"""The snapshot-manifest table as a Spark DataSource — batch AND
incremental (streaming) consumption of the engine's commit log
(operators/table.py):

    spark.dataSource.register(SnapshotTableDataSource)
    spark.read.format("snapshot_table").load("/tables/docs")        # newest
    spark.readStream.format("snapshot_table").load("/tables/docs")  # tail

Batch read = the newest manifest's data directories, one
``InputPartition`` per directory, rows delivered as Arrow record
batches straight from pyarrow (no Python per-row cost).

Streaming read = the table's COMMIT LOG as the offset axis: offsets
are manifest versions (monotone integers — far stronger than file
listings: no mtime races, no atomic-placement contract to document),
and each micro-batch reads exactly the data directories the manifests
in ``(start, end]`` ADDED.  That makes the feed exact change-data
capture for APPEND-ONLY tables; a non-append commit inside the window
(upsert/overwrite/compact rewrites the snapshot rather than adding to
it) fails planning loudly — consume those tables by version diff
(operators/incremental.snapshot_diff) instead.  A vacuumed-away
manifest inside the window also fails loudly: the offset predates the
retention horizon, the same contract as any log-compacted source.

Schema comes from the newest manifest's recorded ``schema_cols`` —
the same record the append guard enforces — so the source never
schema-drifts mid-stream.

Scale: planning is driver-side JSON over manifests; executors read
only the added directories (no re-listing of the table), one
partition per added directory.
"""

from __future__ import annotations

import json
import os
from typing import Iterator

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    InputPartition,
)
from pyspark.sql.types import StructType

__all__ = ["SnapshotTableDataSource", "register_table_source"]


class _DirPartition(InputPartition):
    def __init__(self, path: str):
        self.path = path


def _read_dir_batches(path: str, columns: "list[str]") -> Iterator:
    import pyarrow.parquet as pq

    for name in sorted(os.listdir(path)):
        if not name.endswith(".parquet"):
            continue
        f = pq.ParquetFile(os.path.join(path, name))
        yield from f.iter_batches(columns=columns)


def _manifest_versions(root: str) -> "list[int]":
    d = os.path.join(root, "_manifests")
    if not os.path.isdir(d):
        return []
    out = []
    for n in os.listdir(d):
        if n.startswith("v") and n.endswith(".json"):
            try:
                out.append(int(n[1:-5]))
            except ValueError:
                continue
    return sorted(out)


def _load_manifest(root: str, v: int) -> dict:
    with open(os.path.join(root, "_manifests", f"v{v:012d}.json")) as f:
        return json.load(f)


def _require_root(options: dict) -> str:
    path = options.get("path")
    if not path or "://" in path:
        raise ValueError(
            "snapshot_table source needs a driver-local table root: "
            '.load("/tables/name")'
        )
    if not _manifest_versions(path):
        raise ValueError(f"snapshot table {path!r} has no commits")
    return path.rstrip("/")


def _table_schema_ddl(root: str) -> str:
    """Schema as a DDL string — the DataSource worker has no active
    SparkContext, and the Python DataSource API accepts DDL."""
    newest = _load_manifest(root, _manifest_versions(root)[-1])
    cols = newest.get("schema_cols")
    if not cols:
        raise ValueError(
            "snapshot table manifest lacks schema_cols (pre-round-10 "
            "table): overwrite-commit once to record the schema"
        )
    return ", ".join(f"`{name}` {typ}" for name, typ in cols)


class _Reader(DataSourceReader):
    def __init__(self, options: dict):
        self.root = _require_root(options)
        newest = _load_manifest(self.root, _manifest_versions(self.root)[-1])
        self.dirs = [os.path.join(self.root, f) for f in newest["files"]]
        self.columns = [c for c, _t in newest["schema_cols"]]

    def partitions(self):
        return [_DirPartition(d) for d in self.dirs]

    def read(self, partition: _DirPartition):
        return _read_dir_batches(partition.path, self.columns)


class _StreamReader(DataSourceStreamReader):
    def __init__(self, options: dict):
        self.root = _require_root(options)
        newest = _load_manifest(self.root, _manifest_versions(self.root)[-1])
        self.columns = [c for c, _t in newest["schema_cols"]]

    def initialOffset(self) -> dict:
        return {"version": 0}

    def latestOffset(self) -> dict:
        return {"version": _manifest_versions(self.root)[-1]}

    def partitions(self, start: dict, end: dict):
        v0, v1 = start.get("version", 0), end.get("version", 0)
        have = set(_manifest_versions(self.root))
        added: "list[str]" = []
        for v in range(v0 + 1, v1 + 1):
            if v not in have:
                raise ValueError(
                    f"snapshot_table stream: version {v} was vacuumed away "
                    "— the offset predates the table's retention horizon; "
                    "restart the query from a fresh checkpoint"
                )
            m = _load_manifest(self.root, v)
            if m.get("parent") is not None and m.get("op") != "append":
                raise ValueError(
                    f"snapshot_table stream: version {v} is op="
                    f"{m.get('op')!r} — the change feed is exact only for "
                    "append-only tables; diff snapshots with "
                    "operators/incremental.snapshot_diff instead"
                )
            if m.get("parent") is None:
                prev: set = set()
            elif m["parent"] in have:
                prev = set(_load_manifest(self.root, m["parent"])["files"])
            else:
                raise ValueError(
                    f"snapshot_table stream: version {v}'s parent manifest "
                    f"{m['parent']} was vacuumed away — cannot diff; "
                    "restart the query from a fresh checkpoint"
                )
            added.extend(f for f in m["files"] if f not in prev)
        return [
            _DirPartition(os.path.join(self.root, f)) for f in added
        ] or [_DirPartition("")]

    def read(self, partition: _DirPartition):
        if not partition.path:
            return iter(())
        return _read_dir_batches(partition.path, self.columns)

    def commit(self, end: dict) -> None:
        pass  # offsets are self-describing manifest versions


class SnapshotTableDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "snapshot_table"

    def schema(self) -> str:
        return _table_schema_ddl(_require_root(self.options))

    def reader(self, schema: StructType) -> DataSourceReader:
        return _Reader(self.options)

    def streamReader(self, schema: StructType) -> DataSourceStreamReader:
        return _StreamReader(self.options)


def register_table_source(spark) -> None:
    """Idempotent registration helper."""
    spark.dataSource.register(SnapshotTableDataSource)
