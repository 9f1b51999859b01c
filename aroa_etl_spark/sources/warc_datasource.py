"""WARC as a first-class Spark DataSource: ``spark.read.format("warc")``.

Spark 4's Python DataSource API (`pyspark.sql.datasource`) lets the
engine expose the WARC container (ISO 28500, plain or ``.warc.gz``
per-record gzip members) as a NATIVE source instead of the two-step
``binaryFile`` scan + ``parse_warc_records`` explode:

    spark.dataSource.register(WarcDataSource)
    df = spark.read.format("warc").load("/crawl/segment/*.warc.gz")

Scale model: one ``InputPartition`` per file (Common Crawl ships ~1 GB
segment files — thousands of files ⇒ thousands of independent
partitions; executors stream records without any shuffle), the same
unit the binaryFile path would use but with the record explosion fused
into the scan.  Each partition yields the module's standard record
schema (sources/warc.py): blob id (a stable hash of the file path),
record index, WARC type, target URI, content length, payload md5.

The parse itself is shared verbatim with ``parse_warc_blob`` — the
Content-Length-driven slice that survives payload-embedded magic and
walks gzip members via unused_data — so the DataSource and the
mapInPandas kernel can never disagree about record boundaries.
"""

from __future__ import annotations

import glob
import hashlib
import os
from typing import Iterator

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    InputPartition,
)
from pyspark.sql import types as T

from aroa_etl_spark.sources.warc import parse_warc_blob

from aroa_etl_spark.sources.warc import WARC_RECORD_SCHEMA

# path + the shared record schema, DERIVED so the DataSource and the
# mapInPandas kernel cannot drift apart structurally (round-6 review)
WARC_SOURCE_SCHEMA = T.StructType(
    [T.StructField("path", T.StringType()), *WARC_RECORD_SCHEMA.fields]
)

# only real segment files are ingested: a manifest/checksum/.tmp file
# in the directory must not wedge the stream or pollute a dir load
_WARC_SUFFIXES = (".warc", ".warc.gz")


def _is_warc_file(name: str) -> bool:
    return name.lower().endswith(_WARC_SUFFIXES)


def _path_blob_id(path: str) -> int:
    """Stable 60-bit id from the file path (15 md5 hex chars — the
    engine's BIGINT-safe md5-prefix hash family, the same space the
    kmv/minhash oracles replay), deterministic across runs, executors,
    and retries."""
    return int(hashlib.md5(path.encode("utf-8")).hexdigest()[:15], 16)


class _WarcFilePartition(InputPartition):
    def __init__(self, path: str, size: int | None = None):
        self.path = path
        self.size = size


def _read_file_records(path: str, size: int | None = None) -> Iterator[tuple]:
    """One file → record tuples in WARC_SOURCE_SCHEMA order — the shared
    executor-side kernel of the batch and streaming readers.  ``size``
    caps the read at the byte length the planner observed, so a file
    that grows between offset listing and executor read still parses
    exactly the snapshot the offset describes."""
    with open(path, "rb") as fh:
        blob = fh.read() if size is None else fh.read(size)
    bid = _path_blob_id(path)
    for rec in parse_warc_blob(blob):
        yield (
            path,
            bid,
            rec["rec_idx"],
            rec["warc_type"],
            rec["target_uri"],
            rec["content_length"],
            rec["payload_md5"],
        )


class WarcReader(DataSourceReader):
    def __init__(self, options: dict):
        path = options.get("path")
        if not path:
            raise ValueError("warc source needs a path: .load('/dir/*.warc')")
        if os.path.isdir(path):
            # directory load: only .warc/.warc.gz are segments — a
            # manifest or in-flight .tmp must not pollute the read
            paths = [
                p for p in glob.glob(os.path.join(path, "*"))
                if _is_warc_file(p)
            ]
        else:
            paths = glob.glob(path)  # explicit glob: the caller chose it
        self.paths = sorted(p for p in paths if os.path.isfile(p))
        if not self.paths:
            raise FileNotFoundError(f"warc source matched no files: {path}")

    def partitions(self) -> list[InputPartition]:
        # one partition per file: the natural Common Crawl unit; a
        # thousand segment files fan out to a thousand tasks
        return [_WarcFilePartition(p) for p in self.paths]

    def read(self, partition: _WarcFilePartition) -> Iterator[tuple]:
        return _read_file_records(partition.path)


class WarcStreamReader(DataSourceStreamReader):
    """Streaming WARC ingestion: each micro-batch picks up files that
    appeared in the watched directory since the last offset — the
    crawl-ingestion shape (a fetcher drops finished ``.warc.gz``
    segments; the pipeline tails the directory).

    Offsets are the sorted ``[name, size]`` list of files already
    ingested (directory-relative, JSON-serializable).  New files become
    one InputPartition each, read ON EXECUTORS with the same shared
    record kernel as the batch reader — the partitioned
    ``DataSourceStreamReader`` API, not the driver-side Simple variant,
    precisely because segment files are the scale unit.  Only
    ``.warc``/``.warc.gz`` names are considered, so a manifest or
    in-flight ``.tmp`` in the directory cannot wedge the query.

    Placement contract (same as Spark's own FileStreamSource): files
    must appear ATOMICALLY (write elsewhere, rename in).  The recorded
    size makes a violation loud instead of silently lossy — executors
    read exactly the snapshot length the offset describes, and a
    seen file that later GREW fails the next planning round with an
    explicit error rather than dropping the appended records (round-6
    review finding).  The file list inside the offset grows with the
    directory (documented trade: a 100 TB deployment rotates ingestion
    directories per day/hour, which also bounds the listing)."""

    def __init__(self, options: dict):
        self.dir = options.get("path")
        if not self.dir or not os.path.isdir(self.dir):
            raise ValueError("streaming warc source needs a directory path")
        self._high: dict = {}

    def _listing(self) -> list[list]:
        out = []
        for n in sorted(os.listdir(self.dir)):
            p = os.path.join(self.dir, n)
            if _is_warc_file(n) and os.path.isfile(p):
                out.append([n, os.path.getsize(p)])
        return out

    def initialOffset(self) -> dict:
        return {"seen": []}

    def latestOffset(self) -> dict:
        # MONOTONIC offsets (review finding): a seen shard that is
        # deleted and later re-placed must not be forgotten by the
        # offset (it would silently re-ingest as "new") — the high
        # watermark remembers every shard this reader has ever listed;
        # a reappearance at a DIFFERENT size still fails planning via
        # the changed-size guard.
        for n, size in self._listing():
            self._high[n] = size
        return {"seen": sorted([n, s] for n, s in self._high.items())}

    def partitions(self, start: dict, end: dict):
        seen = dict(map(tuple, start.get("seen", [])))
        grown = [
            (n, seen[n], size)
            for n, size in end.get("seen", [])
            if n in seen and size > seen[n]
        ]
        if grown:
            raise ValueError(
                "warc stream: already-ingested file(s) grew — segment "
                "files must be placed atomically (write to a temp name, "
                f"rename into the directory): {grown}"
            )
        new = [
            (n, size) for n, size in end.get("seen", []) if n not in seen
        ]
        return [
            _WarcFilePartition(os.path.join(self.dir, n), size)
            for n, size in new
        ] or [_WarcFilePartition("")]  # Spark requires >= 1 partition

    def read(self, partition: _WarcFilePartition) -> Iterator[tuple]:
        if not partition.path:  # empty-batch placeholder
            return iter(())
        return _read_file_records(partition.path, partition.size)

    def commit(self, end: dict) -> None:
        pass  # offsets are self-describing; nothing external to ack


class WarcDataSource(DataSource):
    """``spark.read.format("warc")`` / ``spark.readStream.format("warc")``
    — register once per session via
    ``spark.dataSource.register(WarcDataSource)``."""

    @classmethod
    def name(cls) -> str:
        return "warc"

    def schema(self) -> T.StructType:
        return WARC_SOURCE_SCHEMA

    def reader(self, schema: T.StructType) -> DataSourceReader:
        return WarcReader(self.options)

    def streamReader(self, schema: T.StructType) -> DataSourceStreamReader:
        return WarcStreamReader(self.options)


def register_warc_source(spark) -> None:
    """Idempotent registration helper (re-registering is a no-op
    overwrite in the Python DataSource registry)."""
    spark.dataSource.register(WarcDataSource)
