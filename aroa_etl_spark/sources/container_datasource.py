"""Factory for file-per-partition container DataSources.

WARC segments, mbox archives, and every other "directory of
self-contained container files" source share one scan model:

- batch: one ``InputPartition`` per file (the natural crawl/archive
  unit — thousands of files fan out to thousands of independent
  executor tasks, records explode inside the scan, no shuffle);
- streaming: offsets are the high-watermark ``[name, size]`` listing
  of files ever seen, each micro-batch ingests the newly appeared
  ones, and the atomic-placement contract is enforced LOUDLY (a seen
  file that grew fails planning instead of silently dropping appended
  records);
- identity: a stable 60-bit blob id from the file path (15 md5 hex
  chars — the engine's BIGINT-safe hash family).

``make_container_datasource`` stamps that model out for a concrete
format from four ingredients: the format name, the filename suffixes
that count as real container files (manifests/.tmp droppings in the
watched directory must never wedge the stream), the per-blob parse
function (bytes -> list[dict]), and the record schema.  The generated
class pickles by value (cloudpickle) to executors, with the parse
function resolving as a plain module-level import.

sources/warc_datasource.py and the mbox DataSource (sources/mbox.py)
are both instantiations — the streaming semantics live here ONCE, so
the growth guard, monotonic offsets, and suffix filtering cannot
drift between formats.
"""

from __future__ import annotations

import glob
import hashlib
import os
from typing import Callable, Iterator

from pyspark.sql import types as T
from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    InputPartition,
)

__all__ = ["make_container_datasource", "path_blob_id"]


def path_blob_id(path: str) -> int:
    """Stable 60-bit id from the file path, deterministic across runs,
    executors, and retries."""
    return int(hashlib.md5(path.encode("utf-8")).hexdigest()[:15], 16)


class _FilePartition(InputPartition):
    def __init__(self, path: str, size: int | None = None):
        self.path = path
        self.size = size


def make_container_datasource(
    fmt: str,
    suffixes: tuple,
    parse_blob: Callable,
    record_schema: T.StructType,
    id_field: str = "blob_id",
) -> type:
    """Build a ``DataSource`` subclass for a container format.

    ``parse_blob(bytes) -> list[dict]`` supplies every record field
    except ``id_field`` (injected as the path hash) — the parser is
    shared VERBATIM with the format's mapInPandas kernel, so the
    DataSource and the explode path can never disagree about record
    boundaries.  The source schema is ``path`` + ``record_schema``."""
    source_schema = T.StructType(
        [T.StructField("path", T.StringType()), *record_schema.fields]
    )
    fields = [f.name for f in record_schema.fields]
    sufs = tuple(s.lower() for s in suffixes)

    def is_container(name: str) -> bool:
        return name.lower().endswith(sufs)

    def read_file(path: str, size: int | None = None) -> Iterator[tuple]:
        # `size` caps the read at the byte length the planner observed,
        # so a file that grows between offset listing and executor read
        # still parses exactly the snapshot the offset describes
        with open(path, "rb") as fh:
            blob = fh.read() if size is None else fh.read(size)
        bid = path_blob_id(path)
        for rec in parse_blob(blob):
            yield (
                path,
                *[bid if f == id_field else rec.get(f) for f in fields],
            )

    class Reader(DataSourceReader):
        def __init__(self, options: dict):
            path = options.get("path")
            if not path:
                raise ValueError(
                    f"{fmt} source needs a path: .load('/dir/*{sufs[0]}')"
                )
            if os.path.isdir(path):
                # directory load: only real container files are
                # segments — a manifest or in-flight .tmp must not
                # pollute the read
                paths = [
                    p
                    for p in glob.glob(os.path.join(path, "*"))
                    if is_container(p)
                ]
            else:
                paths = glob.glob(path)  # explicit glob: the caller chose it
            self.paths = sorted(p for p in paths if os.path.isfile(p))
            if not self.paths:
                raise FileNotFoundError(f"{fmt} source matched no files: {path}")

        def partitions(self) -> list:
            return [_FilePartition(p) for p in self.paths]

        def read(self, partition: _FilePartition) -> Iterator[tuple]:
            return read_file(partition.path)

    class StreamReader(DataSourceStreamReader):
        def __init__(self, options: dict):
            self.dir = options.get("path")
            if not self.dir or not os.path.isdir(self.dir):
                raise ValueError(f"streaming {fmt} source needs a directory path")
            self._high: dict = {}

        def _listing(self) -> list:
            out = []
            for n in sorted(os.listdir(self.dir)):
                p = os.path.join(self.dir, n)
                if is_container(n) and os.path.isfile(p):
                    out.append([n, os.path.getsize(p)])
            return out

        def initialOffset(self) -> dict:
            return {"seen": []}

        def latestOffset(self) -> dict:
            # MONOTONIC offsets: a seen shard that is deleted and later
            # re-placed must not be forgotten by the offset (it would
            # silently re-ingest as "new") — the high watermark
            # remembers every shard this reader has ever listed; a
            # reappearance at a DIFFERENT size still fails planning via
            # the changed-size guard
            for n, size in self._listing():
                self._high[n] = size
            return {"seen": sorted([n, s] for n, s in self._high.items())}

        def partitions(self, start: dict, end: dict):
            seen = dict(map(tuple, start.get("seen", [])))
            # ANY size change on a seen file violates atomic placement:
            # growth means appended records would be dropped, shrinkage
            # means the file was re-placed with different content that
            # would silently never be read — both must fail planning
            changed = [
                (n, seen[n], size)
                for n, size in end.get("seen", [])
                if n in seen and size != seen[n]
            ]
            if changed:
                raise ValueError(
                    f"{fmt} stream: already-ingested file(s) changed "
                    "size — segment files must be placed atomically "
                    "(write to a temp name, rename into the directory): "
                    f"{changed}"
                )
            new = [
                (n, size) for n, size in end.get("seen", []) if n not in seen
            ]
            return [
                _FilePartition(os.path.join(self.dir, n), size)
                for n, size in new
            ] or [_FilePartition("")]  # Spark requires >= 1 partition

        def read(self, partition: _FilePartition) -> Iterator[tuple]:
            if not partition.path:  # empty-batch placeholder
                return iter(())
            return read_file(partition.path, partition.size)

        def commit(self, end: dict) -> None:
            pass  # offsets are self-describing; nothing external to ack

    class Source(DataSource):
        @classmethod
        def name(cls) -> str:
            return fmt

        def schema(self) -> T.StructType:
            return source_schema

        def reader(self, schema: T.StructType) -> DataSourceReader:
            return Reader(self.options)

        def streamReader(self, schema: T.StructType) -> DataSourceStreamReader:
            return StreamReader(self.options)

    Source.__name__ = f"{fmt.capitalize()}ContainerDataSource"
    Source.__qualname__ = Source.__name__
    Source.__doc__ = (
        f'``spark.read.format("{fmt}")`` / '
        f'``spark.readStream.format("{fmt}")`` — register once per '
        f"session via ``spark.dataSource.register(...)``."
    )
    # expose the internals for unit tests / aliasing by the format module
    Source.Reader = Reader
    Source.StreamReader = StreamReader
    Source.source_schema = source_schema
    return Source
