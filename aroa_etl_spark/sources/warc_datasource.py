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

WARC_SOURCE_SCHEMA = T.StructType(
    [
        T.StructField("path", T.StringType()),
        T.StructField("blob_id", T.LongType()),
        T.StructField("rec_idx", T.IntegerType()),
        T.StructField("warc_type", T.StringType()),
        T.StructField("target_uri", T.StringType()),
        T.StructField("content_length", T.LongType()),
        T.StructField("payload_md5", T.StringType()),
    ]
)


def _path_blob_id(path: str) -> int:
    """Stable 63-bit id from the file path — the same md5-prefix hash
    family the engine uses everywhere (deterministic across runs,
    executors, and retries)."""
    return int(hashlib.md5(path.encode("utf-8")).hexdigest()[:15], 16)


class _WarcFilePartition(InputPartition):
    def __init__(self, path: str):
        self.path = path


def _read_file_records(path: str) -> Iterator[tuple]:
    """One file → record tuples in WARC_SOURCE_SCHEMA order — the shared
    executor-side kernel of the batch and streaming readers."""
    with open(path, "rb") as fh:
        blob = fh.read()
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
            pattern = os.path.join(path, "*")
        else:
            pattern = path
        self.paths = sorted(
            p for p in glob.glob(pattern) if os.path.isfile(p)
        )
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

    Offsets are the sorted list of file names already ingested (names,
    not full paths — the offset JSON stays directory-relative).  New
    files become one InputPartition each, read ON EXECUTORS with the
    same shared record kernel as the batch reader — the partitioned
    ``DataSourceStreamReader`` API, not the driver-side Simple variant,
    precisely because segment files are the scale unit.  The file list
    inside the offset grows with the directory (documented trade: a
    100 TB deployment rotates ingestion directories per day/hour, which
    also bounds the listing)."""

    def __init__(self, options: dict):
        self.dir = options.get("path")
        if not self.dir or not os.path.isdir(self.dir):
            raise ValueError("streaming warc source needs a directory path")

    def initialOffset(self) -> dict:
        return {"seen": []}

    def latestOffset(self) -> dict:
        return {"seen": sorted(
            n for n in os.listdir(self.dir)
            if os.path.isfile(os.path.join(self.dir, n))
        )}

    def partitions(self, start: dict, end: dict):
        new = sorted(set(end.get("seen", [])) - set(start.get("seen", [])))
        return [
            _WarcFilePartition(os.path.join(self.dir, n)) for n in new
        ] or [_WarcFilePartition("")]  # Spark requires >= 1 partition

    def read(self, partition: _WarcFilePartition) -> Iterator[tuple]:
        if not partition.path:  # empty-batch placeholder
            return iter(())
        return _read_file_records(partition.path)

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
