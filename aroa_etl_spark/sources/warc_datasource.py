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

The scan/stream mechanics — per-file partitions, monotonic
high-watermark offsets, the atomic-placement growth guard, suffix
filtering so a manifest or ``.tmp`` never wedges a query — live in
sources/container_datasource.py (shared with the mbox DataSource);
this module only binds the WARC parse and suffixes.  The parse itself
is shared verbatim with ``parse_warc_blob`` — the Content-Length-driven
slice that survives payload-embedded magic and walks gzip members via
unused_data — so the DataSource and the mapInPandas kernel can never
disagree about record boundaries.

Streaming placement contract (same as Spark's own FileStreamSource):
files must appear ATOMICALLY (write elsewhere, rename in).  The
recorded size makes a violation loud instead of silently lossy — a
seen file that later GREW fails the next planning round with an
explicit error rather than dropping the appended records (round-6
review finding).  The file list inside the offset grows with the
directory (documented trade: a 100 TB deployment rotates ingestion
directories per day/hour, which also bounds the listing).
"""

from __future__ import annotations

from aroa_etl_spark.sources.container_datasource import (
    make_container_datasource,
    path_blob_id,
)
from aroa_etl_spark.sources.warc import WARC_RECORD_SCHEMA, parse_warc_blob

# kept as the historical public names (tests + docs reference them)
_path_blob_id = path_blob_id

WarcDataSource = make_container_datasource(
    "warc", (".warc", ".warc.gz"), parse_warc_blob, WARC_RECORD_SCHEMA
)
WARC_SOURCE_SCHEMA = WarcDataSource.source_schema
WarcReader = WarcDataSource.Reader
WarcStreamReader = WarcDataSource.StreamReader


def register_warc_source(spark) -> None:
    """Idempotent registration helper (re-registering is a no-op
    overwrite in the Python DataSource registry)."""
    spark.dataSource.register(WarcDataSource)
