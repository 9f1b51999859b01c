"""Avro OCF reader/writer tests: round-trips, codecs, boundaries."""

import pytest
from pyspark.sql import types as T

from aroa_etl_spark.sources.avro_ocf import (
    avro_records,
    build_avro_ocf,
    parse_avro_blob,
)

SCHEMA = {
    "type": "record", "name": "r",
    "fields": [
        {"name": "id", "type": "long"},
        {"name": "name", "type": "string"},
        {"name": "score", "type": "double"},
        {"name": "flag", "type": "boolean"},
        {"name": "note", "type": ["null", "string"]},
    ],
}
RECS = [
    {"id": -5, "name": "alpha", "score": 1.25, "flag": True, "note": None},
    {"id": 2**40, "name": "β utf8", "score": -0.5, "flag": False, "note": "x"},
    {"id": 0, "name": "", "score": 0.0, "flag": True, "note": "y"},
]


@pytest.mark.parametrize("codec", ["null", "deflate"])
def test_roundtrip_both_codecs_multiblock(codec):
    blob = build_avro_ocf(SCHEMA, RECS, codec=codec, records_per_block=2)
    hdr, back = parse_avro_blob(blob)
    assert back == RECS
    assert hdr["codec"] == codec and hdr["n_records"] == 3


def test_corruption_and_sync_guard():
    blob = bytearray(build_avro_ocf(SCHEMA, RECS, sync=b"S" * 16))
    # flip one byte of the LAST block's sync marker
    blob[-1] ^= 0xFF
    with pytest.raises(ValueError, match="sync marker"):
        parse_avro_blob(bytes(blob))
    with pytest.raises(ValueError, match="magic"):
        parse_avro_blob(b"PAR1 not avro")


def test_unsupported_constructs_raise_by_name():
    arr = {
        "type": "record", "name": "r",
        "fields": [{"name": "a", "type": {"type": "array", "items": "long"}}],
    }
    with pytest.raises(NotImplementedError, match="complex type"):
        build_avro_ocf(arr, [])
    with pytest.raises(NotImplementedError, match="codec"):
        build_avro_ocf(SCHEMA, [], codec="snappy")
    with pytest.raises(ValueError, match="not nullable"):
        build_avro_ocf(SCHEMA, [{"id": None, "name": "x", "score": 0.0,
                                 "flag": True, "note": None}])
    # round-10 advisor: ints outside int64 would zigzag-encode silently
    # and decode to a DIFFERENT value — must fail loudly instead
    for bad in (2**63, -(2**63) - 1):
        with pytest.raises(ValueError, match="int64"):
            build_avro_ocf(SCHEMA, [{"id": bad, "name": "x", "score": 0.0,
                                     "flag": True, "note": None}])
    # the boundary values themselves round-trip
    edge = [{"id": 2**63 - 1, "name": "hi", "score": 0.0, "flag": True,
             "note": None},
            {"id": -(2**63), "name": "lo", "score": 0.0, "flag": False,
             "note": None}]
    _, back = parse_avro_blob(build_avro_ocf(SCHEMA, edge))
    assert back == edge


def test_avro_records_kernel_and_missing_field(spark):
    blob = build_avro_ocf(SCHEMA, RECS)
    df = spark.createDataFrame(
        [(9, bytearray(blob))], "blob_id long, content binary"
    )
    rec_schema = T.StructType(
        [
            T.StructField("id", T.LongType()),
            T.StructField("name", T.StringType()),
            T.StructField("note", T.StringType()),
        ]
    )
    rows = avro_records(df, rec_schema).orderBy("id").collect()
    assert [(r.id, r.name, r.note) for r in rows] == [
        (-5, "alpha", None), (0, "", "y"), (2**40, "β utf8", "x")
    ]
    bad_schema = T.StructType([T.StructField("nope", T.LongType())])
    with pytest.raises(Exception, match="lacks declared fields"):
        avro_records(df, bad_schema).collect()
