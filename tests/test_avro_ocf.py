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


@pytest.mark.parametrize("codec", ["null", "deflate", "snappy", "bzip2", "xz", "zstandard"])
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
    # named-type references stay a boundary (fixed itself decodes
    # since round 11)
    ref = {
        "type": "record", "name": "r",
        "fields": [{"name": "a", "type": "SomeNamedType"}],
    }
    with pytest.raises(NotImplementedError, match="SomeNamedType"):
        build_avro_ocf(ref, [])
    # multi-branch unions DECODE since round 12 — the remaining union
    # boundaries are structural spec violations, loudly typed
    with pytest.raises(ValueError, match="unions may not"):
        build_avro_ocf({
            "type": "record", "name": "r",
            "fields": [{"name": "a", "type": ["null", ["long"]]}],
        }, [])
    with pytest.raises(ValueError, match="exactly one member"):
        build_avro_ocf({
            "type": "record", "name": "r",
            "fields": [{"name": "a", "type": ["null", "long", "string"]}],
        }, [{"a": {"member0": 1, "member1": "x"}}])
    with pytest.raises(ValueError, match="null branch"):
        build_avro_ocf({
            "type": "record", "name": "r",
            "fields": [{"name": "a", "type": ["long", "string"]}],
        }, [{"a": None}])
    with pytest.raises(NotImplementedError, match="codec"):
        build_avro_ocf(SCHEMA, [], codec="lz4")
    # a zstd frame that does not record its content size is a named
    # boundary (streaming writers), not a crash
    from aroa_etl_spark.sources.avro_ocf import _zstd_content_size

    with pytest.raises(NotImplementedError, match="content size"):
        #  magic + FHD(fcs=0, not single-segment) + window byte
        _zstd_content_size(b"\x28\xb5\x2f\xfd\x00\x00rest")
    with pytest.raises(ValueError, match="magic"):
        _zstd_content_size(b"nope")
    # a corrupt bzip2/xz block is typed corruption, not OSError
    for codec in ("bzip2", "xz"):
        blob = bytearray(build_avro_ocf(SCHEMA, RECS, codec=codec))
        blob[len(blob) - 30] ^= 0xFF
        with pytest.raises(ValueError):
            parse_avro_blob(bytes(blob))
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


NESTED_SCHEMA = {
    "type": "record", "name": "doc",
    "fields": [
        {"name": "id", "type": "long"},
        {"name": "meta", "type": {
            "type": "record", "name": "m",
            "fields": [
                {"name": "src", "type": "string"},
                {"name": "ver", "type": "long"},
                {"name": "inner", "type": {
                    "type": "record", "name": "i",
                    "fields": [{"name": "d", "type": "double"}],
                }},
            ],
        }},
        {"name": "tags", "type": {"type": "array", "items": "string"}},
        {"name": "scores", "type": {
            "type": "array", "items": ["null", "double"]}},
        {"name": "alt", "type": ["string", "null"]},  # null at branch 1
    ],
}
NESTED_RECS = [
    {"id": 1,
     "meta": {"src": "a", "ver": 7, "inner": {"d": 0.5}},
     "tags": ["x", "y", "z"],
     "scores": [1.0, None, -2.25],
     "alt": "hi"},
    {"id": 2,
     "meta": {"src": "", "ver": 0, "inner": {"d": -1.0}},
     "tags": [],
     "scores": [],
     "alt": None},
]


@pytest.mark.parametrize("codec", ["null", "deflate", "snappy"])
def test_nested_records_and_arrays_roundtrip(codec):
    blob = build_avro_ocf(NESTED_SCHEMA, NESTED_RECS, codec=codec,
                          records_per_block=1)
    hdr, back = parse_avro_blob(blob)
    assert back == NESTED_RECS
    assert hdr["codec"] == codec


def test_reversed_union_branch_order():
    # [T, "null"]: null is branch 1 — assuming branch 0 would misparse
    blob = build_avro_ocf(NESTED_SCHEMA, NESTED_RECS)
    alt_null = blob  # rec 2 has alt=None
    _, back = parse_avro_blob(alt_null)
    assert back[0]["alt"] == "hi" and back[1]["alt"] is None


def test_array_negative_block_count_decodes():
    # a writer may emit count=-n followed by the block byte size
    from aroa_etl_spark.sources.avro_ocf import (
        _decode_node, _parse_type, _zz_encode,
    )

    node = _parse_type({"type": "array", "items": "long"})
    items = b"".join(_zz_encode(v) for v in (5, -3, 10))
    buf = _zz_encode(-3) + _zz_encode(len(items)) + items + _zz_encode(0)
    vals, pos = _decode_node(node, buf, 0)
    assert vals == [5, -3, 10] and pos == len(buf)


def test_snappy_codec_guards():
    from aroa_etl_spark.sources.avro_ocf import (
        snappy_compress, snappy_decompress,
    )

    # raw codec round-trip incl. >60-byte literals
    for data in (b"", b"abc", b"q" * 70000, bytes(range(256)) * 10):
        assert snappy_decompress(snappy_compress(data)) == data
    # handcrafted copy elements: literal 'abcd' + 1-byte-offset copy
    # (len 4, off 4) = 'abcdabcd'; then overlapping copy (len 5, off 1)
    lit = bytes([3 << 2]) + b"abcd"
    copy1 = bytes([(0 << 5) | (0 << 2) | 1, 4])  # len 4-4=0 -> +4, off 4
    enc = bytes([13]) + lit + copy1 + bytes([((5 - 4) << 2) | 1, 1])
    assert snappy_decompress(enc) == b"abcdabcdddddd"[:13]
    # corrupt CRC fails the avro block: flip a byte just before the
    # final 16-byte sync marker — inside the last block's 4-byte CRC
    blob = bytearray(build_avro_ocf(SCHEMA, RECS, codec="snappy"))
    blob[len(blob) - 18] ^= 0xFF
    with pytest.raises(ValueError, match="CRC32|snappy"):
        parse_avro_blob(bytes(blob))


@pytest.mark.parametrize("codec", ["null", "snappy"])
def test_maps_and_enums_roundtrip(codec):
    schema = {
        "type": "record", "name": "r",
        "fields": [
            {"name": "id", "type": "long"},
            {"name": "color", "type": {
                "type": "enum", "name": "c",
                "symbols": ["RED", "GREEN", "BLUE"]}},
            {"name": "attrs", "type": {"type": "map", "values": "long"}},
            {"name": "labels", "type": {
                "type": "map", "values": ["null", "string"]}},
        ],
    }
    recs = [
        {"id": 1, "color": "GREEN",
         "attrs": {"a": 5, "b": -3, "ü": 2**40},
         "labels": {"x": "hi", "y": None}},
        {"id": 2, "color": "RED", "attrs": {}, "labels": {}},
    ]
    _, back = parse_avro_blob(
        build_avro_ocf(schema, recs, codec=codec, records_per_block=1)
    )
    assert back == recs
    # out-of-vocabulary enum value fails loudly on write
    with pytest.raises(ValueError, match="enum symbols"):
        build_avro_ocf(schema, [{"id": 3, "color": "MAUVE",
                                 "attrs": {}, "labels": {}}])


def test_fuzzed_blobs_raise_typed_errors_only():
    """The parser's fail-loudly taxonomy under mutation fuzz: corrupted
    blobs raise ValueError / NotImplementedError — never IndexError or
    KeyError — and corrupted varint COUNTS can never hang the decode
    (negative lengths used to walk pos backward; round-10 findings)."""
    import random

    schema = {"type": "record", "name": "r", "fields": [
        {"name": "id", "type": "long"}, {"name": "f", "type": "boolean"},
        {"name": "t", "type": {"type": "array", "items": "string"}},
        {"name": "m", "type": {"type": "map", "values": "long"}}]}
    blob = build_avro_ocf(
        schema,
        [{"id": i, "f": i % 2 == 0, "t": ["x", "yy"], "m": {"a": i}}
         for i in range(5)],
        codec="snappy",
    )
    # logical-type seed (round 11): fuzzed epoch days/micros/unscaled
    # ints must surface as ValueError, never OverflowError
    import datetime as dt
    import decimal

    lt_schema = {"type": "record", "name": "lt", "fields": [
        {"name": "d", "type": {"type": "int", "logicalType": "date"}},
        {"name": "ts", "type": {
            "type": "long", "logicalType": "timestamp-micros"}},
        {"name": "a", "type": {"type": "bytes", "logicalType": "decimal",
                               "precision": 8, "scale": 2}}]}
    lt_blob = build_avro_ocf(lt_schema, [
        {"d": dt.date(2020, 1, 1), "ts": dt.datetime(2024, 5, 6),
         "a": decimal.Decimal("12.34")}])
    rng = random.Random(7)
    for trial in range(1100):
        b = bytearray(blob if trial % 3 else lt_blob)
        op = rng.randrange(3)
        if op == 0 and len(b) > 4:
            b = b[:rng.randrange(4, len(b))]
        elif op == 1:
            for _ in range(rng.randrange(1, 6)):
                b[rng.randrange(len(b))] ^= rng.randrange(1, 256)
        else:
            i = rng.randrange(len(b))
            b = b[:i] + bytes(rng.randrange(256) for _ in range(8)) + b[i:]
        try:
            parse_avro_blob(bytes(b))
        except (ValueError, NotImplementedError):
            pass  # the documented taxonomy


# --- logical types (round 11, r10 verdict #5) --------------------------------


def test_logical_types_roundtrip_all_codecs():
    import datetime as dt
    import decimal

    schema = {
        "type": "record", "name": "lt",
        "fields": [
            {"name": "born", "type": {"type": "int", "logicalType": "date"}},
            {"name": "ts_us", "type": {
                "type": "long", "logicalType": "timestamp-micros"}},
            {"name": "ts_ms", "type": {
                "type": "long", "logicalType": "timestamp-millis"}},
            {"name": "amt", "type": {
                "type": "bytes", "logicalType": "decimal",
                "precision": 10, "scale": 2}},
            {"name": "famt", "type": {
                "type": "fixed", "name": "f8", "size": 8,
                "logicalType": "decimal", "precision": 14, "scale": 4}},
            {"name": "uid", "type": {
                "type": "string", "logicalType": "uuid"}},
            {"name": "raw", "type": "bytes"},
            {"name": "future", "type": {
                "type": "long", "logicalType": "not-a-real-one"}},
            {"name": "maybe_d", "type": [
                "null", {"type": "int", "logicalType": "date"}]},
        ],
    }
    recs = [
        {
            "born": dt.date(2001, 2, 3),
            "ts_us": dt.datetime(2024, 1, 2, 3, 4, 5, 123456),
            "ts_ms": dt.datetime(2020, 6, 7, 8, 9, 10, 500000),
            "amt": decimal.Decimal("-123.45"),
            "famt": decimal.Decimal("99999.0001"),
            "uid": "01234567-89ab-cdef-0123-456789abcdef",
            "raw": b"\x00\xffraw",
            "future": 42,
            "maybe_d": None,
        },
        {
            "born": dt.date(1969, 12, 31),  # negative epoch days
            "ts_us": dt.datetime(1969, 12, 31, 23, 59, 59),
            "ts_ms": dt.datetime(1970, 1, 1),
            "amt": decimal.Decimal("0.05"),
            "famt": decimal.Decimal("-0.0002"),
            "uid": "u2",
            "raw": b"",
            "future": -7,
            "maybe_d": dt.date(2030, 1, 1),
        },
    ]
    for codec in ("null", "deflate", "snappy"):
        hdr, back = parse_avro_blob(build_avro_ocf(schema, recs, codec=codec))
        assert back == recs, codec
        # unknown logicalType stays surfaced in the header schema
        assert "not-a-real-one" in str(hdr["schema"])


def test_logical_type_schema_guards():
    def one(field_type):
        return {"type": "record", "name": "r",
                "fields": [{"name": "a", "type": field_type}]}

    with pytest.raises(ValueError, match="scale"):
        build_avro_ocf(one({"type": "bytes", "logicalType": "decimal",
                            "precision": 4, "scale": 9}), [])
    with pytest.raises(ValueError, match="bytes or"):
        build_avro_ocf(one({"type": "string", "logicalType": "decimal",
                            "precision": 4, "scale": 2}), [])
    with pytest.raises(ValueError, match="requires int"):
        build_avro_ocf(one({"type": "long", "logicalType": "date"}), [])
    with pytest.raises(ValueError, match="requires long"):
        build_avro_ocf(
            one({"type": "int", "logicalType": "timestamp-micros"}), []
        )
    with pytest.raises(ValueError, match="fixed value is"):
        build_avro_ocf(
            one({"type": "fixed", "name": "f", "size": 2}), [{"a": b"xxx"}]
        )


def test_logical_decode_out_of_range_is_valueerror():
    """A fuzzed epoch-days/micros field must surface as the ValueError
    taxonomy, not OverflowError (the codec-fuzz contract)."""
    import datetime as dt

    schema = {"type": "record", "name": "r", "fields": [
        {"name": "d", "type": {"type": "int", "logicalType": "date"}}]}
    blob = bytearray(build_avro_ocf(schema, [{"d": dt.date(2020, 1, 1)}]))
    # splice an absurd zigzag varint as the record payload: find the
    # encoded day count and replace the block with days ~ 2**40
    from aroa_etl_spark.sources.avro_ocf import _zz_encode

    good = _zz_encode((dt.date(2020, 1, 1) - dt.date(1970, 1, 1)).days)
    bad = _zz_encode(2**40)
    i = bytes(blob).rindex(good)
    patched = bytes(blob[:i]) + bad + bytes(blob[i + len(good):])
    # block size field must grow too: rebuild via the builder instead
    schema2 = {"type": "record", "name": "r", "fields": [
        {"name": "d", "type": "int"}]}
    raw = build_avro_ocf(schema2, [{"d": 2**40 // 86400}])
    # reinterpret the same bytes under the DATE logical schema
    import json as _json

    raw = raw.replace(
        _json.dumps(schema2, separators=(",", ":")).encode(),
        _json.dumps(schema, separators=(",", ":")).encode(),
    )
    del patched
    with pytest.raises(ValueError):
        parse_avro_blob(raw)


def test_named_type_references_roundtrip():
    """Round 12: records/enums/fixed register under their (namespace-
    qualified) names and later bare names follow the definition —
    including SELF-referential records (linked lists terminated by
    null unions).  Unknown names still refuse (covered above)."""
    schema = {
        "type": "record", "name": "outer", "namespace": "com.x",
        "fields": [
            {"name": "a", "type": {"type": "record", "name": "pt",
                                   "fields": [{"name": "x", "type": "int"},
                                              {"name": "y", "type": "int"}]}},
            {"name": "b", "type": "pt"},
            {"name": "b2", "type": "com.x.pt"},
            {"name": "c", "type": {"type": "enum", "name": "col",
                                   "symbols": ["R", "G"]}},
            {"name": "d", "type": "col"},
            {"name": "e", "type": {"type": "fixed", "name": "f4",
                                   "size": 4}},
            {"name": "f", "type": "f4"},
            {"name": "lst", "type": {
                "type": "record", "name": "node",
                "fields": [{"name": "v", "type": "long"},
                           {"name": "next", "type": ["null", "node"]}]}},
        ],
    }
    deep = None
    for v in range(40, 0, -1):  # 40-deep list: recursion stays bounded
        deep = {"v": v, "next": deep}
    recs = [{
        "a": {"x": 1, "y": 2}, "b": {"x": 3, "y": 4}, "b2": {"x": 5, "y": 6},
        "c": "R", "d": "G", "e": b"abcd", "f": b"wxyz", "lst": deep,
    }]
    for codec in ("null", "deflate", "snappy"):
        _h, back = parse_avro_blob(build_avro_ocf(schema, recs, codec=codec))
        assert back == recs
