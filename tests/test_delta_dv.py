"""Deletion vectors (sources/delta_dv.py) + merge-on-read table reads:
Z85/roaring laws, hypothesis round-trips over every container kind,
end-to-end Delta DV and Iceberg position-delete reads, and the
at-birth mutation fuzz of the new binary parser."""

from __future__ import annotations

import shutil

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from aroa_etl_spark.sources.delta_dv import (
    build_dv_file,
    decode_roaring_array,
    encode_inline_dv,
    encode_roaring_array,
    read_dv_descriptor,
    z85_decode,
    z85_encode,
)


def test_z85_reference_vector():
    # the ZeroMQ spec's published test vector
    assert z85_encode(bytes([0x86, 0x4F, 0xD2, 0x6F, 0xB5, 0x59, 0xF7, 0x5B])) \
        == "HelloWorld"
    assert z85_decode("HelloWorld") == bytes(
        [0x86, 0x4F, 0xD2, 0x6F, 0xB5, 0x59, 0xF7, 0x5B]
    )
    with pytest.raises(ValueError):
        z85_decode("Hell")  # not a whole 5-character group
    with pytest.raises(ValueError):
        z85_decode("#####")  # 84^5-ish group overflows 32 bits
    with pytest.raises(ValueError):
        z85_decode('"""""')


def test_roaring_container_kinds_roundtrip():
    # array (sparse), run (dense ranges), bitset (>4096 per bucket),
    # multiple 32-bit buckets, and 64-bit high keys
    cases = [
        [0],
        [7, 9, 100, 65535, 65536, 70000],
        list(range(1000, 1300)),                      # one run
        list(range(0, 131072, 2)),                    # bitset buckets
        sorted(set(list(range(100, 5000)) + [1 << 33, (1 << 33) + 5])),
        list(range(50)) + list(range(1 << 40, (1 << 40) + 10)),
    ]
    for idx in cases:
        assert decode_roaring_array(encode_roaring_array(idx)) == sorted(set(idx))


@settings(max_examples=60, deadline=None)
@given(st.lists(st.integers(min_value=0, max_value=1 << 40),
                min_size=0, max_size=400))
def test_roaring_roundtrip_law(indexes):
    expect = sorted(set(indexes))
    if not expect:
        assert decode_roaring_array(encode_roaring_array([])) == []
        return
    assert decode_roaring_array(encode_roaring_array(indexes)) == expect


def test_descriptor_file_and_inline(tmp_path):
    root = str(tmp_path)
    d0, d1 = build_dv_file(root, [[1, 2, 3], list(range(100, 200))])
    assert read_dv_descriptor(root, d0) == [1, 2, 3]
    assert read_dv_descriptor(root, d1) == list(range(100, 200))
    inl = encode_inline_dv([0, 9, 1 << 33])
    assert read_dv_descriptor(root, inl) == [0, 9, 1 << 33]
    with pytest.raises(NotImplementedError, match="storageType"):
        read_dv_descriptor(root, {"storageType": "x", "pathOrInlineDv": ""})
    # cardinality cross-check
    bad = dict(inl)
    bad["cardinality"] = 99
    with pytest.raises(ValueError, match="cardinality"):
        read_dv_descriptor(root, bad)


def test_dv_parser_mutation_fuzz(tmp_path):
    """At-birth fuzz (house rule): corrupt payloads raise ValueError /
    NotImplementedError only."""
    rng = np.random.default_rng(31)
    base = encode_roaring_array(
        list(range(0, 300, 3)) + list(range(70000, 70050)) + [1 << 34]
    )
    for trial in range(600):
        b = bytearray(base)
        k = trial % 3
        if k == 0:
            b = b[:int(rng.integers(0, len(b)))]
        elif k == 1:
            for _ in range(int(rng.integers(1, 5))):
                b[int(rng.integers(0, len(b)))] ^= 1 << int(rng.integers(0, 8))
        else:
            i = int(rng.integers(0, len(base)))
            j = int(rng.integers(0, len(base)))
            b = bytearray(base[:i] + base[j:])
        try:
            decode_roaring_array(bytes(b))
        except (ValueError, NotImplementedError):
            pass
    # framed file: truncations and flips through the descriptor path
    root = str(tmp_path)
    (desc,) = build_dv_file(root, [list(range(64))])
    import glob
    import os

    path = glob.glob(os.path.join(root, "deletion_vector_*.bin"))[0]
    blob = open(path, "rb").read()
    for cut in range(0, len(blob), 7):
        with open(path, "wb") as f:
            f.write(blob[:cut])
        try:
            read_dv_descriptor(root, desc)
        except (ValueError, NotImplementedError):
            pass
    with open(path, "wb") as f:
        f.write(blob)
    flipped = bytearray(blob)
    flipped[len(blob) // 2] ^= 0xFF
    with open(path, "wb") as f:
        f.write(bytes(flipped))
    try:
        read_dv_descriptor(root, desc)
    except (ValueError, NotImplementedError):
        pass


def test_delta_dv_read_end_to_end(spark, tmp_path):
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    from aroa_etl_spark.sources.delta_log import (
        build_delta_table,
        delta_read,
        delta_snapshot,
    )

    root = str(tmp_path / "dv")
    shutil.rmtree(root, ignore_errors=True)
    schema = T.StructType([
        T.StructField("k", T.LongType()),
        T.StructField("band", T.IntegerType()),
    ])
    rows = spark.range(100).select(F.col("id").alias("k"))
    b0 = rows.filter("k < 50").orderBy("k")
    b1 = rows.filter("k >= 50").orderBy("k")
    build_delta_table(
        spark, root, schema, ["band"],
        [{"adds": [({"band": 0}, b0), ({"band": 1}, b1)]}],
    )
    snap = delta_snapshot(root)
    paths = {i["partitionValues"]["band"]: p
             for p, i in snap["files"].items()}
    dv0 = encode_inline_dv(list(range(0, 50, 5)))       # inline, sparse
    (dv1,) = build_dv_file(root, [list(range(10, 20))])  # file, one run
    build_delta_table(
        spark, root, schema, ["band"],
        [{"attach_dvs": [(paths["0"], dv0), (paths["1"], dv1)]}],
        start_version=1,
    )
    got = delta_read(spark, root)
    surv = sorted(r["k"] for r in got.collect())
    assert surv == sorted(
        set(range(100)) - set(range(0, 50, 5)) - set(range(60, 70))
    )
    # partition values still reconstruct after the DV anti-join
    assert got.groupBy("band").count().count() == 2
    # time travel to the pre-delete version sees every row
    assert delta_read(spark, root, version=0).count() == 100
    # a checkpoint carrying the DV descriptors replays identically
    build_delta_table(
        spark, root, schema, ["band"],
        [{"adds": []}], start_version=2, checkpoint_at=2,
    )
    assert delta_read(spark, root).count() == 80


def test_iceberg_position_deletes_end_to_end(spark, tmp_path):
    from pyspark.sql import functions as F

    from aroa_etl_spark.sources.iceberg_meta import (
        build_iceberg_table,
        iceberg_read,
        iceberg_snapshot,
    )

    root = str(tmp_path / "ib")
    rows = spark.range(100).select(F.col("id").alias("k"))
    b0 = rows.filter("k < 50").orderBy("k").withColumn("band", F.lit(0))
    b1 = rows.filter("k >= 50").orderBy("k").withColumn("band", F.lit(1))
    sids = build_iceberg_table(
        spark, root,
        [("k", "long"), ("band", "int")], [("band", "int")],
        [
            [{"adds": [({"band": 0}, b0), ({"band": 1}, b1)]}],
            [{"pos_deletes": [({"band": 0}, list(range(0, 50, 5))),
                              ({"band": 1}, list(range(10, 20)))]}],
        ],
    )
    snap = iceberg_snapshot(root)
    assert len(snap["position_delete_files"]) == 1
    surv = sorted(r["k"] for r in iceberg_read(spark, root).collect())
    assert surv == sorted(
        set(range(100)) - set(range(0, 50, 5)) - set(range(60, 70))
    )
    # time travel: the first snapshot predates the deletes
    assert iceberg_read(spark, root, snapshot_id=sids[0]).count() == 100
    # partition pruning composes with the delete anti-join
    assert iceberg_read(spark, root, prune={"band": (1, None)}).count() == 40


def test_delta_column_mapping_name_mode(spark, tmp_path):
    """Round 12: name-mode columnMapping — physical names at every
    nesting level, partitionValues/stats under physical keys, logical
    prune keys, and DV composition; id-mode still refuses by name."""
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    from aroa_etl_spark.sources.delta_log import (
        build_delta_table,
        delta_read,
        delta_snapshot,
    )

    root = str(tmp_path / "cm")
    schema = T.StructType([
        T.StructField("k", T.LongType()),
        T.StructField("meta", T.StructType([
            T.StructField("src", T.StringType()),
        ])),
        T.StructField("band", T.IntegerType()),
    ])
    rows = spark.range(20).select(
        F.col("id").alias("k"),
        F.struct(F.concat(F.lit("s"), F.col("id")).alias("src"))
        .alias("meta"),
    )
    b0 = rows.filter("k < 10").orderBy("k")
    b1 = rows.filter("k >= 10").orderBy("k")
    build_delta_table(
        spark, root, schema, ["band"],
        [{"adds": [({"band": 0}, b0), ({"band": 1}, b1)]}],
        column_mapping=True, stats_cols=["k"],
    )
    got = delta_read(spark, root)
    assert set(got.columns) == {"k", "meta", "band"}
    assert got.count() == 20 and got.filter("band = 1").count() == 10
    assert got.orderBy("k").selectExpr("meta.src").first()[0] == "s0"
    # prune by LOGICAL name hits the physical stats keys
    pr = delta_read(spark, root, prune={"k": (15, None)})
    assert len(pr.inputFiles()) == 1
    # deletion vectors compose with the mapping
    snap = delta_snapshot(root)
    p0 = [p for p, i in snap["files"].items()
          if i["partitionValues"].get("col-02-band") == "0"][0]
    build_delta_table(
        spark, root, schema, ["band"],
        [{"attach_dvs": [(p0, encode_inline_dv([0, 1, 2]))]}],
        start_version=1, column_mapping=True,
    )
    assert delta_read(spark, root).count() == 17
    # id-mode refuses at the metadata gate
    import json
    import os

    meta = json.loads(open(
        os.path.join(root, "_delta_log", f"{0:020d}.json")
    ).readline().strip())
    # rewrite commit 0 with an id-mode config
    lines = open(
        os.path.join(root, "_delta_log", f"{0:020d}.json")
    ).read().splitlines()
    out = []
    for ln in lines:
        act = json.loads(ln)
        if "metaData" in act:
            act["metaData"]["configuration"][
                "delta.columnMapping.mode"] = "id"
        out.append(json.dumps(act))
    with open(os.path.join(root, "_delta_log", f"{0:020d}.json"), "w") as f:
        f.write("\n".join(out) + "\n")
    with pytest.raises(NotImplementedError, match="columnMapping"):
        delta_read(spark, root, version=0)


def test_iceberg_equality_deletes_sequence_scoping(spark, tmp_path):
    """Round 12: equality deletes match null-safely on the
    equality_ids columns and apply ONLY to strictly-older sequences —
    a row re-inserted in the delete's own sequence survives (the
    Flink-upsert contract)."""
    from pyspark.sql import functions as F

    from aroa_etl_spark.sources.iceberg_meta import (
        build_iceberg_table,
        iceberg_read,
        iceberg_snapshot,
    )

    root = str(tmp_path / "eq")
    rows = spark.range(100).select(
        F.col("id").alias("k"), (F.col("id") % 10).alias("g")
    )
    b0 = rows.filter("k < 50").orderBy("k").withColumn("band", F.lit(0))
    b1 = rows.filter("k >= 50").orderBy("k").withColumn("band", F.lit(1))
    late = spark.createDataFrame(
        [(7, 7, 0), (200, 3, 0)], "k long, g long, band int"
    )
    sids = build_iceberg_table(
        spark, root,
        [("k", "long"), ("g", "long"), ("band", "int")], [("band", "int")],
        [
            [{"adds": [({"band": 0}, b0), ({"band": 1}, b1)]}],   # seq 1
            # seq 2: delete g in (3, 7) AND re-add g=7/g=3 rows in the
            # same sequence — the re-adds must survive (strict <)
            [{"eq_deletes": (["g"], [(3,), (7,)])},
             {"adds": [({"band": 0}, late)]}],
            # seq 3: position deletes compose on top
            [{"pos_deletes": [({"band": 1}, list(range(5)))]}],
        ],
    )
    snap = iceberg_snapshot(root)
    assert len(snap["equality_delete_files"]) == 1
    assert snap["equality_delete_files"][0]["seq"] == 2
    surv = sorted(r["k"] for r in iceberg_read(spark, root).collect())
    base = [k for k in range(100) if k % 10 not in (3, 7)]
    assert surv == sorted((set(base) - set(range(50, 55))) | {7, 200})
    # time travel before any delete sees everything
    assert iceberg_read(spark, root, snapshot_id=sids[0]).count() == 100
