"""Round 13 (optimization): equality-delete files sharing an
equality_ids signature apply through ONE anti-join per signature, not
one per file — same survivors, plan size O(#signatures).

A Flink upsert stream emits one equality-delete file per checkpoint;
hundreds of checkpoints must not become hundreds of chained joins
(r12 verdict finding #4)."""

from __future__ import annotations

from pyspark.sql import functions as F

from aroa_etl_spark.sources.iceberg_meta import (
    build_iceberg_table,
    iceberg_read,
    iceberg_snapshot,
)


def _survivor_ks(spark, root):
    return sorted(r["k"] for r in iceberg_read(spark, root).collect())


def test_same_signature_files_one_join_per_signature(spark, tmp_path):
    root = str(tmp_path / "eqgrp")
    rows = spark.range(100).select(
        F.col("id").alias("k"), (F.col("id") % 10).alias("g")
    ).withColumn("band", F.lit(0))
    late = spark.createDataFrame([(107, 7, 0)], "k long, g long, band int")
    build_iceberg_table(
        spark, root,
        [("k", "long"), ("g", "long"), ("band", "int")], [("band", "int")],
        [
            [{"adds": [({"band": 0}, rows)]}],                       # seq 1
            # three same-signature (g) delete files at seqs 2, 3, 4 —
            # plus a re-add at seq 3 that the seq-4 delete must kill
            # and the seq-2/3 deletes must NOT (per-row __del_seq)
            [{"eq_deletes": (["g"], [(3,)])}],                       # seq 2
            [{"eq_deletes": (["g"], [(5,)])},
             {"adds": [({"band": 0}, late)]}],                       # seq 3
            [{"eq_deletes": (["g"], [(7,)])}],                       # seq 4
            # one DIFFERENT signature (k): second join, second group
            [{"eq_deletes": (["k"], [(42,)])}],                      # seq 5
        ],
    )
    snap = iceberg_snapshot(root)
    assert len(snap["equality_delete_files"]) == 4
    sigs = {tuple(d["equality_ids"]) for d in snap["equality_delete_files"]}
    assert len(sigs) == 2

    # survivors: g in (3,5,7) gone from the base, k=42 gone, and the
    # seq-3 re-add of g=7 (k=107) killed by the STRICTLY NEWER seq-4
    # delete — per-row sequence scoping across a merged signature scan
    expect = sorted(
        k for k in range(100) if k % 10 not in (3, 5, 7) and k != 42
    )
    assert _survivor_ks(spark, root) == expect

    # plan shape: exactly one LeftAnti join per signature group (2),
    # plus the position/sequence machinery's joins — count LeftAnti
    # joins carrying __eq_ columns
    plan = iceberg_read(spark, root)._jdf.queryExecution().optimizedPlan().toString()
    n_eq_joins = sum(
        1 for line in plan.splitlines()
        if "LeftAnti" in line and "__eq_" in line
    )
    assert n_eq_joins == 2, plan


def test_same_sequence_readd_survives_grouped(spark, tmp_path):
    """The Flink same-sequence-survivor rule holds through the grouped
    path: a row re-inserted in the delete's OWN sequence survives."""
    root = str(tmp_path / "eqsame")
    rows = spark.range(20).select(
        F.col("id").alias("k"), (F.col("id") % 5).alias("g")
    ).withColumn("band", F.lit(0))
    readd = spark.createDataFrame([(103, 3, 0)], "k long, g long, band int")
    build_iceberg_table(
        spark, root,
        [("k", "long"), ("g", "long"), ("band", "int")], [("band", "int")],
        [
            [{"adds": [({"band": 0}, rows)]}],                       # seq 1
            # two same-signature files in the history; the seq-2 delete
            # of g=3 arrives WITH a re-add of g=3 in the same sequence
            [{"eq_deletes": (["g"], [(3,)])},
             {"adds": [({"band": 0}, readd)]}],                      # seq 2
            [{"eq_deletes": (["g"], [(4,)])}],                       # seq 3
        ],
    )
    expect = sorted(
        [k for k in range(20) if k % 5 not in (3, 4)] + [103]
    )
    assert _survivor_ks(spark, root) == expect


def test_malformed_delete_file_still_raises(spark, tmp_path):
    """Per-file strictness survives the merged scan: a delete file
    lacking an equality column raises instead of null-matching."""
    import os

    import pytest

    root = str(tmp_path / "eqbad")
    rows = spark.range(10).select(
        F.col("id").alias("k"), (F.col("id") % 5).alias("g")
    ).withColumn("band", F.lit(0))
    build_iceberg_table(
        spark, root,
        [("k", "long"), ("g", "long"), ("band", "int")], [("band", "int")],
        [
            [{"adds": [({"band": 0}, rows)]}],
            [{"eq_deletes": (["g"], [(3,)])}],
        ],
    )
    snap = iceberg_snapshot(root)
    # overwrite the delete parquet with one that lacks the g column
    rel = snap["equality_delete_files"][0]["path"]
    path = rel if os.path.isabs(rel) else os.path.join(root, rel)
    if path.startswith("file:"):
        path = path[len("file:"):]
    import pyarrow as pa
    import pyarrow.parquet as pq

    pq.write_table(pa.table({"other": [1]}), path)
    with pytest.raises(ValueError, match="lacks"):
        iceberg_read(spark, root).collect()
