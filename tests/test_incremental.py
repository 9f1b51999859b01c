"""Unit tests for operators/incremental.py."""

from __future__ import annotations

import pytest

from aroa_etl_spark.operators.incremental import snapshot_diff, upsert


def test_upsert_semantics(spark):
    cur = spark.createDataFrame([(1, "a"), (2, "b"), (3, "c")], "k int, v string")
    upd = spark.createDataFrame([(2, "B"), (4, "d")], "k int, v string")
    got = {(r["k"], r["v"]) for r in upsert(cur, upd, "k").collect()}
    assert got == {(1, "a"), (2, "B"), (3, "c"), (4, "d")}


def test_upsert_rejects_schema_mismatch(spark):
    cur = spark.createDataFrame([(1, "a")], "k int, v string")
    upd = spark.createDataFrame([(1, "a", 2)], "k int, v string, extra int")
    with pytest.raises(ValueError):
        upsert(cur, upd, "k")


def test_snapshot_diff_all_change_types(spark):
    old = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c"), (4, None)], "k int, v string"
    )
    new = spark.createDataFrame(
        [(1, "a"), (2, "B"), (5, "e"), (4, "")], "k int, v string"
    )
    got = {(r["k"], r["change_type"]) for r in snapshot_diff(old, new, "k").collect()}
    # k=4: NULL vs '' must count as changed (null-tagged hashing)
    assert got == {(2, "changed"), (3, "removed"), (5, "added"), (4, "changed")}


def test_snapshot_diff_explicit_compare_cols(spark):
    old = spark.createDataFrame([(1, "a", 10)], "k int, v string, w int")
    new = spark.createDataFrame([(1, "a", 99)], "k int, v string, w int")
    # w excluded from comparison → no diff rows at all
    assert snapshot_diff(old, new, "k", compare_cols=["v"]).count() == 0


def test_refresh_aggregate_equals_full_recompute(spark):
    from pyspark.sql import functions as F

    from aroa_etl_spark.operators.incremental import refresh_aggregate

    fact = spark.createDataFrame(
        [("a", 1.0), ("a", 2.0), ("b", 5.0), ("c", 7.0), ("a", 3.0), ("d", 1.5)],
        "k string, v double",
    ).select("k", F.col("v").cast("decimal(18,2)").alias("v"))
    # deterministic split via an explicit predicate (limit() order is
    # not stable)
    base = (
        fact.filter(F.col("v") <= 5.0)
        .groupBy("k")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"), F.sum("v").alias("sum_v"))
    )
    delta = fact.filter(F.col("v") > 5.0)
    refreshed = refresh_aggregate(base, delta, "k", count_col="n", sum_cols=["v"])
    full = fact.groupBy("k").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"), F.sum("v").alias("sum_v")
    )
    assert sorted(map(tuple, refreshed.collect())) == sorted(map(tuple, full.collect()))


def test_refresh_aggregate_new_and_untouched_keys(spark):
    from pyspark.sql import functions as F

    from aroa_etl_spark.operators.incremental import refresh_aggregate

    base = spark.createDataFrame([("a", 2, 10.0)], "k string, n bigint, sum_v double")
    delta = spark.createDataFrame([("b", 4.0), ("b", 6.0)], "k string, v double")
    out = {r.k: (r.n, r.sum_v) for r in
           refresh_aggregate(base, delta, "k", sum_cols=["v"]).collect()}
    assert out["a"] == (2, 10.0)   # untouched key survives
    assert out["b"] == (2, 10.0)   # new key appears from the delta alone


def test_cdc_apply_semantics(spark):
    from aroa_etl_spark.operators.incremental import cdc_apply

    base = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], "k long, v string"
    )
    changes = spark.createDataFrame(
        [
            (2, 1, "U", "b2"),
            (2, 2, "U", "b3"),   # later seq wins
            (3, 1, "D", None),   # delete
            (9, 1, "I", "new"),  # insert of unseen key
        ],
        "k long, seq long, op string, v string",
    )
    out = {r.k: r.v for r in cdc_apply(base, changes, "k").collect()}
    assert out == {1: "a", 2: "b3", 9: "new"}


def test_cdc_apply_delete_then_reinsert_order(spark):
    from aroa_etl_spark.operators.incremental import cdc_apply

    base = spark.createDataFrame([(1, "a")], "k long, v string")
    changes = spark.createDataFrame(
        [(1, 1, "D", None), (1, 2, "I", "back")],
        "k long, seq long, op string, v string",
    )
    out = {r.k: r.v for r in cdc_apply(base, changes, "k").collect()}
    assert out == {1: "back"}
    # reversed order: the delete is final
    changes2 = spark.createDataFrame(
        [(1, 2, "D", None), (1, 1, "I", "back")],
        "k long, seq long, op string, v string",
    )
    assert cdc_apply(base, changes2, "k").collect() == []


def test_cdc_apply_guards(spark):
    import pytest as _pytest

    from aroa_etl_spark.operators.incremental import cdc_apply

    base = spark.createDataFrame([(1, "a")], "k long, v string")
    tied = spark.createDataFrame(
        [(1, 5, "U", "x"), (1, 5, "U", "y")],
        "k long, seq long, op string, v string",
    )
    with _pytest.raises(Exception, match="tiebreak"):
        cdc_apply(base, tied, "k").collect()
    # a tiebreak column resolves the tie deterministically
    from pyspark.sql import functions as F

    tied2 = tied.withColumn("tb", F.col("v"))
    out = cdc_apply(base, tied2, "k", tiebreak_col="tb").collect()
    assert [r.v for r in out] == ["y"]
    # round-10 advisor: a RESIDUAL tie on (seq, tiebreak) must raise just
    # as loudly as a seq tie — the winner would be partition-dependent
    tied3 = tied.withColumn("tb", F.lit("same"))
    with _pytest.raises(Exception, match="ambiguous"):
        cdc_apply(base, tied3, "k", tiebreak_col="tb").collect()
    bad_op = spark.createDataFrame(
        [(1, 1, "X", "x")], "k long, seq long, op string, v string"
    )
    with _pytest.raises(Exception, match="unknown op"):
        cdc_apply(base, bad_op, "k").collect()


def test_cdc_apply_bad_op_on_non_latest_row_raises(spark):
    import pytest as _pytest

    from aroa_etl_spark.operators.incremental import cdc_apply

    base = spark.createDataFrame([(1, "a")], "k long, v string")
    # the typo'd op is NOT the winner — it must still raise
    changes = spark.createDataFrame(
        [(1, 1, "u", "x"), (1, 2, "U", "y")],
        "k long, seq long, op string, v string",
    )
    with _pytest.raises(Exception, match="unknown op"):
        cdc_apply(base, changes, "k").collect()
