"""KMV distinct and count-min sketch operator tests."""

import pytest
from pyspark.sql import functions as F

from aroa_etl_spark.operators.sketches import cms_build, cms_estimate, kmv_distinct


@pytest.fixture(scope="module")
def ids(spark):
    return spark.range(0, 5000).select((F.col("id") % 1200).alias("k"))


def test_kmv_exact_regime_below_k(spark):
    df = spark.range(0, 100).select(F.col("id").alias("k"))
    row = kmv_distinct(df, "k", k=256).collect()[0]
    assert row.kmv_k == 100
    assert row.kmv_estimate == 100.0


def test_kmv_estimate_regime_accuracy(ids):
    row = kmv_distinct(ids, "k", k=256).collect()[0]
    assert row.kmv_k == 256
    # 1/sqrt(256) ~ 6% expected; allow 4 sigma
    assert abs(row.kmv_estimate - 1200) / 1200 < 0.25


def test_kmv_ignores_nulls(spark):
    df = spark.createDataFrame([(1,), (2,), (None,), (2,)], "k int")
    row = kmv_distinct(df, "k", k=16).collect()[0]
    assert row.kmv_k == 2 and row.kmv_estimate == 2.0


def test_kmv_merge_invariance(spark, ids):
    """KMV over a union equals KMV computed on the union directly —
    the sketch is order/partition insensitive (deterministic hashes)."""
    a = ids.filter(F.col("k") < 600)
    b = ids.filter(F.col("k") >= 300)
    whole = a.unionByName(b)
    r1 = kmv_distinct(whole, "k", k=64).collect()[0]
    r2 = kmv_distinct(whole.repartition(13), "k", k=64).collect()[0]
    assert r1 == r2


def test_cms_upper_bound_and_bounded_size(spark):
    df = spark.createDataFrame(
        [("a",)] * 50 + [("b",)] * 7 + [("c",)] * 1, "k string"
    )
    cms = cms_build(df, "k", depth=4, width=64)
    assert cms.count() <= 4 * 64
    probes = spark.createDataFrame([("a",), ("b",), ("c",), ("zzz",)], "k string")
    est = {r.k: r.cms_count for r in cms_estimate(cms, probes, "k", 4, 64).collect()}
    assert est["a"] >= 50 and est["b"] >= 7 and est["c"] >= 1
    # total mass bound: overestimate error <= 2N/w per row with high prob;
    # the never-inserted key still gets a finite (possibly 0) estimate
    assert est["zzz"] >= 0
    assert est["a"] <= 58 + 2  # N=58, generous slack


def test_cms_mergeable(spark):
    half1 = spark.createDataFrame([("a",)] * 10 + [("b",)] * 3, "k string")
    half2 = spark.createDataFrame([("a",)] * 5, "k string")
    merged = (
        cms_build(half1, "k", 4, 64)
        .unionByName(cms_build(half2, "k", 4, 64))
        .groupBy("row", "bucket")
        .agg(F.sum("cnt").cast("bigint").alias("cnt"))
    )
    whole = cms_build(half1.unionByName(half2), "k", 4, 64)
    assert sorted(map(tuple, merged.collect())) == sorted(map(tuple, whole.collect()))
