"""Bloom pruning, interval-overlap join, and weighted sampling tests."""

import pytest
from pyspark.sql import functions as F

from aroa_etl_spark.operators.bloom import bloom_build, bloom_prune
from aroa_etl_spark.operators.sampling import weighted_sample_topk
from aroa_etl_spark.operators.temporal import interval_overlap_join


def test_bloom_no_false_negatives(spark):
    build = spark.range(0, 200).select(F.col("id").alias("k"))
    probe = spark.range(0, 1000).select(F.col("id").alias("k"))
    bloom = bloom_build(build, "k", m_bits=1 << 12, d=4)
    passed = {r.k for r in bloom_prune(probe, "k", bloom, m_bits=1 << 12, d=4).collect()}
    assert set(range(200)) <= passed  # every true member passes


def test_bloom_false_positive_rate_reasonable(spark):
    build = spark.range(0, 200).select(F.col("id").alias("k"))
    probe = spark.range(200, 5200).select(F.col("id").alias("k"))  # all non-members
    bloom = bloom_build(build, "k", m_bits=1 << 14, d=4)
    n_fp = bloom_prune(probe, "k", bloom, m_bits=1 << 14, d=4).count()
    # theoretical fp ~ (1 - e^{-dn/m})^4 ≈ 2e-5 at n=200,m=16384; allow slack
    assert n_fp < 50


def test_bloom_deterministic(spark):
    build = spark.range(0, 100).select(F.col("id").alias("k"))
    w1 = bloom_build(build, "k", m_bits=1 << 10, d=4).collect()[0].words
    w2 = bloom_build(build.repartition(7), "k", m_bits=1 << 10, d=4).collect()[0].words
    assert w1 == w2
    assert len(w1) == (1 << 10) // 32
    # words stay in unsigned-32 range: the sign bit is never touched
    assert all(0 <= w < (1 << 32) for w in w1)


def test_interval_overlap_pairs_exactly_once(spark):
    a = spark.createDataFrame(
        [(1, 0, 100), (2, 1000, 1100), (3, 50, 60)],
        "a_id bigint, a_s bigint, a_e bigint",
    )
    b = spark.createDataFrame(
        [(10, 90, 160), (11, 55, 58), (12, 5000, 5100)],
        "b_id bigint, b_s bigint, b_e bigint",
    )
    out = sorted(
        (r.a_id, r.b_id)
        for r in interval_overlap_join(a, b, "a_s", "a_e", "b_s", "b_e", bucket=30)
        .select("a_id", "b_id")
        .collect()
    )
    # (1,10): [0,100]x[90,160] overlap; (1,11): [0,100]x[55,58];
    # (3,11): [50,60]x[55,58]; (3,10): [50,60]x[90,160] NO; (2,*) NO
    assert out == [(1, 10), (1, 11), (3, 11)]


def test_interval_overlap_bucket_width_invariance(spark):
    import random

    rng = random.Random(3)
    a = spark.createDataFrame(
        [(i, s := rng.randrange(1000), s + rng.randrange(1, 120)) for i in range(60)],
        "a_id bigint, a_s bigint, a_e bigint",
    )
    b = spark.createDataFrame(
        [(i, s := rng.randrange(1000), s + rng.randrange(1, 120)) for i in range(60)],
        "b_id bigint, b_s bigint, b_e bigint",
    )
    res = {}
    for w in (7, 64, 500):
        res[w] = sorted(
            (r.a_id, r.b_id)
            for r in interval_overlap_join(a, b, "a_s", "a_e", "b_s", "b_e", bucket=w)
            .select("a_id", "b_id")
            .collect()
        )
    assert res[7] == res[64] == res[500]


def test_interval_overlap_keyed(spark):
    a = spark.createDataFrame(
        [(1, "u", 0, 10), (2, "v", 0, 10)], "a_id bigint, k string, a_s bigint, a_e bigint"
    )
    b = spark.createDataFrame(
        [(10, "u", 5, 15)], "b_id bigint, k string, b_s bigint, b_e bigint"
    )
    out = interval_overlap_join(a, b, "a_s", "a_e", "b_s", "b_e", by="k", bucket=8)
    assert [(r.a_id, r.b_id) for r in out.select("a_id", "b_id").collect()] == [(1, 10)]


def test_weighted_sample_deterministic_and_biased(spark):
    df = spark.range(0, 2000).select(
        F.col("id").alias("k"),
        F.when(F.col("id") < 100, 1000.0).otherwise(1.0).alias("w"),
    )
    s1 = [r.k for r in weighted_sample_topk(df, "k", "w", 50).collect()]
    s2 = [r.k for r in weighted_sample_topk(df.repartition(13), "k", "w", 50).collect()]
    assert sorted(s1) == sorted(s2)  # partitioning-invariant
    heavy = sum(1 for k in s1 if k < 100)
    # 100 keys hold ~98% of total weight -> the sample should be dominated
    # by them (hypergeometric-ish; bound loosely)
    assert heavy > 30


def test_weighted_sample_excludes_nonpositive(spark):
    df = spark.createDataFrame(
        [(1, 5.0), (2, 0.0), (3, -1.0), (4, None)], "k bigint, w double"
    )
    out = [r.k for r in weighted_sample_topk(df, "k", "w", 10).collect()]
    assert out == [1]


def test_interval_overlap_symmetric(spark):
    import random

    rng = random.Random(21)
    rows_a = [(i, s := rng.randrange(500), s + rng.randrange(1, 60)) for i in range(40)]
    rows_b = [(i, s := rng.randrange(500), s + rng.randrange(1, 60)) for i in range(40)]
    a = spark.createDataFrame(rows_a, "a_id bigint, a_s bigint, a_e bigint")
    b = spark.createDataFrame(rows_b, "b_id bigint, b_s bigint, b_e bigint")
    ab = sorted(
        (r.a_id, r.b_id)
        for r in interval_overlap_join(a, b, "a_s", "a_e", "b_s", "b_e", bucket=40)
        .select("a_id", "b_id").collect()
    )
    # swap roles: rename to avoid column collisions, same pair set mirrored
    a2 = a.withColumnRenamed("a_id", "b_id").withColumnRenamed("a_s", "b_s").withColumnRenamed("a_e", "b_e")
    b2 = b.withColumnRenamed("b_id", "a_id").withColumnRenamed("b_s", "a_s").withColumnRenamed("b_e", "a_e")
    ba = sorted(
        (r.a_id, r.b_id)
        for r in interval_overlap_join(b2, a2, "a_s", "a_e", "b_s", "b_e", bucket=40)
        .select("b_id", "a_id").collect()
    )
    assert ab == sorted((x, y) for y, x in ba)


def test_equidepth_buckets_exact(spark):
    from aroa_etl_spark.operators.sampling import equidepth_buckets

    df = spark.range(1, 101).select(F.col("id").cast("double").alias("v"))
    out = equidepth_buckets(df, "v", 4)
    counts = {r.bucket: r.n for r in out.groupBy("bucket").agg(F.count("*").alias("n")).collect()}
    assert counts == {1: 25, 2: 25, 3: 25, 4: 25}
    # boundary tie goes low: v=25.75 is the q1 boundary for 1..100
    m = {r.v: r.bucket for r in out.collect()}
    assert m[25.0] == 1 and m[26.0] == 2


def test_equidepth_buckets_approx_path_runs(spark):
    from aroa_etl_spark.operators.sampling import equidepth_buckets

    df = spark.range(0, 1000).select(F.col("id").cast("double").alias("v"))
    out = equidepth_buckets(df, "v", 5, exact=False)
    counts = [r.n for r in out.groupBy("bucket").agg(F.count("*").alias("n")).collect()]
    assert len(counts) == 5 and all(150 < n < 250 for n in counts)


def test_equidepth_no_global_sort_in_plan(spark):
    from aroa_etl_spark.operators.sampling import equidepth_buckets
    from aroa_etl_spark.plans.lint import lint_plan

    df = spark.range(0, 1000).select(F.col("id").cast("double").alias("v"))
    out = equidepth_buckets(df, "v", 4)
    codes = {f.code for f in lint_plan(out, allow_bnlj=True) if f.severity == "warning"}
    assert "global_sort" not in codes
