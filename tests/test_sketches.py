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


def test_kmv_set_estimates_exact_regime(spark):
    from aroa_etl_spark.operators.sketches import kmv_set_estimates
    from pyspark.sql import functions as F

    a = spark.range(0, 100).select(F.col("id").alias("k"))       # {0..99}
    b = spark.range(50, 180).select(F.col("id").alias("k"))      # {50..179}
    row = kmv_set_estimates(a, "k", b, "k", k=1024).collect()[0]
    # fewer than k distinct hashes -> all three estimates exact
    assert row.union_est == 180.0
    assert row.intersect_est == 50.0
    assert abs(row.jaccard_est - 50 / 180) < 1e-12


def test_kmv_set_estimates_estimate_regime(spark):
    from aroa_etl_spark.operators.sketches import kmv_set_estimates
    from pyspark.sql import functions as F

    a = spark.range(0, 3000).select(F.col("id").alias("k"))
    b = spark.range(1500, 4500).select(F.col("id").alias("k"))
    row = kmv_set_estimates(a, "k", b, "k", k=256).collect()[0]
    assert abs(row.union_est - 4500) / 4500 < 0.25
    assert abs(row.intersect_est - 1500) / 1500 < 0.4
    assert 0.15 < row.jaccard_est < 0.55  # true 1/3


def test_streaming_cms_equals_batch(spark, tmp_path):
    import os
    from pyspark.sql import functions as F

    from aroa_etl_spark.operators.sketches import cms_build
    from aroa_etl_spark.streaming.pipeline import run_to_memory, streaming_cms_counts

    src = os.path.join(str(tmp_path), "src")
    df = spark.range(0, 500).select((F.col("id") % 37).alias("user_id"))
    df.write.parquet(src)
    stream = spark.readStream.schema(df.schema).parquet(src)
    cms_stream = streaming_cms_counts(stream, "user_id", depth=4, width=64)
    before = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    try:
        run_to_memory(cms_stream, "t_cms_stream_sink", output_mode="complete")
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", before)
    got = sorted(map(tuple, spark.table("t_cms_stream_sink").collect()))
    want = sorted(map(tuple, cms_build(df, "user_id", depth=4, width=64).collect()))
    assert got == want


def test_bloom_no_false_negatives(spark):
    from aroa_etl_spark.operators.sketches import bloom_build, bloom_probe

    keys = spark.range(200).select((F.col("id") * 3).alias("k"))
    bloom = bloom_build(keys, "k", m=1024, k=3)
    probed = bloom_probe(keys, "k", bloom, m=1024, k=3)
    assert probed.filter(F.col("bloom_hit") == 0).count() == 0


def test_bloom_rejects_most_non_members(spark):
    from aroa_etl_spark.operators.sketches import bloom_build, bloom_probe

    members = spark.range(100).select(F.col("id").alias("k"))
    others = spark.range(1000, 2000).select(F.col("id").alias("k"))
    bloom = bloom_build(members, "k", m=4096, k=3)
    hits = (
        bloom_probe(others, "k", bloom, m=4096, k=3)
        .agg(F.sum("bloom_hit")).first()[0]
    )
    # 100 keys * 3 hashes in 4096 bits -> fp rate well under 5%
    assert hits < 50


def test_bloom_merge_is_array_union(spark):
    from aroa_etl_spark.operators.sketches import bloom_build

    a = spark.range(50).select(F.col("id").alias("k"))
    b = spark.range(50, 100).select(F.col("id").alias("k"))
    both = spark.range(100).select(F.col("id").alias("k"))
    bits_a = bloom_build(a, "k", m=512, k=3).first().bits
    bits_b = bloom_build(b, "k", m=512, k=3).first().bits
    bits_ab = bloom_build(both, "k", m=512, k=3).first().bits
    assert sorted(set(bits_a) | set(bits_b)) == list(bits_ab)


def test_bloom_build_validates_params(spark):
    import pytest as _pytest

    from aroa_etl_spark.operators.sketches import bloom_build

    df = spark.range(5).select(F.col("id").alias("k"))
    with _pytest.raises(ValueError, match="m >= 8"):
        bloom_build(df, "k", m=4, k=3)


def test_bloom_probe_tolerates_caller_bits_column(spark):
    from aroa_etl_spark.operators.sketches import bloom_build, bloom_probe

    members = spark.range(20).select(F.col("id").alias("k"))
    bloom = bloom_build(members, "k", m=256, k=2)
    probe = spark.range(5).select(
        F.col("id").alias("k"), F.array(F.lit(1)).alias("bits")
    )
    out = bloom_probe(probe, "k", bloom, m=256, k=2)
    assert set(out.columns) == {"k", "bits", "bloom_hit"}
    rows = out.collect()
    assert all(r.bloom_hit == 1 for r in rows)
    assert all(list(r.bits) == [1] for r in rows)  # caller column intact
