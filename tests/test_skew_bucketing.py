"""Scale toolkit: salted joins and bucketed co-located joins."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


def test_salted_join_matches_plain_join(spark):
    from aroa_etl_spark.operators.skew import salted_join

    # skewed large side: key 1 carries 80% of rows
    large = spark.range(1000).select(
        F.when(F.col("id") < 800, 1).otherwise(F.col("id") % 50).alias("k"),
        F.col("id").alias("payload"),
    )
    small = spark.createDataFrame([(i, f"dim{i}") for i in range(50)], ["k", "name"])

    for how in ("inner", "left"):
        plain = large.join(small, "k", how).orderBy("payload")
        salted = salted_join(large, small, "k", salt=8, how=how).orderBy("payload")
        assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))

    with pytest.raises(ValueError):
        salted_join(large, small, "k", how="full")


def test_salted_join_spreads_hot_key(spark):
    from aroa_etl_spark.operators.skew import salted_join, top_keys

    large = spark.range(1000).select(F.lit(1).alias("k"), F.col("id").alias("v"))
    small = spark.createDataFrame([(1, "x")], ["k", "name"])
    hot = top_keys(large, "k", 1).collect()[0]
    assert hot["k"] == 1 and hot["cnt"] == 1000
    out = salted_join(large, small, "k", salt=8)
    # the join key (k, __salt) takes 8 distinct values for the hot key
    salts = large.withColumn(
        "__salt", F.pmod(F.hash(*[F.col(c) for c in large.columns]), F.lit(8))
    ).select("__salt").distinct().count()
    assert salts == 8
    assert out.count() == 1000


def test_bucketed_join_has_no_exchange(spark, tmp_path):
    from aroa_etl_spark.sources.io import write_bucketed

    import shutil

    for t in ("bt_orders", "bt_lineitem"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
        # a previously-failed run can leave orphan warehouse files the
        # metastore no longer knows about
        shutil.rmtree(
            spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
            + f"/{t}",
            ignore_errors=True,
        )
    orders = spark.range(1000).select(F.col("id").alias("okey"), (F.col("id") % 7).alias("flag"))
    items = spark.range(3000).select((F.col("id") % 1000).alias("okey"), F.col("id").alias("line"))
    write_bucketed(orders, "bt_orders", bucket_by=["okey"], num_buckets=8)
    write_bucketed(items, "bt_lineitem", bucket_by=["okey"], num_buckets=8)

    # force the sort-merge path (tiny test tables would broadcast and
    # bypass bucketed scans entirely); at real fact-to-fact scale SMJ is
    # what the planner picks on its own
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        a, b = spark.table("bt_orders"), spark.table("bt_lineitem")
        joined = a.join(b, "okey")
        # both sides bucketed on the join key with equal counts → the
        # sort-merge join reads bucket files directly, zero shuffle
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange hashpartitioning" not in plan, plan
        assert "SortMergeJoin" in plan
        assert joined.count() == 3000
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS bt_orders")
        spark.sql("DROP TABLE IF EXISTS bt_lineitem")
