"""Unit tests for operators/temporal.py: as-of join and range join.

Strategy: small engineered edge cases (ties, tolerance boundary,
forward direction, DST-immune NTZ arithmetic) plus randomized
brute-force differentials — the operator's bucketized/windowed result
must equal the O(n²) definition, and pandas.merge_asof where its
semantics align.
"""

from __future__ import annotations

import random

import pandas as pd
import pytest
from pyspark.sql import functions as F

from aroa_etl_spark.operators.temporal import asof_join, range_join

US = 1_000_000


def _mk(spark, rows, schema):
    return spark.createDataFrame(rows, schema).withColumn(
        "ts", F.timestamp_micros(F.col("us")).cast("timestamp_ntz")
    )


@pytest.fixture(scope="module")
def rand_frames(spark):
    rng = random.Random(42)
    left = [(f"k{rng.randrange(5)}", rng.randrange(0, 3600) * US + rng.randrange(US), i)
            for i in range(120)]
    right = [(f"k{rng.randrange(5)}", rng.randrange(0, 3600) * US + rng.randrange(US), 1000 + i)
             for i in range(150)]
    ldf = _mk(spark, left, "k string, us long, lid long")
    rdf = _mk(spark, right, "k string, us long, rid long")
    return left, right, ldf, rdf


def test_asof_backward_matches_bruteforce(rand_frames):
    left, right, ldf, rdf = rand_frames
    out = {
        r["lid"]: r["rid_right"]
        for r in asof_join(ldf, rdf, on="ts", by=["k"], right_cols=["rid"]).collect()
    }
    for k, us, lid in left:
        cand = [(rus, rid) for rk, rus, rid in right if rk == k and rus <= us]
        # tie on (k, ts): greatest rid wins (documented tiebreak)
        expect = max(cand, key=lambda t: (t[0], t[1]))[1] if cand else None
        assert out[lid] == expect, f"lid={lid}"


def test_asof_forward_matches_bruteforce(rand_frames):
    left, right, ldf, rdf = rand_frames
    out = {
        r["lid"]: r["rid_right"]
        for r in asof_join(
            ldf, rdf, on="ts", by=["k"], right_cols=["rid"], direction="forward"
        ).collect()
    }
    for k, us, lid in left:
        cand = [(rus, rid) for rk, rus, rid in right if rk == k and rus >= us]
        expect = min(cand, key=lambda t: (t[0], -t[1]))[1] if cand else None
        assert out[lid] == expect, f"lid={lid}"


def test_asof_matches_pandas_merge_asof(rand_frames):
    left, right, ldf, rdf = rand_frames
    # pandas semantics: backward inclusive, by-key; right side deduped
    # per (k, us) keeping max rid so the tiebreak cannot differ.
    lp = pd.DataFrame(left, columns=["k", "us", "lid"]).sort_values("us", kind="stable")
    rp = (
        pd.DataFrame(right, columns=["k", "us", "rid"])
        .groupby(["k", "us"], as_index=False)["rid"].max()
        .sort_values("us", kind="stable")
    )
    expect = pd.merge_asof(lp, rp, on="us", by="k", direction="backward")
    expect_map = {int(r.lid): (None if pd.isna(r.rid) else int(r.rid))
                  for r in expect.itertuples()}
    rdf_dedup = rdf.groupBy("k", "ts").agg(F.max("rid").alias("rid"))
    got = {
        r["lid"]: r["rid_right"]
        for r in asof_join(ldf, rdf_dedup, on="ts", by=["k"], right_cols=["rid"]).collect()
    }
    assert got == expect_map


def test_asof_tolerance_boundary(spark):
    ldf = _mk(spark, [("a", 100 * US, 1)], "k string, us long, lid long")
    rdf = _mk(
        spark,
        [("a", 40 * US, 10), ("a", 70 * US, 20)],
        "k string, us long, rid long",
    )
    # 30s tolerance: the 70s view is exactly 30s away — inclusive match.
    out = asof_join(
        ldf, rdf, on="ts", by=["k"], right_cols=["rid"], tolerance_us=30 * US
    ).collect()
    assert out[0]["rid_right"] == 20
    # 29s tolerance: nothing within reach — NULL, not the farther row.
    out = asof_join(
        ldf, rdf, on="ts", by=["k"], right_cols=["rid"], tolerance_us=29 * US
    ).collect()
    assert out[0]["rid_right"] is None and out[0]["ts_right"] is None


def test_asof_equal_time_is_inclusive(spark):
    ldf = _mk(spark, [("a", 50 * US, 1)], "k string, us long, lid long")
    rdf = _mk(spark, [("a", 50 * US, 7)], "k string, us long, rid long")
    assert (
        asof_join(ldf, rdf, on="ts", by=["k"], right_cols=["rid"]).collect()[0]["rid_right"]
        == 7
    )


def test_range_join_matches_bruteforce(rand_frames):
    left, right, ldf, rdf = rand_frames
    lo, hi = 10 * US, 300 * US
    got = sorted(
        (r["l_lid"], r["r_rid"])
        for r in range_join(ldf, rdf, on="ts", by=["k"], lower_us=lo, upper_us=hi).collect()
    )
    expect = sorted(
        (lid, rid)
        for k, us, lid in left
        for rk, rus, rid in right
        if rk == k and lo <= rus - us <= hi
    )
    assert got == expect  # equality also proves the exactly-once guarantee


def test_range_join_negative_bounds(rand_frames):
    # window straddling zero: right rows up to 60s BEFORE through 60s after
    left, right, ldf, rdf = rand_frames
    lo, hi = -60 * US, 60 * US
    got = sorted(
        (r["l_lid"], r["r_rid"])
        for r in range_join(ldf, rdf, on="ts", by=["k"], lower_us=lo, upper_us=hi).collect()
    )
    expect = sorted(
        (lid, rid)
        for k, us, lid in left
        for rk, rus, rid in right
        if rk == k and lo <= rus - us <= hi
    )
    assert got == expect


def test_range_join_rejects_empty_interval(spark):
    df = _mk(spark, [("a", 0, 1)], "k string, us long, lid long")
    with pytest.raises(ValueError):
        range_join(df, df, on="ts", by=["k"], lower_us=5, upper_us=5)


def test_asof_plan_has_single_shuffle(rand_frames):
    """The scale contract: one Exchange (on the by keys), no join at all."""
    _, _, ldf, rdf = rand_frames
    plan = (
        asof_join(ldf, rdf, on="ts", by=["k"], right_cols=["rid"])
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert plan.count("Exchange hashpartitioning") == 1
    assert "Join" not in plan


def test_range_join_plan_is_hash_join_no_cartesian(rand_frames):
    _, _, ldf, rdf = rand_frames
    df = range_join(ldf, rdf, on="ts", by=["k"], lower_us=0, upper_us=60 * US)
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan and "BroadcastNestedLoop" not in plan


def test_asof_nearest_matches_pandas(rand_frames):
    left, right, ldf, rdf = rand_frames
    lp = pd.DataFrame(left, columns=["k", "us", "lid"]).sort_values("us", kind="stable")
    rp = (
        pd.DataFrame(right, columns=["k", "us", "rid"])
        .groupby(["k", "us"], as_index=False)["rid"].max()
        .sort_values("us", kind="stable")
    )
    expect = pd.merge_asof(lp, rp, on="us", by="k", direction="nearest")
    expect_map = {int(r.lid): (None if pd.isna(r.rid) else int(r.rid))
                  for r in expect.itertuples()}
    rdf_dedup = rdf.groupBy("k", "ts").agg(F.max("rid").alias("rid"))
    got = {
        r["lid"]: r["rid_right"]
        for r in asof_join(
            ldf, rdf_dedup, on="ts", by=["k"], right_cols=["rid"], direction="nearest"
        ).collect()
    }
    assert got == expect_map


def test_asof_nearest_with_tolerance(spark):
    ldf = _mk(spark, [("a", 100 * US, 1)], "k string, us long, lid long")
    rdf = _mk(
        spark, [("a", 60 * US, 10), ("a", 130 * US, 20)], "k string, us long, rid long"
    )
    # forward row is closer (30s vs 40s)
    out = asof_join(
        ldf, rdf, on="ts", by=["k"], right_cols=["rid"], direction="nearest"
    ).collect()
    assert out[0]["rid_right"] == 20
    # tolerance 25s: neither side within reach -> NULL
    out = asof_join(
        ldf, rdf, on="ts", by=["k"], right_cols=["rid"], direction="nearest",
        tolerance_us=25 * US,
    ).collect()
    assert out[0]["rid_right"] is None


def test_asof_nearest_single_exchange(rand_frames):
    _, _, ldf, rdf = rand_frames
    plan = (
        asof_join(ldf, rdf, on="ts", by=["k"], right_cols=["rid"], direction="nearest")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert plan.count("Exchange hashpartitioning") == 1  # two sorts, one shuffle
