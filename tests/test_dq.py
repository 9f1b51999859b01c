"""Unit tests for operators/dq.py — violations engineered per check."""

from __future__ import annotations

from aroa_etl_spark.operators import dq


def _report(spark, df, checks):
    return {r["check"]: r["n_violations"] for r in dq.dq_report(df, checks).collect()}


def test_all_check_kinds(spark):
    df = spark.createDataFrame(
        [
            (1, "F", 10.0, "A-1"),
            (2, "O", -5.0, "B-2"),     # range violation
            (2, "X", 3.0, "bad"),      # dup key, bad status, bad pattern
            (None, "P", None, None),   # null key, null price, null pattern
        ],
        "k int, status string, price double, code string",
    )
    ref = spark.createDataFrame([(1,), (2,)], "rk int")
    got = _report(
        spark,
        df,
        [
            dq.not_null("k"),
            dq.accepted_values("status", ["F", "O", "P"]),
            dq.in_range("price", lo=0),
            dq.matches("code", r"^[A-Z]-\d$"),
            dq.unique("k"),
            dq.fk("k", ref, "rk"),
        ],
    )
    assert got == {
        "not_null(k)": 1,
        "accepted_values(status)": 1,
        "in_range(price)": 2,   # negative + null
        "matches(code)": 2,     # 'bad' + null
        "unique(k)": 1,         # one extra copy of k=2
        "fk(k->rk)": 0,         # nulls excluded, 1/2/2 all present
    }


def test_fk_counts_missing_refs(spark):
    df = spark.createDataFrame([(1,), (9,), (9,)], "k int")
    ref = spark.createDataFrame([(1,)], "rk int")
    got = _report(spark, df, [dq.fk("k", ref, "rk")])
    assert got == {"fk(k->rk)": 2}  # every dangling ROW counts


def test_single_pass_for_row_checks(spark):
    """Row-level + unique checks must not rescan per check: exactly one
    aggregate over the input (one Exchange), regardless of check count."""
    df = spark.createDataFrame([(1, "a")], "k int, v string")
    report = dq.dq_report(
        df, [dq.not_null("k"), dq.not_null("v"), dq.unique("k")]
    )
    plan = report._jdf.queryExecution().sparkPlan().toString()
    assert plan.count("Scan ExistingRDD") == 1


def test_zscore_outliers_flags_planted_anomaly(spark):
    from pyspark.sql import functions as F

    from aroa_etl_spark.operators.dq import zscore_outliers

    rows = [("g", float(v)) for v in [10, 11, 9, 10, 12, 10, 9, 11, 10, 11]] + [
        ("g", 1000.0),  # planted anomaly
        ("h", 5.0),     # singleton group: NULL zscore, not an outlier
    ]
    df = spark.createDataFrame(rows, "k string, v double")
    out = zscore_outliers(df, "v", by=["k"], z=3.0).collect()
    flagged = [(r.k, r.v) for r in out if r.is_outlier]
    assert flagged == [("g", 1000.0)]
    singleton = [r for r in out if r.k == "h"][0]
    assert singleton.zscore is None and singleton.is_outlier is False


def test_zscore_outliers_partition_invariant(spark):
    import random

    from aroa_etl_spark.operators.dq import zscore_outliers

    rng = random.Random(3)
    rows = [("g", round(rng.uniform(0, 100), 2)) for _ in range(300)]
    df = spark.createDataFrame(rows, "k string, v double")
    a = sorted(map(tuple, zscore_outliers(df, "v", by=["k"]).collect()))
    b = sorted(map(tuple, zscore_outliers(df.repartition(11), "v", by=["k"]).collect()))
    assert a == b  # exact sufficient statistics -> bit-identical flags


def test_zscore_outliers_constant_group_not_flagged(spark):
    from aroa_etl_spark.operators.dq import zscore_outliers

    # large-magnitude near-constant values: variance rounds to ~0 (or
    # slightly negative under double cancelation) — nothing may flag
    rows = [("g", 123456789.12)] * 50
    df = spark.createDataFrame(rows, "k string, v double")
    out = zscore_outliers(df, "v", by=["k"]).collect()
    assert all(not r.is_outlier for r in out)
    assert all(r.zscore is None for r in out)


def test_zscore_outliers_null_group_key(spark):
    from aroa_etl_spark.operators.dq import zscore_outliers

    rows = [(None, float(v)) for v in [10, 11, 9, 10, 12, 10, 9, 11, 10, 11]] + [
        (None, 1000.0)
    ]
    df = spark.createDataFrame(rows, "k string, v double")
    out = zscore_outliers(df, "v", by=["k"]).collect()
    flagged = [(r.k, r.v) for r in out if r.is_outlier]
    assert flagged == [(None, 1000.0)]  # NULL key is still a group
