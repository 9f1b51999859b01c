"""Exact regression aggregates and grid radius join tests."""

import math
import random

import pytest
from pyspark.sql import functions as F

from aroa_etl_spark.operators.geo import grid_radius_join
from aroa_etl_spark.operators.stats import exact_linear_stats


def test_exact_linear_stats_known_line(spark):
    # y = 2x + 3 exactly -> corr 1, slope 2, intercept 3
    rows = [(float(x), 2.0 * x + 3.0) for x in range(1, 50)]
    df = spark.createDataFrame(rows, "x double, y double")
    r = exact_linear_stats(df, "x", "y").collect()[0]
    assert r.n == 49
    assert r.corr == 1.0
    assert r.slope == 2.0
    assert r.intercept == 3.0


def test_exact_linear_stats_matches_numpy(spark):
    rng = random.Random(11)
    rows = [
        (round(rng.uniform(0, 100), 2), round(rng.uniform(0, 1000), 2))
        for _ in range(500)
    ]
    df = spark.createDataFrame(rows, "x double, y double")
    r = exact_linear_stats(df, "x", "y").collect()[0]
    xs = [a for a, _ in rows]
    ys = [b for _, b in rows]
    n = len(rows)
    sx, sy = sum(xs), sum(ys)
    sxy = sum(a * b for a, b in rows)
    sxx = sum(a * a for a in xs)
    syy = sum(b * b for b in ys)
    corr = (n * sxy - sx * sy) / math.sqrt((n * sxx - sx * sx) * (n * syy - sy * sy))
    assert abs(r.corr - corr) < 1e-6
    slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    assert abs(r.slope - slope) < 1e-6


def test_exact_linear_stats_partition_invariant(spark):
    rng = random.Random(5)
    rows = [
        (round(rng.uniform(0, 9), 2), round(rng.uniform(0, 9), 2)) for _ in range(300)
    ]
    df = spark.createDataFrame(rows, "x double, y double")
    r1 = exact_linear_stats(df, "x", "y").collect()[0]
    r2 = exact_linear_stats(df.repartition(13), "x", "y").collect()[0]
    assert tuple(r1) == tuple(r2)  # bit-identical, not merely close


def test_exact_linear_stats_drops_null_pairs(spark):
    df = spark.createDataFrame(
        [(1.0, 2.0), (2.0, None), (None, 3.0), (3.0, 6.0)], "x double, y double"
    )
    r = exact_linear_stats(df, "x", "y").collect()[0]
    assert r.n == 2 and r.slope == 2.0


def _brute(pts_a, pts_b, r):
    out = []
    for i, (ax, ay) in pts_a:
        for j, (bx, by) in pts_b:
            if (ax - bx) ** 2 + (ay - by) ** 2 <= r * r:
                out.append((i, j))
    return sorted(out)


def test_grid_radius_join_matches_brute_force(spark):
    rng = random.Random(9)
    pa = [(i, (rng.randrange(0, 2000), rng.randrange(0, 2000))) for i in range(80)]
    pb = [(i, (rng.randrange(0, 2000), rng.randrange(0, 2000))) for i in range(80)]
    a = spark.createDataFrame(
        [(i, x, y) for i, (x, y) in pa], "a_id bigint, ax bigint, ay bigint"
    )
    b = spark.createDataFrame(
        [(i, x, y) for i, (x, y) in pb], "b_id bigint, bx bigint, by bigint"
    )
    for r in (50, 300, 900):
        got = sorted(
            (row.a_id, row.b_id)
            for row in grid_radius_join(a, b, "ax", "ay", "bx", "by", radius=r)
            .select("a_id", "b_id")
            .collect()
        )
        assert got == _brute(pa, pb, r), f"radius {r}"


def test_grid_radius_join_boundary_inclusive(spark):
    a = spark.createDataFrame([(1, 0, 0)], "a_id bigint, ax bigint, ay bigint")
    b = spark.createDataFrame(
        [(10, 3, 4), (11, 3, 5)], "b_id bigint, bx bigint, by bigint"
    )
    got = sorted(
        (r.a_id, r.b_id)
        for r in grid_radius_join(a, b, "ax", "ay", "bx", "by", radius=5)
        .select("a_id", "b_id")
        .collect()
    )
    assert got == [(1, 10)]  # dist 5 included, dist ~5.83 excluded


def test_grid_radius_join_keyed(spark):
    a = spark.createDataFrame(
        [(1, "u", 0, 0), (2, "v", 0, 0)], "a_id bigint, k string, ax bigint, ay bigint"
    )
    b = spark.createDataFrame([(10, "u", 1, 1)], "b_id bigint, k string, bx bigint, by bigint")
    got = grid_radius_join(a, b, "ax", "ay", "bx", "by", radius=5, by="k")
    assert [(r.a_id, r.b_id) for r in got.select("a_id", "b_id").collect()] == [(1, 10)]


def test_exact_auc_hand_computed_ties_and_separation(spark):
    """Mann-Whitney AUC with ties, against hand-computed pairs:
    pos={3,2,2}, neg={2,1} -> U = 5 (one 0.5-tie pair), AUC = 5/6;
    perfectly separated scores give AUC = 1."""
    from aroa_etl_spark.operators.evaluation import exact_auc

    df = spark.createDataFrame(
        [(1, 3, 1), (2, 2, 1), (3, 2, 1), (4, 2, 0), (5, 1, 0)],
        "id long, s int, y int",
    )
    row = exact_auc(df, "s", "y", "id").first()
    assert (row.n, row.n_pos, row.n_neg) == (5, 3, 2)
    assert (row.auc_num, row.auc_den) == (10, 12)
    assert abs(row.auc - 5 / 6) < 1e-9
    sep = spark.createDataFrame(
        [(i, 10 + i, 1) for i in range(5)] + [(9 + i, i, 0) for i in range(5)],
        "id long, s int, y int",
    )
    assert exact_auc(sep, "s", "y", "id").first().auc == 1.0
    # partitioning invariance (banded rank + integer sums)
    again = exact_auc(df.repartition(7), "s", "y", "id").first()
    assert (again.auc_num, again.auc_den) == (10, 12)


def test_exact_auc_single_class_yields_null(spark):
    """AUC is undefined without both labels: the division is guarded,
    so auc is NULL (not Infinity / silent NULL-by-accident) while the
    integer counts still report."""
    from aroa_etl_spark.operators.evaluation import exact_auc

    all_pos = spark.createDataFrame(
        [(1, 3, 1), (2, 2, 1)], "id long, s int, y int"
    )
    row = exact_auc(all_pos, "s", "y", "id").first()
    assert (row.n, row.n_pos, row.n_neg) == (2, 2, 0)
    assert row.auc_den == 0 and row.auc is None
    all_neg = spark.createDataFrame(
        [(1, 3, 0), (2, 2, 0)], "id long, s int, y int"
    )
    assert exact_auc(all_neg, "s", "y", "id").first().auc is None


def test_calibration_bins_hand_computed(spark):
    from aroa_etl_spark.operators.evaluation import calibration_bins

    # scores 0..9 over span 10 with n_bins=5 -> bins of width 2
    rows = [(s, 1 if s >= 5 else 0) for s in range(10)]
    df = spark.createDataFrame(rows, "s int, y int")
    out = calibration_bins(df, "s", "y", n_bins=5).collect()
    assert [r.bin for r in out] == [0, 1, 2, 3, 4]
    assert all(r.n == 2 for r in out)
    assert [r.n_pos for r in out] == [0, 0, 1, 2, 2]
    # bin 0 holds scores {0,1}: exact sum and rounded mean
    assert out[0].score_sum == 1 and out[0].mean_score == 0.5
    assert out[2].frac_pos == 0.5


def test_calibration_bins_partition_invariant(spark):
    from aroa_etl_spark.operators.evaluation import calibration_bins

    rows = [(s % 97, (s * 7) % 2) for s in range(500)]
    df = spark.createDataFrame(rows, "s int, y int")
    a = {r.bin: (r.n, r.n_pos, r.score_sum)
         for r in calibration_bins(df, "s", "y").collect()}
    b = {r.bin: (r.n, r.n_pos, r.score_sum)
         for r in calibration_bins(df.repartition(13), "s", "y").collect()}
    assert a == b


def test_calibration_bins_constant_score_single_bin(spark):
    from aroa_etl_spark.operators.evaluation import calibration_bins

    df = spark.createDataFrame([(42, 1), (42, 0)], "s int, y int")
    out = calibration_bins(df, "s", "y").collect()
    assert len(out) == 1 and out[0].bin == 0 and out[0].n == 2


def test_calibration_bins_rejects_one_bin(spark):
    import pytest as _pytest

    from aroa_etl_spark.operators.evaluation import calibration_bins

    df = spark.createDataFrame([(1, 0)], "s int, y int")
    with _pytest.raises(ValueError, match="n_bins"):
        calibration_bins(df, "s", "y", n_bins=1)


def test_weighted_median_hand_computed(spark):
    from aroa_etl_spark.operators.stats import exact_weighted_median

    # group g: values 1 (w=1), 2 (w=1), 10 (w=5): total 7, half 3.5 ->
    # first v with cumw >= 3.5 is 10
    rows = [("g", 1, 1), ("g", 2, 1), ("g", 10, 5), ("h", 4, 2), ("h", 6, 2)]
    df = spark.createDataFrame(rows, "grp string, v int, w int")
    out = {r.grp: r for r in exact_weighted_median(df, ["grp"], "v", "w").collect()}
    assert out["g"].weighted_median == 10 and out["g"].total_weight == 7
    # h: even split 2|2 -> lower median is 4 (2*2 >= 4)
    assert out["h"].weighted_median == 4


def test_weighted_median_tie_values_collapse(spark):
    from aroa_etl_spark.operators.stats import exact_weighted_median

    # the same value appearing as many rows must behave as one bucket
    rows = [("g", 5, 1)] * 4 + [("g", 9, 3)]
    df = spark.createDataFrame(rows, "grp string, v int, w int")
    r = exact_weighted_median(df, ["grp"], "v", "w").first()
    assert r.weighted_median == 5 and r.total_weight == 7
    # partitioning invariance
    r2 = exact_weighted_median(df.repartition(5), ["grp"], "v", "w").first()
    assert (r.weighted_median, r.total_weight) == (r2.weighted_median, r2.total_weight)


def test_weighted_median_equals_plain_median_unit_weights(spark):
    import statistics

    from aroa_etl_spark.operators.stats import exact_weighted_median

    vals = [3, 1, 4, 1, 5, 9, 2, 6, 5, 3, 5]
    df = spark.createDataFrame([("g", v, 1) for v in vals], "grp string, v int, w int")
    r = exact_weighted_median(df, ["grp"], "v", "w").first()
    assert r.weighted_median == statistics.median_low(vals)


def test_calibration_bins_drops_null_scores(spark):
    from aroa_etl_spark.operators.evaluation import calibration_bins

    rows = [(None, 1), (0, 0), (9, 1)]
    df = spark.createDataFrame(rows, "s int, y int")
    out = calibration_bins(df, "s", "y", n_bins=2).collect()
    assert [r.bin for r in out] == [0, 1]
    assert sum(r.n for r in out) == 2  # the null-score row is gone
