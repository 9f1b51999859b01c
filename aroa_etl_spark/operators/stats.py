"""Exact-arithmetic statistical aggregates: correlation and simple
linear regression.

Spark's built-in ``corr``/``covar``/``regr_*`` accumulate doubles, so
the last ulps depend on partition/merge order — two runs of the same
query can differ, and no external engine reproduces them bit-for-bit.
Here the five sufficient statistics (n, Σx, Σy, Σxy, Σx², Σy²) are
accumulated EXACTLY: inputs are scaled to integer units (``round(x *
10^scale)``) and summed as DECIMAL(38,0), which is order-independent.
The final Pearson r / OLS slope / intercept are then pure scalar double
arithmetic over those exact sums — deterministic on any engine, any
partitioning, any rerun.

One map-side-combinable aggregation pass; the scaled products stay well
inside DECIMAL(38) head-room (x,y up to ~1e9 in scaled units and 1e12
rows before overflow). NULL pairs are dropped (SQL corr semantics).

Extension inventory (SURVEY §2.11): the reference computes similarity
scores, never regression; this is the data-profiling/monitoring
counterpart of the sketches module.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["exact_linear_stats"]


def exact_linear_stats(
    df: DataFrame, x_col: str, y_col: str, scale: int = 2, out_decimals: int = 9
) -> DataFrame:
    """Single-row frame: n, Pearson ``corr``, OLS ``slope`` /
    ``intercept`` (y on x), each rounded to ``out_decimals``; inputs
    fixed-pointed at ``10^scale`` units before exact summation."""
    mult = 10 ** scale
    pair = df.filter(F.col(x_col).isNotNull() & F.col(y_col).isNotNull()).select(
        F.round(F.col(x_col) * mult).cast("decimal(38,0)").alias("xi"),
        F.round(F.col(y_col) * mult).cast("decimal(38,0)").alias("yi"),
    )
    sums = pair.agg(
        F.count(F.lit(1)).cast("decimal(38,0)").alias("n"),
        F.sum("xi").alias("sx"),
        F.sum("yi").alias("sy"),
        F.sum(F.col("xi") * F.col("yi")).alias("sxy"),
        F.sum(F.col("xi") * F.col("xi")).alias("sxx"),
        F.sum(F.col("yi") * F.col("yi")).alias("syy"),
    )
    n = F.col("n").cast("double")
    sx = F.col("sx").cast("double")
    sy = F.col("sy").cast("double")
    sxy = F.col("sxy").cast("double")
    sxx = F.col("sxx").cast("double")
    syy = F.col("syy").cast("double")
    cov_n = n * sxy - sx * sy  # n^2 * covariance, in scaled units
    var_x = n * sxx - sx * sx
    var_y = n * syy - sy * sy
    slope = cov_n / var_x
    return sums.select(
        F.col("n").cast("bigint").alias("n"),
        F.round(cov_n / F.sqrt(var_x * var_y), out_decimals).alias("corr"),
        F.round(slope, out_decimals).alias("slope"),
        F.round((sy - slope * sx) / n / F.lit(float(mult)), out_decimals).alias(
            "intercept"
        ),
    )
