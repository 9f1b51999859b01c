"""Declarative data-quality checks (dbt-tests-style) as engine operators.

A check suite compiles to the MINIMUM number of Spark jobs:

- all row-level checks (not_null / accepted_values / in_range /
  matches) fold into ONE conditional-aggregation pass over the table —
  no per-check scans;
- uniqueness is count − count(distinct) in the same pass (exact;
  count_distinct's partial aggregation keeps it one shuffle);
- referential checks (fk) are left-anti joins counted per relation.

The report is a small (check, n_violations) table — the shape you gate
a 100 TB load on, built from one scan plus one anti-join per foreign
key. The reference has no data-quality surface (its QA flags are
row-level columns, §2.8 F2/F9 — those are implemented in
functions/cleaning.py); this is the table-level complement.
"""

from __future__ import annotations

from collections.abc import Sequence
from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "Check",
    "not_null",
    "unique",
    "accepted_values",
    "in_range",
    "matches",
    "fk",
    "dq_report",
    "zscore_outliers",
]


@dataclass(frozen=True)
class Check:
    name: str
    kind: str  # 'row' | 'unique' | 'fk'
    violation: Column | None = None  # row-level predicate: True = violation
    col: str | None = None  # unique: column
    ref: DataFrame | None = None  # fk: referenced frame
    ref_col: str | None = None  # fk: referenced column


def not_null(col: str) -> Check:
    return Check(f"not_null({col})", "row", F.col(col).isNull())


def accepted_values(col: str, values: Sequence) -> Check:
    return Check(
        f"accepted_values({col})",
        "row",
        ~F.col(col).isin(list(values)) | F.col(col).isNull(),
    )


def in_range(col: str, lo=None, hi=None) -> Check:
    cond = F.lit(False)
    if lo is not None:
        cond = cond | (F.col(col) < lo)
    if hi is not None:
        cond = cond | (F.col(col) > hi)
    return Check(f"in_range({col})", "row", cond | F.col(col).isNull())


def matches(col: str, pattern: str) -> Check:
    """Regex full-row sanity (NULL counts as a violation)."""
    return Check(
        f"matches({col})",
        "row",
        F.col(col).isNull() | ~F.col(col).rlike(pattern),
    )


def unique(col: str) -> Check:
    return Check(f"unique({col})", "unique", col=col)


def fk(col: str, ref: DataFrame, ref_col: str) -> Check:
    return Check(f"fk({col}->{ref_col})", "fk", col=col, ref=ref, ref_col=ref_col)


def dq_report(df: DataFrame, checks: Sequence[Check]) -> DataFrame:
    """(check, n_violations) for every check, fewest-jobs compilation:
    row-level + uniqueness checks share one aggregation pass; each fk
    adds one anti-join count. Row order is one row per check; rows with
    zero violations are kept (the gate wants to see the green too)."""
    if not checks:
        raise ValueError("dq_report: no checks given")
    aggs = []
    for c in checks:
        if c.kind == "row":
            aggs.append(
                F.sum(F.when(c.violation, 1).otherwise(0)).cast("bigint").alias(c.name)
            )
        elif c.kind == "unique":
            aggs.append(
                (F.count(c.col) - F.count_distinct(F.col(c.col)))
                .cast("bigint")
                .alias(c.name)
            )
    spark = df.sparkSession
    parts = []
    if aggs:
        wide = df.agg(*aggs)
        stack = F.expr(
            "stack({n}, {pairs}) as (check, n_violations)".format(
                n=len(aggs),
                pairs=", ".join(
                    f"'{c.name}', `{c.name}`"
                    for c in checks
                    if c.kind in ("row", "unique")
                ),
            )
        )
        parts.append(wide.select(stack))
    for c in checks:
        if c.kind == "fk":
            missing = (
                df.select(F.col(c.col))
                .filter(F.col(c.col).isNotNull())
                .join(
                    c.ref.select(F.col(c.ref_col).alias(c.col)).distinct(),
                    c.col,
                    "left_anti",
                )
                .agg(F.count(F.lit(1)).cast("bigint").alias("n_violations"))
                .select(F.lit(c.name).alias("check"), "n_violations")
            )
            parts.append(missing)
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def zscore_outliers(
    df: DataFrame,
    col: str,
    by: Sequence[str] | None = None,
    z: float = 3.0,
    scale: int = 2,
) -> DataFrame:
    """Flag numeric outliers per group by z-score: adds ``zscore``
    (rounded to 6 decimals) and ``is_outlier`` (|z| > ``z``) to every
    row. The anomaly-detection leg of the data-quality family —
    dq_report counts rule violations, profile() summarizes columns,
    this finds the rows that don't belong.

    Determinism: group mean and sample standard deviation derive from
    EXACT sufficient statistics — values fixed-pointed at 10^scale and
    summed as DECIMAL(38,0) (the stats.py recipe), so the flags are
    identical on any engine or partitioning, unlike stddev_samp's
    double folding. Plan: one map-side-combinable groupBy for the
    stats + one keyed join back (broadcast when groups are few); rows
    with NULL values or in groups of size < 2 get NULL zscore / false.
    """
    by = list(by or [])
    mult = 10 ** scale
    xi = F.round(F.col(col) * mult).cast("decimal(38,0)")
    stats = (
        df.filter(F.col(col).isNotNull())
        .select(*by, xi.alias("__xi"))
        .groupBy(*by)
        .agg(
            F.count(F.lit(1)).cast("decimal(38,0)").alias("__n"),
            F.sum("__xi").alias("__s"),
            F.sum(F.col("__xi") * F.col("__xi")).alias("__sq"),
        )
    )
    n = F.col("__n").cast("double")
    sm = F.col("__s").cast("double")
    sq = F.col("__sq").cast("double")
    mean = sm / n
    var = (n * sq - sm * sm) / (n * (n - F.lit(1.0)))
    if by:
        # eqNullSafe join: a NULL group key is still a group — a plain
        # name join would silently leave NULL-key rows without stats
        # (and a DQ operator must not skip exactly the dirty keys)
        cond = None
        stats_r = stats
        for c in by:
            stats_r = stats_r.withColumnRenamed(c, f"__by_{c}")
            this = F.col(c).eqNullSafe(F.col(f"__by_{c}"))
            cond = this if cond is None else (cond & this)
        enriched = df.join(stats_r, cond, "left")
    else:
        enriched = df.crossJoin(F.broadcast(stats))
    zcol = (
        (F.round(F.col(col) * mult).cast("double") - mean)
        / F.sqrt(var)
    )
    return enriched.select(
        *[df[c] for c in df.columns],
        F.when(
            # var > 0 BEFORE sqrt: catastrophic cancelation can round a
            # constant group's variance slightly negative, and sqrt(neg)
            # = NaN compares GREATER than 0 under Spark NaN ordering —
            # which would flag every row of the constant group
            F.col(col).isNotNull() & (F.col("__n") >= 2) & (var > 0),
            F.round(zcol, 6),
        ).alias("zscore"),
    ).withColumn(
        "is_outlier",
        F.coalesce(F.abs(F.col("zscore")) > F.lit(z), F.lit(False)),
    )
