"""One-pass column profiler: the table-statistics complement of the
declarative check suite in operators/dq.py.

``profile`` computes per-column null counts, exact distinct counts, and
min/max in a SINGLE aggregation over the table — the profile you run
before designing partitioning/bucketing for a 100 TB load. All
per-column aggregates fold into one ``agg(...)`` call; the multiple
exact ``count_distinct``s compile to one Expand-based aggregation
(one scan, one shuffle), and the wide single-row result is unpivoted to
(column, ...) rows with ``stack`` — the same fewest-jobs compilation as
dq_report.

min/max cross the output boundary as strings of the ORIGINAL type's
ordering (min first, then cast), so a date column profiles as its
earliest/latest date, not its alphabetically-first string.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["profile"]


def profile(df: DataFrame, cols: Sequence[str] | None = None) -> DataFrame:
    """(column, n_rows, n_nulls, n_distinct, min_str, max_str) — one row
    per profiled column, one aggregation pass over the table."""
    cols = list(cols) if cols is not None else list(df.columns)
    if not cols:
        raise ValueError("profile: no columns given")
    aggs = [F.count(F.lit(1)).cast("bigint").alias("__n")]
    for c in cols:
        aggs.extend(
            [
                F.sum(F.when(F.col(c).isNull(), 1).otherwise(0))
                .cast("bigint")
                .alias(f"__nulls_{c}"),
                F.count_distinct(F.col(c)).cast("bigint").alias(f"__dist_{c}"),
                F.min(F.col(c)).cast("string").alias(f"__min_{c}"),
                F.max(F.col(c)).cast("string").alias(f"__max_{c}"),
            ]
        )
    wide = df.agg(*aggs)
    stack = F.expr(
        "stack({n}, {quads}) as (column, n_nulls, n_distinct, min_str, max_str)".format(
            n=len(cols),
            quads=", ".join(
                "'{0}', `__nulls_{1}`, `__dist_{1}`, `__min_{1}`, `__max_{1}`".format(
                    c.replace("\\", "\\\\").replace("'", "''"),
                    c.replace("`", "``"),
                )
                for c in cols
            ),
        )
    )
    return wide.select(F.col("__n").alias("n_rows"), stack).select(
        "column", "n_rows", "n_nulls", "n_distinct", "min_str", "max_str"
    )
