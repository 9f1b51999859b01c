"""Data-layout operators: Z-order (Morton) clustering keys.

At 100 TB, multi-dimensional pruning (``WHERE a BETWEEN .. AND b
BETWEEN ..``) depends on the physical layout: files range-partitioned
on a single column prune on that column only. Writing files ordered by
an interleaved-bit Morton key keeps BOTH dimensions locally clustered,
so parquet min/max stats prune on either predicate (the Delta/Iceberg
OPTIMIZE ZORDER idea, expressed as plain Spark).

``zorder_key`` is pure integer bit arithmetic (a static
``bits * ncols``-term sum of shifted bit extracts — no UDF, fully
codegen'd); ``repartition_by_zorder`` range-partitions on it, which is
what makes the subsequent parquet write clustered. Inputs must be
non-negative and fit the per-column bit budget; bucket/normalize first
(e.g. days since epoch, price cents capped at 2^bits-1) — values above
the budget raise rather than silently aliasing.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["zorder_key", "repartition_by_zorder"]


def zorder_key(cols: Sequence[Column | str], bits: int = 16) -> Column:
    """Morton-interleave ``bits`` low bits of each column: bit i of
    column j lands at position ``i * ncols + j``. Total bits must fit a
    signed 64-bit value. Any input outside [0, 2^bits) raises at
    runtime (raise_error) — silent masking would corrupt locality."""
    ncols = len(cols)
    if ncols < 2:
        raise ValueError("zorder needs at least 2 columns")
    if bits * ncols > 63:
        raise ValueError(f"{bits} bits x {ncols} cols exceeds 63 bits")
    cs = [F.col(c) if isinstance(c, str) else c for c in cols]
    checked = []
    for c in cs:
        lc = c.cast("long")
        checked.append(
            F.when(
                (lc < 0) | (lc >= F.lit(1 << bits)),
                F.raise_error(
                    F.concat(
                        F.lit(f"zorder_key: value out of [0, {1 << bits}): "),
                        lc.cast("string"),
                    )
                ).cast("long"),
            ).otherwise(lc)
        )
    key = F.lit(0).cast("long")
    for i in range(bits):
        for j, c in enumerate(checked):
            key = key + F.shiftleft(
                F.shiftright(c, i).bitwiseAND(F.lit(1)), i * ncols + j
            ).cast("long")
    return key


def repartition_by_zorder(
    df: DataFrame,
    cols: Sequence[str],
    bits: int = 16,
    num_partitions: int | None = None,
) -> DataFrame:
    """Range-partition (and sort within partitions) by the Morton key —
    write the result to parquet and both dimensions prune via min/max
    stats. The key column is dropped after partitioning."""
    keyed = df.withColumn("__zkey", zorder_key(list(cols), bits))
    parted = (
        keyed.repartitionByRange(num_partitions, "__zkey")
        if num_partitions
        else keyed.repartitionByRange("__zkey")
    )
    return parted.sortWithinPartitions("__zkey").drop("__zkey")
