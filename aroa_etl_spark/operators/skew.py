"""Skew-mitigation utilities for large joins (100 TB posture).

AQE's skew-join splitting (on in `session.get_spark`) handles moderate
runtime skew in sort-merge joins; these helpers cover the cases AQE
can't:

- ``salted_join``: explicit key salting for a *known* hot-key join where
  the small side fits replication — the large side scatters each key
  across ``salt`` sub-partitions deterministically, the small side is
  replicated once per salt value, and the join key becomes
  (key, salt). Row-identical to the plain inner/left join.
- ``top_keys``: the metadata-scale probe that finds the hot keys worth
  salting (run on a sample at scale).

Reference analogue: none (single-process pandas has no shuffles); this
is part of the engine's Spark-native scale surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def top_keys(df: DataFrame, key: str, n: int = 20) -> DataFrame:
    """(key, cnt) for the n heaviest keys — the salting candidates.
    One aggregation; run over a ``.sample`` at scale."""
    return df.groupBy(key).agg(F.count(F.lit(1)).alias("cnt")).orderBy(
        F.desc("cnt"), F.asc(key)
    ).limit(n)


def salted_join(
    large: DataFrame,
    small: DataFrame,
    key: str,
    *,
    salt: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Join with the key salted ``salt`` ways: the large side adds a
    DETERMINISTIC salt (hash of the whole row modulo ``salt`` — stable
    under retries, unlike ``rand()``), the small side cross-joins the
    salt range (×``salt`` replication), and the equi-join runs on
    (key, salt) so one hot key spreads over ``salt`` shuffle partitions.

    Result is row-identical to ``large.join(small, key, how)`` for
    ``inner`` and ``left`` (the supported modes — right/outer would need
    salt-aware null handling on the replicated side).
    """
    if how not in ("inner", "left"):
        raise ValueError("salted_join supports how='inner' or 'left'")
    salt_col = F.pmod(F.hash(*[F.col(c) for c in large.columns]), F.lit(salt))
    big = large.withColumn("__salt", salt_col)
    # Replicate the small side once per salt value with explode — a
    # narrow generator, so no join operator (the earlier broadcast cross
    # join materialized as a BroadcastNestedLoopJoin in the plan).
    rep = small.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(salt - 1)))
    )
    return big.join(rep, [key, "__salt"], how).drop("__salt")
