"""Incremental-refresh operators: keyed upsert and snapshot diff.

The reference pipeline refreshes by REWRITING whole staged files
(batch pandas, GCS file handoff — SURVEY §3); at 100 TB a refresh must
be keyed and incremental. Two primitives cover it:

- ``upsert``: new/updated rows win, untouched current rows survive.
  Implemented as updates ∪ (current ⟕anti updates) — an anti-join plus
  union, both shuffling only on the key. Deliberately NOT a full-outer
  join: outer joins materialize both sides' payloads per row and need
  per-column null-coalescing; the anti-join form stays narrow and
  whole-stage-codegen friendly.
- ``snapshot_diff``: CDC between two snapshots of a keyed table —
  added / removed / changed rows, detected by comparing an md5 over the
  compare columns (one hash per side, not N column comparisons). One
  full-outer join on the key, payload reduced to the hash, so the
  shuffle carries (key, hash) — bytes per row, not the row.

Both demand UNIQUE keys per side (standard upsert/CDC contract); the
caller dedupes first (e.g. best-per-key window) when the source has
versions.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = [
    "upsert",
    "snapshot_diff",
    "scd2_from_changelog",
    "refresh_aggregate",
    "cdc_apply",
]


def upsert(current: DataFrame, updates: DataFrame, key: Sequence[str] | str) -> DataFrame:
    """Keyed upsert: every ``updates`` row wins; ``current`` rows whose
    key is untouched pass through. Schemas must match by name."""
    key = [key] if isinstance(key, str) else list(key)
    if set(current.columns) != set(updates.columns):
        raise ValueError(
            f"schema mismatch: {sorted(current.columns)} vs {sorted(updates.columns)}"
        )
    untouched = current.join(updates.select(*key), key, "left_anti")
    return updates.unionByName(untouched)


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    key: Sequence[str] | str,
    compare_cols: Sequence[str] | None = None,
) -> DataFrame:
    """Row-level diff of two snapshots: (key..., change_type) with
    change_type ∈ {'added', 'removed', 'changed'} — unchanged rows are
    absent. ``compare_cols`` defaults to every non-key column present in
    BOTH sides. Comparison hashes the compare columns (null-tagged, so
    NULL vs '' differ) into one md5 per side; the full-outer join then
    moves only (key, hash)."""
    key = [key] if isinstance(key, str) else list(key)
    if compare_cols is None:
        compare_cols = [
            c for c in old.columns if c in set(new.columns) and c not in key
        ]
    compare_cols = list(compare_cols)

    def hashed(df: DataFrame, alias: str) -> DataFrame:
        tagged = [
            F.when(F.col(c).isNull(), F.lit("\x00null")).otherwise(
                F.col(c).cast("string")
            )
            for c in compare_cols
        ]
        return df.select(*key, F.md5(F.concat_ws("\x01", *tagged)).alias(alias))

    o = hashed(old, "__h_old")
    n = hashed(new, "__h_new")
    j = o.join(n, key, "full_outer")
    return (
        j.select(
            *key,
            F.when(F.col("__h_old").isNull(), F.lit("added"))
            .when(F.col("__h_new").isNull(), F.lit("removed"))
            .when(F.col("__h_old") != F.col("__h_new"), F.lit("changed"))
            .alias("change_type"),
        )
        .filter(F.col("change_type").isNotNull())
    )


def scd2_from_changelog(
    df: DataFrame,
    key: str,
    ts_col: str,
    state_col: str,
    tiebreak: str | None = None,
) -> DataFrame:
    """Build a type-2 slowly-changing dimension from a change log:
    consecutive rows per ``key`` (ordered by ``ts_col``, then
    ``tiebreak`` for a total order) with the SAME ``state_col`` value
    collapse into one validity interval. Output per (key, interval):

    - ``state_col``   the value during the interval
    - ``valid_from``  first ts the state was observed
    - ``valid_to``    next state's valid_from (NULL for the current row)
    - ``version``     1-based interval ordinal per key
    - ``is_current``  valid_to IS NULL

    Plan: ONE shuffle on ``key`` feeds both windows and the collapse
    aggregation (same partitioning, Exchange reuse); interval detection
    is the classic gaps-and-islands running sum over a lag-inequality
    flag — no self-join, no per-row Python at any scale.
    """
    from pyspark.sql.window import Window as W

    order = [F.col(ts_col).asc()] + (
        [F.col(tiebreak).asc()] if tiebreak else []
    )
    w = W.partitionBy(key).orderBy(*order)
    flagged = df.select(
        key,
        ts_col,
        state_col,
        *([tiebreak] if tiebreak else []),
        # null-safe: a NULL state starts/continues its own island (plain
        # != returns NULL against NULL and would silently merge it into
        # the previous island). The explicit first-row flag is needed
        # because lag()'s missing-row NULL is indistinguishable from a
        # NULL state value.
        F.when(
            (F.row_number().over(w) == 1)
            | ~F.lag(state_col).over(w).eqNullSafe(F.col(state_col)),
            1,
        )
        .otherwise(0)
        .alias("__chg"),
    ).withColumn("__grp", F.sum("__chg").over(w.rowsBetween(W.unboundedPreceding, 0)))
    islands = flagged.groupBy(key, "__grp").agg(
        F.first(state_col).alias(state_col),
        F.min(ts_col).alias("valid_from"),
    )
    w2 = W.partitionBy(key).orderBy("__grp")
    return islands.select(
        key,
        state_col,
        "valid_from",
        F.lead("valid_from").over(w2).alias("valid_to"),
        F.col("__grp").cast("int").alias("version"),
    ).withColumn("is_current", F.col("valid_to").isNull())


def refresh_aggregate(
    agg: DataFrame,
    delta: DataFrame,
    keys: Sequence[str] | str,
    count_col: str = "n",
    sum_cols: Sequence[str] | None = None,
) -> DataFrame:
    """Incrementally maintain a COUNT/SUM aggregate table from a batch
    of new fact rows — the materialized-view delta refresh: instead of
    recomputing ``fact.groupBy(keys).agg(...)`` over 100 TB, aggregate
    ONLY the delta and merge it into the existing aggregate by key.

    ``agg`` holds (keys..., count_col, sum_<c> for each sum col);
    ``delta`` holds raw fact rows. Count and sum are the classic
    self-maintainable aggregates (merge = add); avg derives as
    sum/count downstream; min/max are NOT self-maintainable under
    deletes and are deliberately not offered here.

    Plan: one groupBy over the (small) delta + one full-outer join on
    the keys against the aggregate — both shuffles keyed, payload is
    counters only. The result is the new aggregate table; write it back
    with ``upsert``-style key replacement or full overwrite.
    """
    keys = [keys] if isinstance(keys, str) else list(keys)
    sum_cols = list(sum_cols or [])
    d = delta.groupBy(*keys).agg(
        F.count(F.lit(1)).cast("bigint").alias(f"__d_{count_col}"),
        *[F.sum(c).alias(f"__d_sum_{c}") for c in sum_cols],
    )
    joined = agg.join(d, keys, "full_outer")
    out_cols = [
        (
            F.coalesce(F.col(count_col), F.lit(0))
            + F.coalesce(F.col(f"__d_{count_col}"), F.lit(0))
        )
        .cast("bigint")
        .alias(count_col)
    ]
    for c in sum_cols:
        zero = F.lit(0).cast(agg.schema[f"sum_{c}"].dataType)
        out_cols.append(
            (
                F.coalesce(F.col(f"sum_{c}"), zero)
                + F.coalesce(F.col(f"__d_sum_{c}"), zero)
            ).alias(f"sum_{c}")
        )
    return joined.select(*keys, *out_cols)


def cdc_apply(
    base: DataFrame,
    changes: DataFrame,
    key: Sequence[str] | str,
    *,
    op_col: str = "op",
    seq_col: str = "seq",
    tiebreak_col: str | None = None,
) -> DataFrame:
    """Apply a CDC change log (Debezium/DMS shape: per-row ``op`` in
    {'I', 'U', 'D'} plus a monotone ``seq``) onto a base snapshot —
    the batch twin of the streaming upsert sink (st_upsert_table):
    for every key the LATEST change wins; a final 'D' removes the row,
    a final 'I'/'U' replaces (or inserts) it, and untouched base rows
    pass through.

    Determinism: the winner per key is selected by ``row_number`` over
    (seq DESC, tiebreak DESC) — ties in ``seq`` without a tiebreak
    column raise, because "latest" would then be partition-dependent
    (same loudness rule as the SCD2 builder).  Unknown op codes raise
    via an assertion column rather than silently passing through.

    Plan: one window over the changes keyed by ``key`` (the change log
    is the small side at 100 TB — a day's deltas, not the corpus) +
    one keyed anti-join + union with the base. No base-side window,
    no base shuffle beyond the anti-join."""
    keys = [key] if isinstance(key, str) else list(key)
    from pyspark.sql.window import Window as W

    checked_op = F.when(
        F.col(op_col).isin("I", "U", "D"), F.col(op_col)
    ).otherwise(
        F.raise_error(
            F.concat(F.lit("cdc_apply: unknown op code "), F.col(op_col))
        )
    )
    if tiebreak_col is not None:
        # same loudness rule as the no-tiebreak branch: a residual tie
        # on (seq, tiebreak) would make row_number's pick partition-
        # dependent, so rank() keeps every tied winner and a >1 winner
        # count raises through an expression the result consumes
        win = W.partitionBy(*keys).orderBy(
            F.col(seq_col).desc(), F.col(tiebreak_col).desc()
        )
        winners = (
            changes.withColumn(op_col, checked_op)
            .withColumn("__rk", F.rank().over(win))
            .filter(F.col("__rk") == 1)
        )
        n_win = F.count(F.lit(1)).over(W.partitionBy(*keys))
        latest = winners.withColumn(
            op_col,
            F.when(n_win == 1, F.col(op_col)).otherwise(
                F.raise_error(
                    F.concat(
                        F.lit(
                            "cdc_apply: tied (seq, tiebreak) values for a "
                            "key — latest change is ambiguous; key="
                        ),
                        F.concat_ws(
                            ",", *[F.col(k).cast("string") for k in keys]
                        ),
                    )
                )
            ),
        ).drop("__rk")
    else:
        # no tiebreak: a tie at the LATEST seq makes "latest" partition-
        # dependent, so it must raise. rank() keeps every tied winner,
        # and the guard is woven into the op column itself — an
        # expression the result actually consumes, so Catalyst cannot
        # prune the check away (a projected-then-dropped guard column
        # would be dead code and never evaluate).
        win = W.partitionBy(*keys).orderBy(F.col(seq_col).desc())
        # op validation BEFORE the winner filter: a malformed op code on
        # a non-latest change is feed corruption too and must raise just
        # as loudly (the winner-only form fired only sometimes)
        winners = (
            changes.withColumn(op_col, checked_op)
            .withColumn("__rk", F.rank().over(win))
            .filter(F.col("__rk") == 1)
        )
        n_win = F.count(F.lit(1)).over(W.partitionBy(*keys))
        latest = winners.withColumn(
            op_col,
            F.when(n_win == 1, F.col(op_col)).otherwise(
                F.raise_error(
                    F.concat(
                        F.lit(
                            "cdc_apply: tied seq values for a key need a "
                            "tiebreak_col; key="
                        ),
                        F.concat_ws(
                            ",", *[F.col(k).cast("string") for k in keys]
                        ),
                    )
                )
            ),
        ).drop("__rk")
    survivors = latest.filter(F.col(op_col) != "D").drop(op_col, seq_col)
    if tiebreak_col is not None:
        survivors = survivors.drop(tiebreak_col)
    untouched = base.join(latest.select(*keys), keys, "left_anti")
    return untouched.unionByName(survivors)
