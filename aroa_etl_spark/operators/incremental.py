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

__all__ = ["upsert", "snapshot_diff"]


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
