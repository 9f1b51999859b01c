"""Temporal join operators Spark lacks as built-ins: as-of join and
bounded range join.

Neither exists in the reference (its pipeline is batch pandas with no
time-series joins — see SURVEY.md §2.9 note); both are table-stakes for
event/feature pipelines at scale, so they are provided as first-class
engine operators with the scale-safe shapes:

- ``asof_join``: the classic union + running ``last(ignorenulls)``
  window. ONE shuffle on the ``by`` keys; the window is a running
  aggregate (UNBOUNDED PRECEDING → CURRENT ROW), so state per partition
  is O(1) per right payload column — no full-partition buffering, no
  per-key driver loop, no range scan. This is the plan you want at
  100 TB: it survives arbitrary key cardinality and time skew.
- ``range_join``: interval-bucketized equi-join. Each right row is
  exploded into exactly TWO candidate buckets (its own and the
  previous), which guarantees every qualifying pair is produced exactly
  once — no ``distinct`` de-dup shuffle afterwards — and the join is a
  plain hash equi-join on (by, bucket) that AQE can size/skew-split.
  The exact predicate then refines candidates. Candidate blow-up is
  bounded by interval width × event density per key, the standard
  trade-off of bucketized range joins (Flink/Trino interval joins use
  the same scheme).

Timestamps: all arithmetic is done in tz-free epoch-from-NTZ
microseconds (``timestampdiff`` against the NTZ epoch), never through a
session-timezone-dependent NTZ→LTZ cast — a plain driver session with a
DST timezone would otherwise corrupt wall times that fall in a DST gap.
LTZ inputs work too (the diff is computed on the instant).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import TimestampNTZType
from pyspark.sql.window import Window as W

__all__ = ["asof_join", "range_join", "interval_overlap_join", "epoch_us"]


def epoch_us(c: Column | str, dtype=None) -> Column:
    """Microseconds since epoch as BIGINT, timezone-free.

    For TIMESTAMP_NTZ this diffs against the NTZ epoch literal — no
    session-tz cast anywhere. For TIMESTAMP (LTZ) it uses unix_micros.
    Pass ``dtype`` (the column's DataType) when known; when omitted the
    NTZ path is used, which also accepts DATE/strings castable to NTZ.
    """
    c = F.col(c) if isinstance(c, str) else c
    if dtype is not None and not isinstance(dtype, TimestampNTZType):
        return F.unix_micros(c)
    return F.timestamp_diff("MICROSECOND", F.lit("1970-01-01 00:00:00").cast("timestamp_ntz"), c)


def asof_join(
    left: DataFrame,
    right: DataFrame,
    *,
    on: str,
    by: Sequence[str],
    right_cols: Sequence[str],
    tolerance_us: int | None = None,
    direction: str = "backward",
    suffix: str = "_right",
) -> DataFrame:
    """Left as-of join: for every left row, the single right row with the
    largest ``on`` ≤ left.``on`` (direction='backward', inclusive), the
    smallest ``on`` ≥ left.``on`` ('forward'), or whichever of the two is
    closer ('nearest', ties to backward — pandas merge_asof semantics),
    matching on the ``by`` keys. ``right_cols`` are the right payload
    columns to attach (NULL when no right row qualifies); the matched
    right timestamp is always attached as ``on + suffix``.

    ``tolerance_us``: optional max |left.on - right.on| in microseconds;
    matches farther away surface as NULL (pandas ``merge_asof``
    semantics).

    Determinism: if several right rows tie on (by, on), the one with the
    greatest ``right_cols[0]`` wins (ascending tiebreak before the
    running last()). Pre-aggregate the right side if you need a
    different rule.

    Scale shape: union → ONE hash-partition shuffle on ``by`` → sort
    within partitions → running last(ignorenulls). No join explosion,
    no state beyond one value per payload column.
    """
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(
            f"direction must be backward|forward|nearest, got {direction!r}"
        )
    by = list(by)
    right_cols = list(right_cols)
    if not right_cols:
        raise ValueError("right_cols must name at least one right payload column")
    for k in by + [on]:
        if k not in left.columns or k not in right.columns:
            raise ValueError(f"join column {k!r} missing from one side")

    on_r = on + suffix
    payload = [c + suffix for c in right_cols]
    left_cols = [c for c in left.columns if c not in by and c != on]

    # Tag and align the two sides into one schema. Right rows carry the
    # payload; left rows carry NULL payload and their own attributes.
    l_tagged = left.select(
        *by,
        F.col(on).alias("__on"),
        F.lit(1).alias("__side"),
        *[F.col(c) for c in left_cols],
        *[F.lit(None).cast(right.schema[c].dataType).alias(p) for c, p in zip(right_cols, payload)],
        F.lit(None).cast(right.schema[on].dataType).alias(on_r),
    )
    r_tagged = right.select(
        *by,
        F.col(on).alias("__on"),
        F.lit(0).alias("__side"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in left_cols],
        *[F.col(c).alias(p) for c, p in zip(right_cols, payload)],
        F.col(on).alias(on_r),
    )
    u = l_tagged.unionByName(r_tagged)

    # backward: right rows sort before left at equal time (inclusive ≤),
    # running last() picks the latest right seen so far. forward is the
    # mirror image (descending time, right still first at equal time).
    def _win(asc: bool):
        t = F.col("__on").asc() if asc else F.col("__on").desc()
        # Tiebreak over ALL payload columns: ordering by payload[0] alone
        # leaves right rows tying on (by, on, payload[0]) in a non-total
        # order, and each last() would then resolve independently against
        # a nondeterministic row order (mixing values from different right
        # rows). With every payload column in the sort the within-tie
        # order is total unless rows are fully identical — where mixing
        # is harmless. Non-orderable payload types (maps) are skipped:
        # Spark rejects them in an ORDER BY, and their presence in the
        # tiebreak would turn a working join into an AnalysisException —
        # rows tying on every orderable column may then mix map values.
        from pyspark.sql.types import ArrayType, MapType, StructType

        def _orderable(dt) -> bool:
            # maps anywhere in the type tree make a column unsortable
            if isinstance(dt, MapType):
                return False
            if isinstance(dt, ArrayType):
                return _orderable(dt.elementType)
            if isinstance(dt, StructType):
                return all(_orderable(f.dataType) for f in dt.fields)
            return True

        orderable = [
            p
            for c, p in zip(right_cols, payload)
            if _orderable(right.schema[c].dataType)
        ]
        ties = [F.col(p).asc_nulls_first() for p in orderable]
        return (
            W.partitionBy(*by)
            .orderBy(t, F.col("__side").asc(), *ties)
            .rowsBetween(W.unboundedPreceding, W.currentRow)
        )

    if direction in ("backward", "forward"):
        win = _win(direction == "backward")
        matched = u.select(
            *by,
            "__on",
            "__side",
            *left_cols,
            *[F.last(p, ignorenulls=True).over(win).alias(p) for p in payload],
            F.last(on_r, ignorenulls=True).over(win).alias(on_r),
        ).filter(F.col("__side") == 1)
    else:
        # nearest: evaluate both directions over the SAME union (the two
        # windows share the partitioning — one Exchange, two sorts) and
        # pick the closer side per row, ties to backward.
        wb, wf = _win(True), _win(False)
        lt = left.schema[on].dataType
        rt = right.schema[on].dataType
        both = u.select(
            *by,
            "__on",
            "__side",
            *left_cols,
            *[F.last(p, ignorenulls=True).over(wb).alias("__b_" + p) for p in payload],
            F.last(on_r, ignorenulls=True).over(wb).alias("__b_on"),
            *[F.last(p, ignorenulls=True).over(wf).alias("__f_" + p) for p in payload],
            F.last(on_r, ignorenulls=True).over(wf).alias("__f_on"),
        ).filter(F.col("__side") == 1)
        gap_b = epoch_us(F.col("__on"), lt) - epoch_us(F.col("__b_on"), rt)
        gap_f = epoch_us(F.col("__f_on"), rt) - epoch_us(F.col("__on"), lt)
        use_b = F.col("__b_on").isNotNull() & (
            F.col("__f_on").isNull() | (gap_b <= gap_f)
        )
        matched = both.select(
            *by,
            "__on",
            "__side",
            *left_cols,
            *[
                F.when(use_b, F.col("__b_" + p)).otherwise(F.col("__f_" + p)).alias(p)
                for p in payload
            ],
            F.when(use_b, F.col("__b_on")).otherwise(F.col("__f_on")).alias(on_r),
        )

    if tolerance_us is not None:
        lt = left.schema[on].dataType
        rt = right.schema[on].dataType
        gap = epoch_us(F.col("__on"), lt) - epoch_us(F.col(on_r), rt)
        gap = F.abs(gap)
        keep = F.col(on_r).isNotNull() & (gap <= F.lit(tolerance_us))
        matched = matched.select(
            *by,
            "__on",
            *left_cols,
            *[F.when(keep, F.col(p)).alias(p) for p in payload],
            F.when(keep, F.col(on_r)).alias(on_r),
        )
    else:
        matched = matched.drop("__side")

    return matched.withColumnRenamed("__on", on)


def range_join(
    left: DataFrame,
    right: DataFrame,
    *,
    on: str,
    by: Sequence[str],
    lower_us: int,
    upper_us: int,
    left_prefix: str = "l_",
    right_prefix: str = "r_",
) -> DataFrame:
    """Bounded range join: all (left, right) pairs with
    ``left.on + lower_us ≤ right.on ≤ left.on + upper_us`` and equal
    ``by`` keys. Requires ``upper_us > lower_us`` (a degenerate zero
    width interval is an equi-join — express it as one).

    Returns the ``by`` keys plus every non-key column of each side under
    ``left_prefix``/``right_prefix``.

    Exactly-once candidate generation: with bucket width
    B = upper_us - lower_us, key the left row by kl = floor(on/B) and
    explode each right row to buckets {ks, ks-1} where
    ks = floor((on - lower_us)/B). A qualifying pair has
    (right.on - lower_us) - left.on ∈ [0, B], hence ks ∈ {kl, kl+1} —
    exactly one of the two exploded buckets equals kl, so no pair is
    emitted twice and no post-join distinct is needed.
    """
    if upper_us <= lower_us:
        raise ValueError("upper_us must be > lower_us")
    width = upper_us - lower_us
    by = list(by)

    l_on_us = epoch_us(F.col(on), left.schema[on].dataType)
    r_on_us = epoch_us(F.col(on), right.schema[on].dataType)

    l_keyed = left.select(
        *by,
        F.floor(l_on_us / F.lit(width)).alias("__bucket"),
        l_on_us.alias("__l_us"),
        *[F.col(c).alias(left_prefix + c) for c in left.columns if c not in by],
    )
    r_shift = F.floor((r_on_us - F.lit(lower_us)) / F.lit(width))
    r_keyed = right.select(
        *by,
        F.explode(F.array(r_shift, r_shift - F.lit(1))).alias("__bucket"),
        r_on_us.alias("__r_us"),
        *[F.col(c).alias(right_prefix + c) for c in right.columns if c not in by],
    )

    gap = F.col("__r_us") - F.col("__l_us")
    return (
        l_keyed.join(r_keyed, [*by, "__bucket"])
        .filter((gap >= F.lit(lower_us)) & (gap <= F.lit(upper_us)))
        .drop("__bucket", "__l_us", "__r_us")
    )


def interval_overlap_join(
    a: DataFrame,
    b: DataFrame,
    a_start: str,
    a_end: str,
    b_start: str,
    b_end: str,
    by: Sequence[str] | str | None = None,
    bucket: int = 1_000_000 * 60 * 30,
) -> DataFrame:
    """Join two INTERVAL sets on overlap (``a.start <= b.end AND
    b.start <= a.end``, closed intervals), optionally per equality key —
    the third temporal-join shape beside as-of (point→latest point) and
    range_join (point→bounded offset window).

    The naive formulation is an inequality join (cartesian per key).
    Here both sides explode each interval to the fixed-width time
    buckets it covers, the join runs as an EQUI-join on (keys, bucket),
    and each overlapping pair survives from EXACTLY ONE bucket — the
    bucket containing ``greatest(a.start, b.start)``, which any
    overlapping pair shares — so no post-join dedup is needed. Choose
    ``bucket`` (in the interval columns' own units; default 30 min of
    epoch-µs) near the typical interval length: explode factor is
    ``len/bucket + 1`` per row, shuffle stays linear, and a pair is
    inspected once. Interval columns must be NON-NEGATIVE numerics
    (epoch_us() for timestamps; `div` truncates toward zero, so
    negative epochs would mis-bucket) and start <= end is the caller's
    contract.
    """
    by = [by] if isinstance(by, str) else list(by or [])
    dup = set(a.columns) & set(b.columns) - set(by)
    if dup:
        raise ValueError(f"overlapping non-key columns: {sorted(dup)}")
    taken = {"__bucket"} & (set(a.columns) | set(b.columns))
    if taken:
        # withColumn would silently overwrite it and corrupt the join
        raise ValueError(f"reserved internal column name in input: {sorted(taken)}")

    def exploded(df: DataFrame, s: str, e: str) -> DataFrame:
        # integer `div`, not double division: exact for any 64-bit epoch
        # scale (double rounds above 2^53, e.g. nanosecond epochs)
        return df.withColumn(
            "__bucket",
            F.explode(
                F.sequence(
                    F.expr(f"`{s}` div {bucket}"), F.expr(f"`{e}` div {bucket}")
                )
            ),
        )

    ea = exploded(a, a_start, a_end)
    eb = exploded(b, b_start, b_end)
    joined = ea.join(eb, [*by, "__bucket"])
    first_shared = F.expr(f"greatest(`{a_start}`, `{b_start}`) div {bucket}")
    return (
        joined.filter(
            (F.col(a_start) <= F.col(b_end))
            & (F.col(b_start) <= F.col(a_end))
            & (F.col("__bucket") == first_shared)
        )
        .drop("__bucket")
    )
