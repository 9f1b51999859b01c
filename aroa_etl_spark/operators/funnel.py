"""Ordered-funnel analysis over an event stream.

``funnel_counts`` computes, for an ordered list of step event-types,
how many users reached each step IN ORDER: a user reaches step i at the
earliest event of that type at-or-after the time they reached step
i-1. This is the sequential-pattern primitive behind conversion
funnels, and (with steps = pipeline stages) behind data-pipeline
progress audits.

Plan shape: events are filtered to the step types (pushed to the scan),
then ONE groupBy on the user key collects the per-user (ts, type)
events sorted; each step's reach-time is a staged narrow projection
folding over that array (`array_min` of a filtered transform — native
higher-order functions, no Python). One shuffle total regardless of
step count; the per-user array is bounded by that user's step-type
events (heavy users are data skew, absorbed by AQE, not a cross
product). The staged projections follow the repo's analysis-cost rule:
each reach-time is materialized as a named column so the expression
tree stays linear in the number of steps.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["funnel_counts", "user_funnel_times"]


def user_funnel_times(
    events: DataFrame,
    user_col: str,
    type_col: str,
    ts_col: str,
    steps: Sequence[str],
    max_gap=None,
) -> DataFrame:
    """(user, t_1 .. t_k): the time each user reached each step, NULL
    from the first step not reached. t_i = min ts of a step-i event with
    ts >= t_{i-1} (same-timestamp progress allowed). ``max_gap``
    additionally requires ts <= t_{i-1} + max_gap (same units as the
    timestamp column's ordering — e.g. a datetime.timedelta for
    timestamps, an integer for epoch numerics): the conversion-window
    contract real funnels use ("purchased within 7 days of clicking")."""
    if not steps:
        raise ValueError("funnel needs at least one step")
    evs = (
        events.filter(F.col(type_col).isin(list(steps)))
        .groupBy(user_col)
        .agg(
            F.array_sort(
                F.collect_list(F.struct(F.col(ts_col).alias("ts"), F.col(type_col).alias("t")))
            ).alias("__evs")
        )
    )
    out = evs
    prev: str | None = None
    for i, step in enumerate(steps, start=1):
        cond_prev = F.col(prev).isNotNull() if prev else F.lit(True)
        # factory binds step/prev eagerly; the gate itself must stay
        # UNARY — F.filter treats a 2-arg function as (element, index)
        def _make_gate(step_, prev_):
            def gate(x):
                if prev_ is None:
                    return x["t"] == step_
                cond = (x["t"] == step_) & (x["ts"] >= F.col(prev_))
                if max_gap is not None:
                    cond = cond & (x["ts"] <= F.col(prev_) + F.lit(max_gap))
                return cond

            return gate

        gate = _make_gate(step, prev)
        col = F.when(
            cond_prev,
            F.array_min(F.transform(F.filter("__evs", gate), lambda x: x["ts"])),
        ).alias(f"t_{i}")
        out = out.select("*", col)  # staged: keeps the expr tree linear
        prev = f"t_{i}"
    return out.drop("__evs")


def funnel_counts(
    events: DataFrame,
    user_col: str,
    type_col: str,
    ts_col: str,
    steps: Sequence[str],
    max_gap=None,
) -> DataFrame:
    """(step_idx, step, n_users) — users reaching each step in order
    (optionally within ``max_gap`` of the previous step). Monotone
    non-increasing down the funnel by construction."""
    times = user_funnel_times(events, user_col, type_col, ts_col, steps, max_gap)
    wide = times.agg(
        *[
            F.sum(F.when(F.col(f"t_{i}").isNotNull(), 1).otherwise(0))
            .cast("bigint")
            .alias(f"n_{i}")
            for i in range(1, len(steps) + 1)
        ]
    )
    stack = F.expr(
        "stack({n}, {pairs}) as (step_idx, step, n_users)".format(
            n=len(steps),
            pairs=", ".join(
                "{}, '{}', n_{}".format(
                    i, s.replace("\\", "\\\\").replace("'", "''"), i
                )
                for i, s in enumerate(steps, start=1)
            ),
        )
    )
    return wide.select(stack).select(
        F.col("step_idx").cast("bigint").alias("step_idx"),
        "step",
        "n_users",
    )
