"""Chat-transcript operators for instruction-tuning corpora.

Post-training data arrives as JSON conversations (role/content turn
lists); the curation questions are structural — does the transcript
alternate roles, does it end on an assistant turn, how many exchanges,
how long — and the training step wants ONE flattened text per
conversation under a fixed turn template.  All of it is pure column
expressions over ``from_json`` + higher-order array functions: no
Python in the hot path, schema declared once, malformed JSON rows get
NULL turns (flagged, never dropped silently).

Reference analogue: none (the reference predates instruction data);
extension inventory SURVEY §2.11, same tier as the tdp_* curation
family.

Scale: narrow per-row expressions — no shuffle at all until the caller
aggregates; a 100 TB transcript corpus flattens embarrassingly
parallel.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = [
    "TURNS_SCHEMA",
    "parse_turns",
    "chat_stats",
    "flatten_turns",
]

TURNS_SCHEMA = "array<struct<role: string, content: string>>"


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def parse_turns(json_col: Column | str) -> Column:
    """JSON conversation -> array<struct<role, content>>; malformed
    JSON yields NULL (from_json's contract) so corruption is visible,
    not silently zero-turn."""
    return F.from_json(_c(json_col), TURNS_SCHEMA)


def chat_stats(turns: Column | str) -> Column:
    """Structural stats struct over a turns array:

    - ``n_turns`` / ``n_user`` / ``n_assistant``
    - ``alternates``: no two consecutive turns share a role
    - ``ends_assistant``: the training-complete shape (a dangling user
      turn means the label is missing)
    - ``content_chars``: total content length

    All pure higher-order expressions; NULL turns (malformed JSON)
    propagate NULL stats."""
    t = _c(turns)
    n = F.size(t)
    return F.when(t.isNull(), F.lit(None)).otherwise(
        F.struct(
            n.cast("int").alias("n_turns"),
            F.size(F.filter(t, lambda x: x["role"] == "user"))
            .cast("int")
            .alias("n_user"),
            F.size(F.filter(t, lambda x: x["role"] == "assistant"))
            .cast("int")
            .alias("n_assistant"),
            F.when(
                n <= 1, F.lit(True)
            ).otherwise(
                F.forall(
                    F.transform(
                        F.sequence(F.lit(1), n - 1),
                        lambda i: F.element_at(t, i + 1)["role"]
                        != F.element_at(t, i)["role"],
                    ),
                    lambda ok: ok,
                )
            ).alias("alternates"),
            # 0-based get() is NULL-safe on the empty array (ANSI
            # element_at(-1) throws there); empty -> not complete
            F.coalesce(
                F.get(t, n - 1)["role"] == F.lit("assistant"), F.lit(False)
            ).alias("ends_assistant"),
            F.aggregate(
                t,
                F.lit(0).cast("bigint"),
                lambda acc, x: acc + F.length(x["content"]),
            ).alias("content_chars"),
        )
    )


def flatten_turns(
    turns: Column | str,
    *,
    prefix: str = "<|",
    suffix: str = "|>",
    sep: str = "\n",
) -> Column:
    """One training text per conversation under the fixed template
    ``<|role|>content`` joined by ``sep`` — the flattening step before
    tokenization.  NULL turns stay NULL."""
    t = _c(turns)
    return F.array_join(
        F.transform(
            t,
            lambda x: F.concat(
                F.lit(prefix), x["role"], F.lit(suffix), x["content"]
            ),
        ),
        sep,
    )
