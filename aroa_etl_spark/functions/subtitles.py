"""Subtitle (SRT) cue parsing — the text track of the video modality:
video corpora ship captions as SubRip files, and caption text is
first-class training data (aligned, timestamped, dense dialogue).

Spark disposition: PURE column expressions — cue blocks split on blank
lines, posexplode keeps document order, index/timestamps/text come
from regexp extracts, millisecond arithmetic is exact integers.  No
UDF anywhere, so the whole parse is whole-stage codegen and
oracle-replayable.

Malformed cue blocks (no timing line) surface with NULL start/end
rather than being silently dropped — the caller decides whether to
filter (report, don't guess)."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["parse_srt"]

_TS = r"(\d{2}):(\d{2}):(\d{2})[,.](\d{3})"


def _ms(cue, base_group: int):
    """start/end milliseconds from the timing line: the four capture
    groups of one timestamp, combined in exact integer arithmetic."""
    full = rf"{_TS}\s*-->\s*{_TS}"

    def g(i):
        return F.regexp_extract(cue, full, i)

    h, m, s, ms = (g(base_group + j) for j in range(4))
    return F.when(
        g(1) != "",
        h.cast("long") * 3_600_000
        + m.cast("long") * 60_000
        + s.cast("long") * 1_000
        + ms.cast("long"),
    ).otherwise(F.lit(None).cast("long"))


def parse_srt(
    df: DataFrame, text_col: str, *, id_col: str = "doc_id"
) -> DataFrame:
    """One row per cue: (id_col, cue_index int, start_ms, end_ms,
    duration_ms long, cue_text string — internal line breaks folded to
    single spaces).  cue_index is the DECLARED SubRip counter (files
    in the wild renumber and skip; reporting the declared value keeps
    gaps visible), NULL when the block carries none."""
    cue = F.col("__cue")
    # a UTF-8 BOM (the default from many Windows subtitle tools) would
    # defeat the ^-anchored counter/body regexes for the FIRST cue and
    # leak the counter+timing lines into its text (review finding)
    debommed = F.regexp_replace(F.col(text_col), "^\ufeff", "")
    exploded = (
        df.select(
            id_col,
            F.posexplode(
                F.split(debommed, r"\r?\n[ \t]*\r?\n")
            ).alias("__pos", "__cue"),
        )
        .where(F.trim(cue) != "")
    )
    idx = F.regexp_extract(cue, r"^\s*(\d+)\s*\r?\n", 1)
    start = _ms(cue, 1)
    end = _ms(cue, 5)
    # drop the counter line (if present) and the timing line; fold the
    # remaining lines into one space-separated string
    body = F.regexp_replace(cue, r"^\s*\d+\s*\r?\n", "")
    body = F.regexp_replace(body, r"^[^\n]*-->[^\n]*(\r?\n|$)", "")
    text = F.trim(F.regexp_replace(body, r"\s*\r?\n\s*", " "))
    return exploded.select(
        id_col,
        F.when(idx != "", idx.cast("int")).otherwise(
            F.lit(None).cast("int")
        ).alias("cue_index"),
        start.alias("start_ms"),
        end.alias("end_ms"),
        (end - start).alias("duration_ms"),
        text.alias("cue_text"),
    )
