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


def parse_webvtt(
    df: DataFrame, text_col: str, *, id_col: str = "doc_id"
) -> DataFrame:
    """WebVTT cue parsing — the WEB-NATIVE caption format (YouTube,
    DASH/HLS sidecars): one row per cue with (id_col, cue_id string —
    WebVTT identifiers are arbitrary text, not counters — start_ms,
    end_ms, duration_ms, cue_text, settings string).  Differences from
    SubRip handled per spec: the mandatory WEBVTT header block (with
    optional trailing metadata on the same block) is dropped, NOTE /
    STYLE / REGION blocks are filtered out, timestamps use dot
    milliseconds with an OPTIONAL hours field, and the timing line may
    carry cue settings after the end timestamp (preserved verbatim in
    ``settings``).  Same discipline as :func:`parse_srt`: pure
    posexplode/regexp/integer expressions, BOM stripped, malformed
    cue blocks surface with NULL timing."""
    ts_opt_h = r"(?:(\d{2,}):)?(\d{2}):(\d{2})\.(\d{3})"
    timing = rf"{ts_opt_h}[ \t]*-->[ \t]*{ts_opt_h}[ \t]*(.*)"

    debommed = F.regexp_replace(F.col(text_col), "^﻿", "")
    cue = F.col("__cue")
    exploded = (
        df.select(
            id_col,
            F.posexplode(
                F.split(debommed, r"\r?\n[ \t]*\r?\n")
            ).alias("__pos", "__cue"),
        )
        .where(F.trim(cue) != "")
        # header block + comment/metadata blocks are not cues
        .where(~cue.rlike(r"^﻿?(WEBVTT|NOTE|STYLE|REGION)\b"))
    )

    def ms(base: int):
        # groups: base+0 = optional hours, base+1 = minutes (always
        # present when the timing line matched), +2 seconds, +3 millis
        def g(i):
            return F.regexp_extract(cue, timing, i)

        h, m, s, mmm = (g(base + j) for j in range(4))
        return F.when(
            m != "",
            F.when(h != "", h.cast("long")).otherwise(F.lit(0)) * 3_600_000
            + m.cast("long") * 60_000
            + s.cast("long") * 1_000
            + mmm.cast("long"),
        ).otherwise(F.lit(None).cast("long"))

    start = ms(1)
    end = ms(5)
    settings = F.regexp_extract(cue, timing, 9)
    # the optional identifier is any first line NOT containing '-->'
    cue_id = F.regexp_extract(cue, r"^([^\n]*)\r?\n[^\n]*-->", 1)
    body = F.regexp_replace(cue, r"^[^\n]*\r?\n(?=[^\n]*-->)", "")
    body = F.regexp_replace(body, r"^[^\n]*-->[^\n]*(\r?\n|$)", "")
    text = F.trim(F.regexp_replace(body, r"\s*\r?\n\s*", " "))
    return exploded.select(
        id_col,
        F.when(F.trim(cue_id) != "", F.trim(cue_id))
        .otherwise(F.lit(None).cast("string")).alias("cue_id"),
        start.alias("start_ms"),
        end.alias("end_ms"),
        (end - start).alias("duration_ms"),
        text.alias("cue_text"),
        F.when(F.trim(settings) != "", F.trim(settings))
        .otherwise(F.lit(None).cast("string")).alias("settings"),
    )
