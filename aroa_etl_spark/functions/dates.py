"""Partial-date expression library (SURVEY §2.8 D-family).

Dates here are NOT Spark DateType: partial dates are first-class —
``0000`` year / ``00`` month/day mean "unknown part" and all validity
and comparison logic treats 0 as "skip". Everything compiles to
when/regexp chains (whole-stage codegen), no Python row loops.

Semantics re-expressed from the reference
(attribute_processing/column_processing.py:489-1031 normalise_date /
clean_date, aux_functions.py:96-134,451-519 helpers).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from aroa_etl_spark.functions.cleaning import (
    NAME_SEMICOLON_TRANSFORMATION,
    clean_copy,
    create_qa_col,
)

DIGIT_4_YEAR = r"^[12][0-9]{3}$"
DATE_SPLIT = r"(\.\s*|\/|,\s*|\s+|\s|;|(?<=[0-9])(-)(?=[0-9]))+"
NO_DOUBLE_ZEROS_MD = r"^0+(?=[0-9]{2})"
NO_DOUBLE_ZEROS_Y = r"^0+(?=[0-9]{4})"
AGE_HINT = r"(y|j|J)|age"  # any y/j/J letter or 'age' ⇒ an age, not a date


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def _s(col: Column | str) -> Column:
    return F.coalesce(_c(col).cast("string"), F.lit(""))


# ---------------------------------------------------------------------------
# D3: digit-run → separated date
# ---------------------------------------------------------------------------

def date_integer_separator(col: Column | str) -> Column:
    """'01021930' → '01;02;1930' (aux_functions.py:96-103): strip
    non-digits, cut at 2 and 4."""
    d = F.regexp_replace(_s(col), r"[^0-9]", "")
    return F.concat_ws(
        ";", F.substring(d, 1, 2), F.substring(d, 3, 2), F.substring(d, 5, 10)
    )


# ---------------------------------------------------------------------------
# D4: per-part validity QA
# ---------------------------------------------------------------------------

def date_validity_qa(col: Column | str, lower: int, upper: int) -> Column:
    """Numeric + in-range check (aux_functions.py:108-134): pure digits →
    flag when outside [lower, upper] (0 exempt); any non-digit content →
    flag; empty → no flag."""
    c = _s(col)
    i = c.try_cast("bigint")
    return F.coalesce(
        F.when(
            c.rlike(r"^[0-9]+$"),
            F.when(i == 0, F.lit(False)).otherwise((i < lower) | (i > upper)),
        ).otherwise(F.length(c) > 0),
        F.lit(False),
    )


# ---------------------------------------------------------------------------
# D5: day/month swap repair
# ---------------------------------------------------------------------------

def _both_numeric(day: Column, month: Column) -> Column:
    return day.rlike(r"^[0-9]+$") & month.rlike(r"^[0-9]+$")


def day_swap(day: Column | str, month: Column | str) -> Column:
    """If month holds 13..31 and day ≤ 12, the writer swapped them: take
    month as the day (aux_functions.py:451-483)."""
    d, m = _s(day), _s(month)
    di, mi = d.try_cast("bigint"), m.try_cast("bigint")
    return F.when(
        _both_numeric(d, m) & (mi > 12) & (mi < 32) & (di <= 12), m
    ).otherwise(d)


def month_swap(day: Column | str, month: Column | str) -> Column:
    """Counterpart of day_swap (aux_functions.py:487-519)."""
    d, m = _s(day), _s(month)
    di, mi = d.try_cast("bigint"), m.try_cast("bigint")
    return F.when(_both_numeric(d, m) & (mi > 12) & (di <= 12), d).otherwise(m)


# ---------------------------------------------------------------------------
# D1: free-text date → (year, month, day, qa) columns
# ---------------------------------------------------------------------------

# The pipeline (order preserved from the reference,
# column_processing.py:489-766): clean → '?' QA → year-only completion
# ('1943' → '0.0.1943') → 6/8-digit splitting → separator
# canonicalization → age-string blanking → split day-first →
# digit-strip → 2-digit-year century rule (≥50→18xx else 19xx) →
# zero-pad → leading-zero canonicalization → day/month swap repair →
# range validity → all-or-nothing completeness QA → int64 guard.
#
# Each stage is a small Column→Column function. `normalise_date_frame`
# (the hot path, and the df-in/df-out shape the reference itself has)
# applies them as CHAINED PROJECTIONS so every stage references the
# previous stage's attribute: Catalyst's CollapseProject refuses to
# inline a non-cheap alias referenced more than once, so the analyzed
# tree stays linear in stage count. Composing the same stages as one
# nested expression (`normalise_date`) multiplies the subtree by ~3 per
# `when(cond(c), f(c)).otherwise(c)` stage — a ~10^5-node tree that
# costs over a minute of driver-side analysis/codegen regardless of
# data size (measured flat from sf0.001 to sf0.01).

_ND_PRE_STAGES = [
    # year-only dates: '1943' → '0.0.1943'
    lambda c: F.when(c.rlike(DIGIT_4_YEAR), F.concat(F.lit("0.0."), c)).otherwise(c),
    # separator-free 6/8-digit runs → separated. Deliberate divergence:
    # the reference fires this whenever the DIGIT COUNT is 6/8 even if
    # separators are present, mangling '9.4.1900' → '94;19;00'
    # (column_processing.py:543-553); we implement its stated intent
    # ("in case separators were not given") by requiring an all-digit cell.
    lambda c: F.when(
        c.rlike(r"^[0-9]{6}$|^[0-9]{8}$"), date_integer_separator(c)
    ).otherwise(c),
    # separators → ';' (noble-guarded regex reused by the reference), collapse
    lambda c: F.regexp_replace(F.trim(c), NAME_SEMICOLON_TRANSFORMATION, ";"),
    lambda c: F.regexp_replace(F.trim(c), r";{2,}", ";"),
    # '23 Jahre' / '45 yrs' is an age, not a date → blank
    lambda c: F.when(c.rlike(AGE_HINT), F.lit("")).otherwise(c),
    # canonical '.' separators before the day-first split
    lambda c: F.regexp_replace(F.trim(c), DATE_SPLIT, "."),
]


def _nd_part(parts: Column, i: int) -> Column:
    raw = F.coalesce(F.trim(F.try_element_at(parts, F.lit(i))), F.lit(""))
    # '-' runs and any non-digit content are dropped (keeps digits only)
    return F.regexp_replace(raw, r"[^0-9]", "")


def _nd_year_century(year: Column) -> Column:
    # 2-digit year → century rule (birth-date flavor): ≥50 → 18xx, else 19xx
    return F.when(
        F.length(year) == 2,
        F.concat(F.when(year.try_cast("int") >= 50, F.lit("18")).otherwise(F.lit("19")), year),
    ).otherwise(year)


def _nd_pad(x: Column) -> Column:
    # zero-pad single digits: '3' → '03'
    return F.when(F.length(x) == 1, F.concat(F.lit("0"), x)).otherwise(x)


def _nd_outputs(
    day: Column,
    month: Column,
    year: Column,
    qa_question: Column,
    output_name: str,
    timespan: tuple[int, int],
    data_source: str,
) -> dict[str, Column]:
    """Final assembly from canonicalized (ideally materialized) parts."""
    # swap repair (both derived from the PRE-swap pair)
    day_c = day_swap(day, month)
    month_c = month_swap(day, month)
    # (the reference then maps month NAMES to numbers; at this point in its
    # own pipeline all letters are already stripped, so that step cannot
    # fire — not reproduced)

    qa = (
        qa_question
        | date_validity_qa(day_c, 0, 31)
        | date_validity_qa(month_c, 0, 12)
        | date_validity_qa(year, timespan[0], timespan[1])
    )

    # all-or-nothing completeness: mixed filled/empty parts → QA
    d_e, m_e, y_e = (F.length(day_c) == 0), (F.length(month_c) == 0), (F.length(year) == 0)
    complete = (d_e == m_e) & (d_e == y_e)
    qa = qa | ~complete

    # int64 guard: digit runs ≥ 10 can't survive downstream BigQuery int64
    def guard(x: Column) -> Column:
        return F.regexp_replace(x, r"[0-9]{10,}", "")

    return {
        f"{output_name}_year_cleaned": guard(year),
        f"{output_name}_month_cleaned": guard(month_c),
        f"{output_name}_day_cleaned": guard(day_c),
        f"{output_name}_qa": qa,
        f"{output_name}_data_source": F.lit(data_source),
    }


def normalise_date_frame(
    df,
    col: Column | str,
    output_name: str,
    timespan: tuple[int, int] = (1850, 1950),
    data_source: str = "crowd_sourcing",
):
    """One free-text date column → df plus ``{out}_year/_month/_day_cleaned``
    + ``{out}_qa`` + ``{out}_data_source`` (column_processing.py:489-766;
    pipeline documented above). THE production path: staged projections
    keep Catalyst analysis linear; semantics identical to
    `normalise_date`."""
    t = f"__nd_{output_name}"
    qaq, td, tm, ty = f"{t}_qaq", f"{t}_d", f"{t}_m", f"{t}_y"
    df = df.withColumn(t, clean_copy(_s(col)))
    df = df.withColumn(qaq, create_qa_col(F.col(t), r"\?", r"^-$|nan"))
    for stage in _ND_PRE_STAGES:
        df = df.withColumn(t, stage(F.col(t)))
    parts = F.split(F.col(t), r"\.", 3)
    df = df.withColumns(
        {td: _nd_part(parts, 1), tm: _nd_part(parts, 2), ty: _nd_part(parts, 3)}
    )
    df = df.withColumns(
        {
            td: F.regexp_replace(_nd_pad(F.col(td)), NO_DOUBLE_ZEROS_MD, ""),
            tm: F.regexp_replace(_nd_pad(F.col(tm)), NO_DOUBLE_ZEROS_MD, ""),
            ty: F.regexp_replace(_nd_year_century(F.col(ty)), NO_DOUBLE_ZEROS_Y, ""),
        }
    )
    out = _nd_outputs(
        F.col(td), F.col(tm), F.col(ty), F.col(qaq),
        output_name, timespan, data_source,
    )
    return df.withColumns(out).drop(t, qaq, td, tm, ty)


def normalise_date(
    col: Column | str,
    output_name: str,
    timespan: tuple[int, int] = (1850, 1950),
    data_source: str = "crowd_sourcing",
) -> dict[str, Column]:
    """Single-expression form of `normalise_date_frame` (same stages,
    same outputs) for composing over ad-hoc expressions. WARNING: the
    nested tree costs >60 s of driver-side analysis regardless of row
    count — every hot path must use `normalise_date_frame`."""
    c = clean_copy(_s(col))
    qa_question = create_qa_col(c, r"\?", r"^-$|nan")
    for stage in _ND_PRE_STAGES:
        c = stage(c)
    parts = F.split(c, r"\.", 3)
    day = F.regexp_replace(_nd_pad(_nd_part(parts, 1)), NO_DOUBLE_ZEROS_MD, "")
    month = F.regexp_replace(_nd_pad(_nd_part(parts, 2)), NO_DOUBLE_ZEROS_MD, "")
    year = F.regexp_replace(
        _nd_year_century(_nd_part(parts, 3)), NO_DOUBLE_ZEROS_Y, ""
    )
    return _nd_outputs(day, month, year, qa_question, output_name, timespan, data_source)


# ---------------------------------------------------------------------------
# D2: three-column (dropdown) date clean
# ---------------------------------------------------------------------------

def clean_date(
    day_col: Column | str,
    month_col: Column | str,
    year_col: Column | str,
    output_name: str,
    timespan: tuple[int, int] = (1850, 1950),
    dropdown: bool = True,
    data_source: str = "crowd_sourcing",
) -> dict[str, Column]:
    """Three pre-separated date columns → cleaned family
    (column_processing.py:808-1031). '-' → '00' placeholders; everything
    blanked unless a full 4-digit year is present; same validity +
    completeness QA as normalise_date."""
    day, month, year = _s(day_col), _s(month_col), _s(year_col)

    qa = (
        create_qa_col(day, r"unclear", r"^-$")
        | create_qa_col(month, r"unclear", r"^-$")
        | create_qa_col(year, r"unclear", r"^-$")
    )

    if dropdown:
        # dropdown month renders as '08 - August' → keep the leading digits
        month = F.when(month.rlike(r"^[0-9]"), F.substring(month, 1, 2)).otherwise(month)
    else:
        for pat, repl in MONTH_NAME_TO_NUM:
            month = F.regexp_replace(F.lower(month), pat, repl)

    def canon(x: Column) -> Column:
        x = F.trim(x)
        x = F.regexp_replace(x, r"(\.0)", "")  # float artifacts '8.0' → '8'
        x = F.regexp_replace(x, r"[-]", "00")  # '-' placeholder → '00'
        return F.regexp_replace(x, r"[^0-9]", "")

    day, month, year = canon(day), canon(month), canon(year)

    if not dropdown:
        year = F.when(
            F.length(year) == 2,
            F.concat(
                F.when(year.try_cast("int") >= 50, F.lit("18")).otherwise(F.lit("19")), year
            ),
        ).otherwise(year)
        day = F.when(F.length(day) == 1, F.concat(F.lit("0"), day)).otherwise(day)
        month = F.when(F.length(month) == 1, F.concat(F.lit("0"), month)).otherwise(month)

    qa = (
        qa
        | date_validity_qa(day, 0, 31)
        | date_validity_qa(month, 0, 12)
        | date_validity_qa(year, timespan[0], timespan[1])
    )

    # a date without a full 4-digit year is no date at all
    has_year = F.length(year) == 4
    day = F.when(has_year, day).otherwise(F.lit(""))
    month = F.when(has_year, month).otherwise(F.lit(""))
    year = F.when(has_year, year).otherwise(F.lit(""))

    d_e, m_e, y_e = (F.length(day) == 0), (F.length(month) == 0), (F.length(year) == 0)
    qa = qa | ~((d_e == m_e) & (d_e == y_e))

    return {
        f"{output_name}_year_cleaned": year,
        f"{output_name}_month_cleaned": month,
        f"{output_name}_day_cleaned": day,
        f"{output_name}_qa": qa,
        f"{output_name}_data_source": F.lit(data_source),
    }


MONTH_NAME_TO_NUM = [
    (r"jan[a-z]*", "01"),
    (r"feb[a-z]*", "02"),
    (r"(mär[a-z]*)|(mar[a-z]*)|(maer[a-z]*)", "03"),
    (r"a.ril", "04"),
    (r"ma[a-z]*|peut", "05"),
    (r"(jun[a-z]*)|(juin)", "06"),
    (r"jul[a-z]*|juil[a-z]*", "07"),
    (r"aug[a-z]*|ao[a-z]*", "08"),
    (r"sep[a-z]*", "09"),
    (r"o[ck]t[a-z]*", "10"),
    (r"nov[a-z]*", "11"),
    (r"d.c[a-z]*", "12"),
]


# ---------------------------------------------------------------------------
# D6: date ordering check
# ---------------------------------------------------------------------------

def date_timing_check(
    y1: Column | str,
    m1: Column | str,
    d1: Column | str,
    y2: Column | str,
    m2: Column | str,
    d2: Column | str,
) -> tuple[Column, Column]:
    """(timing, timing_qa): is date1 ≤ date2, comparing y/m/d as ints with
    0/'unknown' parts skipped (aux_functions.py:337-408, re-expressed as
    one when-chain instead of the reference's iterrows loop)."""

    def i(c: Column | str) -> Column:
        s = _s(c)
        return F.when(s.rlike(r"^[0-9]+$"), s.try_cast("bigint")).otherwise(F.lit(None))

    iy1, im1, id1 = i(y1), i(m1), i(d1)
    iy2, im2, id2 = i(y2), i(m2), i(d2)

    any_non_numeric = (
        iy1.isNull() | im1.isNull() | id1.isNull() | iy2.isNull() | im2.isNull() | id2.isNull()
    )

    # pack into comparable ints, 0-parts (unknown) compare equal via 0
    p1 = iy1 * 10000 + im1 * 100 + id1
    p2 = iy2 * 10000 + im2 * 100 + id2
    years_known = (iy1 > 0) & (iy2 > 0)

    timing = F.when(any_non_numeric | ~years_known, F.lit(True)).otherwise(p1 <= p2)
    timing_qa = F.coalesce(any_non_numeric | (~timing), F.lit(True))
    return timing, F.coalesce(timing_qa, F.lit(True))


# ---------------------------------------------------------------------------
# D8: packed-date helpers for matching
# ---------------------------------------------------------------------------

def pack_yyyymmdd(
    year: Column | str, month: Column | str, day: Column | str
) -> Column:
    """(y,m,d) strings → 'yyyymmdd' with 0-fill for unknown parts (the
    matching pipeline's packed form, run-matching.py:38-41)."""
    y = F.lpad(F.when(_s(year) == "", "0").otherwise(_s(year)), 4, "0")
    m = F.lpad(F.when(_s(month) == "", "0").otherwise(_s(month)), 2, "0")
    d = F.lpad(F.when(_s(day) == "", "0").otherwise(_s(day)), 2, "0")
    return F.concat(y, m, d)


def parse_date_parts(col: Column | str) -> Column:
    """'yyyymmdd' or 'dd.mm.yyyy' → struct(year int, month int, day int)
    with 0 for unknown (similarity_measures.py:31-42)."""
    c = _s(col)
    packed = c.rlike(r"^[0-9]{8}$")
    dotted = c.rlike(r"^[0-9]{1,2}\.[0-9]{1,2}\.[0-9]{4}$")
    y = (
        F.when(packed, F.substring(c, 1, 4))
        .when(dotted, F.regexp_extract(c, r"\.([0-9]{4})$", 1))
        .otherwise(F.lit("0"))
    )
    m = (
        F.when(packed, F.substring(c, 5, 2))
        .when(dotted, F.regexp_extract(c, r"^[0-9]{1,2}\.([0-9]{1,2})\.", 1))
        .otherwise(F.lit("0"))
    )
    d = (
        F.when(packed, F.substring(c, 7, 2))
        .when(dotted, F.regexp_extract(c, r"^([0-9]{1,2})\.", 1))
        .otherwise(F.lit("0"))
    )
    return F.struct(
        y.cast("int").alias("year"), m.cast("int").alias("month"), d.cast("int").alias("day")
    )


# ---------------------------------------------------------------------------
# D9: LLM-output date repair (KI-indexing pipeline)
# ---------------------------------------------------------------------------

def llm_repair_date(col: Column | str) -> Column:
    """Part-wise repair of an LLM-transcribed 'dd.mm.yyyy' string —
    standalone port of ``repair_date`` (indizierung.ipynb cell 18).

    - any letter → '00000000'; not exactly three '.'-parts → '0000000'
      (the reference's seven-zero quirk, kept faithfully)
    - day: 1-2 digits and ≤ 31, else '00'
    - month: 1-2 digits and ≤ 12, else '00'
    - year: 3 digits → ×10 if that lands in (1855, 1954);
      4 digits → kept if in range, else the OCR century fix tries
      +800 then +900 (misread '1' → transcripts like '1089' for 1889);
      anything else → '0000'

    Divergence: parts with non-digit symbols ('-3') repair to '00'/'0000'
    instead of crashing the way ``int()`` would in the reference.
    Null input → '00000000' (str(nan) contains letters in the reference).
    """
    c = _s(col)
    parts = F.split(c, r"\.")

    def pp_dm(i: int, cap: int) -> Column:
        p = F.coalesce(F.try_element_at(parts, F.lit(i)), F.lit(""))
        ok = p.rlike(r"^[0-9]{1,2}$") & (p.try_cast("int") <= cap)
        return F.when(ok, p).otherwise(F.lit("00"))

    y = F.coalesce(F.try_element_at(parts, F.lit(3)), F.lit(""))
    yi = y.try_cast("int")
    y10 = yi * 10
    in_range = lambda v: (F.lit(1855) < v) & (v < F.lit(1954))  # noqa: E731
    year = (
        F.when(~y.rlike(r"^[0-9]{3,4}$"), F.lit("0000"))
        .when(F.length(y) == 3, F.when(in_range(y10), y10.cast("string")).otherwise("0000"))
        .when(in_range(yi), y)
        .when(in_range(yi + 800), (yi + 800).cast("string"))
        .when(in_range(yi + 900), (yi + 900).cast("string"))
        .otherwise(F.lit("0000"))
    )

    repaired = F.concat_ws(".", pp_dm(1, 31), pp_dm(2, 12), year)
    # null test on the RAW column — _s coalesces null to '' and the
    # reference distinguishes them (str(nan) has letters → 8 zeros)
    return (
        F.when(_c(col).isNull() | c.rlike(r"[a-zA-Z]"), F.lit("00000000"))
        .when(F.size(parts) != 3, F.lit("0000000"))
        .otherwise(repaired)
    )


def llm_convert_date_field(col: Column | str) -> Column:
    """'dd.mm.yyyy' → packed 'yyyymmdd' — standalone port of
    ``convert_date_field`` (indizierung.ipynb cell 18): not three parts
    or any non-[0-9.] character → '00000000'; 2-digit year ≤ 45 → 19xx
    else 18xx; other years outside 4 digits or [1845, 1945] → '0000';
    day/month left-padded to 2. Null → '' → '00000000'."""
    c = F.coalesce(_s(col), F.lit(""))
    parts = F.split(c, r"\.")
    bad = (F.size(parts) != 3) | c.rlike(r"[^0-9.]")

    dd = F.coalesce(F.try_element_at(parts, F.lit(1)), F.lit(""))
    mm = F.coalesce(F.try_element_at(parts, F.lit(2)), F.lit(""))
    yy = F.coalesce(F.try_element_at(parts, F.lit(3)), F.lit(""))

    yi = yy.try_cast("int")
    year = (
        F.when(
            F.length(yy) == 2,
            F.concat(F.when(yi <= 45, F.lit("19")).otherwise(F.lit("18")), yy),
        )
        .when((F.length(yy) != 4) | (yi < 1845) | (yi > 1945), F.lit("0000"))
        .otherwise(yy)
    )
    pad = lambda p: F.when(F.length(p) == 1, F.concat(F.lit("0"), p)).otherwise(p)  # noqa: E731
    return F.when(bad, F.lit("00000000")).otherwise(F.concat(year, pad(mm), pad(dd)))
