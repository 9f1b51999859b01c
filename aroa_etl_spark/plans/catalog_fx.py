"""Driver-checkable catalog entries for the §2.8 expression library
(F-family cleaning/transliteration, D-family partial dates).

These queries run the REAL engine expressions (functions/cleaning.py,
functions/translit.py, functions/dates.py) over driver tables, with two
oracle styles:

- *mechanism mirror* (f_*): the DuckDB SQL replays the same regex chain.
  Spark regexes are Java-dialect; DuckDB is RE2 (no lookaround, no
  pattern backrefs), so only RE2-expressible chains are mirrored and the
  few non-RE2 constructs are emulated with replacement-backref forms
  proven equivalent on this corpus (see inline notes). The corpus is
  ASCII with a fixed vocabulary (verified: zero non-ASCII rows, no
  'ueue' sequences), and the non-ASCII content is PLANTED by the query
  itself, so the emulations are exact here.
- *arithmetic model* (d_*): inputs are date strings GENERATED from row
  integers, so the expected (year, month, day, qa) are computable in
  plain SQL CASE arithmetic. This checks the whole regex pipeline
  against an independent model — stronger than a mechanism mirror.

Reference parity targets: column_processing.py:489-1031 (dates),
aux_functions.py:11-142 (clean/QA/keyword), string_utils.py:34-205
(transliteration).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from aroa_etl_spark.functions import cleaning as C
from aroa_etl_spark.functions import dates as D
from aroa_etl_spark.functions import translit as T
from aroa_etl_spark.plans.catalog import query
from aroa_etl_spark.session import load_tables


def _sq(pat: str) -> str:
    """Inline a regex as a DuckDB single-quoted literal."""
    return "'" + pat.replace("'", "''") + "'"


# ---------------------------------------------------------------------------
# F1/F2/F9: clean_copy + QA flags  (mechanism mirror; all patterns RE2-safe)
# ---------------------------------------------------------------------------

# the planted dirty text: leading blanks, separator junk, no-entry words,
# unclear words, '"' deletions — exercises every clean_copy vocabulary.
_DIRTY_SPARK = lambda: F.concat(  # noqa: E731
    F.lit("  "),
    F.substring("text", 1, 25),
    F.lit(' / unknown, none "x" (illegible) '),
    F.substring("text", 26, 12),
    F.lit(" xxx  "),
)
_DIRTY_SQL = (
    "'  ' || substr(text, 1, 25) || ' / unknown, none \"x\" (illegible) ' || "
    "substr(text, 26, 12) || ' xxx  '"
)

def _clean_copy_sql(x: str) -> str:
    out = f"trim({x})"
    for pat, repl in [
        (C.DASH_WORDS, "-"),
        (C.DELETED_WORDS, ""),
        (C.QUESTION_MARK_WORDS, "?"),
        (C.SEMICOLON_WORDS, ";"),
        (r";+", ";"),
        (r"^\s*;\s*|\s*;\s*$|^\s+|\s+$|[\n\t]*", ""),
        (r"-+", "-"),
    ]:
        out = f"regexp_replace({out}, {_sq(pat)}, '{repl}', 'g')"
    return out


_CLEAN_CHAIN_SQL = _clean_copy_sql("{x}")


@query(
    "f_clean_copy_qa",
    oracle=f"""
    WITH c AS (SELECT doc_id, {_CLEAN_CHAIN_SQL.format(x=_DIRTY_SQL)} AS cleaned
               FROM documents)
    SELECT doc_id, cleaned,
           COALESCE(regexp_matches(cleaned, {_sq(C.QA_REGEX)})
                    AND NOT regexp_matches(cleaned, {_sq(C.QA_NO_ENTRY_REGEX)}),
                    FALSE) AS qa,
           COALESCE(len(cleaned) > 49, FALSE) AS long_qa
    FROM c
    """,
)
def f_clean_copy_qa(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F1 clean_copy + F2 create_qa_col + F9 too_long_qa over planted
    dirty text (aux_functions.py:11-91, column_processing.py:198-200).
    The oracle replays the identical regex chain (all RE2-safe)."""
    docs = load_tables(spark, sf_dir, ("documents",))["documents"]
    cleaned = C.clean_copy(_DIRTY_SPARK())
    return docs.select(
        "doc_id",
        cleaned.alias("cleaned"),
        C.create_qa_col(cleaned).alias("qa"),
        C.too_long_qa(cleaned).alias("long_qa"),
    )


# ---------------------------------------------------------------------------
# F3/F4/F6 + title casing: keyword/title strip, birth-name extract
# ---------------------------------------------------------------------------

_T1_SQL = r"regexp_extract(text, '^(\S+)', 1)"
_T2_SQL = r"regexp_extract(text, '^\S+\s+(\S+)', 1)"


def _t1():
    return F.regexp_extract("text", r"^(\S+)", 1)


def _t2():
    return F.regexp_extract("text", r"^\S+\s+(\S+)", 1)


def _sql_initcap_words(e: str) -> str:
    """DuckDB initcap-by-whitespace mirror of Spark's F.initcap."""
    return (
        f"array_to_string(list_transform(string_split({e}, ' '), "
        "w -> upper(substr(w, 1, 1)) || lower(substr(w, 2, 100000))), ' ')"
    )


def _sql_title_case(e: str) -> str:
    """Mirror of functions/cleaning.py title_case: ';' segments →
    initcap → '-' parts → initcap again."""
    hy = (
        f"array_to_string(list_transform(string_split({_sql_initcap_words('seg')}, '-'), "
        f"h -> {_sql_initcap_words('h')}), '-')"
    )
    return (
        f"array_to_string(list_transform(string_split({e}, ';'), seg -> {hy}), ';')"
    )


_NAME_RAW_SQL = f"('Dr. frau ' || {_T1_SQL} || ' geb. ' || {_T2_SQL})"


@query(
    "f_name_extract",
    oracle=f"""
    WITH r AS (SELECT doc_id, {_NAME_RAW_SQL} AS raw FROM documents),
    e AS (SELECT doc_id,
                 regexp_replace(lower(raw), {_sq(C.KEY_WORDS)}, '', 'g') AS kw_removed,
                 regexp_replace(raw, {_sq(C.ACADEMIC_TITLE)}, '', 'g') AS no_title,
                 regexp_replace(regexp_replace(
                     regexp_extract(lower(raw), {_sq(C.BIRTH_NAME)}),
                     {_sq(C.BIRTH_NAME_CLEAN)}, '', 'g'),
                     {_sq(C.BIRTH_NAME)}, '', 'g') AS birth_raw
          FROM r)
    SELECT doc_id, kw_removed, no_title,
           {_sql_title_case("birth_raw")} AS birth_name
    FROM e
    """,
)
def f_name_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F3 keyword_removal + F4 strip_academic_titles + F6
    extract_birth_name (incl. title_case) over planted 'Dr. frau X geb.
    Y' names (aux_functions.py:139-142, column_processing.py:66-127)."""
    docs = load_tables(spark, sf_dir, ("documents",))["documents"]
    raw = F.concat(F.lit("Dr. frau "), _t1(), F.lit(" geb. "), _t2())
    return docs.select(
        "doc_id",
        C.keyword_removal(raw).alias("kw_removed"),
        C.strip_academic_titles(raw).alias("no_title"),
        C.extract_birth_name(raw).alias("birth_name"),
    )


# ---------------------------------------------------------------------------
# F13-F19: transliteration pipeline  (mechanism mirror with proven-equal
# emulations for the two non-RE2 constructs)
# ---------------------------------------------------------------------------

def _sql_preprocess_name(e: str) -> str:
    """Mirror of translit.preprocess_name for THIS corpus: ASCII data +
    planted ä/ö/ü/ß only, so fold_ascii reduces to the ß→ss expansion.

    Non-RE2 emulations (exact on this corpus — no 'ueue' sequences, and
    replacements cannot create them):
    - (?<!a)ue → 'a' becomes ^ue + ([^a])ue with a replacement backref;
    - ([a-zA-Z])\\1 dedouble becomes 26 literal lowercase replaces
      (input is lowered first; left-to-right non-overlap semantics of
      replace() match Java's global regex replace).
    """
    x = f"lower({e})"
    x = f"replace({x}, 'ß', 'ss')"
    for a, b in [("ä", "a"), ("ae", "a"), ("ö", "o"), ("oe", "a"), ("ü", "u")]:
        x = f"replace({x}, '{a}', '{b}')"
    x = f"regexp_replace({x}, '^ue', 'a')"
    x = f"regexp_replace({x}, '([^a])ue', '\\1a', 'g')"
    for a, b in T.PHONETIC_PAIRS:
        x = f"replace({x}, '{a}', '{b}')"
    for ch in "abcdefghijklmnopqrstuvwxyz":
        x = f"replace({x}, '{ch}{ch}', '{ch}')"
    return x


def _sql_preprocess_last_name(e: str) -> str:
    """Mirror of translit.preprocess_last_name: ending strips + maiden
    strip, then preprocess_name. (?<=sk|ck)a$ is emulated with a
    replacement backref — identical semantics, no lookbehind."""
    x = f"lower({e})"
    x = f"regexp_replace({x}, 'owa$|ova$', '')"
    x = f"regexp_replace({x}, 'sohns$', 'sons')"
    x = f"regexp_replace({x}, 'sohn$', 'son')"
    x = f"regexp_replace({x}, '(sk|ck)a$', '\\1i')"
    x = f"regexp_replace({x}, '\\sgeb\\.?\\s.*', '')"
    x = f"regexp_replace({x}, '\\sgesch\\.?\\s.*', '')"
    return _sql_preprocess_name(x)


@query(
    "f_translit_pipeline",
    oracle=f"""
    SELECT doc_id,
           {_sql_preprocess_name("'Müßler-' || " + _T1_SQL + " || ' Wätjck'")} AS pname,
           {_sql_preprocess_last_name(_T1_SQL + " || 'sohn geb. ' || " + _T2_SQL)} AS plast
    FROM documents
    """,
)
def f_translit_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F13-F19 canonical normalizers over planted German-style names:
    accent fold, umlaut matching flavor, phonetic folding, dedouble,
    language-ending and maiden-suffix strips (string_utils.py:34-205)."""
    docs = load_tables(spark, sf_dir, ("documents",))["documents"]
    n1 = F.concat(F.lit("Müßler-"), _t1(), F.lit(" Wätjck"))
    n2 = F.concat(_t1(), F.lit("sohn geb. "), _t2())
    return docs.select(
        "doc_id",
        T.preprocess_name(n1).alias("pname"),
        T.preprocess_last_name(n2).alias("plast"),
    )


# ---------------------------------------------------------------------------
# D1: normalise_date against an arithmetic model
# ---------------------------------------------------------------------------

@query(
    "d_normalise_date",
    oracle="""
    WITH g AS (
      SELECT event_id,
             event_id % 45 AS d,
             (event_id // 45) % 16 AS m,
             event_id % 4 AS ysel,
             1840 + event_id % 130 AS y0,
             event_id % 100 AS y1
      FROM events)
    SELECT event_id,
           CASE ysel
             WHEN 0 THEN y0::VARCHAR
             WHEN 1 THEN (CASE WHEN y1 >= 50 THEN 1800 + y1
                               WHEN y1 >= 10 THEN 1900 + y1
                               ELSE y1 END)::VARCHAR
             WHEN 2 THEN '0' ELSE '' END AS year_c,
           CASE WHEN m > 12 AND d <= 12 THEN lpad(d::VARCHAR, 2, '0')
                ELSE lpad(m::VARCHAR, 2, '0') END AS month_c,
           CASE WHEN m > 12 AND d <= 12 THEN lpad(m::VARCHAR, 2, '0')
                ELSE lpad(d::VARCHAR, 2, '0') END AS day_c,
           ((CASE WHEN m > 12 AND d <= 12 THEN m ELSE d END) > 31
            OR (CASE WHEN m > 12 AND d <= 12 THEN d ELSE m END) > 12
            OR (ysel = 0 AND (y0 < 1850 OR y0 > 1950))
            OR (ysel = 1 AND y1 BETWEEN 1 AND 9)
            OR ysel = 3) AS qa
    FROM g
    """,
)
def d_normalise_date(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D1 normalise_date (the reference's biggest function,
    column_processing.py:489-766) on dates GENERATED from event_id:
    days 0-44 (some invalid), months 0-15 (some swapped), years 4-digit
    in/out of timespan, 2-digit (century rule), '0' (unknown), '-'
    (empty → completeness QA). The oracle computes the expected family
    arithmetically — an independent model of the regex pipeline."""
    ev = load_tables(spark, sf_dir, ("events",))["events"]
    ev = ev.select("event_id", F.expr("event_id div 45").alias("q45"))
    d_raw = (F.col("event_id") % 45).cast("string")
    m_raw = (F.col("q45") % 16).cast("string")
    ysel = F.col("event_id") % 4
    y_raw = (
        F.when(ysel == 0, (F.lit(1840) + F.col("event_id") % 130).cast("string"))
        .when(ysel == 1, (F.col("event_id") % 100).cast("string"))
        .when(ysel == 2, F.lit("0"))
        .otherwise(F.lit("-"))
    )
    gen = ev.select(
        "event_id", F.concat_ws(".", d_raw, m_raw, y_raw).alias("__dob_raw")
    )
    return D.normalise_date_frame(gen, "__dob_raw", "dob").select(
        "event_id",
        F.col("dob_year_cleaned").alias("year_c"),
        F.col("dob_month_cleaned").alias("month_c"),
        F.col("dob_day_cleaned").alias("day_c"),
        F.col("dob_qa").alias("qa"),
    )


# ---------------------------------------------------------------------------
# D2: clean_date (3-column, month names) against an arithmetic model
# ---------------------------------------------------------------------------

_MONTHS = (
    "january february march april may june july august "
    "september october november december"
).split()


@query(
    "d_clean_date_names",
    oracle="""
    WITH g AS (
      SELECT event_id,
             event_id % 35 AS d,
             (event_id % 12) + 1 AS m,
             event_id % 3 AS ysel,
             1800 + event_id % 200 AS y0,
             event_id % 100 AS y1
      FROM events),
    e AS (
      SELECT event_id, d, m, ysel, y0, y1,
             -- a 1-digit year never reaches 4 digits → whole date blanked
             (ysel = 1 AND y1 < 10) AS blanked
      FROM g)
    SELECT event_id,
           CASE WHEN blanked THEN '' WHEN ysel = 0 THEN y0::VARCHAR
                WHEN ysel = 1 THEN (CASE WHEN y1 >= 50 THEN 1800 + y1
                                         ELSE 1900 + y1 END)::VARCHAR
                ELSE '1900' END AS year_c,
           CASE WHEN blanked THEN '' ELSE lpad(m::VARCHAR, 2, '0') END AS month_c,
           CASE WHEN blanked THEN '' ELSE lpad(d::VARCHAR, 2, '0') END AS day_c,
           (d > 31
            OR (ysel = 0 AND (y0 < 1850 OR y0 > 1950))
            OR (ysel = 1 AND y1 BETWEEN 1 AND 9)) AS qa
    FROM e
    """,
)
def d_clean_date_names(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D2 clean_date with dropdown=False — exercises the month-NAME →
    number regex table (column_processing.py:808-1031) plus the '.0'
    float-artifact strip, the '-'→'00'→century quirk, 4-digit-year
    gating, and validity QA; oracle is again an arithmetic model."""
    ev = load_tables(spark, sf_dir, ("events",))["events"].select("event_id")
    eid = F.col("event_id")
    d_int = eid % 35
    day_raw = F.when(eid % 5 == 0, F.concat(d_int.cast("string"), F.lit(".0"))).otherwise(
        d_int.cast("string")
    )
    month_raw = F.element_at(F.array(*[F.lit(m) for m in _MONTHS]), ((eid % 12) + 1).cast("int"))
    ysel = eid % 3
    year_raw = (
        F.when(ysel == 0, (F.lit(1800) + eid % 200).cast("string"))
        .when(ysel == 1, (eid % 100).cast("string"))
        .otherwise(F.lit("-"))
    )
    fam = D.clean_date(day_raw, month_raw, year_raw, "doc", dropdown=False)
    return ev.select(
        "event_id",
        fam["doc_year_cleaned"].alias("year_c"),
        fam["doc_month_cleaned"].alias("month_c"),
        fam["doc_day_cleaned"].alias("day_c"),
        fam["doc_qa"].alias("qa"),
    )


# ---------------------------------------------------------------------------
# D6: date ordering check against an arithmetic model
# ---------------------------------------------------------------------------

@query(
    "d_timing_check",
    oracle="""
    WITH g AS (
      SELECT event_id,
             1900 + event_id % 50 AS yy1, event_id % 13 AS mm1, event_id % 29 AS dd1,
             1900 + (event_id // 7) % 50 AS yy2, (event_id // 13) % 13 AS mm2,
             (event_id // 29) % 29 AS dd2
      FROM events)
    SELECT event_id,
           (yy1 * 10000 + mm1 * 100 + dd1) <= (yy2 * 10000 + mm2 * 100 + dd2) AS timing,
           NOT ((yy1 * 10000 + mm1 * 100 + dd1) <= (yy2 * 10000 + mm2 * 100 + dd2)) AS timing_qa
    FROM g
    """,
)
def d_timing_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D6 date_timing_check (aux_functions.py:337-408): is date1 ≤ date2
    with 0 parts comparing as 0 — generated numeric parts, arithmetic
    oracle."""
    ev = load_tables(spark, sf_dir, ("events",))["events"].select(
        "event_id",
        F.expr("event_id div 7").alias("q7"),
        F.expr("event_id div 13").alias("q13"),
        F.expr("event_id div 29").alias("q29"),
    )
    eid = F.col("event_id")
    timing, timing_qa = D.date_timing_check(
        (F.lit(1900) + eid % 50).cast("string"),
        (eid % 13).cast("string"),
        (eid % 29).cast("string"),
        (F.lit(1900) + F.col("q7") % 50).cast("string"),
        (F.col("q13") % 13).cast("string"),
        (F.col("q29") % 29).cast("string"),
    )
    return ev.select("event_id", timing.alias("timing"), timing_qa.alias("timing_qa"))


# ---------------------------------------------------------------------------
# D9: LLM-output date repair against an arithmetic model
# ---------------------------------------------------------------------------

@query(
    "d_llm_repair",
    oracle="""
    WITH g AS (
      SELECT event_id,
             event_id % 40 AS d,
             (event_id // 40) % 15 AS m,
             event_id % 5 AS ysel,
             1856 + event_id % 97 AS y0,
             1056 + event_id % 97 AS y1,
             956 + event_id % 97 AS y2,
             180 + event_id % 20 AS y3
      FROM events)
    SELECT event_id,
           (CASE WHEN d <= 31 THEN d::VARCHAR ELSE '00' END) || '.' ||
           (CASE WHEN m <= 12 THEN m::VARCHAR ELSE '00' END) || '.' ||
           CASE ysel
             WHEN 0 THEN y0::VARCHAR
             WHEN 1 THEN (y1 + 800)::VARCHAR
             WHEN 2 THEN CASE WHEN y2 < 1000 THEN '0000'
                              ELSE (y2 + 900)::VARCHAR END
             WHEN 3 THEN CASE WHEN y3 BETWEEN 186 AND 195
                              THEN (y3 * 10)::VARCHAR ELSE '0000' END
             ELSE '0000' END AS repaired,
           CASE WHEN ysel = 0 AND y0 <= 1945
                THEN y0::VARCHAR || lpad(m::VARCHAR, 2, '0') || lpad(d::VARCHAR, 2, '0')
                ELSE '0000' || lpad(m::VARCHAR, 2, '0') || lpad(d::VARCHAR, 2, '0')
           END AS packed
    FROM g
    """,
)
def d_llm_repair(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D9 LLM-output date repair (indizierung.ipynb cell 18): dates
    GENERATED from event_id cover days/months in and out of range, years
    that are valid, need the +800 or +900 OCR century fix, are 3-digit
    (×10 rule), or garbage. Both the part-wise repair and the packed
    conversion ([1845,1945] window, no OCR fix) are checked against an
    arithmetic oracle."""
    ev = load_tables(spark, sf_dir, ("events",))["events"].select(
        "event_id", F.expr("event_id div 40").alias("q40")
    )
    eid = F.col("event_id")
    d_raw = (eid % 40).cast("string")
    m_raw = (F.col("q40") % 15).cast("string")
    ysel = eid % 5
    y_raw = (
        F.when(ysel == 0, (F.lit(1856) + eid % 97).cast("string"))
        .when(ysel == 1, (F.lit(1056) + eid % 97).cast("string"))
        .when(ysel == 2, (F.lit(956) + eid % 97).cast("string"))
        .when(ysel == 3, (F.lit(180) + eid % 20).cast("string"))
        .otherwise(F.lit("12345"))
    )
    raw = F.concat_ws(".", d_raw, m_raw, y_raw)
    return ev.select(
        "event_id",
        D.llm_repair_date(raw).alias("repaired"),
        D.llm_convert_date_field(raw).alias("packed"),
    )


# ---------------------------------------------------------------------------
# F24/F25: geo-identifier parsing against a planted-selector model
# ---------------------------------------------------------------------------

@query(
    "f_geo_ids",
    oracle="""
    WITH g AS (SELECT event_id, event_id % 5 AS sel FROM events)
    SELECT event_id,
           CASE sel WHEN 0 THEN 'Q' || event_id::VARCHAR
                    WHEN 1 THEN 'q' || event_id::VARCHAR
                    WHEN 2 THEN 'Q' || event_id::VARCHAR
                    ELSE '' END AS wd,
           sel >= 2 AS wd_qa,
           CASE WHEN sel = 2 THEN event_id::VARCHAR ELSE '' END AS gn,
           sel != 2 AS gn_qa
    FROM g
    """,
)
def f_geo_ids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F24/F25 wikidata/geoname id cleaning (column_processing.py:
    1338-1422) over ids PLANTED by selector: well-formed 'Q123'/'q123',
    bare digits (gain the prefix, QA), 'unclear' and '?' (emptied, QA).
    The oracle computes the expected (cleaned, qa) pairs from the
    selector arithmetic."""
    ev = load_tables(spark, sf_dir, ("events",))["events"].select("event_id")
    sel = F.col("event_id") % 5
    ids = F.col("event_id").cast("string")
    raw = (
        F.when(sel == 0, F.concat(F.lit("Q"), ids))
        .when(sel == 1, F.concat(F.lit("q"), ids))
        .when(sel == 2, ids)
        .when(sel == 3, F.lit("unclear"))
        .otherwise(F.lit("?"))
    )
    wd, wd_qa = C.clean_wikidata_id(raw)
    gn, gn_qa = C.clean_geoname_id(raw)
    return ev.select(
        "event_id",
        wd.alias("wd"), wd_qa.alias("wd_qa"),
        gn.alias("gn"), gn_qa.alias("gn_qa"),
    )


# ---------------------------------------------------------------------------
# F26: dictionary standardizer against a planted-selector model
# ---------------------------------------------------------------------------

@query(
    "f_standardize",
    oracle="""
    WITH g AS (SELECT event_id, event_id % 6 AS sel FROM events)
    SELECT event_id,
           CASE sel WHEN 0 THEN 'POL' WHEN 1 THEN 'GER' WHEN 2 THEN 'dutch'
                    WHEN 3 THEN '' WHEN 4 THEN '?' ELSE 'POL;GER' END AS std,
           sel IN (2, 4) AS qa
    FROM g
    """,
)
def f_standardize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F26 dictionary standardization (standardize.py / the reference's
    nationality tables): planted raws cover mapped words, unmapped (QA),
    empty, the unclear table ('?'), and multi-word substitution. Runs
    the REAL Arrow UDF with its longest-key-first word-boundary regex;
    the oracle is selector arithmetic."""
    from aroa_etl_spark.operators.standardize import standardize_column

    ev = load_tables(spark, sf_dir, ("events",))["events"].select("event_id")
    sel = F.col("event_id") % 6
    raw = (
        F.when(sel == 0, F.lit("polish"))
        .when(sel == 1, F.lit("german"))
        .when(sel == 2, F.lit("dutch"))
        .when(sel == 3, F.lit(""))
        .when(sel == 4, F.lit("unknown"))
        .otherwise(F.lit("polish german"))
    )
    df = ev.withColumn("nat", raw)
    out = standardize_column(
        df, "nat",
        mapping={"polish": "POL", "german": "GER"},
        unclear={"unknown": "?"},
    )
    return out.select("event_id", F.col("nat_std").alias("std"), F.col("nat_qa").alias("qa"))


# ---------------------------------------------------------------------------
# F20/F22: OCR repair against pinned goldens
# ---------------------------------------------------------------------------

# Golden pairs for the two Python-kernel functions: inputs planted by
# selector, expected outputs pinned literally in the oracle (computed
# from the scalar ports, which are differentially tested in
# test_parity_gaps.py). The catalog check proves the Arrow UDF path
# executes those semantics inside Spark.
_F20_CASES = [
    ("Müller", "Müller"),            # umlauts are protected
    ("M0ller", "MOller"),            # digit→letter confusable
    ("café", "cafe"),                # accent fold
    ("Иван Петров", ""),             # >30% foreign → rejected
    ("J0hann (b0rn 1900)", "JOhann bOrn lOO"),
    ("Ivan®", "Ivan"),               # unmappable symbol dropped
    ("We1ß", "Welß"),
    ("", ""),
]
_F22_CASES = [
    ("ab12(cd34)ef56", "ab#(cd34)ef#"),  # bracketed text untouched
    ("x[9]y8", "x[9]y#"),
    ("(1)2(3)4", "(1)#(3)#"),
    ("none", "none"),
]


@query(
    "f_ocr_repair",
    oracle=f"""
    WITH g AS (SELECT doc_id, doc_id % 8 AS s20, doc_id % 4 AS s22 FROM documents)
    SELECT doc_id,
           CASE s20 {' '.join(f"WHEN {i} THEN '{o}'" for i, (_, o) in enumerate(_F20_CASES))} END AS repaired,
           CASE s22 {' '.join(f"WHEN {i} THEN '{o}'" for i, (_, o) in enumerate(_F22_CASES))} END AS desubbed
    FROM g
    """,
)
def f_ocr_repair(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F20 fix_visual_decoding + F22 re_sub_exclude_parenthesis
    (reference utils.py:42-57, visual-confusable tables) over planted
    inputs: umlaut protection, digit→letter OCR confusables, accent
    folds, the >30%-foreign rejection, and bracket-depth-aware regex
    substitution. Oracle pins the goldens per selector."""
    from aroa_etl_spark.functions.ocr import fix_visual_decoding, re_sub_exclude_parenthesis

    docs = load_tables(spark, sf_dir, ("documents",))["documents"].select("doc_id")
    s20, s22 = F.col("doc_id") % 8, F.col("doc_id") % 4
    raw20 = F.lit(None).cast("string")
    for i, (inp, _) in enumerate(_F20_CASES):
        raw20 = F.when(s20 == i, F.lit(inp)).otherwise(raw20)
    raw22 = F.lit(None).cast("string")
    for i, (inp, _) in enumerate(_F22_CASES):
        raw22 = F.when(s22 == i, F.lit(inp)).otherwise(raw22)
    return docs.select(
        "doc_id",
        fix_visual_decoding(raw20).alias("repaired"),
        re_sub_exclude_parenthesis(raw22, r"\d+", "#").alias("desubbed"),
    )


# ---------------------------------------------------------------------------
# JS2/JS3: Zooniverse annotation/metadata/subject parsing
# ---------------------------------------------------------------------------

_ZOO_ANNOT = [
    # simple task
    '[{"task":"T0","task_label":"Name","value":"anna"}]',
    # nested task: labels prefixed with the parent task id
    '[{"task":"T1","value":[{"task":"T2","task_label":"City","value":"wien"}]}]',
    # dropdown pair inside a nested task: type object then value object
    '[{"task":"T3","value":[{"task":"x","value":[{"select_label":"d","label":"Country"}]},'
    '{"task":"y","value":"AT"}]}]',
    # malformed payload → empty map, not a crash
    "notjson",
]


@query(
    "js_zooniverse_parse",
    oracle="""
    WITH g AS (SELECT doc_id, doc_id % 4 AS s FROM documents)
    SELECT doc_id,
           CASE WHEN s = 0 THEN 'anna' END AS name,
           CASE WHEN s = 1 THEN 'wien' END AS city,
           CASE WHEN s = 2 THEN 'AT' END AS country,
           CASE WHEN s != 3 THEN '{"c": 2}' END AS meta_b,
           CASE WHEN s != 3 THEN '12345' ELSE '' END AS subject_id,
           CASE WHEN s != 3 THEN 'y' END AS subject_x
    FROM g
    """,
)
def js_zooniverse_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JS2 parse_annotations (all three task shapes: simple, nested with
    parent-prefixed labels, dropdown type/value pair) + JS3
    parse_metadata / parse_subject_data (zooniverse/unpacking.py:6-101)
    over planted JSON; malformed payloads yield empty maps. Flat string
    extracts make the result hash-comparable; oracle pins the goldens."""
    from aroa_etl_spark.sources.zooniverse import (
        parse_annotations,
        parse_metadata,
        parse_subject_data,
    )

    docs = load_tables(spark, sf_dir, ("documents",))["documents"].select("doc_id")
    s = F.col("doc_id") % 4
    annot = F.lit(None).cast("string")
    for i, payload in enumerate(_ZOO_ANNOT):
        annot = F.when(s == i, F.lit(payload)).otherwise(annot)
    meta = F.when(s != 3, F.lit('{"a": 1, "b": {"c": 2}}')).otherwise(F.lit("{broken"))
    subj = F.when(s != 3, F.lit('{"12345": {"x": "y"}}')).otherwise(F.lit("[]"))

    m = parse_annotations(annot)
    md = parse_metadata(meta)
    sd = parse_subject_data(subj)
    return docs.select(
        "doc_id",
        F.element_at(m, "Name").alias("name"),
        F.element_at(m, "T1: City").alias("city"),
        F.element_at(m, "T3: Country").alias("country"),
        F.element_at(md, "b").alias("meta_b"),
        sd["subject_id"].alias("subject_id"),
        F.element_at(sd["subject_data"], "x").alias("subject_x"),
    )


# ---------------------------------------------------------------------------
# F7/F8/F10/F11/F12/F21: separator/split/name-repair family
# ---------------------------------------------------------------------------

# (input, semicolonized, female-suffix-completed part2, digit-stripped+
# despaced+title-cased) — goldens pin actual engine behavior, including
# the reference quirks the regexes inherit (noble 'van der' protection;
# letterspacing collapse only on 1-char runs).
_NAMES_CASES = [
    ("anna maria schmidt", "anna;maria;schmidt", "maria", "Anna Maria Schmidt"),
    ("van der berg, hans", "van der berg;hans", "hans", "Van Der Berg, Hans"),
    ("S c h m i d t anna", "S;c;h;m;i;d t;anna", "c", "Schmidt Anna"),
    ("Novak Ova", "Novak;Ova", "Novakova", "Novak Ova"),
    ("he4ns 3maria9", "he4ns;3maria9", "3maria9", "Hens Maria"),
]


@query(
    "f_split_names",
    oracle=f"""
    WITH g AS (SELECT doc_id, doc_id % 5 AS s FROM documents)
    SELECT doc_id,
           CASE s {' '.join(f"WHEN {i} THEN '{c[1]}'" for i, c in enumerate(_NAMES_CASES))} END AS sem,
           CASE s {' '.join(f"WHEN {i} THEN '{c[2]}'" for i, c in enumerate(_NAMES_CASES))} END AS fem,
           CASE s {' '.join(f"WHEN {i} THEN '{c[3]}'" for i, c in enumerate(_NAMES_CASES))} END AS fixed
    FROM g
    """,
)
def f_split_names(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F7 noble-guarded separator transform, F8 limited split, F10 digit
    strip, F11 letterspacing collapse, F12 female-suffix completion, F21
    title casing (column_processing.py:136-200, aux_functions.py:195-332)
    over planted names; oracle pins the goldens per selector."""
    docs = load_tables(spark, sf_dir, ("documents",))["documents"].select("doc_id")
    s = F.col("doc_id") % 5
    raw = F.lit(None).cast("string")
    for i, case in enumerate(_NAMES_CASES):
        raw = F.when(s == i, F.lit(case[0])).otherwise(raw)
    sem = C.to_semicolon_separators(raw)
    parts = C.split_limited(sem)
    p1 = F.coalesce(F.try_element_at(parts, F.lit(1)), F.lit(""))
    p2 = F.coalesce(F.try_element_at(parts, F.lit(2)), F.lit(""))
    return docs.select(
        "doc_id",
        sem.alias("sem"),
        C.extend_female_suffix(p1, p2).alias("fem"),
        C.title_case(C.remove_name_spacing(C.strip_digits(raw))).alias("fixed"),
    )


# ---------------------------------------------------------------------------
# L3/L2: repeat-group re-splitting (plain + paren-aware) and NA filtering
# ---------------------------------------------------------------------------

# (input array, plain re-split, paren-aware re-split, NA-filtered) —
# '|'-joined goldens; empty parts from adjacent separators are kept by
# both splitters (faithful to the reference's re.split), and the
# paren-aware variant protects separators inside (...) / [...].
_L_CASES = [
    (["Alice, Blice", "Clice"], "Alice||Blice|Clice", "Alice||Blice|Clice",
     "Alice, Blice|Clice"),
    (["Schmidt (geb, Meyer)", "Braun"], "Schmidt|(geb||Meyer)|Braun",
     "Schmidt|(geb, Meyer)|Braun", "Schmidt (geb, Meyer)|Braun"),
    (["a;b", "c[d;e]f"], "a|b|c[d|e]f", "a|b|c[d;e]f", "a;b|c[d;e]f"),
    (["solo"], "solo", "solo", "solo"),
]


@query(
    "l_resplit_family",
    oracle=f"""
    WITH g AS (SELECT doc_id, doc_id % 4 AS s FROM documents)
    SELECT doc_id,
           CASE s {' '.join(f"WHEN {i} THEN '{c[1]}'" for i, c in enumerate(_L_CASES))} END AS plain,
           CASE s {' '.join(f"WHEN {i} THEN '{c[2]}'" for i, c in enumerate(_L_CASES))} END AS paren,
           CASE s {' '.join(f"WHEN {i} THEN '{c[3]}'" for i, c in enumerate(_L_CASES))} END AS na_kept
    FROM g
    """,
)
def l_resplit_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L3 additional_splits (native flatten/split) + its paren-aware
    Arrow variant (enc/unpacking.py:58-68 with utils.py:42-57
    protection) + L2 filter_na over planted repeat groups; '|'-joined
    goldens pinned in the oracle."""
    from aroa_etl_spark.sources import unpacking as U

    docs = load_tables(spark, sf_dir, ("documents",))["documents"].select("doc_id")
    s = F.col("doc_id") % 4
    vals = F.array().cast("array<string>")
    for i, case in enumerate(_L_CASES):
        vals = F.when(s == i, F.array(*[F.lit(v) for v in case[0]])).otherwise(vals)
    return docs.select(
        "doc_id",
        F.concat_ws("|", U._additional_splits(vals, U.DEFAULT_SPLIT_RE)).alias("plain"),
        F.concat_ws("|", U.split_paren_aware(vals)).alias("paren"),
        F.concat_ws("|", U._filter_na(vals)).alias("na_kept"),
    )


# ---------------------------------------------------------------------------
# M1/M2/M3: date-similarity kernels against an arithmetic model
# ---------------------------------------------------------------------------

_ND_SQL = "CASE WHEN {x} > 3 THEN 0.0 ELSE greatest(0.0, 100.0 - (power(5.0, {x}) - 1.0)) END"


@query(
    "m_date_kernels",
    oracle=f"""
    WITH g AS (
      SELECT event_id,
             1 + event_id % 28 AS da, (event_id // 28) % 13 AS ma, 1900 + event_id % 8 AS ya,
             1 + (event_id // 3) % 28 AS db, (event_id // 5) % 13 AS mb, 1900 + (event_id // 8) % 8 AS yb
      FROM events),
    s AS (
      SELECT event_id, da, ma, ya, db, mb, yb,
             {_ND_SQL.format(x="abs(ya - yb)")} AS year_s,
             CASE WHEN ma = 0 OR mb = 0 THEN -1.0 ELSE {_ND_SQL.format(x="abs(ma - mb)")} END AS ms,
             {_ND_SQL.format(x="abs(da - db)")} AS ds,
             CASE WHEN ma = 0 OR db = 0 THEN -1.0 ELSE {_ND_SQL.format(x="abs(ma - db)")} END AS ms_rev,
             CASE WHEN da = 0 OR mb = 0 THEN -1.0 ELSE {_ND_SQL.format(x="abs(da - mb)")} END AS ds_rev
      FROM g),
    o AS (
      SELECT event_id, da, ma, ya, db, mb, yb, year_s,
             CASE WHEN ms + ds <= ms_rev + ds_rev THEN ms_rev ELSE ms END AS month_s,
             CASE WHEN ms + ds <= ms_rev + ds_rev THEN ds_rev ELSE ds END AS day_s
      FROM s)
    SELECT event_id,
           CAST({_ND_SQL.format(x="abs(ya - yb)")} AS DOUBLE) AS nd,
           CAST(greatest(0.0,
                100.0 - (CASE WHEN year_s  >= 0 THEN 100.0 - year_s  ELSE 0.0 END)
                      - (CASE WHEN month_s >= 0 THEN 100.0 - month_s ELSE 0.0 END)
                      - (CASE WHEN day_s   >= 0 THEN 100.0 - day_s   ELSE 0.0 END))
             AS DOUBLE) AS ds,
           CAST(least(3,
                  (CASE WHEN da = db OR (mb > 0 AND da = mb) THEN 1 ELSE 0 END)
                + (CASE WHEN ma > 0 AND (ma = db OR (mb > 0 AND ma = mb)) THEN 1 ELSE 0 END)
                + (CASE WHEN ya = yb THEN 1 ELSE 0 END)) / 3.0 * 100.0
             AS DOUBLE) AS sm
    FROM o
    """,
)
def m_date_kernels(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M1 number_diff + M2 date_similarity (0-part skips, day/month-swap
    retry) + M3 simple_date_matcher (shared-part counting) — the REAL
    Python kernels (similarity_measures.py:12-89 ports) run through an
    Arrow pandas UDF over dates generated from event_id, checked against
    an independent SQL arithmetic model of all three formulas."""
    from pyspark.sql import types as ST

    from aroa_etl_spark.functions.simkernels import (
        date_similarity,
        number_diff,
        simple_date_matcher,
    )

    ev = load_tables(spark, sf_dir, ("events",))["events"].select(
        "event_id",
        F.expr("event_id div 28").alias("q28"),
        F.expr("event_id div 3").alias("q3"),
        F.expr("event_id div 5").alias("q5"),
        F.expr("event_id div 8").alias("q8"),
    )
    eid = F.col("event_id")
    da, ma, ya = 1 + eid % 28, F.col("q28") % 13, 1900 + eid % 8
    db, mb, yb = 1 + F.col("q3") % 28, F.col("q5") % 13, 1900 + F.col("q8") % 8

    def dotted(d, m, y):
        return F.concat_ws(
            ".",
            F.lpad(d.cast("string"), 2, "0"),
            F.lpad(m.cast("string"), 2, "0"),
            y.cast("string"),
        )

    @F.pandas_udf(ST.DoubleType())
    def _nd(a: pd.Series, b: pd.Series) -> pd.Series:
        return pd.Series([number_diff(int(x), int(y)) for x, y in zip(a, b)])

    @F.pandas_udf(ST.DoubleType())
    def _ds(a: pd.Series, b: pd.Series) -> pd.Series:
        return pd.Series([date_similarity(x, y) for x, y in zip(a, b)])

    @F.pandas_udf(ST.DoubleType())
    def _sm(a: pd.Series, b: pd.Series) -> pd.Series:
        return pd.Series([simple_date_matcher(x, y) for x, y in zip(a, b)])

    a_str, b_str = dotted(da, ma, ya), dotted(db, mb, yb)
    return ev.select(
        "event_id",
        _nd(ya, yb).alias("nd"),
        _ds(a_str, b_str).alias("ds"),
        _sm(a_str, b_str).alias("sm"),
    )
