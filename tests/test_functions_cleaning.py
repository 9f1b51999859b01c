"""Table-driven unit tests for the cleaning/translit/date expression library."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from aroa_etl_spark.functions import cleaning as C
from aroa_etl_spark.functions import dates as D
from aroa_etl_spark.functions import translit as T
from aroa_etl_spark.functions.vocab import is_empty


def run1(spark, col_fn, values):
    """Apply a Column-function to a single string column, return results."""
    df = spark.createDataFrame([(v,) for v in values], ["x"])
    return [r.y for r in df.select(col_fn(F.col("x")).alias("y")).collect()]


# ---------------------------------------------------------------- vocab

def test_is_empty(spark):
    vals = ["", "-", "None", "0000", "Müller", None, "  ", "NA", "?"]
    out = run1(spark, lambda c: is_empty(c), vals)
    assert out == [True, True, True, True, False, True, True, True, False]


# ---------------------------------------------------------------- clean_copy

@pytest.mark.parametrize(
    "raw,expected",
    [
        ("unknown", "-"),
        ("blank", "-"),
        ("keine Angabe", "-"),
        ("crossed out", ""),
        ("illegible", "?"),
        ("unklar", "?"),
        ("Meier, Anna", "Meier; Anna"),
        ("a(b)c", "a;b;c"),
        ("x;;;y", "x;y"),
        (" Müller ", "Müller"),
        ("---", "-"),
    ],
)
def test_clean_copy(spark, raw, expected):
    assert run1(spark, C.clean_copy, [raw]) == [expected]


def test_clean_copy_2_empty_to_dash(spark):
    assert run1(spark, lambda c: C.clean_copy(c, empty_to_dash=True), [" "]) == ["-"]


# ---------------------------------------------------------------- QA flag

def test_create_qa_col(spark):
    vals = ["Mül?ler", "Meier", "-", "Mei3er", "(x)", None]
    out = run1(spark, lambda c: C.create_qa_col(c), vals)
    assert out == [True, False, False, True, True, False]


# ---------------------------------------------------------------- names

def test_strip_academic_titles(spark):
    assert run1(spark, C.strip_academic_titles, ["Dr. Meier", "Prof. Braun", "MUDr. Novak"]) == [
        " Meier",
        " Braun",
        "MUDr. Novak",  # reference regex only matches 'Mudr.'/'mudr.' capitalizations
    ]


def test_keyword_removal(spark):
    out = run1(spark, C.keyword_removal, ["Frau Meier", "alias Schmidt", "Meier"])
    assert out == ["meier", "schmidt", "meier"]


def test_noble_prefix_extraction(spark):
    out = run1(spark, C.extract_noble_prefix, ["van der Berg", "von Humboldt", "Meier"])
    assert out == ["van der", "von", ""]


def test_birth_name_extraction(spark):
    out = run1(spark, C.extract_birth_name, ["schmidt geb. meier", "meier", "geb."])
    # reference keeps the leading space ('geb.' marker strip is boundary-quirky)
    assert out == [" Meier", "", ""]


def test_remove_name_spacing(spark):
    assert run1(spark, C.remove_name_spacing, ["B l o c k e d", "Normal Name"]) == [
        "Blocked",
        "Normal Name",
    ]


def test_title_case(spark):
    assert run1(spark, C.title_case, ["anna-maria;de vries", "meier"]) == [
        "Anna-Maria;De Vries",
        "Meier",
    ]


def test_extend_female_suffix(spark):
    df = spark.createDataFrame([("Novak", "Ova"), ("Meier", "Anna")], ["p", "c"])
    out = [r.y for r in df.select(C.extend_female_suffix("p", "c").alias("y")).collect()]
    assert out == ["Novakova", "Anna"]


def test_sort_list_numeric(spark):
    assert run1(spark, C.sort_list_numeric, ["B123;A9;C40", "77"]) == [
        "A9;C40;B123",
        "77",
    ]


def test_separate_prisoner_number_chars(spark):
    assert run1(spark, C.separate_prisoner_number_chars, ["A 12345", "B-999", "12345"]) == [
        "A;12345",
        "B;999",
        "12345",
    ]


# ---------------------------------------------------------------- translit

def test_fold_ascii(spark):
    assert run1(spark, T.fold_ascii, ["łódź", "Müßig", "æon"]) == ["lodz", "Müssig", "aeon"]


def test_umlaut_flavors(spark):
    # matching flavor: ä→a, ae→a (with its production quirks oe→a)
    assert run1(spark, T.fold_umlauts_matching, ["müller", "maeier"]) == ["muller", "maier"]
    # clustering flavor: ä→ae
    assert run1(spark, T.fold_umlauts_expanded, ["müller", "härte"]) == ["mueller", "haerte"]


def test_preprocess_name(spark):
    # schwarz: w→v, tz... 'tz'→'z' after y/j; müller → muler (ü→u, ll→l)
    assert run1(spark, T.preprocess_name, ["Müller", "Schwartz", "Meyer"]) == [
        "muler",
        "schvarz",
        "meier",
    ]


def test_preprocess_last_name(spark):
    assert run1(spark, T.preprocess_last_name, ["Nowakowa", "Petersohn", "Kowalska"]) == [
        "novak",  # -owa stripped, then w→v
        "peterson",
        "kovalski",
    ]


def test_ocr_decode_repair(spark):
    # Cyrillic-lookalike 'Мüller' (М is Cyrillic) repaired to Latin
    out = run1(spark, T.fix_visual_character_decoding, ["Мüller", "οκ garbage ωωωω"])
    assert out[0] == "Müller"


def test_fix_name_uppercasing(spark):
    # the word class has no uppercase umlauts — 'MÜller' splits at Ü
    # (reference quirk preserved: string_utils.py:153-159)
    assert run1(spark, T.fix_name_uppercasing, ["hANS-peter MÜller"]) == ["Hans-Peter MÜLler"]


# ---------------------------------------------------------------- dates

def test_date_integer_separator(spark):
    assert run1(spark, D.date_integer_separator, ["01021930", "1.2.1930x"]) == [
        "01;02;1930",
        "12;19;30",
    ]


def test_date_validity_qa(spark):
    vals = ["31", "32", "0", "", "abc", "12"]
    out = run1(spark, lambda c: D.date_validity_qa(c, 0, 31), vals)
    assert out == [False, True, False, False, True, False]


def test_day_month_swap(spark):
    df = spark.createDataFrame([("05", "20"), ("20", "05"), ("", "13")], ["d", "m"])
    out = [
        (r.d2, r.m2)
        for r in df.select(
            D.day_swap("d", "m").alias("d2"), D.month_swap("d", "m").alias("m2")
        ).collect()
    ]
    assert out == [("20", "05"), ("20", "05"), ("", "13")]


def test_normalise_date_full(spark):
    df = spark.createDataFrame(
        [("9.4.1900",), ("1943",), ("01021930",), ("23 Jahre",), ("1.13.44",), (None,)],
        ["dob"],
    )
    out = (
        D.normalise_date_frame(df, "dob", "birthdate", timespan=(1850, 1950))
        .drop("dob")
        .collect()
    )

    r = out[0]  # 9.4.1900 (day-first)
    assert (r.birthdate_year_cleaned, r.birthdate_month_cleaned, r.birthdate_day_cleaned) == (
        "1900", "04", "09",
    )
    assert r.birthdate_qa is False

    r = out[1]  # year only → completed with zero-padded '00' day/month
    assert (r.birthdate_year_cleaned, r.birthdate_month_cleaned, r.birthdate_day_cleaned) == (
        "1943", "00", "00",
    )

    r = out[2]  # packed 8 digits
    assert (r.birthdate_year_cleaned, r.birthdate_month_cleaned, r.birthdate_day_cleaned) == (
        "1930", "02", "01",
    )
    assert r.birthdate_qa is False

    r = out[3]  # age string → blanked entirely
    assert (r.birthdate_year_cleaned, r.birthdate_month_cleaned, r.birthdate_day_cleaned) == (
        "", "", "",
    )

    r = out[4]  # 1.13.44: month 13 > 12 & day ≤ 12 → swap; 2-digit year 44 → 1944
    assert (r.birthdate_year_cleaned, r.birthdate_month_cleaned, r.birthdate_day_cleaned) == (
        "1944", "01", "13",
    )


def test_clean_date_dropdown(spark):
    df = spark.createDataFrame(
        [("09", "04 - April", "1900"), ("-", "-", "1943"), ("09", "04", "-")],
        ["d", "m", "y"],
    )
    cols = D.clean_date("d", "m", "y", "bd")
    out = df.select(*[v.alias(k) for k, v in cols.items()]).collect()
    assert (out[0].bd_year_cleaned, out[0].bd_month_cleaned, out[0].bd_day_cleaned) == (
        "1900", "04", "09",
    )
    assert out[0].bd_qa is False
    # '-' placeholders become '00' with a real year → complete, no qa
    assert (out[1].bd_year_cleaned, out[1].bd_month_cleaned, out[1].bd_day_cleaned) == (
        "1943", "00", "00",
    )
    # no 4-digit year → everything blanked
    assert (out[2].bd_year_cleaned, out[2].bd_month_cleaned, out[2].bd_day_cleaned) == (
        "", "", "",
    )


def test_date_timing_check(spark):
    df = spark.createDataFrame(
        [("1940", "01", "01", "1941", "01", "01"), ("1942", "05", "05", "1941", "01", "01")],
        ["y1", "m1", "d1", "y2", "m2", "d2"],
    )
    timing, qa = D.date_timing_check("y1", "m1", "d1", "y2", "m2", "d2")
    out = df.select(timing.alias("t"), qa.alias("q")).collect()
    assert (out[0].t, out[0].q) == (True, False)
    assert (out[1].t, out[1].q) == (False, True)


def test_pack_and_parse(spark):
    df = spark.createDataFrame([("1900", "4", "9")], ["y", "m", "d"])
    packed = df.select(D.pack_yyyymmdd("y", "m", "d").alias("p")).collect()[0].p
    assert packed == "19000409"
    parts = run1(spark, D.parse_date_parts, ["19000409", "9.4.1900", "junk"])
    assert (parts[0].year, parts[0].month, parts[0].day) == (1900, 4, 9)
    assert (parts[1].year, parts[1].month, parts[1].day) == (1900, 4, 9)
    assert (parts[2].year, parts[2].month, parts[2].day) == (0, 0, 0)


def test_llm_date_repair_matches_reference_port(spark):
    """Differential: the native exprs vs a literal Python port of
    repair_date / convert_date_field (indizierung.ipynb cell 18)."""
    import re

    from aroa_etl_spark.functions.dates import llm_convert_date_field, llm_repair_date

    def pp_year(y):
        if len(y) == 3 and y.isdigit():
            v = int(y) * 10
            return str(v) if 1855 < v < 1954 else "0000"
        if len(y) == 4 and y.isdigit():
            v = int(y)
            if 1855 < v < 1954:
                return str(v)
            if 1855 < v + 800 < 1954:
                return str(v + 800)
            if 1855 < v + 900 < 1954:
                return str(v + 900)
            return "0000"
        return "0000"

    def py_repair(date):
        if date is None or re.search(r"[a-zA-Z]", date):
            return "00000000"
        parts = date.split(".")
        if len(parts) != 3:
            return "0000000"
        d = parts[0] if re.match(r"^\d{1,2}$", parts[0]) and int(parts[0]) <= 31 else "00"
        m = parts[1] if re.match(r"^\d{1,2}$", parts[1]) and int(parts[1]) <= 12 else "00"
        return ".".join([d, m, pp_year(parts[2])])

    def py_convert(date):
        date = "" if date is None else date
        parts = date.split(".")
        if len(parts) != 3 or re.search(r"[^\d.]", date):
            return "00000000"
        dd, mm, yyyy = parts
        if len(yyyy) == 2:
            yyyy = ("19" if int(yyyy) <= 45 else "18") + yyyy
        elif len(yyyy) != 4 or int(yyyy) < 1845 or int(yyyy) > 1945:
            yyyy = "0000"
        dd = "0" + dd if len(dd) == 1 else dd
        mm = "0" + mm if len(mm) == 1 else mm
        return yyyy + mm + dd

    cases = [
        "7.4.1903", "31.12.1953", "07.04.1089", "1.1.1003",   # +800 / +900 fixes
        "12.11.190", "3.2.189", "15.06.1855", "15.06.1856",
        "32.13.1900", "00.00.0000", "5.5.45", "9.9.99",
        "1.2", "1.2.3.4", "", "12a.3.1900", "abc", None,
        "-3.04.1920", "..1920", "4..1930", "15.6.2020",
    ]
    df = spark.createDataFrame([(c,) for c in cases], ["d"])
    got = df.select(
        llm_repair_date("d").alias("r"), llm_convert_date_field("d").alias("p")
    ).collect()
    for case, row in zip(cases, got):
        assert row["r"] == py_repair(case), f"repair({case!r}): {row['r']} != {py_repair(case)}"
        assert row["p"] == py_convert(case), f"convert({case!r}): {row['p']} != {py_convert(case)}"
