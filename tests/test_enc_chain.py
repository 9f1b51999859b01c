"""Golden-chain tests for the ENC pipeline: unpack → process (mirrors the
reference's tests/enc/unpacking_test.py + processing_test.py assertions
on an equivalent synthetic fixture)."""

from __future__ import annotations

import re

import pytest

from aroa_etl_spark.operators.attributes import process_unpacked_data
from aroa_etl_spark.sources.unpacking import unpack
from tests.fixtures.enc_fixture import raw_enc_df


@pytest.fixture(scope="module")
def unpacked(spark):
    df = unpack(
        raw_enc_df(spark),
        "json_data",
        additional_splits_on=lambda col: re.search(r"(category)", col),
    )
    return df.orderBy("row_id").cache()


def test_unpack_columns(unpacked):
    cols = set(unpacked.columns)
    assert {
        "workflow_id", "document_id",
        "prisoner_category_0", "prisoner_category_1", "prisoner_category_2",
        "prisoner_category_3", "prisoner_category_4", "prisoner_category_5",
        "prisoner_number",
        "imprisonment_year", "imprisonment_month", "imprisonment_day",
        "imprisonment_camp",
        "place_of_birth_0", "place_of_birth_1",
        "birthdate_year", "birthdate_month", "birthdate_day",
        "first_name_0", "first_name_1",
        "last_name",
    } <= cols


def test_unpack_first_names(unpacked):
    rows = unpacked.select("first_name_0", "first_name_1").collect()
    assert [r.first_name_0 for r in rows] == [
        "Dr.Alice", "Dr. Alice", "Alice", "Bob1 Bob2", "Bob1", "Bob1", "Bob1", "Bob1",
    ]
    assert [r.first_name_1 for r in rows][5] == "Bob2"


def test_unpack_null_handling(unpacked):
    rows = unpacked.collect()
    # JSON null renders as the 'None' string (NA vocabulary handles it later)
    assert rows[1].prisoner_category_0 == "None"
    assert rows[7].prisoner_number == "None"
    # multi-value single-field group deduped/cleaned
    assert (rows[1].place_of_birth_0, rows[1].place_of_birth_1) == ("Frandfurt", "Main")
    assert rows[0].place_of_birth_1 is None


@pytest.fixture(scope="module")
def processed(spark, unpacked):
    out = process_unpacked_data(
        unpacked,
        skip_columns=["row_id", "workflow_id", "document_id"],
    )
    return out.orderBy("row_id").cache()


def test_processed_qa_and_families(processed):
    rows = processed.collect()
    # 'Unklar' camps flagged (reference: imprisonment_camp_qa.sum() == 5)
    assert sum(1 for r in rows if r.imprisonment_camp_qa) == 5
    assert "imprisonment_camp_data_source" in processed.columns


def test_processed_last_names(processed):
    rows = processed.collect()
    assert [r.last_name_cleaned_0 for r in rows][:5] == [
        "Muller", "Müller", "Mueller", "Schmidt", "Schmïdt",
    ]


def test_processed_first_names(processed):
    rows = processed.collect()
    assert [r.first_name_cleaned_0 for r in rows] == [
        "Alice", "Alice", "Alice", "Bob1", "Bob1", "Bob1", "Bob1", "Bob1",
    ]
    # multi-value cell split positionally
    assert rows[3].first_name_cleaned_1 == "Bob2"


def test_processed_dates(processed):
    rows = processed.collect()
    r = rows[0]
    assert (
        r.birthdate_year_cleaned, r.birthdate_month_cleaned, r.birthdate_day_cleaned,
    ) == ("1900", "04", "09")
    # single-digit month zero-padded
    assert rows[2].imprisonment_month_cleaned == "08"
    # all-null date → fully blanked, not partially filled
    assert (
        rows[3].birthdate_year_cleaned, rows[3].birthdate_month_cleaned,
        rows[3].birthdate_day_cleaned,
    ) == ("", "", "")


def test_processed_prisoner_numbers(processed):
    rows = processed.collect()
    assert rows[0].prisoner_number_trim_1 == "111"
    assert rows[0].prisoner_number_qa is False
    # 'None' → no-entry → empty, not QA-flagged (matches reference golden:
    # normalised_enc_data.csv row 7 has trim_1 == '')
    assert rows[7].prisoner_number_trim_1 == ""
    assert rows[7].prisoner_number_qa is False


def test_with_row_key_and_positional_join(spark):
    """J3: explicit row identity + positional concat (SURVEY §7 risk 1)."""
    import pytest

    from aroa_etl_spark.operators.attributes import positional_join, with_row_key

    df = spark.range(100).withColumnRenamed("id", "v")
    keyed = with_row_key(df)
    assert keyed.select("row_key").distinct().count() == 100  # unique

    seq = with_row_key(df, consecutive=True)
    keys = sorted(r["row_key"] for r in seq.collect())
    assert keys == list(range(100))  # consecutive 0..n-1

    left = spark.createDataFrame([("a",), ("b",), ("c",)], ["x"])
    right = spark.createDataFrame([(1,), (2,), (3,)], ["y"])
    got = positional_join(left, right).orderBy("y").collect()
    assert [(r["x"], r["y"]) for r in got] == [("a", 1), ("b", 2), ("c", 3)]

    with pytest.raises(ValueError, match="length mismatch"):
        positional_join(left, right.limit(2))


def test_split_paren_aware(spark):
    """L3 paren-aware re-split: separators inside (...)/[...] protected;
    null arrays yield empty lists (was latent-broken: unresolvable UDF
    type hints + numpy truthiness on the Arrow path)."""
    from pyspark.sql import functions as F

    from aroa_etl_spark.sources.unpacking import split_paren_aware

    df = spark.createDataFrame(
        [(["Schmidt (geb, Meyer)", "Braun"],), (["a;b", "c[d;e]f"],), (None,)],
        "vals array<string>",
    )
    got = [r["s"] for r in df.select(split_paren_aware("vals").alias("s")).collect()]
    assert got[0] == ["Schmidt", "(geb, Meyer)", "Braun"]
    assert got[1] == ["a", "b", "c[d;e]f"]
    assert got[2] == []
