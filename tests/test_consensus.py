"""Golden test for the full EP1 chain stage 3: consensus deduplication
(mirrors reference tests/enc/deduplication_test.py on the synthetic
fixture) plus ColMatcher unit behavior."""

from __future__ import annotations

import re

import pytest

from aroa_etl_spark.operators.attributes import process_unpacked_data
from aroa_etl_spark.operators.consensus import (
    ColMatcher,
    ENCDeduplicater,
    default_col_matcher,
    default_date_col_matcher,
    default_fuzzy_col_matcher,
)
from aroa_etl_spark.sources.unpacking import unpack
from tests.fixtures.enc_fixture import raw_enc_df

PERSON_COLS = ["first_name_cleaned_0", "first_name_cleaned_1", "last_name_cleaned_0"]
DATE_COLS = [
    "birthdate_day_cleaned", "birthdate_month_cleaned", "birthdate_year_cleaned",
    "imprisonment_day_cleaned", "imprisonment_month_cleaned", "imprisonment_year_cleaned",
]
OTHER_COLS = [
    "imprisonment_camp_cleaned", "place_of_birth_0_cleaned", "place_of_birth_1_cleaned",
]
STRICT_COLS = [f"prisoner_category_{i}_cleaned" for i in range(6)]


# ---------------------------------------------------------------- kernels

def test_col_matcher_umlaut_unification():
    m = default_col_matcher()
    assert m(["Muller", "Müller", "Mueller"]) == "Müller"


def test_col_matcher_syllable():
    m = default_col_matcher()
    assert m(["Frankfurt", "Frandfurt", "Frankfurter"]) == "Frankfurt"


def test_col_matcher_too_few_values():
    m = default_col_matcher()
    assert m(["OnlyOne", "-", ""]) == "-"


def test_col_matcher_conflict_is_none():
    m = default_col_matcher()
    assert m(["Alpha", "Beta", "Gamma"]) is None


def test_date_matcher_verbatim():
    m = default_date_col_matcher()
    assert m(["1943", "", "1944"]) is None  # single votes only → ambiguous
    assert m(["1943", "1943", "1944"]) == "1943"  # majority support
    assert m(["1943", "1943", "1943"]) == "1943"
    assert m(["-", "-", "1943"]) == "-"  # dash break


def test_fuzzy_matcher_medoid():
    m = default_fuzzy_col_matcher()
    assert m(["Weimar", "Weimar", "Wiemar"]) == "Weimar"


def test_custom_matcher_break_if():
    m = ColMatcher().break_if(lambda vals: len(vals) > 2, "TOO_MANY")
    assert m(["a", "b", "c"]) == "TOO_MANY"


# ---------------------------------------------------------------- end-to-end

@pytest.fixture(scope="module")
def dedup_result(spark):
    unpacked = unpack(
        raw_enc_df(spark), "json_data",
        additional_splits_on=lambda col: re.search(r"(category)", col),
    )
    processed = process_unpacked_data(
        unpacked, skip_columns=["row_id", "workflow_id", "document_id"]
    )
    dedup = (
        ENCDeduplicater(processed, "document_id", metadata_columns=["workflow_id"])
        .on_person_cols(PERSON_COLS)
        .on_date_cols(DATE_COLS)
        .on_other_cols(OTHER_COLS)
        .on_other_strict_cols(STRICT_COLS)
    )
    return dedup.run().cache()


def test_dedup_shape_and_ids(dedup_result):
    rows = dedup_result.collect()
    assert len(rows) == 10  # 8 raw (deleted) + 2 consensus
    consensus = [r for r in rows if not r.deleted]
    assert len(consensus) == 2
    assert all(r.object_id for r in consensus)
    assert "object_id" in dedup_result.columns


def test_dedup_consensus_values(dedup_result):
    consensus = {
        r.document_id: r for r in dedup_result.collect() if not r.deleted
    }
    assert consensus["do_001"].last_name_cleaned_0 == "Müller"
    assert consensus["do_002"].last_name_cleaned_0 == "Schmidt"
    assert consensus["do_001"].first_name_cleaned_0 == "Alice"
    assert consensus["do_002"].first_name_cleaned_0 == "Bob1"
    assert consensus["do_002"].first_name_cleaned_1 == "Bob2"
    assert consensus["do_001"].place_of_birth_0_cleaned == "Frankfurt"
    assert consensus["do_002"].place_of_birth_0_cleaned == "Stadt"


def test_dedup_ambiguity_marking(dedup_result):
    consensus = {
        r.document_id: r for r in dedup_result.collect() if not r.deleted
    }
    amb1 = set(consensus["do_001"].ambiguous_columns.split(", "))
    # engineered conflicts of document 1 (reference golden set):
    assert "imprisonment_year_cleaned" in amb1  # 1943 vs 1944
    assert "imprisonment_camp_cleaned" in amb1  # Unklar vs None
    assert "prisoner_category_5_cleaned" in amb1  # only one row has a 6th
    assert "place_of_birth_1_cleaned" in amb1  # only one row has a 2nd place
    # ambiguous columns are masked with '?'
    assert consensus["do_001"].imprisonment_year_cleaned == "?"
    # raw rows carry their document's ambiguity info
    raw1 = [r for r in dedup_result.collect() if r.deleted and r.document_id == "do_001"]
    assert all(r.is_ambiguous for r in raw1)


def test_dedup_deterministic_object_ids(spark, dedup_result):
    ids1 = {
        r.document_id: r.object_id for r in dedup_result.collect() if not r.deleted
    }
    # recompute → same ids (deterministic mode)
    unpacked = unpack(
        raw_enc_df(spark), "json_data",
        additional_splits_on=lambda col: re.search(r"(category)", col),
    )
    processed = process_unpacked_data(
        unpacked, skip_columns=["row_id", "workflow_id", "document_id"]
    )
    again = (
        ENCDeduplicater(processed, "document_id")
        .on_person_cols(PERSON_COLS)
        .on_date_cols(DATE_COLS)
        .on_other_cols(OTHER_COLS)
        .on_other_strict_cols(STRICT_COLS)
        .run()
    )
    ids2 = {r.document_id: r.object_id for r in again.collect() if not r.deleted}
    assert ids1 == ids2


def test_combine_columns_default_is_native_and_matches_udf_path(spark):
    import re as _re

    from aroa_etl_spark.operators.consensus import EncMatcher

    df = spark.createDataFrame(
        [
            ("d1", "Wien", "Wien IX"),
            ("d2", None, "Linz"),
            ("d3", "123", "---"),
            ("d4", None, None),
        ],
        ["doc", "city_0", "city_1"],
    )

    native = EncMatcher(df, "doc").combine_columns(["city_0", "city_1"], "full_city")
    # the default predicate must compile to native exprs — no Python UDF
    plan = native.df._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan

    pred = lambda v: v is not None and _re.search(r"[a-zA-Z]", str(v))  # noqa: E731
    udf_path = EncMatcher(df, "doc").combine_columns(
        ["city_0", "city_1"], "full_city", join_filter=pred
    )
    get = lambda m: {  # noqa: E731
        r["doc"]: r["full_city"] for r in m.df.select("doc", "full_city").collect()
    }
    assert get(native) == get(udf_path) == {
        "d1": "Wien, Wien IX", "d2": "Linz", "d3": "", "d4": "",
    }


def test_custom_join_filter_is_arrow_batched(spark):
    """A user-supplied join_filter must compile to an Arrow-batched
    pandas UDF (ArrowEvalPython), never row-at-a-time BatchEvalPython —
    the plan invariant extends to custom-predicate pipelines."""
    from aroa_etl_spark.operators.consensus import EncMatcher

    df = spark.createDataFrame(
        [("d1", "Wien", "X"), ("d2", None, "Linz")], ["doc", "a", "b"]
    )
    m = EncMatcher(df, "doc").combine_columns(
        ["a", "b"], "j", join_filter=lambda v: v is not None and len(str(v)) > 1
    )
    plan = m.df._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan
    assert "ArrowEvalPython" in plan
    got = {r["doc"]: r["j"] for r in m.df.select("doc", "j").collect()}
    assert got == {"d1": "Wien", "d2": "Linz"}
