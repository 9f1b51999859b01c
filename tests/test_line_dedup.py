"""line_dedup (C4-style corpus line dedup) and overlapping chunking tests."""

import pytest
from pyspark.sql import functions as F

from aroa_etl_spark.functions.text import token_chunks_overlap, tokens
from aroa_etl_spark.operators.dedup import line_dedup


@pytest.fixture(scope="module")
def docs(spark):
    boiler = "all rights reserved"
    rows = [
        (1, f"unique alpha\n{boiler}\nunique beta"),
        (2, f"{boiler}\nunique gamma"),
        (3, f"unique delta\n{boiler}"),
        (4, "only unique content"),
        (5, ""),
    ]
    return spark.createDataFrame(rows, "doc_id bigint, text string")


def test_line_dedup_removes_frequent_keeps_first(docs):
    out = {r.doc_id: r for r in line_dedup(docs, min_repeat=3).collect()}
    # boilerplate occurs 3x -> kept only at its first occurrence (doc 1, idx 1)
    assert out[1].text == "unique alpha\nall rights reserved\nunique beta"
    assert out[2].text == "unique gamma"
    assert out[3].text == "unique delta"
    assert out[4].text == "only unique content"
    assert out[2].n_lines_kept == 1 and out[1].n_lines_kept == 3


def test_line_dedup_below_threshold_untouched(docs):
    out = {r.doc_id: r.text for r in line_dedup(docs, min_repeat=4).collect()}
    # 3 occurrences < min_repeat=4 -> everything survives
    assert out[2] == "all rights reserved\nunique gamma"


def test_line_dedup_preserves_other_columns_and_empty_doc(spark):
    df = spark.createDataFrame(
        [(1, "x", "en"), (2, "x", "de"), (3, "x", "fr")],
        "doc_id bigint, text string, lang string",
    )
    out = {r.doc_id: r for r in line_dedup(df, min_repeat=3).collect()}
    assert out[2].lang == "de"
    assert out[2].text == "" and out[2].n_lines_kept == 0  # lost its only line
    assert out[1].text == "x"  # keeper


def test_chunk_overlap_coverage_and_stride(spark):
    df = spark.createDataFrame(
        [(1, " ".join(f"t{i}" for i in range(57)))], "doc_id bigint, text string"
    )
    chunks = (
        df.select(F.posexplode(token_chunks_overlap(tokens("text"), 32, 24)))
        .orderBy("pos")
        .collect()
    )
    assert len(chunks) == 3
    c0, c1, c2 = [r.col.split(" ") for r in chunks]
    assert c0 == [f"t{i}" for i in range(32)]
    assert c1 == [f"t{i}" for i in range(24, 56)]
    assert c2 == [f"t{i}" for i in range(48, 57)]  # ragged tail, 8-token overlap


def test_chunk_overlap_short_doc_single_chunk(spark):
    df = spark.createDataFrame([(1, "a b c")], "doc_id bigint, text string")
    chunks = df.select(
        token_chunks_overlap(tokens("text"), 32, 24).alias("c")
    ).collect()[0].c
    assert chunks == ["a b c"]


def test_chunk_overlap_empty_doc(spark):
    df = spark.createDataFrame([(1, "")], "doc_id bigint, text string")
    assert (
        df.select(token_chunks_overlap(tokens("text"), 32, 24).alias("c"))
        .collect()[0]
        .c
        == []
    )


def test_line_dedup_idempotent(spark):
    rows = [
        (i, "\n".join(["common header"] + [f"unique {i} line {j}" for j in range(3)]))
        for i in range(12)
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    once = line_dedup(df, min_repeat=3)
    twice = line_dedup(once.drop("n_lines_kept"), min_repeat=3)
    a = sorted((r.doc_id, r.text) for r in once.collect())
    b = sorted((r.doc_id, r.text) for r in twice.collect())
    assert a == b  # survivors occur < min_repeat times -> fixpoint
