"""BM25 / inverted-index operator tests."""

import math

import pytest
from pyspark.sql import functions as F

from aroa_etl_spark.operators.search import (
    bm25_topk,
    build_inverted_index,
    term_frequencies,
)


@pytest.fixture(scope="module")
def corpus(spark):
    rows = [
        (1, "spark join window spark"),
        (2, "join the window"),
        (3, "nothing relevant here"),
        (4, "spark spark spark spark spark"),
        (5, ""),
    ]
    return spark.createDataFrame(rows, "doc_id bigint, text string")


def test_term_frequencies(corpus):
    tf = {
        (r.doc_id, r.term): (r.tf, r.doc_len)
        for r in term_frequencies(corpus, "doc_id", "text").collect()
    }
    assert tf[(1, "spark")] == (2, 4)
    assert tf[(2, "join")] == (1, 3)
    assert (5, "") not in tf  # empty doc contributes no terms


def test_inverted_index_postings_sorted(corpus):
    tf = term_frequencies(corpus, "doc_id", "text")
    idx = {r.term: r for r in build_inverted_index(tf, "doc_id").collect()}
    assert idx["spark"].df == 2 and idx["spark"].postings == [1, 4]
    assert idx["join"].df == 2 and idx["join"].postings == [1, 2]


def test_bm25_ranking_and_score(corpus):
    out = bm25_topk(corpus, "doc_id", "text", ["spark"], k=3).collect()
    ids = [r.doc_id for r in out]
    # doc 4 is pure 'spark' (high tf, short normalization penalty),
    # doc 1 has tf=2; doc 3/5 don't match at all
    assert set(ids) == {1, 4}
    # hand-computed BM25 for doc 4: N=5, df=2, avgdl=15/5=3
    idf = math.log(1 + (5 - 2 + 0.5) / (2 + 0.5))
    tf_, dl = 5, 5
    expected = idf * (tf_ * 2.2) / (tf_ + 1.2 * (0.25 + 0.75 * dl / 3.0))
    got = [r.score for r in out if r.doc_id == 4][0]
    assert abs(got - expected) < 1e-6


def test_bm25_no_match_empty(corpus):
    assert bm25_topk(corpus, "doc_id", "text", ["zzzz"], k=3).count() == 0


def test_bm25_multi_term_additive(corpus):
    one = {
        r.doc_id: r.score
        for r in bm25_topk(corpus, "doc_id", "text", ["join"], k=5).collect()
    }
    both = {
        r.doc_id: r.score
        for r in bm25_topk(corpus, "doc_id", "text", ["spark", "join"], k=5).collect()
    }
    # doc 2 matches only 'join': identical score in both queries
    assert abs(both[2] - one[2]) < 1e-9
    # doc 1 matches both terms: strictly higher than its 'join'-only part
    assert both[1] > one[1]


def test_rrf_fuse_math_and_sentinels(spark):
    from aroa_etl_spark.operators.search import rrf_fuse

    lex = spark.createDataFrame([(1, 1), (2, 2), (3, 3)], "doc_id long, rank int")
    sem = spark.createDataFrame([(3, 1), (4, 2)], "doc_id long, rank int")
    rows = {r.doc_id: (r.rank_0, r.rank_1, r.rrf_score)
            for r in rrf_fuse([lex, sem], "doc_id", k=60, topk=10).collect()}
    # doc 3 appears in both legs: 1/63 + 1/61
    assert rows[3] == (3, 1, round(1 / 63 + 1 / 61, 9))
    # single-leg docs carry the 0 sentinel on the missing leg
    assert rows[1] == (1, 0, round(1 / 61, 9))
    assert rows[4] == (0, 2, round(1 / 62, 9))
    # doc 3 (two legs) outranks every single-leg doc here
    top = rrf_fuse([lex, sem], "doc_id").first()
    assert top.doc_id == 3
    import pytest as _pytest

    with _pytest.raises(ValueError, match="at least two"):
        rrf_fuse([lex], "doc_id")


def test_rrf_fuse_rejects_zero_based_ranks(spark):
    from aroa_etl_spark.operators.search import rrf_fuse

    a = spark.createDataFrame([(1, 0), (2, 1)], "doc_id long, rank int")
    b = spark.createDataFrame([(1, 1)], "doc_id long, rank int")
    import pytest as _pytest

    with _pytest.raises(Exception, match="1-based"):
        rrf_fuse([a, b], "doc_id").collect()


def test_rrf_oracle_cosine_template_matches_tdp():
    """Drift guard for the duplicated oracle cosine SQL (a cross-module
    import would reorder catalog registration, which the gate window's
    stable tiebreak depends on — so the duplication is pinned instead)."""
    from aroa_etl_spark.plans import catalog_ext, catalog_tdp

    assert catalog_ext._RRF_COS == catalog_tdp._sql_cosine(
        "q.embedding", "c.embedding"
    )


def test_tfidf_top_terms_ranking(corpus):
    from aroa_etl_spark.operators.search import tfidf_top_terms

    out = tfidf_top_terms(corpus, "doc_id", "text", k=2).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r.doc_id, []).append(r)
    # doc 3: all three terms are corpus-unique (df=1) with tf=1 — equal
    # scores, term-ascending tiebreak, only k=2 survive
    d3 = sorted(by_doc[3], key=lambda r: r.rank)
    assert [r.term for r in d3] == ["here", "nothing"]
    # doc 1: 'spark' (tf=2, df=2) outranks 'join'/'window' (tf=1, df=2)
    assert sorted(by_doc[1], key=lambda r: r.rank)[0].term == "spark"
    # empty doc contributes nothing but still counted in N
    assert 5 not in by_doc
    n, df_spark = 5, 2
    exp_fp = 2 * round(math.log(n / df_spark) * 1e9)
    got = [r for r in by_doc[1] if r.term == "spark"][0]
    assert got.tfidf == round(exp_fp / 1e9, 6)
    assert got.tf == 2


def test_tfidf_rank_never_exceeds_k(corpus):
    from aroa_etl_spark.operators.search import tfidf_top_terms

    out = tfidf_top_terms(corpus, "doc_id", "text", k=1).collect()
    assert all(r.rank == 1 for r in out)
    assert len(out) == 4  # one row per non-empty doc
