"""Full-text relevance search: inverted index, TF-IDF, BM25 top-k.

The training-data-curation sibling of near-dup detection: given a term
query, rank the corpus by BM25 (Robertson & Zaragoza 2009, "The
Probabilistic Relevance Framework: BM25 and Beyond"). Built entirely
from DataFrame ops:

- ``term_frequencies`` explodes tokens once and aggregates (doc, term)
  counts — one map-side-combinable shuffle keyed by (doc, term);
- ``build_inverted_index`` pivots that into term -> sorted posting list
  (the layout you'd persist bucketed BY term for interactive lookups);
- ``bm25_topk`` joins ONLY the query's terms (a broadcast of a handful
  of rows) against the (doc, term) frame, so the corpus-wide frame is
  filtered to matching postings before any scoring work — at 100 TB the
  scan prunes on the broadcast semi side and the score aggregation
  shuffles only matching (doc) groups.

Scores use natural log and double math; for cross-engine comparison the
catalog entry rounds to 6 decimals and breaks ranking ties by doc id
(the determinism rules in plans/catalog.py).

The reference has no search surface; this is extension inventory
(SURVEY.md §2.11) for corpus curation at scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from aroa_etl_spark.functions import text as X

__all__ = [
    "term_frequencies",
    "build_inverted_index",
    "bm25_topk",
    "tfidf_top_terms",
]


def term_frequencies(docs: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, term, tf, doc_len): per-document term counts plus the token
    length of each document. One explode + one (id, term) groupBy."""
    toks = docs.select(F.col(id_col), X.tokens(text_col).alias("toks"))
    with_len = toks.select(id_col, F.size("toks").alias("doc_len"), "toks")
    return (
        with_len.select(id_col, "doc_len", F.explode("toks").alias("term"))
        .groupBy(id_col, "term")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("tf"),
            F.first("doc_len").alias("doc_len"),
        )
    )


def build_inverted_index(tf: DataFrame, id_col: str) -> DataFrame:
    """term -> df (document frequency) and the posting list sorted by
    id. Persist this bucketed BY term for point lookups; the build is
    one shuffle on term."""
    return tf.groupBy("term").agg(
        F.count(F.lit(1)).cast("bigint").alias("df"),
        F.array_sort(F.collect_list(F.col(id_col))).alias("postings"),
    )


def bm25_topk(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    query_terms: list[str],
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """Top-k documents by BM25 for a bag-of-terms query.

    idf(t) = ln(1 + (N - df + 0.5)/(df + 0.5))   (always positive)
    score  = sum_t idf(t) * tf*(k1+1) / (tf + k1*(1 - b + b*dl/avgdl))

    Returns (id, score) with score rounded to 6 decimals and ties broken
    by id ascending, so the ranking is deterministic cross-engine.
    """
    tf = term_frequencies(docs, id_col, text_col)
    # corpus stats over per-document lengths (NOT the (doc, term) frame,
    # which would weight doc_len once per distinct term)
    stats = (
        docs.select(F.size(X.tokens(text_col)).alias("dl"))
        .agg(
            F.count(F.lit(1)).cast("double").alias("n_docs"),
            (F.sum("dl").cast("double") / F.count(F.lit(1))).alias("avgdl"),
        )
    )
    qterms = [t.lower() for t in query_terms]
    matching = tf.filter(F.col("term").isin(qterms))
    dfreq = matching.groupBy("term").agg(
        F.count(F.lit(1)).cast("double").alias("df")
    )
    scored = (
        matching.join(F.broadcast(dfreq), "term")
        .crossJoin(F.broadcast(stats))
        .select(
            F.col(id_col),
            (
                F.log(
                    F.lit(1.0)
                    + (F.col("n_docs") - F.col("df") + F.lit(0.5))
                    / (F.col("df") + F.lit(0.5))
                )
                * (F.col("tf") * (F.lit(k1) + 1.0))
                / (
                    F.col("tf")
                    + F.lit(k1)
                    * (
                        F.lit(1.0)
                        - F.lit(b)
                        + F.lit(b) * F.col("doc_len") / F.col("avgdl")
                    )
                )
            ).alias("part"),
        )
        # Fixed-point per-term contribution: double addition is
        # order-dependent, BIGINT addition is not (catalog.py determinism
        # rules) — so each term part rounds to 1e-8 units first and the
        # per-document sum is exact.
        .select(F.col(id_col), F.round(F.col("part") * 1e8).cast("long").alias("fp"))
        .groupBy(id_col)
        .agg(F.round(F.sum("fp") / 1e8, 6).alias("score"))
    )
    return scored.orderBy(F.col("score").desc(), F.col(id_col)).limit(k)


def tfidf_top_terms(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 3,
) -> DataFrame:
    """Top-``k`` characteristic terms per document by TF-IDF — the
    classic keyword-extraction / document-labeling pass of a curation
    pipeline (what you'd feed a topic-mixture or domain-tagging stage).

    score(d, t) = tf(d, t) * ln(N / df(t)), with N the TOTAL corpus
    size (empty documents count toward N but contribute no terms).

    Determinism: ln() is double math, so each term's idf rounds to a
    1e-9 fixed-point BIGINT before the tf multiply and the per-document
    ranking — identical ranking and 6-decimal scores on any engine
    (plans/catalog.py determinism rules). Ties break by term ascending.

    Shape at scale: one explode + (doc, term) groupBy for tf, one term
    groupBy for df, one shuffle join back on term, then a per-document
    top-k window partitioned by the document id — every stage keyed,
    nothing global."""
    tf = term_frequencies(docs, id_col, text_col)
    n_docs = docs.agg(F.count(F.lit(1)).cast("double").alias("n_docs"))
    dfreq = tf.groupBy("term").agg(
        F.count(F.lit(1)).cast("double").alias("df")
    )
    scored = (
        tf.join(dfreq, "term")
        .crossJoin(F.broadcast(n_docs))
        .select(
            F.col(id_col),
            "term",
            F.col("tf").cast("bigint").alias("tf"),
            (
                F.col("tf")
                * F.round(
                    F.log(F.col("n_docs") / F.col("df")) * F.lit(1e9)
                ).cast("long")
            ).alias("score_fp"),
        )
    )
    from pyspark.sql.window import Window as W

    win = W.partitionBy(id_col).orderBy(F.col("score_fp").desc(), "term")
    return (
        scored.withColumn("rank", F.row_number().over(win).cast("int"))
        .filter(F.col("rank") <= k)
        .select(
            id_col,
            "rank",
            "term",
            "tf",
            F.round(F.col("score_fp") / F.lit(1e9), 6).alias("tfidf"),
        )
    )


def rrf_fuse(
    rankings: "list[DataFrame]",
    id_col: str = "doc_id",
    *,
    k: int = 60,
    topk: int = 10,
) -> DataFrame:
    """Reciprocal Rank Fusion (Cormack et al. 2009) — the standard
    hybrid-retrieval combiner: each input frame carries (id, rank) from
    one retriever (lexical BM25, semantic ANN, …) and the fused score
    is ``Σ_legs 1/(k + rank)`` with absent legs contributing 0.  Rank
    positions, not raw scores, enter the sum, so heterogeneous score
    scales need no calibration — the reason RRF is the default fuser
    in RAG stacks.

    Returns (id, rank_0..rank_{n-1} with 0 for 'not retrieved',
    rrf_score rounded to 9 dp) — the integer ranks make the double sum
    bit-reproducible on any engine.  Scale: each leg is a top-k frame
    (tiny); the fusion is a broadcast-sized full outer join chain, one
    final sort of ≤ Σ k rows."""
    if len(rankings) < 2:
        raise ValueError("rrf_fuse needs at least two rankings")
    legs = []
    for i, df in enumerate(rankings):
        legs.append(df.select(
            F.col(id_col),
            # ranks must be 1-based: a 0-based leg would both inflate
            # its top document's 1/(k+rank) AND collide with the 0
            # "not retrieved" sentinel — fail loudly at execution
            F.when(
                F.col("rank") >= 1, F.col("rank").cast("int")
            ).otherwise(
                F.expr("raise_error('rrf_fuse: ranks must be 1-based "
                       "(got a rank < 1)')").cast("int")
            ).alias(f"rank_{i}"),
        ))
    fused = legs[0]
    for leg in legs[1:]:
        fused = fused.join(leg, id_col, "full_outer")
    rank_cols = [f"rank_{i}" for i in range(len(legs))]
    score = None
    for c in rank_cols:
        term = F.when(
            F.col(c).isNotNull(), F.lit(1.0) / (F.lit(k) + F.col(c))
        ).otherwise(F.lit(0.0))
        score = term if score is None else score + term
    return (
        fused.select(
            id_col,
            *[F.coalesce(F.col(c), F.lit(0)).alias(c) for c in rank_cols],
            F.round(score, 9).alias("rrf_score"),
        )
        .orderBy(F.desc("rrf_score"), id_col)
        .limit(topk)
    )
