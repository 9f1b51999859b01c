"""Round-3 extension catalog: sketches, search, web/corpus curation,
layout, graph, and profiling operators — each a (Spark builder, DuckDB
oracle) pair like every other catalog module.

All estimates here are DETERMINISTIC (md5 hash family, integer or
fixed-point arithmetic), so the oracle reproduces them bit-identically —
the same engine-wide determinism rules documented in catalog.py apply.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from aroa_etl_spark.plans.catalog import query
from aroa_etl_spark.session import load_tables

_TOK = r"list_filter(string_split_regex(lower(trim(text)), '\s+'), t -> t != '')"

# 2^60 as an exact double literal (hash space of the 60-bit md5 family)
_POW60 = "1152921504606846976"


@query(
    "sk_kmv_distinct",
    oracle=f"""
    WITH h AS (SELECT DISTINCT
                 ('0x'||substr(md5(CAST(o_custkey AS VARCHAR)),1,15))::UBIGINT::BIGINT AS h
               FROM orders WHERE o_custkey IS NOT NULL),
    mins AS (SELECT h FROM h ORDER BY h LIMIT 256),
    agg AS (SELECT COUNT(*) AS n, MAX(h) AS hk FROM mins),
    ex AS (SELECT COUNT(DISTINCT o_custkey) AS exact_distinct FROM orders)
    SELECT CAST(n AS BIGINT) AS kmv_k,
           CASE WHEN n < 256 THEN CAST(n AS DOUBLE)
                ELSE CAST(n - 1 AS DOUBLE) / (CAST(hk + 1 AS DOUBLE) / {_POW60}.0)
           END AS kmv_estimate,
           CAST(exact_distinct AS BIGINT) AS exact_distinct
    FROM agg, ex
    """,
)
def sk_kmv_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KMV distinct-count sketch (operators/sketches.py) on
    orders.o_custkey with k=256, alongside the exact distinct for
    audit. The estimate is a pure function of the 256 smallest md5
    hashes, so DuckDB reproduces it bit-identically. Scale story: the
    sketch shuffle carries <= 4096 bounded arrays instead of every
    distinct key; k=256 gives ~6% relative error, k=4096 ~1.6%."""
    from aroa_etl_spark.operators.sketches import kmv_distinct

    orders = load_tables(spark, sf_dir, ("orders",))["orders"]
    sk = kmv_distinct(orders, "o_custkey", k=256)
    exact = orders.agg(
        F.count_distinct(F.col("o_custkey")).cast("bigint").alias("exact_distinct")
    )
    return sk.crossJoin(exact)


@query(
    "sk_cms_heavy_hitters",
    oracle="""
    WITH keyed AS (SELECT CAST(user_id AS VARCHAR) AS k FROM events
                   WHERE user_id IS NOT NULL),
    rows_t AS (SELECT unnest(range(4)) AS row),
    cms AS (SELECT row,
                   ('0x'||substr(md5('cms'||CAST(row AS VARCHAR)||':'||k),1,15))::UBIGINT::BIGINT
                     % 1024 AS bucket,
                   COUNT(*) AS cnt
            FROM keyed, rows_t GROUP BY 1, 2),
    exact AS (SELECT user_id, COUNT(*) AS exact_count FROM events
              WHERE user_id IS NOT NULL GROUP BY user_id),
    probes AS (SELECT user_id, CAST(user_id AS VARCHAR) AS k FROM exact),
    addressed AS (SELECT user_id, row,
                         ('0x'||substr(md5('cms'||CAST(row AS VARCHAR)||':'||k),1,15))::UBIGINT::BIGINT
                           % 1024 AS bucket
                  FROM probes, rows_t),
    est AS (SELECT user_id, MIN(cnt) AS cms_count
            FROM addressed JOIN cms USING (row, bucket) GROUP BY user_id)
    SELECT user_id,
           CAST(cms_count AS BIGINT) AS cms_count,
           CAST(exact_count AS BIGINT) AS exact_count
    FROM est JOIN exact USING (user_id)
    ORDER BY exact_count DESC, user_id
    LIMIT 20
    """,
)
def sk_cms_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min sketch (depth 4 x width 1024, operators/sketches.py)
    over events.user_id, probed for the top-20 heaviest users with the
    exact count beside the (upper-bound) estimate. The sketch build is
    one map-side-combinable groupBy bounded at 4096 counters no matter
    the input size; the probe join broadcasts the sketch. Deterministic
    md5 row-hashes make the estimate oracle-reproducible."""
    from aroa_etl_spark.operators.sketches import cms_build, cms_estimate

    events = load_tables(spark, sf_dir, ("events",))["events"]
    cms = cms_build(events, "user_id", depth=4, width=1024)
    exact = (
        events.filter(F.col("user_id").isNotNull())
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).cast("bigint").alias("exact_count"))
    )
    est = cms_estimate(cms, exact.select("user_id"), "user_id", depth=4, width=1024)
    return (
        est.join(exact, "user_id")
        .select("user_id", "cms_count", "exact_count")
        .orderBy(F.col("exact_count").desc(), "user_id")
        .limit(20)
    )


@query(
    "search_bm25_topk",
    oracle=f"""
    WITH toks_t AS (SELECT doc_id, {_TOK} AS toks FROM documents),
    stats AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n_docs,
                     CAST(SUM(len(toks)) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS avgdl
              FROM toks_t),
    tf AS (SELECT doc_id, term, COUNT(*) AS tf, ANY_VALUE(dl) AS doc_len
           FROM (SELECT doc_id, unnest(toks) AS term, len(toks) AS dl FROM toks_t)
           GROUP BY doc_id, term),
    m AS (SELECT * FROM tf WHERE term IN ('spark', 'join', 'window')),
    dfreq AS (SELECT term, CAST(COUNT(*) AS DOUBLE) AS df FROM m GROUP BY term),
    parts AS (SELECT m.doc_id,
                     CAST(round(
                       ln(1.0 + ((n_docs - df) + 0.5) / (df + 0.5))
                       * (m.tf * (1.2 + 1.0))
                       / (m.tf + 1.2 * ((1.0 - 0.75) + (0.75 * m.doc_len) / avgdl))
                       * 100000000.0) AS BIGINT) AS fp
              FROM m JOIN dfreq USING (term), stats),
    scored AS (SELECT doc_id, round(SUM(fp) / 100000000.0, 6) AS score
               FROM parts GROUP BY doc_id)
    SELECT doc_id, score FROM scored ORDER BY score DESC, doc_id LIMIT 10
    """,
)
def search_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 top-10 for the bag-of-terms query ['spark','join','window']
    (operators/search.py). The corpus (doc,term) frame is filtered to
    the query's terms BEFORE scoring — a broadcast-pruned join — so at
    100 TB only matching postings are shuffled. Per-term contributions
    round to 1e-8 fixed-point BIGINT before the per-document sum, making
    the score order-independent and oracle-reproducible despite double
    log arithmetic."""
    from aroa_etl_spark.operators.search import bm25_topk

    docs = load_tables(spark, sf_dir, ("documents",))["documents"]
    return bm25_topk(docs, "doc_id", "text", ["spark", "join", "window"], k=10)


@query(
    "search_inverted_index",
    oracle=f"""
    WITH toks_t AS (SELECT doc_id, {_TOK} AS toks FROM documents),
    tf AS (SELECT doc_id, term, COUNT(*) AS tf
           FROM (SELECT doc_id, unnest(toks) AS term FROM toks_t)
           GROUP BY doc_id, term),
    idx AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS df,
                   md5(array_to_string(list_sort(list(doc_id)), ',')) AS postings_md5
            FROM tf GROUP BY term)
    SELECT term, df, postings_md5 FROM idx
    ORDER BY df DESC, term LIMIT 30
    """,
)
def search_inverted_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inverted-index build (operators/search.py): term -> document
    frequency + id-sorted posting list, reduced to md5 at the output
    boundary (array reprs differ across engines; the hash pins content).
    Top-30 terms by df with term tiebreak. One shuffle on term; at scale
    this is the frame you persist bucketed BY term."""
    from aroa_etl_spark.operators.search import build_inverted_index, term_frequencies

    docs = load_tables(spark, sf_dir, ("documents",))["documents"]
    tf = term_frequencies(docs, "doc_id", "text")
    idx = build_inverted_index(tf, "doc_id")
    return (
        idx.select(
            "term",
            "df",
            F.md5(F.concat_ws(",", F.col("postings").cast("array<string>"))).alias(
                "postings_md5"
            ),
        )
        .orderBy(F.col("df").desc(), "term")
        .limit(30)
    )
