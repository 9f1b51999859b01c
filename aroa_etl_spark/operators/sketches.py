"""Mergeable, deterministic data sketches: KMV distinct-count and
count-min frequency estimation.

At 100 TB you cannot afford ``COUNT(DISTINCT key)`` over a high-cardinality
key for monitoring/profiling purposes — the exact answer costs a full
shuffle of every distinct key. Sketches reduce that to a bounded-size
mergeable summary built with map-side partial aggregation:

- **KMV (k-minimum values)**: keep the k smallest distinct hash values of
  the key; if the k-th smallest (normalized to (0,1]) is ``u_k``, then
  ``(k-1)/u_k`` estimates the distinct count (Bar-Yossef et al. 2002,
  "Counting distinct elements in a data stream"). Mergeable: the union of
  two KMV sets, re-truncated to k, is the KMV of the union. Relative
  error ~ 1/sqrt(k).
- **Count-min sketch** (Cormode & Muthukrishnan 2005): d independent
  hash rows of w counters; per-key estimate is the min over rows of the
  addressed counters — an overestimate with error <= 2N/w at probability
  1 - 2^-d. The sketch build is ONE map-side-combinable groupBy on
  (row, bucket): at most d*w groups regardless of input size.

Unlike Spark's built-in ``approx_count_distinct`` (HLL++) these are
built from the engine-wide md5 hash family, so an external engine
(the DuckDB oracle, a different cluster) reproduces the estimate
BIT-IDENTICALLY — which also makes the estimates auditable and
regression-testable, not just statistically plausible.

The reference has no sketch surface (its scale ceiling made exact
passes viable); this is part of the 100 TB extension inventory
(SURVEY.md §2.11).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "kmv_distinct",
    "kmv_sketch",
    "kmv_set_estimates",
    "kmv_distinct_by",
    "cms_build",
    "cms_estimate",
    "bloom_build",
    "bloom_probe",
]

# 15 hex chars = 60 bits: fits a signed BIGINT on both engines.
_HASH_BITS = 60
_HASH_SPACE = float(1 << _HASH_BITS)


def _h60(c: Column, salt: str = "") -> Column:
    """Uniform 60-bit hash of a column via the engine-wide md5 family.
    DuckDB twin: ``('0x'||substr(md5(salt||x),1,15))::UBIGINT::BIGINT``."""
    return F.conv(
        F.substring(F.md5(F.concat(F.lit(salt), c.cast("string"))), 1, 15), 16, 10
    ).cast("long")


def kmv_distinct(df: DataFrame, col: str, k: int = 1024, buckets: int = 4096) -> DataFrame:
    """Single-row frame ``(kmv_k, kmv_estimate)`` estimating
    ``COUNT(DISTINCT col)`` from the k minimum distinct hash values.

    Plan shape (scale posture, stated honestly): hash projection
    (narrow) -> groupBy on ``hash % buckets`` collecting per-group
    distinct hashes -> slice to k -> one final merge of <= ``buckets``
    k-bounded arrays. The FINAL merge is bounded at ``buckets * k``
    longs; the BUILD shuffle still carries one 8-byte hash per distinct
    value (collect_set partials are not k-truncatable map-side) — the
    win over exact COUNT(DISTINCT wide_key) is payload width (8-byte
    hash vs the full key), a mergeable/persistable result, and cheap
    re-aggregation, not a bounded first shuffle. Where build-shuffle
    boundedness itself matters, use Spark's built-in
    ``approx_count_distinct`` (HLL++, bounded partials) and give up
    cross-engine reproducibility. Raise ``buckets`` for very high
    cardinality to cap per-group buffer size (~distinct/buckets each).
    NULLs are ignored (SQL COUNT DISTINCT semantics).

    If fewer than k distinct hashes exist the estimate is the exact
    distinct count (small-range regime).
    """
    h = df.select(_h60(F.col(col)).alias("h")).filter(F.col("h").isNotNull())
    partial = h.groupBy((F.col("h") % buckets).alias("g")).agg(
        F.slice(F.array_sort(F.collect_set("h")), 1, k).alias("mins")
    )
    merged = partial.agg(
        F.slice(
            F.array_sort(F.array_distinct(F.flatten(F.collect_list("mins")))), 1, k
        ).alias("mins")
    )
    n = F.size("mins")
    # normalized k-th minimum in (0, 1]; +1 keeps u strictly positive
    u_k = (F.element_at("mins", n) + F.lit(1)).cast("double") / F.lit(_HASH_SPACE)
    return merged.select(
        n.cast("bigint").alias("kmv_k"),
        F.when(n < k, n.cast("double"))
        .otherwise((n - F.lit(1)).cast("double") / u_k)
        .alias("kmv_estimate"),
    )


def cms_build(df: DataFrame, col: str, depth: int = 4, width: int = 1024) -> DataFrame:
    """Count-min sketch of ``col`` frequencies as a ``(row, bucket, cnt)``
    frame with at most ``depth * width`` rows.

    One map-side-combinable groupBy: each input row contributes
    ``depth`` (row, bucket) increments via ``explode`` of a literal
    row-index array, and partial aggregation collapses them to the
    bounded counter table before the (tiny) shuffle. The sketch is
    mergeable by unioning two sketch frames and re-summing ``cnt``.
    """
    rows = F.array(*[F.lit(j) for j in range(depth)])
    keyed = df.select(F.col(col).cast("string").alias("k")).filter(
        F.col("k").isNotNull()
    )
    exploded = keyed.select("k", F.explode(rows).alias("row"))
    bucketed = exploded.select(
        "row",
        (
            _h60_salted_by_row(F.col("k"), F.col("row")) % F.lit(width)
        ).alias("bucket"),
    )
    return bucketed.groupBy("row", "bucket").agg(
        F.count(F.lit(1)).cast("bigint").alias("cnt")
    )


def _h60_salted_by_row(c: Column, row: Column) -> Column:
    """Row-salted member of the md5 hash family: md5('cms<row>:' || x).
    DuckDB twin: ``('0x'||substr(md5('cms'||row||':'||x),1,15))::UBIGINT::BIGINT``."""
    return F.conv(
        F.substring(
            F.md5(F.concat(F.lit("cms"), row.cast("string"), F.lit(":"), c)), 1, 15
        ),
        16,
        10,
    ).cast("long")


def cms_estimate(
    cms: DataFrame, probes: DataFrame, col: str, depth: int = 4, width: int = 1024
) -> DataFrame:
    """Point-query the sketch for every row of ``probes``: returns the
    probe frame plus ``cms_count`` (the min-over-rows counter estimate,
    an upper bound on the true frequency; 0 if the key hashed to
    never-touched buckets).

    The probe side re-derives the ``depth`` (row, bucket) addresses and
    equi-joins the bounded sketch — the sketch side is at most
    ``depth*width`` rows, so Spark broadcasts it and the probe never
    shuffles.
    """
    rows = F.array(*[F.lit(j) for j in range(depth)])
    # internal names are __cms_-prefixed so probe columns named
    # 'row'/'bucket' cannot collide with the sketch address columns
    addressed = probes.select(
        F.col(col),
        F.col(col).cast("string").alias("__k"),
        F.explode(rows).alias("__cms_row"),
    ).select(
        F.col(col),
        "__cms_row",
        (_h60_salted_by_row(F.col("__k"), F.col("__cms_row")) % F.lit(width)).alias(
            "__cms_bucket"
        ),
    )
    cms_r = cms.select(
        F.col("row").alias("__cms_row"),
        F.col("bucket").alias("__cms_bucket"),
        F.col("cnt").alias("__cms_cnt"),
    )
    joined = addressed.join(
        F.broadcast(cms_r), ["__cms_row", "__cms_bucket"], "left"
    ).select(F.col(col), F.coalesce(F.col("__cms_cnt"), F.lit(0)).alias("__cms_cnt"))
    return joined.groupBy(col).agg(
        F.min("__cms_cnt").cast("bigint").alias("cms_count")
    )


def kmv_sketch(df: DataFrame, col: str, k: int = 1024, buckets: int = 4096) -> DataFrame:
    """Single-row ``(mins)`` frame: the k minimum distinct hashes of
    ``col`` — the raw mergeable KMV sketch behind :func:`kmv_distinct`
    and :func:`kmv_set_estimates`. Same two-level aggregation (and the
    same honest shuffle posture) as :func:`kmv_distinct`."""
    h = df.select(_h60(F.col(col)).alias("h")).filter(F.col("h").isNotNull())
    partial = h.groupBy((F.col("h") % buckets).alias("g")).agg(
        F.slice(F.array_sort(F.collect_set("h")), 1, k).alias("mins")
    )
    return partial.agg(
        F.slice(
            F.array_sort(F.array_distinct(F.flatten(F.collect_list("mins")))), 1, k
        ).alias("mins")
    )


def kmv_set_estimates(
    a: DataFrame, col_a: str, b: DataFrame, col_b: str, k: int = 1024
) -> DataFrame:
    """Distinct-set algebra from two KMV sketches (Beyer et al. 2007,
    "On synopses for distinct-value estimation under multiset
    operations"): single-row frame with

    - ``union_est``      |A ∪ B| estimate — KMV over the merged minima
      (the k smallest of sketch(A) ∪ sketch(B) IS the KMV of A ∪ B);
    - ``intersect_est``  |A ∩ B| ≈ (|K ∩ A ∩ B| / |K|) * union_est,
      where K is the merged k-minimum set;
    - ``jaccard_est``    |K ∩ A ∩ B| / |K|.

    In the small regime (fewer than k distinct hashes) all three are
    exact. Everything is integer/set arithmetic over the two bounded
    sketches joined as single rows — no data-side work beyond the two
    sketch builds."""
    sa = kmv_sketch(a, col_a, k).select(F.col("mins").alias("ma"))
    sb = kmv_sketch(b, col_b, k).select(F.col("mins").alias("mb"))
    j = sa.crossJoin(sb)
    merged = F.slice(F.array_sort(F.array_union("ma", "mb")), 1, k)
    out = j.select(merged.alias("mu"), "ma", "mb")
    n = F.size("mu")
    u_k = (F.element_at("mu", n) + F.lit(1)).cast("double") / F.lit(_HASH_SPACE)
    union_est = (
        F.when(n < k, n.cast("double"))
        .otherwise((n - F.lit(1)).cast("double") / u_k)
    )
    inter = F.size(F.array_intersect(F.array_intersect(F.col("mu"), F.col("ma")), F.col("mb")))
    return out.select(
        union_est.alias("union_est"),
        (inter.cast("double") * union_est / n.cast("double")).alias("intersect_est"),
        (inter.cast("double") / n.cast("double")).alias("jaccard_est"),
    )


def kmv_distinct_by(
    df: DataFrame, group_cols: list[str] | str, col: str, k: int = 256
) -> DataFrame:
    """Per-group distinct-count estimates: ``group_cols + (kmv_k,
    kmv_estimate)`` — ``approx_count_distinct`` shaped, but
    bit-reproducible (md5 hash family) like :func:`kmv_distinct`.

    ONE groupBy with ``array_sort(collect_set)[1:k]`` per group — the
    grouped-profiling shape (distinct users per cohort, distinct docs
    per domain). Honest posture: the k-slice bounds the RESULT, not the
    build shuffle (collect_set partials carry each group's per-partition
    distinct hashes); the win over exact per-group COUNT(DISTINCT) is
    the 8-byte hash payload and a reproducible, auditable estimate.
    """
    group_cols = [group_cols] if isinstance(group_cols, str) else list(group_cols)
    h = df.select(*group_cols, _h60(F.col(col)).alias("h")).filter(
        F.col("h").isNotNull()
    )
    sk = h.groupBy(*group_cols).agg(
        F.slice(F.array_sort(F.collect_set("h")), 1, k).alias("mins")
    )
    n = F.size("mins")
    u_k = (F.element_at("mins", n) + F.lit(1)).cast("double") / F.lit(_HASH_SPACE)
    return sk.select(
        *group_cols,
        n.cast("bigint").alias("kmv_k"),
        F.when(n < k, n.cast("double"))
        .otherwise((n - F.lit(1)).cast("double") / u_k)
        .alias("kmv_estimate"),
    )


def _bloom_positions(c: Column, m: int, k: int) -> Column:
    """The k bit positions of a key: md5-family hashes with per-hash
    salts, mod m. DuckDB twin: ``('0x'||substr(md5('b{i}:'||x),1,15))
    ::UBIGINT::BIGINT % m`` (the 60-bit value is non-negative, so %
    agrees across engines)."""
    return F.array(
        *[( _h60(c, salt=f"b{i}:") % m).cast("int") for i in range(k)]
    )


def bloom_build(df: DataFrame, col: str, m: int = 4096, k: int = 3) -> DataFrame:
    """1-row Bloom filter over ``col`` in position-list form: the
    sorted distinct set bit positions (``bits array<int>``, bounded at
    m elements) plus ``n_set_bits``.

    Position-list beats a packed bitmap here because it is MERGEABLE
    with plain array union (two filters with the same (m, k) merge by
    ``array_distinct(concat(bits_a, bits_b))``) and replayable by an
    oracle in list arithmetic; at m in the thousands the list is at
    most a few KiB — broadcast freely. The build is one explode of k
    positions per key + one distinct — shuffle payload is 4-byte
    positions capped at m distinct values, NOT the key width.

    The standard use at 100 TB is the same as Spark's built-in
    bloom_filter_agg (which trades this determinism for speed): build
    on the small side's join key, broadcast, pre-filter the big side
    before the real join — j_bloom_prune shows that play; this
    operator is its deterministic, mergeable, cross-engine-checkable
    sibling."""
    if m < 8 or k < 1:
        raise ValueError(f"need m >= 8 and k >= 1, got m={m} k={k}")
    pos = (
        df.filter(F.col(col).isNotNull())
        .select(F.explode(_bloom_positions(F.col(col), m, k)).alias("p"))
        .distinct()
    )
    return pos.agg(
        F.array_sort(F.collect_list("p")).alias("bits"),
        F.count(F.lit(1)).cast("int").alias("n_set_bits"),
    )


def bloom_probe(
    df: DataFrame,
    col: str,
    bloom: DataFrame,
    m: int = 4096,
    k: int = 3,
    out: str = "bloom_hit",
) -> DataFrame:
    """Append ``out`` (1 = possibly member, 0 = DEFINITELY not) by
    testing all k positions of each key against the broadcast 1-row
    filter. No false negatives by construction — the catalog entry
    asserts that as an oracle-checked invariant, not a comment."""
    # reserved internal names so a probe frame that itself carries a
    # 'bits' (or '__pos') column neither collides nor gets dropped
    probed = df.withColumn("__bloom_pos", _bloom_positions(F.col(col), m, k))
    return (
        probed.crossJoin(
            F.broadcast(bloom.select(F.col("bits").alias("__bloom_bits")))
        )
        .withColumn(
            out,
            (
                F.size(
                    F.array_except(F.col("__bloom_pos"), F.col("__bloom_bits"))
                )
                == 0
            ).cast("int"),
        )
        .drop("__bloom_pos", "__bloom_bits")
    )
