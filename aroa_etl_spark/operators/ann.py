"""Similarity search over embedding columns: brute-force cosine top-k
(exact baseline) and sign-bucket LSH top-k (scale path).

The embeddings table is (vec_id, embedding array<float>, label).

Architecture:
- ``brute_force_topk``: query set × corpus cross-score. The query side
  is expected to be small (it is broadcast); the corpus streams through
  executors — a full scan per query batch, the exact-recall baseline.
  Dot products run JVM-side via zip_with/aggregate in double precision
  (deterministic fold order → oracle-reproducible), ranked by a
  per-query window.
- ``lsh_topk``: both sides bucketed by leading-dimension sign bits
  (fixed axis-aligned hyperplanes — deterministic). Probing multiplies
  recall: each query probes its own bucket plus all buckets within
  ``probe_hamming`` sign flips (the multi-probe LSH trick), then exact
  cosine ranks within candidates. Misses only vectors differing in >
  probe_hamming leading signs — the documented recall trade.
- ``ivf_topk``: the IVF variant — k-means centroid cells (pyspark.ml
  KMeans fit, distributed; centroids inlined as literal arrays so
  assignment is a pure column expression), queries probe their nprobe
  nearest cells. Same join shape as LSH but the cells track the data
  distribution, so recall at small nprobe is far higher (measured
  0.60 vs 0.12 at comparable budgets on the random sf0.001 corpus);
  nprobe = n_centroids degenerates to an exact full scan.

Parameterization (measured on the sf0.01 synthetic embeddings — 500
UNSTRUCTURED random vectors, the worst case for any LSH):

    sign_dims=8: probe 0 → recall@10 0.02; probe 1 → 0.12; probe 2 → 0.33

For a neighbor at cosine ρ the per-hyperplane sign-agreement
probability is 1 − arccos(ρ)/π, so recall ≈ p^sign_dims before
probing: choose sign_dims ≈ log2(corpus_size / desired_bucket_size)
and spend probes to buy recall back. Real embedding corpora are
clustered (ρ within a near-dup group ≫ random), where the same
parameters recall near-dups reliably — the dedup use case this serves.
For high-recall search over unstructured data, use brute_force_topk or
the IVF variant.
"""

from __future__ import annotations

from itertools import combinations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W


def _dot(x: Column, y: Column) -> Column:
    return F.aggregate(
        F.zip_with(x, y, lambda p, q: p.cast("double") * q.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(x: Column) -> Column:
    return F.sqrt(_dot(x, x))


def cosine(x: Column, y: Column) -> Column:
    """Double-precision cosine similarity between two float arrays."""
    return _dot(x, y) / (_norm(x) * _norm(y))


def brute_force_topk(
    queries: DataFrame,
    corpus: DataFrame,
    *,
    k: int = 10,
    query_id: str = "vec_id",
    corpus_id: str = "vec_id",
    query_vec: str = "embedding",
    corpus_vec: str = "embedding",
    exclude_self: bool = True,
) -> DataFrame:
    """Exact cosine top-k: (query_id, rank, neighbor_id).

    Broadcast the (small) query set against the corpus scan; rank with
    a per-query window. Ties break by neighbor id ascending so results
    are total-ordered and reproducible."""
    q = queries.select(
        F.col(query_id).alias("query_id"), F.col(query_vec).alias("__qv")
    )
    c = corpus.select(
        F.col(corpus_id).alias("neighbor_id"), F.col(corpus_vec).alias("__cv")
    )
    scored = (
        F.broadcast(q)
        .crossJoin(c)
        .withColumn("__cos", cosine(F.col("__qv"), F.col("__cv")))
    )
    if exclude_self:
        scored = scored.filter(F.col("query_id") != F.col("neighbor_id"))
    w = W.partitionBy("query_id").orderBy(F.desc("__cos"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "neighbor_id")
    )


def _sign_key(vec: str, sign_dims: int) -> Column:
    return F.concat_ws(
        "",
        *[
            F.when(F.element_at(F.col(vec), i + 1) >= 0, F.lit("1")).otherwise(F.lit("0"))
            for i in range(sign_dims)
        ],
    )


def _probe_keys(vec: str, sign_dims: int, probe_hamming: int) -> Column:
    """Array of bucket keys: the vector's own sign key plus every key
    within ``probe_hamming`` bit flips (multi-probe)."""
    bits = [
        F.when(F.element_at(F.col(vec), i + 1) >= 0, F.lit(1)).otherwise(F.lit(0))
        for i in range(sign_dims)
    ]

    def key_with_flips(flip: set[int]) -> Column:
        parts = [
            (F.lit(1) - bits[i] if i in flip else bits[i]).cast("string")
            for i in range(sign_dims)
        ]
        return F.concat_ws("", *parts)

    keys = [key_with_flips(set())]
    for r in range(1, probe_hamming + 1):
        for combo in combinations(range(sign_dims), r):
            keys.append(key_with_flips(set(combo)))
    return F.array(*keys)


def lsh_topk(
    queries: DataFrame,
    corpus: DataFrame,
    *,
    k: int = 10,
    sign_dims: int = 8,
    probe_hamming: int = 1,
    query_id: str = "vec_id",
    corpus_id: str = "vec_id",
    query_vec: str = "embedding",
    corpus_vec: str = "embedding",
    exclude_self: bool = True,
) -> DataFrame:
    """Approximate cosine top-k via sign-bucket LSH with multi-probe.

    Corpus is bucketed once (its own key); queries explode to
    1 + C(sign_dims,1..probe_hamming) probe keys and equi-join buckets
    — a shuffle join on short string keys instead of a cross product.
    Exact cosine + window rank within candidates. Output schema matches
    brute_force_topk for recall evaluation."""
    c = corpus.select(
        F.col(corpus_id).alias("neighbor_id"),
        F.col(corpus_vec).alias("__cv"),
        _sign_key(corpus_vec, sign_dims).alias("__k"),
    )
    q = queries.select(
        F.col(query_id).alias("query_id"),
        F.col(query_vec).alias("__qv"),
        F.explode(_probe_keys(query_vec, sign_dims, probe_hamming)).alias("__k"),
    )
    scored = (
        q.join(c, "__k")
        .withColumn("__cos", cosine(F.col("__qv"), F.col("__cv")))
    )
    if exclude_self:
        scored = scored.filter(F.col("query_id") != F.col("neighbor_id"))
    w = W.partitionBy("query_id").orderBy(F.desc("__cos"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "neighbor_id")
    )


def _sq_dist(x: Column, y: Column) -> Column:
    return F.aggregate(
        F.zip_with(x, y, lambda p, q: (p.cast("double") - q.cast("double"))
                   * (p.cast("double") - q.cast("double"))),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def ivf_topk(
    queries: DataFrame,
    corpus: DataFrame,
    *,
    k: int = 10,
    n_centroids: int = 16,
    nprobe: int = 2,
    seed: int = 7,
    train_fraction: float = 1.0,
    query_id: str = "vec_id",
    corpus_id: str = "vec_id",
    query_vec: str = "embedding",
    corpus_vec: str = "embedding",
    exclude_self: bool = True,
) -> DataFrame:
    """IVF-style approximate cosine top-k — the 100 TB scale path
    promised in the module header.

    Coarse quantizer: pyspark.ml KMeans (distributed fit, fixed seed)
    on ``train_fraction`` of the corpus; the learned centroids come back
    to the driver (n_centroids × dim floats — tiny) and are inlined as
    literal arrays, so cell assignment is a pure column expression
    (argmin of squared distances) — no UDF, no broadcast variable, and
    the corpus is bucketed in one projection. Queries probe their
    ``nprobe`` nearest cells; candidates equi-join on the cell id and
    exact cosine ranks them. ``nprobe=n_centroids`` degenerates to an
    exact full scan (useful as a correctness oracle); small nprobe
    trades recall for a corpus-fraction scan of roughly nprobe /
    n_centroids.

    Unlike sign-bucket LSH the cells track the DATA distribution, so
    recall on clustered real-world embeddings is high at small nprobe;
    size n_centroids ≈ sqrt(corpus) for balanced cells at scale.
    """
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    train = corpus.select(
        array_to_vector(F.col(corpus_vec).cast("array<double>")).alias("features")
    )
    if train_fraction < 1.0:
        train = train.sample(fraction=train_fraction, seed=seed)
    model = KMeans(k=n_centroids, seed=seed).fit(train)
    cents = [
        F.array(*[F.lit(float(v)) for v in c]) for c in model.clusterCenters()
    ]

    def dists(vec: str) -> Column:
        return F.array(*[_sq_dist(F.col(vec), c) for c in cents])

    def assign(vec: str) -> Column:
        d = dists(vec)
        return F.array_position(d, F.array_min(d)).cast("int")

    def probes(vec: str) -> Column:
        # nprobe nearest cells: sort (dist, idx) structs, take the ids
        d = dists(vec)
        ranked = F.array_sort(
            F.transform(
                d, lambda v, i: F.struct(v.alias("d"), (i + 1).alias("c"))
            )
        )
        return F.slice(F.transform(ranked, lambda s: s["c"]), 1, nprobe)

    c = corpus.select(
        F.col(corpus_id).alias("neighbor_id"),
        F.col(corpus_vec).alias("__cv"),
        assign(corpus_vec).alias("__cell"),
    )
    q = queries.select(
        F.col(query_id).alias("query_id"),
        F.col(query_vec).alias("__qv"),
        F.explode(probes(query_vec)).alias("__cell"),
    )
    scored = q.join(c, "__cell").withColumn(
        "__cos", cosine(F.col("__qv"), F.col("__cv"))
    )
    if exclude_self:
        scored = scored.filter(F.col("query_id") != F.col("neighbor_id"))
    w = W.partitionBy("query_id").orderBy(F.desc("__cos"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "neighbor_id")
    )
