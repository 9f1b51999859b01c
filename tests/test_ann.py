"""ANN operators: brute-force baseline, sign-LSH, and the IVF scale
path (operators/ann.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from aroa_etl_spark.operators.ann import brute_force_topk, ivf_topk, lsh_topk
from aroa_etl_spark.session import load_tables


def _topk_map(rows):
    out = {}
    for r in rows:
        out.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    return out


def test_ivf_full_probe_equals_brute_force(spark, sf_dir):
    """nprobe = n_centroids degenerates to an exact full scan: the IVF
    plumbing (kmeans fit, literal-centroid assignment, probe explode,
    cell join) must reproduce brute force bit-for-bit."""
    emb = load_tables(spark, sf_dir, ("embeddings",))["embeddings"]
    q = emb.filter(F.col("vec_id") < 20)
    bf = sorted(map(tuple, brute_force_topk(q, emb, k=5).collect()))
    ivf = sorted(map(tuple, ivf_topk(q, emb, k=5, n_centroids=8, nprobe=8).collect()))
    assert ivf == bf


def test_ivf_partial_probe_recall_beats_sign_lsh(spark, sf_dir):
    """Data-adaptive cells recall more than fixed sign buckets at a
    comparable candidate budget, even on unstructured random vectors."""
    emb = load_tables(spark, sf_dir, ("embeddings",))["embeddings"]
    q = emb.filter(F.col("vec_id") < 20)
    bf = _topk_map(brute_force_topk(q, emb, k=5).collect())

    ivf = _topk_map(ivf_topk(q, emb, k=5, n_centroids=8, nprobe=2).collect())
    lsh = _topk_map(lsh_topk(q, emb, k=5, sign_dims=8, probe_hamming=1).collect())

    def recall(got):
        return sum(len(got.get(k, set()) & s) / len(s) for k, s in bf.items()) / len(bf)

    r_ivf, r_lsh = recall(ivf), recall(lsh)
    assert r_ivf > r_lsh
    assert r_ivf >= 0.4  # measured 0.60 on the sf0.001 random corpus


def test_ivf_deterministic_across_fits(spark, sf_dir):
    """Fixed seed → same centroids → identical results run over run
    (SURVEY §7 risk 3: no nondeterminism on retries)."""
    emb = load_tables(spark, sf_dir, ("embeddings",))["embeddings"]
    q = emb.filter(F.col("vec_id") < 10)
    a = sorted(map(tuple, ivf_topk(q, emb, k=3, n_centroids=4, nprobe=1).collect()))
    b = sorted(map(tuple, ivf_topk(q, emb, k=3, n_centroids=4, nprobe=1).collect()))
    assert a == b


def test_pq_encode_shape_and_determinism(spark, sf_dir):
    from aroa_etl_spark.operators.ann import pq_encode, pq_train
    from aroa_etl_spark.session import load_tables

    emb = load_tables(spark, sf_dir, ("embeddings",))["embeddings"]
    cb = pq_train(emb, m=8, k=16)
    assert len(cb) == 8 and len(cb[0]) == 16 and len(cb[0][0]) == 8
    codes = pq_encode(emb, cb)
    rows = codes.select("pq_code").limit(20).collect()
    for r in rows:
        assert len(r.pq_code) == 8
        assert all(1 <= c <= 16 for c in r.pq_code)
    # encoding is a pure function of (vector, codebook): partition-invariant
    a = sorted(map(tuple, codes.select("vec_id", "pq_code").collect()))
    b = sorted(
        map(tuple, pq_encode(emb.repartition(7), cb).select("vec_id", "pq_code").collect())
    )
    assert a == b


def test_pq_topk_recall_against_brute_force(spark, sf_dir):
    from pyspark.sql import functions as F

    from aroa_etl_spark.operators.ann import brute_force_topk, pq_encode, pq_topk, pq_train
    from aroa_etl_spark.session import load_tables

    raw = load_tables(spark, sf_dir, ("embeddings",))["embeddings"]
    # normalize to unit length: PQ scores euclidean, the brute baseline
    # scores cosine — on the unit sphere the two orders coincide
    norm = F.sqrt(
        F.aggregate(
            F.col("embedding"),
            F.lit(0.0),
            lambda a, v: a + v.cast("double") * v.cast("double"),
        )
    )
    emb = raw.select(
        "vec_id",
        F.transform("embedding", lambda v: (v.cast("double") / norm).cast("float")).alias(
            "embedding"
        ),
    )
    queries = emb.filter(F.col("vec_id") < 10)
    cb = pq_train(emb, m=8, k=16)
    codes = pq_encode(emb, cb).select("vec_id", "pq_code")
    approx = pq_topk(queries, codes, cb, k=10)
    exact = brute_force_topk(queries, emb, k=10)
    a = {(r.query_id, r.neighbor_id) for r in approx.collect()}
    e = {(r.query_id, r.neighbor_id) for r in exact.collect()}
    recall = len(a & e) / len(e)
    # the synthetic embeddings are near-random, where PQ quantization
    # error genuinely dominates neighbor gaps — recall is modest by the
    # nature of the data, but must sit far above chance (10/500 = 0.02)
    assert recall > 0.1, f"recall {recall}"
    # sanity: ranks are 1..10 per query
    assert approx.groupBy("query_id").count().agg(F.min("count")).first()[0] == 10


def test_pq_adc_matches_numpy_replication(spark, sf_dir):
    """The Spark ADC scorer must equal an independent NumPy replay of
    Jégou's asymmetric distance for the same codebook — exactness of
    the implementation, separate from data-dependent recall."""
    import numpy as np
    from pyspark.sql import functions as F

    from aroa_etl_spark.operators.ann import pq_encode, pq_topk, pq_train
    from aroa_etl_spark.session import load_tables

    emb = load_tables(spark, sf_dir, ("embeddings",))["embeddings"]
    cb = pq_train(emb, m=8, k=16)
    codes_df = pq_encode(emb, cb).select("vec_id", "pq_code")
    got = [
        r.neighbor_id
        for r in sorted(
            pq_topk(
                emb.filter(F.col("vec_id") == 0), codes_df, cb, k=10
            ).collect(),
            key=lambda r: r.rank,
        )
    ]
    V = {r.vec_id: np.array(r.embedding, dtype=float) for r in emb.collect()}
    codes = {r.vec_id: r.pq_code for r in codes_df.collect()}
    cb_np = [np.array(c) for c in cb]
    q = V[0]

    def adc(vid):
        return sum(
            ((q[s * 8:(s + 1) * 8] - cb_np[s][codes[vid][s] - 1]) ** 2).sum()
            for s in range(8)
        )

    want = sorted((v for v in V if v != 0), key=lambda v: (adc(v), v))[:10]
    assert got == want


def test_ivfpq_full_probe_equals_pq(spark, sf_dir):
    """nprobe == n_centroids removes the pruning, leaving pure PQ error:
    the composed index must equal pq_topk exactly."""
    from pyspark.sql import functions as F

    from aroa_etl_spark.operators.ann import ivfpq_topk, pq_encode, pq_topk, pq_train
    from aroa_etl_spark.session import load_tables

    emb = load_tables(spark, sf_dir, ("embeddings",))["embeddings"]
    queries = emb.filter(F.col("vec_id") < 5)
    full = ivfpq_topk(queries, emb, k=5, n_centroids=8, nprobe=8, m=8, pq_k=16)
    cb = pq_train(emb, m=8, k=16)
    plain = pq_topk(queries, pq_encode(emb, cb).select("vec_id", "pq_code"), cb, k=5)
    assert sorted(map(tuple, full.collect())) == sorted(map(tuple, plain.collect()))


def test_ivfpq_pruned_is_subset_shaped(spark, sf_dir):
    from pyspark.sql import functions as F

    from aroa_etl_spark.operators.ann import ivfpq_topk
    from aroa_etl_spark.session import load_tables

    emb = load_tables(spark, sf_dir, ("embeddings",))["embeddings"]
    queries = emb.filter(F.col("vec_id") < 5)
    out = ivfpq_topk(queries, emb, k=5, n_centroids=8, nprobe=2, m=8, pq_k=16)
    rows = out.collect()
    assert {r.query_id for r in rows} == set(range(5))
    per_q = {}
    for r in rows:
        per_q.setdefault(r.query_id, []).append(r.rank)
    for q, ranks in per_q.items():
        assert sorted(ranks) == list(range(1, len(ranks) + 1))


def test_ivfpq_residual_mode(spark, sf_dir):
    """Residual encoding: same output contract, deterministic reruns,
    and with full probing the candidate set is complete (ranks 1..k per
    query) — quantization differs from raw mode by design."""
    from pyspark.sql import functions as F

    from aroa_etl_spark.operators.ann import ivfpq_topk
    from aroa_etl_spark.session import load_tables

    emb = load_tables(spark, sf_dir, ("embeddings",))["embeddings"]
    queries = emb.filter(F.col("vec_id") < 5)
    r1 = ivfpq_topk(
        queries, emb, k=5, n_centroids=8, nprobe=8, m=8, pq_k=16, residual=True
    )
    rows = r1.collect()
    assert {r.query_id for r in rows} == set(range(5))
    per_q = {}
    for r in rows:
        per_q.setdefault(r.query_id, []).append(r.rank)
    for ranks in per_q.values():
        assert sorted(ranks) == [1, 2, 3, 4, 5]
    r2 = ivfpq_topk(
        queries.repartition(3), emb, k=5, n_centroids=8, nprobe=8, m=8, pq_k=16,
        residual=True,
    )
    assert sorted(map(tuple, rows)) == sorted(map(tuple, r2.collect()))


def test_ivf_persisted_index_equals_trained(spark, tmp_path):
    """save -> load round-trips the quantizer bit-exactly and a
    small-nprobe search with the LOADED index returns exactly what the
    trained-in-session index returns."""
    from aroa_etl_spark.operators.ann import (
        ivf_load_centroids,
        ivf_save_centroids,
        ivf_topk,
        ivf_train_centroids,
    )

    emb = spark.createDataFrame(
        [(i, [float((i * 13 + d * 7) % 29) - 14.0 for d in range(8)])
         for i in range(200)],
        "vec_id bigint, embedding array<double>",
    )
    cents = ivf_train_centroids(emb, n_centroids=4, seed=7)
    ivf_save_centroids(spark, cents, str(tmp_path / "cent"))
    loaded = ivf_load_centroids(spark, str(tmp_path / "cent"))
    assert loaded == cents  # bit-exact round-trip

    q = emb.filter("vec_id < 5")
    a = sorted(map(tuple, ivf_topk(q, emb, k=3, nprobe=2, centroids=cents).collect()))
    b = sorted(map(tuple, ivf_topk(q, emb, k=3, nprobe=2, centroids=loaded).collect()))
    assert a == b and len(a) == 15


def test_ivfpq_pinned_index_recall_and_determinism(spark, sf_dir):
    """The frozen ann_ivfpq_topk index (plans/ivfpq_pins.py): recall@5
    vs brute force must sit well above chance (5/500 = 0.01) — modest
    in absolute terms because the synthetic embeddings are near-random
    (PQ quantization error dominates) and PQ scores Euclidean while
    the baseline scores cosine — and the search must be partitioning-
    invariant (pure literal arithmetic end to end)."""
    from pyspark.sql import functions as F

    from aroa_etl_spark.operators.ann import brute_force_topk, ivfpq_topk
    from aroa_etl_spark.plans.ivfpq_pins import _IVFPQ_CENTS, _IVFPQ_CODEBOOK
    from aroa_etl_spark.session import load_tables

    emb = load_tables(spark, sf_dir, ("embeddings",))["embeddings"]
    q = emb.filter(F.col("vec_id") < 20)
    approx = ivfpq_topk(
        q, emb, k=5, nprobe=2,
        centroids=_IVFPQ_CENTS, codebook=_IVFPQ_CODEBOOK,
    )
    a = {(r.query_id, r.neighbor_id) for r in approx.collect()}
    e = {(r.query_id, r.neighbor_id)
         for r in brute_force_topk(q, emb, k=5).collect()}
    recall = len(a & e) / len(e)
    assert recall > 0.05, f"recall {recall}"
    again = ivfpq_topk(
        q.repartition(7), emb.repartition(13), k=5, nprobe=2,
        centroids=_IVFPQ_CENTS, codebook=_IVFPQ_CODEBOOK,
    )
    assert {(r.query_id, r.rank, r.neighbor_id) for r in again.collect()} == {
        (r.query_id, r.rank, r.neighbor_id) for r in approx.collect()
    }


def test_ivfpq_pinned_codebook_overrides_m(spark, sf_dir):
    """A pinned codebook dictates m/sub — mismatched m/pq_k params must
    not corrupt the ADC table shape."""
    from pyspark.sql import functions as F

    from aroa_etl_spark.operators.ann import ivfpq_topk
    from aroa_etl_spark.plans.ivfpq_pins import _IVFPQ_CENTS, _IVFPQ_CODEBOOK
    from aroa_etl_spark.session import load_tables

    emb = load_tables(spark, sf_dir, ("embeddings",))["embeddings"]
    q = emb.filter(F.col("vec_id") < 3)
    out = ivfpq_topk(
        q, emb, k=3, nprobe=2, m=8, pq_k=16,   # deliberately wrong m/pq_k
        centroids=_IVFPQ_CENTS, codebook=_IVFPQ_CODEBOOK,
    ).collect()
    assert len(out) == 9 and {r.rank for r in out} == {1, 2, 3}
