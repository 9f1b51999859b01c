"""fastText-shape quality classifier (r7 verdict ask #5): training on
planted labels learns the signal; scoring is exact integer exprs;
training is deterministic at the prediction level under repartition."""

from __future__ import annotations

from pyspark.sql import functions as F


def _planted(spark, n=400):
    """Half the docs are stopword-dense English-ish, half are
    letter-soup — a separable planted quality signal."""
    rows = []
    for i in range(n):
        if i % 2 == 0:
            rows.append((i, f"the cat and the dog of the house {i} sat on the mat", 1))
        else:
            rows.append((i, f"zzq{i}xv kpw qqj zzk vvx jjq ppz {i} wqk xxj", 0))
    return spark.createDataFrame(rows, "doc_id long, text string, label int")


def test_train_learns_planted_signal_and_scores_exactly(spark):
    from aroa_etl_spark.functions.quality_clf import (
        score_hashed_ngrams_milli, train_quality_classifier,
    )

    df = _planted(spark)
    w, b = train_quality_classifier(df, "text", "label", buckets=64, max_iter=30)
    assert len(w) == 64
    wm = [round(x * 1000) for x in w]
    bm = round(b * 1000)
    scored = df.withColumn(
        "s", score_hashed_ngrams_milli("text", wm, bm)
    ).withColumn("p", (F.col("s") > 0).cast("int"))
    acc = scored.select(
        F.avg((F.col("p") == F.col("label")).cast("double"))
    ).first()[0]
    assert acc >= 0.98, f"planted signal not learned: acc={acc}"


def test_training_prediction_deterministic_under_repartition(spark):
    from aroa_etl_spark.functions.quality_clf import (
        score_hashed_ngrams_milli, train_quality_classifier,
    )

    df = _planted(spark, n=200)
    preds = []
    for frame in (df, df.repartition(13)):
        w, b = train_quality_classifier(frame, "text", "label", buckets=64,
                                        max_iter=30)
        wm = [round(x * 1000) for x in w]
        scored = df.withColumn(
            "p", (score_hashed_ngrams_milli("text", wm, round(b * 1000)) > 0)
            .cast("int")
        )
        preds.append({r.doc_id: r.p for r in scored.select("doc_id", "p").collect()})
    assert preds[0] == preds[1]


def test_scoring_is_partitioning_invariant_and_empty_safe(spark):
    """The frozen-weight score is exact integer arithmetic — identical
    at any partitioning — and sub-n texts score intercept-only."""
    from aroa_etl_spark.functions.quality_clf import score_hashed_ngrams_milli

    wm = [7 * (i % 5) - 3 for i in range(64)]
    df = spark.createDataFrame(
        [(1, "hello world"), (2, ""), (3, "ab"), (4, "abc")],
        "doc_id long, text string",
    )
    col = score_hashed_ngrams_milli("text", wm, 100)
    a = {r.doc_id: r.s for r in df.select("doc_id", col.alias("s")).collect()}
    b = {
        r.doc_id: r.s
        for r in df.repartition(7).select("doc_id", col.alias("s")).collect()
    }
    assert a == b
    assert a[2] == 100 and a[3] == 100  # length < 3 -> intercept only
    # 'abc': exactly one gram
    assert a[4] != 100 or wm[0] == 0


def test_hashed_ngram_counts_shape(spark):
    from aroa_etl_spark.functions.quality_clf import hashed_ngram_counts

    df = spark.createDataFrame([(1, "abcdef")], "doc_id long, text string")
    row = hashed_ngram_counts(df, "text", buckets=16).first()
    assert len(row.features) == 16
    assert sum(row.features) == 4  # 6 chars -> 4 trigrams


def test_sparse_featurizer_matches_dense(spark):
    """r8 verdict ask #3's 'done' condition: the explode→groupBy
    sparse count vectors equal the dense expression-lambda vectors on
    the same fixture — char AND word modes, buckets > 64, including
    empty/short texts (all-zero vectors survive the left join)."""
    from aroa_etl_spark.functions.quality_clf import (
        hashed_ngram_counts, sparse_ngram_counts,
    )

    rows = [
        (1, "the quick brown fox jumps over the lazy dog"),
        (2, "aaaaaa bbb"),
        (3, ""),            # no grams at all
        (4, "xy"),          # shorter than n=3
        (5, "päivää    multiple   spaces\tand\ttabs here"),
        (6, "the quick brown fox jumps over the lazy dog"),  # duplicate
    ]
    df = spark.createDataFrame(rows, "id long, text string")
    for mode, n in (("char", 3), ("word", 2)):
        dense = {
            r.id: r.f
            for r in hashed_ngram_counts(
                df, "text", n=n, buckets=128, out_col="f", mode=mode
            ).collect()
        }
        sparse = {
            r.id: r.f
            for r in sparse_ngram_counts(
                df, "text", n=n, buckets=128, out_col="f", mode=mode,
                id_col="id",
            ).collect()
        }
        assert dense == sparse, mode
        assert all(len(v) == 128 for v in dense.values())
        assert sparse[3] == [0] * 128 and sparse[4] == [0] * 128


def test_sparse_featurizer_transient_id_and_training(spark):
    """featurizer='sparse' trains to the same decision as dense on a
    separable fixture (weights identical up to LBFGS determinism —
    same vectors in, same model out), and the transient-id path keeps
    every row."""
    from aroa_etl_spark.functions.quality_clf import (
        score_hashed_ngrams_milli, sparse_ngram_counts,
        train_quality_classifier,
    )

    good = ["clean well formed prose here"] * 12
    bad = ["zz@@!! ## qq%% ^^&&"] * 12
    df = spark.createDataFrame(
        [(t, 1) for t in good] + [(t, 0) for t in bad], "text string, y int"
    )
    out = sparse_ngram_counts(df, "text", n=3, buckets=64)
    assert out.count() == 24  # transient id dropped, rows preserved
    assert "features" in out.columns and "__sparse_id" not in out.columns

    w_d, b_d = train_quality_classifier(
        df, "text", "y", buckets=64, featurizer="dense")
    w_s, b_s = train_quality_classifier(
        df, "text", "y", buckets=64, featurizer="sparse")
    # identical feature vectors -> identical optimization problem;
    # allow tiny float drift from row-order-dependent summation
    import math
    assert math.isclose(b_d, b_s, rel_tol=1e-6, abs_tol=1e-6)
    assert all(
        math.isclose(a, b, rel_tol=1e-5, abs_tol=1e-6)
        for a, b in zip(w_d, w_s)
    )
    # and the pinned-milli scoring gate separates the classes
    wm = [round(w * 1000) for w in w_s]
    bm = round(b_s * 1000)
    scored = df.select(
        "y", score_hashed_ngrams_milli("text", wm, bm).alias("s")
    ).collect()
    assert all((r.s > 0) == (r.y == 1) for r in scored)


def test_word_ngram_mode_buckets_and_auto(spark):
    """word-gram buckets differ from char-gram buckets (distinct gram
    space), featurizer='auto' flips to sparse above 128 buckets, and
    buckets > 64 score exactly."""
    from aroa_etl_spark.functions.quality_clf import (
        gram_bucket_expr, train_quality_classifier,
    )

    df = spark.createDataFrame(
        [("alpha beta gamma delta",)], "text string"
    )
    chars = df.select(
        F.expr(gram_bucket_expr("text", n=3, buckets=256)).alias("b")
    ).first().b
    words = df.select(
        F.expr(gram_bucket_expr("text", n=2, buckets=256, mode="word")).alias("b")
    ).first().b
    assert len(words) == 3  # 4 tokens -> 3 bigrams
    assert len(chars) == len("alpha beta gamma delta") - 2
    # auto -> sparse at buckets=256 must still train (smoke, tiny fixture)
    tiny = spark.createDataFrame(
        [("good clean text", 1), ("@@!!##", 0)] * 6, "text string, y int"
    )
    w, b = train_quality_classifier(tiny, "text", "y", buckets=256,
                                    featurizer="auto", max_iter=10)
    assert len(w) == 256
