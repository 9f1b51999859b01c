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
