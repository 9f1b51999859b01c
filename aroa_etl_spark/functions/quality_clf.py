"""Trainable text-quality classifier, fastText-shape (r7 verdict ask
#5): hashed character n-gram features + logistic regression, with a
scoring path that is PURE column expressions — no Python in the hot
path, oracle-replayable in closed form.

The modern curation default (fastText-style quality/domain gates in
CCNet/RefinedWeb-style pipelines) is a linear model over hashed
n-grams: cheap to train, trivially distributable to score.  Spark
disposition:

- FEATURES: character n-grams hashed to ``buckets`` slots.  The bucket
  function is md5-based (first 4 hex digits mod B) rather than
  murmur3/``F.hash`` so an external engine can replay it exactly —
  both Spark and DuckDB expose md5 over UTF-8 text.
- TRAINING: per-document bucket-count vectors feed
  ``pyspark.ml.classification.LogisticRegression`` (distributed LBFGS
  — training fits Spark ML, the model is a B-length weight vector).
  Fixture-scale count vectors are built with a transform/aggregate
  expression (O(grams × B) per row — fine for B ≤ 256); a 100 TB
  training run would explode grams → groupBy(doc, bucket) instead.
- SCORING: dot(w, counts) == Σ_gram w[bucket(gram)], so inference is a
  single ``aggregate`` over the gram sequence against a LITERAL weight
  array — whole-stage-codegen JVM expressions, broadcast-free (the
  weights ride inside the plan), zero shuffle, zero Python.  Weights
  are pinned as INTEGER milli-units so the score is exact integer
  arithmetic any engine reproduces bit-for-bit.

Reference analogue: none — the reference has rule gates only; this is
the trainable gate the LLM-data-pipeline brief calls for (SURVEY
§2.11 extension surface).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "gram_bucket_expr",
    "hashed_ngram_counts",
    "sparse_ngram_counts",
    "train_quality_classifier",
    "score_hashed_ngrams_milli",
    "bucket_sql_duckdb",
]


def _grams_expr(text_expr: str, n: int, mode: str = "char") -> str:
    """SQL for the array of n-grams of ``text_expr``; empty when the
    text is shorter than n grams (guarded — Spark's sequence(1, 0)
    would DESCEND, not return empty).  ``mode='word'`` shingles
    whitespace tokens joined by a single space (the fastText wordNgrams
    analogue) instead of character windows."""
    if mode == "char":
        return (
            f"if(length({text_expr}) < {n}, array(), "
            f"transform(sequence(1, length({text_expr}) - {n - 1}), "
            f"i -> substring({text_expr}, i, {n})))"
        )
    if mode == "word":
        toks = f"filter(split({text_expr}, '\\\\s+'), t -> t != '')"
        return (
            f"if(size({toks}) < {n}, array(), "
            f"transform(sequence(1, size({toks}) - {n - 1}), "
            f"i -> array_join(slice({toks}, i, {n}), ' ')))"
        )
    raise ValueError(f"mode must be 'char' or 'word', got {mode!r}")


def gram_bucket_expr(
    text_expr: str, *, n: int = 3, buckets: int = 64, mode: str = "char"
) -> str:
    """SQL for the array of hashed bucket ids (one per n-gram):
    ``conv(substr(md5(gram), 1, 4), 16, 10) % buckets`` — md5 so DuckDB
    replays it verbatim (see :func:`bucket_sql_duckdb`)."""
    return (
        f"transform({_grams_expr(text_expr, n, mode)}, "
        f"g -> pmod(cast(conv(substring(md5(g), 1, 4), 16, 10) as bigint), "
        f"{buckets}))"
    )


def bucket_sql_duckdb(gram_sql: str, buckets: int = 64) -> str:
    """The DuckDB twin of the bucket function, for oracle authors."""
    return f"(('0x' || substr(md5({gram_sql}), 1, 4))::BIGINT % {buckets})"


def hashed_ngram_counts(
    df: DataFrame, text_col: str, *, n: int = 3, buckets: int = 64,
    out_col: str = "features", mode: str = "char",
) -> DataFrame:
    """Append a ``buckets``-length int-array column of n-gram bucket
    counts — the training feature vector.  Expression-only; O(grams ×
    buckets) per row, the fixture-scale trade (production:
    :func:`sparse_ngram_counts`)."""
    counts = (
        f"aggregate({gram_bucket_expr(text_col, n=n, buckets=buckets, mode=mode)}, "
        f"array_repeat(0, {buckets}), "
        f"(acc, b) -> transform(acc, (x, j) -> if(j = cast(b as int), x + 1, x)))"
    )
    return df.withColumn(out_col, F.expr(counts))


def sparse_ngram_counts(
    df: DataFrame, text_col: str, *, n: int = 3, buckets: int = 64,
    out_col: str = "features", mode: str = "char",
    id_col: "str | None" = None,
) -> DataFrame:
    """The PRODUCTION featurizer (r8 verdict ask #3): the same bucket
    counts as :func:`hashed_ngram_counts` built the crawl-scale way —
    explode grams → groupBy(doc, bucket) count → map-assemble — so
    per-row cost is O(grams) + one shuffle keyed on (doc, bucket)
    instead of the dense path's O(grams × buckets) lambda (which at
    buckets=4096 multiplies every document's work 4096×).  Equivalence
    with the dense path is pytest-pinned (identical count vectors on
    the same fixture, char and word modes, buckets > 64).

    Assembly is ``transform(sequence(0, B-1), j -> coalesce(m[j], 0))``
    over a per-doc ``map_from_entries`` of (bucket, count) pairs —
    O(buckets) with map lookup, no per-pair rescan.  Documents with no
    grams (short/empty text) keep an all-zero vector via the left join
    back to the input.  ``id_col=None`` tags rows with a transient
    monotonic id; because the tagged frame feeds BOTH sides of the
    join, it is MATERIALIZED first (eager localCheckpoint) —
    monotonically_increasing_id is plan-nondeterministic, and two
    independent evaluations could attach features to the wrong rows
    with no error (review finding).  Pass a real key column to skip
    the checkpoint and keep row identity.  Scale: the (doc, bucket)
    shuffle is the one cost — keys are near-uniform by construction
    (md5 buckets), so no skew handling is needed; at cluster scale
    prefer a real id column over the checkpointed transient path."""
    transient = id_col is None
    key = id_col or "__sparse_id"
    base = (
        df.withColumn(key, F.monotonically_increasing_id()).localCheckpoint(
            eager=True
        )
        if transient
        else df
    )
    grams = gram_bucket_expr(text_col, n=n, buckets=buckets, mode=mode)
    counts = (
        base.select(key, F.explode(F.expr(grams)).alias("__b"))
        .groupBy(key, "__b")
        .agg(F.count(F.lit(1)).alias("__c"))
    )
    pairs = counts.groupBy(key).agg(
        F.map_from_entries(
            F.collect_list(F.struct(F.col("__b"), F.col("__c")))
        ).alias("__m")
    )
    dense = (
        f"transform(sequence(0, {buckets - 1}), "
        f"j -> cast(coalesce(element_at(__m, cast(j as bigint)), 0) as int))"
    )
    out = (
        base.join(pairs, key, "left")
        .withColumn(
            out_col,
            F.when(F.col("__m").isNull(), F.expr(f"array_repeat(0, {buckets})"))
            .otherwise(F.expr(dense)),
        )
        .drop("__m")
    )
    return out.drop(key) if transient else out


def train_quality_classifier(
    df: DataFrame,
    text_col: str,
    label_col: str,
    *,
    n: int = 3,
    buckets: int = 64,
    max_iter: int = 60,
    reg_param: float = 0.01,
    featurizer: str = "auto",
    mode: str = "char",
) -> "tuple[list[float], float]":
    """Train the hashed-n-gram logistic gate on (text, 0/1 label) rows;
    returns ``(weights, intercept)`` — a plain Python list so callers
    can pin it as literals (the fixed-weight-replay pattern: train
    once, freeze, score forever with pure exprs).  Distributed: Spark
    ML LBFGS over count vectors from either featurizer —
    ``featurizer='dense'`` (expression lambda, O(grams × buckets) per
    row, fine at fixture buckets), ``'sparse'`` (explode → groupBy —
    the crawl-scale path), or ``'auto'`` (sparse once buckets exceed
    128, where the dense lambda's multiplier starts to dominate).  The
    two produce IDENTICAL vectors (pytest-pinned), so the trained
    weights do not depend on the choice.  No driver-side feature
    work either way."""
    from pyspark.ml.classification import LogisticRegression
    from pyspark.ml.functions import array_to_vector

    if featurizer == "auto":
        featurizer = "sparse" if buckets > 128 else "dense"
    if featurizer == "sparse":
        featurized = sparse_ngram_counts(
            df, text_col, n=n, buckets=buckets, out_col="__counts", mode=mode
        )
    elif featurizer == "dense":
        featurized = hashed_ngram_counts(
            df, text_col, n=n, buckets=buckets, out_col="__counts", mode=mode
        )
    else:
        raise ValueError(
            f"featurizer must be 'auto', 'dense' or 'sparse', got {featurizer!r}"
        )
    feats = featurized.select(
        F.col(label_col).cast("double").alias("label"),
        array_to_vector(F.expr("transform(__counts, x -> cast(x as double))"))
        .alias("features"),
    )
    lr = LogisticRegression(
        maxIter=max_iter, regParam=reg_param, standardization=False,
        family="binomial",
    )
    model = lr.fit(feats)
    return list(model.coefficients.toArray()), float(model.intercept)


def score_hashed_ngrams_milli(
    text_expr: str,
    weights_milli: "list[int]",
    intercept_milli: int = 0,
    *,
    n: int = 3,
    mode: str = "char",
) -> Column:
    """EXACT integer scoring column: ``intercept + Σ_gram
    w_milli[bucket(gram)]`` with the weight array as plan literals —
    codegen-only inference, bit-identical on any engine/partitioning.
    Callers pin ``weights_milli = [round(w * 1000) for w in weights]``
    from a :func:`train_quality_classifier` run (same ``mode``);
    quality gate = ``score > 0`` (sigmoid is monotone, the threshold
    is all a gate needs)."""
    buckets = len(weights_milli)
    w_arr = "array(" + ",".join(f"{int(w)}L" for w in weights_milli) + ")"
    return F.expr(
        f"cast({int(intercept_milli)} + aggregate("
        f"{gram_bucket_expr(text_expr, n=n, buckets=buckets, mode=mode)}, 0L, "
        f"(acc, b) -> acc + element_at({w_arr}, cast(b as int) + 1)) as bigint)"
    )
