"""Record-linkage / dedup evaluation: precision, recall, F1, and
blocking diagnostics against a labeled pair set.

The reference pipeline produces matches but has no evaluation surface —
quality was judged by eyeballing xlsx exports (SURVEY §3 EP2). At
engine scale you need the metrics AS OPERATORS: given predicted pairs
and ground-truth pairs (both as id-pair frames), compute exact
TP/FP/FN via two anti-joins on canonicalized pairs, and derive
precision/recall/F1 from the exact counts in identical double
arithmetic — deterministic, oracle-checkable.

``blocking_stats`` adds the classic blocking-quality diagnostics:
pairs completeness (recall of the candidate set) and reduction ratio
(1 - candidates / possible-pairs) — the two numbers that tell you
whether an LSH/blocking scheme is keeping enough true pairs while
pruning enough of the quadratic space.

All pair frames are canonicalized to (least, greatest) before
comparison, so direction and duplicates don't skew counts. One shuffle
per anti-join, counts only — nothing quadratic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["linkage_eval", "blocking_stats", "exact_auc", "calibration_bins"]


def _canon(df: DataFrame, a: str, b: str) -> DataFrame:
    return df.select(
        F.least(F.col(a), F.col(b)).alias("__a"),
        F.greatest(F.col(a), F.col(b)).alias("__b"),
    ).distinct()


def linkage_eval(
    pred: DataFrame, truth: DataFrame, a: str = "id_a", b: str = "id_b"
) -> DataFrame:
    """Single-row (tp, fp, fn, precision, recall, f1) — exact counts via
    semi/anti-joins on canonicalized pairs; metrics rounded to 9
    decimals from the exact integers. Empty denominators yield 0.0."""
    p = _canon(pred, a, b)
    t = _canon(truth, a, b)
    tp = p.join(t, ["__a", "__b"], "left_semi").agg(
        F.count(F.lit(1)).cast("bigint").alias("tp")
    )
    fp = p.join(t, ["__a", "__b"], "left_anti").agg(
        F.count(F.lit(1)).cast("bigint").alias("fp")
    )
    fn = t.join(p, ["__a", "__b"], "left_anti").agg(
        F.count(F.lit(1)).cast("bigint").alias("fn")
    )
    j = tp.crossJoin(fp).crossJoin(fn)
    tp_d = F.col("tp").cast("double")
    prec = F.when(F.col("tp") + F.col("fp") > 0, tp_d / (F.col("tp") + F.col("fp"))).otherwise(
        F.lit(0.0)
    )
    rec = F.when(F.col("tp") + F.col("fn") > 0, tp_d / (F.col("tp") + F.col("fn"))).otherwise(
        F.lit(0.0)
    )
    return j.select(
        "tp",
        "fp",
        "fn",
        F.round(prec, 9).alias("precision"),
        F.round(rec, 9).alias("recall"),
        F.round(
            F.when(
                (F.lit(2.0) * F.col("tp") + F.col("fp") + F.col("fn")) > 0,
                F.lit(2.0) * tp_d / (F.lit(2.0) * F.col("tp") + F.col("fp") + F.col("fn")),
            ).otherwise(F.lit(0.0)),
            9,
        ).alias("f1"),
    )


def blocking_stats(
    candidates: DataFrame,
    truth: DataFrame,
    n_records: int,
    a: str = "id_a",
    b: str = "id_b",
) -> DataFrame:
    """Single-row (n_candidates, pairs_completeness, reduction_ratio)
    for a blocking/LSH candidate set: completeness = fraction of true
    pairs surviving blocking; reduction = 1 - candidates / C(n,2)."""
    if n_records < 2:
        raise ValueError("n_records must be >= 2")
    c = _canon(candidates, a, b)
    t = _canon(truth, a, b)
    nc = c.agg(F.count(F.lit(1)).cast("bigint").alias("n_candidates"))
    hit = t.join(c, ["__a", "__b"], "left_semi").agg(
        F.count(F.lit(1)).cast("bigint").alias("__hit")
    )
    nt = t.agg(F.count(F.lit(1)).cast("bigint").alias("__nt"))
    possible = float(n_records * (n_records - 1) // 2)
    return (
        nc.crossJoin(hit)
        .crossJoin(nt)
        .select(
            "n_candidates",
            F.round(
                F.when(
                    F.col("__nt") > 0,
                    F.col("__hit").cast("double") / F.col("__nt").cast("double"),
                ).otherwise(F.lit(0.0)),
                9,
            ).alias("pairs_completeness"),
            F.round(
                F.lit(1.0) - F.col("n_candidates").cast("double") / F.lit(possible), 9
            ).alias("reduction_ratio"),
        )
    )


def exact_auc(
    df: DataFrame,
    score_col: str,
    label_col: str,
    tiebreak_col: str,
    *,
    n_bands: int = 32,
    persist: bool = False,
) -> DataFrame:
    """EXACT ROC-AUC as a 1-row frame — the Mann-Whitney rank form
    with proper tie handling, in pure integer arithmetic until the
    final division (classifier evaluation belongs next to the
    classifier: this is the companion of
    functions/quality_clf.train_quality_classifier).

    Math: with row ranks 1..N over (score, tiebreak) — computed by
    :func:`~aroa_etl_spark.operators.stats.exact_global_rank`, so NO
    single-partition sort — every tie group's average rank is
    (min_rank + max_rank)/2, hence
    ``2U = Σ_groups n_pos_g · (min_g + max_g) − n_pos·(n_pos+1)`` and
    ``AUC = 2U / (2·n_pos·n_neg)`` — all integers until the division,
    so the numerator/denominator pair is bit-replayable on any engine
    and the rounded double is deterministic.

    Output columns: n, n_pos, n_neg, auc_num (=2U), auc_den
    (=2·n_pos·n_neg), auc (double, 9 dp; NULL when the input is
    single-class — AUC is undefined without both labels).  Scale: the banded rank's
    two passes + one groupBy(score) shuffle + a scalar aggregate;
    nothing quadratic, no data-sized window.  ``persist=True`` caches
    the 3-column (score, label, tiebreak) projection so the rank's
    percentile probe, band-size aggregation, and windowed pass scan it
    once instead of re-running an expensive upstream (e.g. a
    classifier scoring expression) three times — same cache-ownership
    contract as exact_global_rank (registered in
    ``operators.stats``'s cache registry; call
    ``stats.release_caches()`` after materializing)."""
    from aroa_etl_spark.operators.stats import exact_global_rank

    ranked = exact_global_rank(
        df.select(
            F.col(score_col).alias("__s"),
            F.col(label_col).cast("int").alias("__y"),
            F.col(tiebreak_col).alias("__t"),
        ),
        "__s",
        "__t",
        rank_col="__rk",
        n_bands=n_bands,
        persist=persist,
    )
    groups = ranked.groupBy("__s").agg(
        F.min("__rk").alias("lo"),
        F.max("__rk").alias("hi"),
        F.sum("__y").alias("np_g"),
    )
    agg = groups.agg(
        F.sum((F.col("lo") + F.col("hi")) * F.col("np_g"))
        .cast("decimal(38,0)").alias("rank_term"),
        F.sum("np_g").cast("bigint").alias("n_pos"),
        F.sum(F.col("hi") - F.col("lo") + 1).cast("bigint").alias("n"),
    )
    return agg.select(
        "n",
        "n_pos",
        (F.col("n") - F.col("n_pos")).alias("n_neg"),
        (F.col("rank_term").cast("bigint")
         - F.col("n_pos") * (F.col("n_pos") + 1)).alias("auc_num"),
        (2 * F.col("n_pos") * (F.col("n") - F.col("n_pos"))).alias("auc_den"),
    ).select(
        "n", "n_pos", "n_neg", "auc_num", "auc_den",
        # AUC is undefined for single-class input (n_pos or n_neg == 0
        # -> auc_den == 0): return NULL explicitly rather than letting
        # the division produce NULL/Infinity by accident — callers can
        # F.assert_true on auc IS NOT NULL if they require both classes
        F.when(
            F.col("auc_den") > 0,
            F.round(
                F.col("auc_num").cast("double")
                / F.col("auc_den").cast("double"),
                9,
            ),
        ).otherwise(F.lit(None).cast("double")).alias("auc"),
    )


def calibration_bins(
    df: DataFrame,
    score_col: str,
    label_col: str,
    n_bins: int = 10,
) -> DataFrame:
    """Reliability-diagram bins for an integer-scored classifier — the
    calibration companion of :func:`exact_auc` (AUC measures ranking;
    calibration measures whether the score MAGNITUDE is trustworthy,
    which decides where a curation pipeline can place its gate
    threshold).

    ``score_col`` must be an integer score (e.g. the classifier's
    milli-logit). Bins are equi-width over the observed [min, max]:
    ``bin = (score - min) * n_bins div (max - min + 1)`` — pure integer
    arithmetic, so bin assignment is bit-identical on any engine (no
    float edges, no transcendentals). Per bin: row count, positive
    count, the exact integer score sum, and the two rounded doubles a
    reliability diagram plots (mean score vs observed positive rate).
    The |gap| column is the bin's expected-calibration-error
    contribution before the n_b/N weighting.

    NULL scores are dropped (they have no bin; min/max already ignore
    them, so keeping the rows would emit a spurious bin=NULL group and
    skew the n_b/N weights).

    Scale: one min/max aggregate (broadcast back as a 1-row dim) + one
    groupBy(bin) — two scans, no window, no sort."""
    if n_bins < 2:
        raise ValueError(f"n_bins must be >= 2, got {n_bins}")
    scored = df.filter(F.col(score_col).isNotNull())
    stats = scored.agg(
        F.min(F.col(score_col).cast("long")).alias("__lo"),
        F.max(F.col(score_col).cast("long")).alias("__hi"),
    )
    binned = (
        scored.select(
            F.col(score_col).cast("long").alias("__s"),
            F.col(label_col).cast("int").alias("__y"),
        )
        .crossJoin(F.broadcast(stats))
        .withColumn(
            "bin",
            F.expr(f"CAST(((__s - __lo) * {n_bins}) DIV (__hi - __lo + 1) AS INT)"),
        )
    )
    per_bin = binned.groupBy("bin").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("__y").cast("bigint").alias("n_pos"),
        F.sum("__s").cast("bigint").alias("score_sum"),
    )
    mean_score = F.round(
        F.col("score_sum").cast("double") / F.col("n").cast("double"), 6
    )
    frac_pos = F.round(
        F.col("n_pos").cast("double") / F.col("n").cast("double"), 6
    )
    return per_bin.select(
        "bin",
        "n",
        "n_pos",
        "score_sum",
        mean_score.alias("mean_score"),
        frac_pos.alias("frac_pos"),
    ).orderBy("bin")
