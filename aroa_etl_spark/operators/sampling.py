"""Deterministic sampling and dataset-split operators for training-data
pipelines.

Spark's ``df.sample``/``randomSplit`` are partition-RNG based: the
sample CHANGES when the partitioning, cluster size, or row order
changes — unacceptable for reproducible train/val/test splits over a
100 TB corpus. These operators key every decision on a content hash of
a stable id (first 8 md5 hex chars, the same engine-wide hash family as
the dedup/minhash stack), so:

- the assignment of any given row is a pure function of (id, salt) —
  stable under repartitioning, AQE re-plans, cluster resizes, and
  re-runs;
- rows are NOT shuffled: both operators are narrow projections/filters
  that parallelize embarrassingly and push through Catalyst;
- the exact same arithmetic is expressible in any engine with md5
  (DuckDB oracles in the catalog verify bit-for-bit assignment parity).

The reference has no sampling surface (eager pandas: ``df.sample`` with
a seed, single-node only) — this is a scale-era extension, not parity.
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["hash_bucket", "hash_split", "hash_sample", "grouped_sample_exact_k", "deterministic_shuffle", "epoch_repeat"]

# Granularity of split/sample decisions. 10^6 buckets keeps fraction
# resolution at 1e-6 while staying far below 2^32 (no modulo bias worth
# caring about: 2^32 % 1e6 leaves a 0.0002% skew on the last buckets).
BUCKETS = 1_000_000


def hash_bucket(id_col: Column | str, salt: str = "") -> Column:
    """Deterministic bucket in [0, BUCKETS) from md5(salt || id).

    The 8-hex-char prefix → BIGINT → modulo pipeline is the engine's
    standard cross-engine hash (functions/text.py uses the identical
    scheme for minhash), so oracles can replay it exactly."""
    c = F.col(id_col) if isinstance(id_col, str) else id_col
    h = F.md5(F.concat(F.lit(salt), c.cast("string")))
    return (F.conv(F.substring(h, 1, 8), 16, 10).cast("long") % BUCKETS).alias("bucket")


def hash_split(
    df: DataFrame,
    id_col: str,
    weights: Mapping[str, float],
    *,
    salt: str = "",
    split_col: str = "split",
) -> DataFrame:
    """Assign every row to a named split with the given weights,
    deterministically by id hash. Weights must sum to ~1.0; the last
    split absorbs rounding. Adds ``split_col``; no shuffle.

    hash_split(docs, "doc_id", {"train": .8, "val": .1, "test": .1})
    """
    names = list(weights.keys())
    if len(names) < 2:
        raise ValueError("need at least two splits")
    total = sum(weights.values())
    if not 0.999 <= total <= 1.001:
        raise ValueError(f"weights must sum to 1, got {total}")

    bucket = hash_bucket(id_col, salt)
    expr: Column | None = None
    edge = 0.0
    for name in names[:-1]:
        edge += weights[name]
        cond = bucket < int(round(edge * BUCKETS))
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    expr = expr.otherwise(names[-1])
    return df.withColumn(split_col, expr)


def hash_sample(
    df: DataFrame,
    id_col: str,
    fraction: float | Mapping[str, float],
    *,
    strata_col: str | None = None,
    salt: str = "",
) -> DataFrame:
    """Deterministic (optionally stratified) sample: keep a row iff its
    id-hash bucket falls under the fraction. With ``strata_col`` and a
    mapping, each stratum gets its own fraction (strata missing from the
    mapping are dropped). A narrow filter — no shuffle, reproducible
    regardless of partitioning."""
    bucket = hash_bucket(id_col, salt)
    if isinstance(fraction, Mapping):
        if strata_col is None:
            raise ValueError("strata fractions require strata_col")
        expr = None
        for value, frac in fraction.items():
            cond = (F.col(strata_col) == value) & (bucket < int(round(frac * BUCKETS)))
            expr = cond if expr is None else expr | cond
        return df.filter(expr)
    if not 0.0 <= fraction <= 1.0:
        raise ValueError(f"fraction must be in [0,1], got {fraction}")
    return df.filter(bucket < int(round(fraction * BUCKETS)))


def grouped_sample_exact_k(
    df: DataFrame,
    group_col: str,
    id_col: str,
    k: int,
    *,
    oversample: float = 8.0,
    salt: str = "bal1",
) -> DataFrame:
    """EXACTLY k uniformly-sampled rows per group — the balanced
    eval-set constructor (k held-out docs per language/domain/label),
    deterministic like everything in this module.

    Per-group exact-k is a window sort, and a naive window over the
    full corpus shuffles 100 TB onto a handful of group keys (group
    cardinality is tiny — languages, domains).  The scale shape used
    here: each row draws the engine-standard uniform u = md5(salt||id)
    mapped to [0,1); a one-pass group-count aggregate (broadcast back)
    sets a per-group threshold ``min(1, oversample*k/n_g)``; rows over
    the threshold are FILTERED OUT before the window, so row_number
    runs on ~oversample*k survivors per group instead of n_g.  The k
    smallest u per group are below the threshold unless fewer than k
    survivors exist — a (oversample=8) probability below 1e-40 per
    group by Chernoff, and the construction is replayed verbatim by
    the catalog oracle, so the two engines agree row-for-row even in
    that event (the sample is then short, not wrong).

    Returns the sampled rows with ``sample_rank`` (1..k within group,
    ordered by u with id tiebreak).  Groups smaller than k return all
    their rows.  A NULL group key is a group like any other (the join
    with the counts aggregate is null-safe — a plain equi-join would
    silently drop the whole unidentified-language stratum)."""
    if k <= 0:
        raise ValueError(f"k must be positive, got {k}")
    if oversample < 1.0:
        # below 1 the threshold undercuts k/n_g and the "exact k"
        # contract silently degrades to a short sample
        raise ValueError(f"oversample must be >= 1, got {oversample}")
    c_id = F.col(id_col)
    h = F.conv(
        F.substring(F.md5(F.concat(F.lit(salt), c_id.cast("string"))), 1, 15), 16, 10
    ).cast("long")
    u = h.cast("double") / F.lit(float(1 << 60))
    counts = df.groupBy(group_col).agg(F.count(F.lit(1)).alias("__n")).select(
        F.col(group_col).alias("__g"), "__n"
    )
    thresh = F.least(
        F.lit(1.0), F.lit(float(oversample * k)) / F.col("__n").cast("double")
    )
    surv = (
        df.withColumn("__u", u)
        .join(F.broadcast(counts), F.col(group_col).eqNullSafe(F.col("__g")))
        .filter(F.col("__u") <= thresh)
    )
    from pyspark.sql.window import Window as _W

    w = _W.partitionBy(group_col).orderBy(F.col("__u"), c_id)
    return (
        surv.withColumn("sample_rank", F.row_number().over(w))
        .filter(F.col("sample_rank") <= k)
        .drop("__u", "__n", "__g")
    )


def weighted_sample_topk(
    df: DataFrame,
    id_col: str,
    weight_col: str,
    n: int,
    salt: str = "v1",
) -> DataFrame:
    """Weighted sampling WITHOUT replacement via the Efraimidis–
    Spirakis A-ES scheme (IPL 2006): each row gets the key
    ``u^(1/w)`` for a uniform u, and the n largest keys are the sample
    — inclusion probability proportional to weight, no sequential scan,
    no rejection loop. Rows with NULL, zero, or negative weight are
    excluded (they can never be drawn).

    Determinism: u comes from the engine-wide md5 family (salt || id),
    and the key is compared through the monotone-equivalent
    ``ln(u)/w`` rounded to 1e-12 fixed point with the id as tiebreak —
    so the same rows are drawn on every engine, partitioning, and rerun
    (the property that makes a 100 TB sample auditable). Plan: narrow
    key projection + TakeOrderedAndProject — no full sort, no shuffle
    beyond the top-n gather.
    """
    c_id = F.col(id_col)
    h = F.conv(
        F.substring(F.md5(F.concat(F.lit(salt), c_id.cast("string"))), 1, 15), 16, 10
    ).cast("long")
    u = (h + F.lit(1)).cast("double") / F.lit(float(1 << 60))
    raw = F.log(u) / F.col(weight_col) * F.lit(1e12)
    # ln(u) ∈ [-41.6, 0): weights below ~1e-5 push the fixed-point key
    # past long range, where a silent cast would saturate many rows to
    # one value and destroy weight proportionality — raise instead
    # (rescale weights, e.g. multiply by corpus size, and resample).
    key_fp = F.when(
        raw < F.lit(-9.0e18),
        F.raise_error(
            F.concat(
                F.lit("weighted_sample_topk: weight too small for 1e-12 "
                      "fixed-point keys (w="),
                F.col(weight_col).cast("string"),
                F.lit("); rescale weights to >= 1e-5"),
            )
        ).cast("long"),
    ).otherwise(F.round(raw).cast("long"))
    keyed = df.filter(
        F.col(weight_col).isNotNull() & (F.col(weight_col) > 0)
    ).withColumn("__aes_key", key_fp)
    # ln(u) < 0: maximizing u^(1/w) == maximizing ln(u)/w (toward 0)
    return (
        keyed.orderBy(F.col("__aes_key").desc(), c_id.asc())
        .limit(n)
        .drop("__aes_key")
    )


def equidepth_buckets(
    df: DataFrame,
    col: str,
    n_buckets: int,
    exact: bool = True,
    relative_error: float = 0.001,
) -> DataFrame:
    """Assign each row an equi-depth bucket WITHOUT a global sort: compute
    the n-1 boundary quantiles (one aggregation), broadcast them, and
    assign buckets by comparison — the fact-scale replacement for
    ``ntile``, whose single ORDER BY window totally sorts the dataset.

    ``exact=True`` uses ``percentile()`` (exact interpolated quantiles,
    deterministic and cross-engine reproducible — per-group sort inside
    ONE aggregation, fine up to report scale). ``exact=False`` switches
    to ``approx_percentile`` (KLL-style, fully partial-aggregated, the
    100 TB path; boundaries then depend on the sketch, so use it when
    throughput matters more than reproducibility). Ties on a boundary
    go to the lower bucket (value <= boundary); bucket ids are 1-based
    like ntile. Unlike ntile, bucket populations are equal only in
    distribution — exact-equal counts require the global sort this
    operator exists to avoid.
    """
    if n_buckets < 2:
        raise ValueError("n_buckets must be >= 2")
    qs = [i / n_buckets for i in range(1, n_buckets)]
    fn = "percentile" if exact else "approx_percentile"
    arg = "" if exact else f", {int(1 / relative_error)}"
    bounds = df.agg(
        F.expr(
            f"{fn}({col}, array({', '.join(map(str, qs))}){arg})"
        ).alias("__b")
    )
    bucket = F.lit(1)
    for i in range(n_buckets - 1):
        bucket = bucket + F.when(
            F.col(col) > F.element_at("__b", i + 1), 1
        ).otherwise(0)
    return (
        df.crossJoin(F.broadcast(bounds))
        .withColumn("bucket", bucket.cast("int"))
        .drop("__b")
    )


def grouped_equidepth_buckets(
    df: DataFrame,
    col: str,
    by: str,
    n_buckets: int,
    exact: bool = True,
    relative_error: float = 0.001,
) -> DataFrame:
    """Per-GROUP equi-depth buckets WITHOUT a per-group window sort: the
    n-1 boundary quantiles come from ONE groupBy aggregation, join back
    (broadcast — the boundary table is group-count sized), and each row
    buckets by comparison.  This is the fact-scale replacement for
    ``ntile(n) OVER (PARTITION BY group ORDER BY col)``, whose window
    sorts every partition's rows — per-language CCNet terciles over a
    100 TB corpus being the motivating case (see
    ``tdp_perplexity_buckets_scalable``).

    ``exact=True`` uses ``percentile()`` (exact interpolated quantiles,
    cross-engine reproducible — the per-group sort happens inside one
    aggregation, fine while single groups fit a partition's sort
    budget).  ``exact=False`` switches to ``approx_percentile``
    (KLL-style sketch, fully partial-aggregated, bounded memory per
    group — the 100 TB default; boundaries then carry the sketch's
    relative_error).  Ties on a boundary go to the lower bucket; bucket
    ids are 1-based like ntile.  If the group cardinality itself is
    fact-scale, drop the broadcast hint and let AQE pick the join."""
    if n_buckets < 2:
        raise ValueError("n_buckets must be >= 2")
    qs = [i / n_buckets for i in range(1, n_buckets)]
    fn = "percentile" if exact else "approx_percentile"
    arg = "" if exact else f", {int(1 / relative_error)}"
    bounds = df.groupBy(by).agg(
        F.expr(
            f"{fn}({col}, array({', '.join(map(str, qs))}){arg})"
        ).alias("__b")
    )
    bucket = F.lit(1)
    for i in range(n_buckets - 1):
        bucket = bucket + F.when(
            F.col(col) > F.element_at("__b", i + 1), 1
        ).otherwise(0)
    return (
        df.join(F.broadcast(bounds), by)
        .withColumn("bucket", bucket.cast("int"))
        .drop("__b")
    )


def temperature_sample(
    df: DataFrame,
    id_col: str,
    strata_col: str,
    *,
    target_frac: float = 0.2,
    salt: str = "mix",
) -> DataFrame:
    """Temperature-balanced mixture sampling (the multilingual-corpus
    rebalancing recipe, exponent fixed at 0.5): stratum s with n_s rows
    gets sampling weight sqrt(n_s)/sum(sqrt(n_m)), so small strata are
    up-weighted relative to proportional sampling; per-stratum rate =
    min(1, target_frac * total * weight / n_s); each row keeps or drops
    by the engine-standard md5 bucket against floor(rate * BUCKETS).

    Determinism contract: the exponent is 0.5 BECAUSE sqrt is
    correctly-rounded IEEE (pow(x, a) for general a is not guaranteed
    identical across engines); sqrt(n_s) rounds to 1e-6 fixed-point
    BIGINT before the cross-strata SUM (int addition is order-free);
    the rate pipeline is a fixed left-to-right double chain an oracle
    replays exactly.

    Returns df filtered to the sample with ``sample_thresh`` attached.
    Plan: tiny per-stratum aggregate -> 1-row total -> broadcast join
    back -> narrow filter.  The fact table shuffles ONCE (the stats
    groupBy reads it; at 100 TB feed pre-aggregated stratum counts in
    instead) and the filter itself is shuffle-free."""
    c = F.col(strata_col)
    stats = df.groupBy(strata_col).agg(
        F.count(F.lit(1)).cast("bigint").alias("__n_s"),
        F.round(F.sqrt(F.count(F.lit(1)).cast("double")) * F.lit(1000000.0))
        .cast("long")
        .alias("__sq"),
    )
    tot = stats.agg(
        F.sum("__n_s").cast("bigint").alias("__total"),
        F.sum("__sq").cast("bigint").alias("__sum_sq"),
    )
    rate = (
        F.col("__sq").cast("double")
        / F.col("__sum_sq").cast("double")
        * F.col("__total").cast("double")
        * F.lit(target_frac)
        / F.col("__n_s").cast("double")
    )
    th = (
        stats.crossJoin(F.broadcast(tot))
        .select(
            c.alias("__stratum"),
            F.floor(F.least(F.lit(1.0), rate) * F.lit(float(BUCKETS)))
            .cast("long")
            .alias("sample_thresh"),
        )
    )
    bucket = hash_bucket(id_col, salt)
    return (
        df.join(F.broadcast(th), c == F.col("__stratum"))
        .filter(bucket < F.col("sample_thresh"))
        .drop("__stratum")
    )


def deterministic_shuffle(
    df: DataFrame,
    id_col: str,
    *,
    n_shards: int = 64,
    salt: str = "shuf",
) -> DataFrame:
    """Reproducible global corpus shuffle WITHOUT a global sort — the
    pre-packing permutation a training pipeline runs so batches mix
    sources, re-derivable bit-exactly by any engine for resumption or
    audit.

    The permutation is (shard, pos_in_shard): shard = md5 bucket of
    (salt || id); pos_in_shard = rank of the full 60-bit md5 within the
    shard (id tiebreak); global_pos = cumulative size of earlier shards
    + pos_in_shard.  Shard sizes are exact counts, so global positions
    are a true permutation of [1, N] — yet the only per-row window is
    PARTITIONED by shard (never a single global ordering partition),
    and the cumulative offsets come from a window over the tiny
    n_shards-row size dim, broadcast back.  Scale: one hash shuffle +
    one broadcast join; shard count is the parallelism lever (set it
    to O(corpus bytes / shard target), not CPU count).  Changing
    ``salt`` yields an independent permutation — epoch reshuffles are
    a salt bump, no state.  All input columns are carried through, so
    downstream consumers (packing, budget cuts) need no join back."""
    from pyspark.sql.window import Window as W

    h = F.conv(
        F.substring(F.md5(F.concat(F.lit(salt), F.col(id_col).cast("string"))), 1, 15),
        16, 10,
    ).cast("long")
    reserved = {"shard", "pos_in_shard", "global_pos", "__h"}
    clash = reserved & set(df.columns)
    if clash:
        raise ValueError(
            "deterministic_shuffle reserves output columns "
            f"{sorted(reserved)}; rename input columns {sorted(clash)}"
        )
    payload = [c for c in df.columns]
    staged = df.withColumn("__h", h).withColumn(
        "shard", (F.col("__h") % n_shards).cast("int")
    )
    pos = F.row_number().over(
        W.partitionBy("shard").orderBy("__h", id_col)
    )
    positioned = staged.select(*payload, "shard", pos.alias("pos_in_shard"))
    sizes = positioned.groupBy("shard").agg(F.count(F.lit(1)).alias("__n"))
    offsets = sizes.select(
        "shard",
        F.coalesce(
            F.sum("__n").over(
                W.orderBy("shard").rowsBetween(W.unboundedPreceding, -1)
            ),
            F.lit(0),
        ).alias("__offset"),
    )
    return positioned.join(F.broadcast(offsets), "shard").select(
        *payload,
        "shard",
        "pos_in_shard",
        (F.col("__offset") + F.col("pos_in_shard")).cast("bigint")
        .alias("global_pos"),
    )


def epoch_repeat(
    df: DataFrame,
    id_col: str,
    epochs_milli_col: Column,
    *,
    salt: str = "rep",
) -> DataFrame:
    """Dataset mixing with REPETITION — the upsampling half of corpus
    mixing (temperature_sample is the downsampling half): emit each row
    ``epochs`` times, where epochs is fractional — e.g. 2.3 epochs =
    two guaranteed copies plus a third for a deterministic 30% of ids.
    This is how low-resource sources are repeated into a training mix
    (the Llama/GPT corpus-weights recipe) without materializing a
    shuffle: ``explode(sequence(1, n_copies))``, map-side only.

    ``epochs_milli_col``: epochs × 1000 as an integer column (exact
    fractional arithmetic — float epochs would make the fractional
    gate engine-dependent).  The fractional copy is granted when the
    row's md5 bucket (mod 1000) falls below the fractional part, so
    re-runs and other engines reproduce the exact same copy set.
    Output adds ``copy_idx`` (1-based).  Scale: zero shuffle; output
    row count is sum(epochs) by construction."""
    # exact integer floor (div), NOT double division cast — the same
    # rounding hazard the quota apportionment fix removed (review
    # finding)
    gate = hash_bucket(F.col(id_col), salt) % 1000
    return (
        df.withColumn("__em", epochs_milli_col.cast("long"))
        .withColumn(
            "__n",
            F.expr("__em div 1000")
            + (gate < F.pmod(F.col("__em"), F.lit(1000))).cast("long"),
        )
        .filter(F.col("__n") > 0)
        .withColumn("copy_idx", F.explode(F.sequence(F.lit(1), F.col("__n"))))
        .drop("__em", "__n")
    )
