"""Unit tests for operators/sampling.py — the reproducibility contract."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from aroa_etl_spark.operators.sampling import hash_sample, hash_split


@pytest.fixture(scope="module")
def ids(spark):
    return spark.range(0, 5000).withColumnRenamed("id", "doc_id").withColumn(
        "grp", (F.col("doc_id") % 3).cast("string")
    )


def test_split_stable_under_repartition(ids):
    w = {"train": 0.8, "val": 0.1, "test": 0.1}
    a = {r["doc_id"]: r["split"] for r in hash_split(ids, "doc_id", w).collect()}
    b = {
        r["doc_id"]: r["split"]
        for r in hash_split(ids.repartition(17, "grp"), "doc_id", w).collect()
    }
    assert a == b  # assignment is a pure function of id — never of layout


def test_split_proportions_and_totality(ids):
    w = {"train": 0.8, "val": 0.1, "test": 0.1}
    counts = {
        r["split"]: r["n"]
        for r in hash_split(ids, "doc_id", w).groupBy("split").agg(
            F.count(F.lit(1)).alias("n")
        ).collect()
    }
    assert sum(counts.values()) == 5000  # total: every row lands somewhere
    assert abs(counts["train"] / 5000 - 0.8) < 0.03
    assert abs(counts["val"] / 5000 - 0.1) < 0.02
    assert abs(counts["test"] / 5000 - 0.1) < 0.02


def test_split_salt_changes_assignment(ids):
    w = {"train": 0.5, "test": 0.5}
    a = {r["doc_id"]: r["split"] for r in hash_split(ids, "doc_id", w, salt="a").collect()}
    b = {r["doc_id"]: r["split"] for r in hash_split(ids, "doc_id", w, salt="b").collect()}
    assert a != b
    assert set(a.values()) == {"train", "test"}


def test_split_rejects_bad_weights(ids):
    with pytest.raises(ValueError):
        hash_split(ids, "doc_id", {"train": 0.5, "test": 0.4})
    with pytest.raises(ValueError):
        hash_split(ids, "doc_id", {"all": 1.0})


def test_sample_fraction_and_determinism(ids):
    s1 = hash_sample(ids, "doc_id", 0.2)
    s2 = hash_sample(ids.repartition(7), "doc_id", 0.2)
    got1 = sorted(r["doc_id"] for r in s1.collect())
    got2 = sorted(r["doc_id"] for r in s2.collect())
    assert got1 == got2
    assert abs(len(got1) / 5000 - 0.2) < 0.03


def test_sample_is_subset_consistent(ids):
    """Nested fractions with one salt: the 10% sample ⊂ the 20% sample —
    the property that lets a pipeline grow a sample without resampling."""
    small = {r["doc_id"] for r in hash_sample(ids, "doc_id", 0.1).collect()}
    big = {r["doc_id"] for r in hash_sample(ids, "doc_id", 0.2).collect()}
    assert small <= big


def test_stratified_sample(ids):
    out = hash_sample(
        ids, "doc_id", {"0": 0.5, "1": 0.1}, strata_col="grp"
    ).groupBy("grp").agg(F.count(F.lit(1)).alias("n")).collect()
    counts = {r["grp"]: r["n"] for r in out}
    assert set(counts) == {"0", "1"}  # stratum "2" absent from the map → dropped
    assert abs(counts["0"] / (5000 / 3) - 0.5) < 0.06
    assert abs(counts["1"] / (5000 / 3) - 0.1) < 0.04


def test_no_shuffle_in_plan(ids):
    plan = (
        hash_split(ids, "doc_id", {"a": 0.5, "b": 0.5})
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan


# ---- edge semantics of the curation gate expressions (functions/text.py)


def test_text_gate_edge_cases(spark):
    from pyspark.sql import functions as F

    from aroa_etl_spark.functions import text as X

    df = spark.createDataFrame(
        [("",), ("one",), ("a a a a",), ("a b c d",)], "text string"
    ).select("text", X.tokens("text").alias("toks"))
    df = df.select(
        "text",
        X.distinct_token_ratio("toks").alias("dr"),
        X.max_token_freq_ratio("toks").alias("mf"),
        X.token_chunks("toks", 2).alias("chunks"),
    )
    rows = {r["text"]: r for r in df.collect()}
    assert rows[""]["dr"] == 1.0 and rows[""]["mf"] == 0.0 and rows[""]["chunks"] == []
    assert rows["one"]["dr"] == 1.0 and rows["one"]["mf"] == 1.0
    assert rows["a a a a"]["dr"] == 0.25 and rows["a a a a"]["mf"] == 1.0
    assert rows["a b c d"]["dr"] == 1.0 and rows["a b c d"]["mf"] == 0.25
    assert rows["a b c d"]["chunks"] == ["a b", "c d"]
    assert rows["a a a a"]["chunks"] == ["a a", "a a"]


def test_scrub_pii_counts_and_tags(spark):
    from pyspark.sql import functions as F

    from aroa_etl_spark.functions import text as X

    df = spark.createDataFrame(
        [("mail a@b.io and https://x.io/p?e=c@d.io end",)], "text string"
    ).select(
        X.count_emails("text").alias("ne"),
        X.count_urls("text").alias("nu"),
        X.scrub_pii("text").alias("s"),
    )
    r = df.collect()[0]
    # the email inside the URL query string belongs to the URL tag
    assert r["ne"] == 2 and r["nu"] == 1
    assert r["s"] == "mail <EMAIL> and <URL> end"


def test_temperature_sample_upweights_small_strata(spark):
    """temperature_sample: sqrt-temperature rates up-weight small
    strata relative to proportional sampling; the kept set is a pure
    function of (id, salt) — identical under repartition."""
    import pyspark.sql.functions as F

    from aroa_etl_spark.operators.sampling import temperature_sample

    rows = [(i, "big") for i in range(900)] + [(1000 + i, "small") for i in range(100)]
    df = spark.createDataFrame(rows, "id long, grp string")
    samp = temperature_sample(df, "id", "grp", target_frac=0.2, salt="t1")
    th = {
        r["grp"]: r["thresh"]
        for r in samp.groupBy("grp")
        .agg(F.max("sample_thresh").alias("thresh"))
        .collect()
    }
    # proportional would give both strata thresh 200000; sqrt-temperature
    # shifts budget toward the small stratum
    assert th["small"] > 200_000 > th["big"], th
    ids = sorted(r["id"] for r in samp.collect())
    ids2 = sorted(
        r["id"] for r in temperature_sample(
            df.repartition(7), "id", "grp", target_frac=0.2, salt="t1"
        ).collect()
    )
    assert ids == ids2 and len(ids) > 0


def test_grouped_equidepth_buckets(spark):
    """Per-group terciles via one aggregation: bucket counts per group
    are near-equal and boundaries respect the <=-goes-lower tie rule;
    the approx path produces the same buckets on a small frame (the
    sketch is exact below its compaction threshold)."""
    from aroa_etl_spark.operators.sampling import grouped_equidepth_buckets

    rows = [("a", float(i)) for i in range(30)] + [("b", float(i * 10)) for i in range(12)]
    df = spark.createDataFrame(rows, "g string, v double")
    out = grouped_equidepth_buckets(df, "v", "g", 3).collect()
    by_group = {}
    for r in out:
        by_group.setdefault((r.g, r.bucket), []).append(r.v)
    # group a: 30 values 0..29, boundaries at ~9.67/19.33 -> 10/10/10
    assert sorted(len(by_group[("a", b)]) for b in (1, 2, 3)) == [10, 10, 10]
    # within-group ordering: every bucket-1 value < every bucket-3 value
    assert max(by_group[("a", 1)]) < min(by_group[("a", 3)])
    assert max(by_group[("b", 1)]) < min(by_group[("b", 3)])
    # groups bucket independently: b's bucket-1 values exceed a's range
    assert max(by_group[("b", 3)]) == 110.0
    approx = grouped_equidepth_buckets(df, "v", "g", 3, exact=False).collect()
    assert sorted((r.g, r.v, r.bucket) for r in approx) == sorted(
        (r.g, r.v, r.bucket) for r in out
    )


def test_grouped_equidepth_rejects_bad_buckets(spark):
    from aroa_etl_spark.operators.sampling import grouped_equidepth_buckets
    import pytest as _pytest

    df = spark.createDataFrame([("a", 1.0)], "g string, v double")
    with _pytest.raises(ValueError):
        grouped_equidepth_buckets(df, "v", "g", 1)


def test_quality_score_from_matches_composed(spark):
    """The materialized-token hot path must be value-identical to the
    composed quality_score on every penalty branch (short doc, punct
    blast, no stopwords, empty, healthy prose)."""
    from pyspark.sql import functions as F
    from aroa_etl_spark.functions import text as X

    rows = [
        ("the quick brown fox jumps over the lazy dog and runs far away "
         "from the big red barn with a friendly smile on its face",),
        ("tiny doc",),
        ("!!!! ???? ;;;; @@@@ #### $$$$ %%%%",),
        ("zzz qqq xxx vvv www yyy kkk jjj mmm nnn ppp rrr sss ttt uuu "
         "bbb ccc ddd eee fff ggg",),
        ("",),
        ("   ",),
    ]
    df = spark.createDataFrame(rows, "text string")
    staged = df.select(
        "text",
        X.quality_score("text").alias("composed"),
        X.tokens("text").alias("__toks"),
    ).select(
        "composed", X.quality_score_from("__toks", "text").alias("materialized")
    )
    for r in staged.collect():
        assert r.composed == r.materialized, r


def test_grouped_sample_exact_k_counts_and_determinism(spark):
    from aroa_etl_spark.operators.sampling import grouped_sample_exact_k

    df = spark.createDataFrame(
        [(i, "g%d" % (i % 3)) for i in range(300)], "id bigint, g string"
    )
    out = grouped_sample_exact_k(df, "g", "id", k=5)
    rows = out.collect()
    by_g = {}
    for r in rows:
        by_g.setdefault(r.g, []).append((r.sample_rank, r.id))
    assert set(by_g) == {"g0", "g1", "g2"}
    for g, pairs in by_g.items():
        assert sorted(p[0] for p in pairs) == [1, 2, 3, 4, 5], g
    # determinism under repartition: same ids, same ranks
    out2 = grouped_sample_exact_k(df.repartition(17), "g", "id", k=5)
    assert sorted((r.g, r.sample_rank, r.id) for r in out2.collect()) == sorted(
        (r.g, r.sample_rank, r.id) for r in rows
    )


def test_grouped_sample_exact_k_small_group_returns_all(spark):
    from aroa_etl_spark.operators.sampling import grouped_sample_exact_k

    df = spark.createDataFrame(
        [(1, "a"), (2, "a"), (3, "b")], "id bigint, g string"
    )
    out = grouped_sample_exact_k(df, "g", "id", k=10).collect()
    assert len(out) == 3  # groups smaller than k keep every row


def test_grouped_sample_exact_k_rejects_bad_k(spark):
    import pytest as _pytest
    from aroa_etl_spark.operators.sampling import grouped_sample_exact_k

    df = spark.createDataFrame([(1, "a")], "id bigint, g string")
    with _pytest.raises(ValueError):
        grouped_sample_exact_k(df, "g", "id", k=0)


def test_grouped_sample_exact_k_null_group_kept(spark):
    from aroa_etl_spark.operators.sampling import grouped_sample_exact_k

    df = spark.createDataFrame(
        [(i, None if i % 2 else "a") for i in range(40)], "id bigint, g string"
    )
    out = grouped_sample_exact_k(df, "g", "id", k=3).collect()
    by_g = {}
    for r in out:
        by_g.setdefault(r.g, []).append(r.sample_rank)
    # the NULL stratum samples like any other group (null-safe join)
    assert sorted(by_g[None]) == [1, 2, 3]
    assert sorted(by_g["a"]) == [1, 2, 3]


def test_grouped_sample_exact_k_rejects_bad_oversample(spark):
    import pytest as _pytest
    from aroa_etl_spark.operators.sampling import grouped_sample_exact_k

    df = spark.createDataFrame([(1, "a")], "id bigint, g string")
    with _pytest.raises(ValueError):
        grouped_sample_exact_k(df, "g", "id", k=1, oversample=0.5)


def test_quota_apportionment_sums_to_budget(spark):
    # Hamilton apportionment is exact: quotas sum to the budget and
    # every quota is floor or floor+1 of the proportional share
    from aroa_etl_spark.plans.catalog import spec

    df = spec("tdp_quota_apportionment").builder(spark, "/root/testdata/sf0.001")
    rows = df.collect()
    assert sum(r.quota for r in rows) == 1000
    total = sum(r.n_docs for r in rows)
    for r in rows:
        base = 1000 * r.n_docs // total
        assert r.quota in (base, base + 1), (r.source, r.quota, base)


def test_deterministic_shuffle_is_true_permutation(spark):
    from aroa_etl_spark.operators.sampling import deterministic_shuffle

    df = spark.range(0, 500).withColumnRenamed("id", "doc_id")
    out = deterministic_shuffle(df, "doc_id", n_shards=8)
    rows = out.collect()
    # global_pos is exactly the permutation 1..500
    assert sorted(r.global_pos for r in rows) == list(range(1, 501))
    # re-running yields the identical assignment (reproducibility)
    again = {r.doc_id: r.global_pos for r in deterministic_shuffle(
        df.repartition(13), "doc_id", n_shards=8).collect()}
    assert all(again[r.doc_id] == r.global_pos for r in rows)
    # a salt bump is an independent epoch permutation, same support
    epoch2 = {r.doc_id: r.global_pos for r in deterministic_shuffle(
        df, "doc_id", n_shards=8, salt="epoch2").collect()}
    assert sorted(epoch2.values()) == list(range(1, 501))
    assert any(epoch2[r.doc_id] != r.global_pos for r in rows)


def test_epoch_repeat_fractional_copies(spark):
    from pyspark.sql import functions as F

    from aroa_etl_spark.operators.sampling import epoch_repeat

    df = spark.range(0, 1000).withColumnRenamed("id", "doc_id")
    # 2.3 epochs: everyone twice, ~30% a third time, deterministically
    out = epoch_repeat(df, "doc_id", F.lit(2300))
    per_doc = {r.doc_id: r.n for r in out.groupBy("doc_id")
               .agg(F.count("*").alias("n")).collect()}
    assert len(per_doc) == 1000
    assert set(per_doc.values()) <= {2, 3}
    n3 = sum(1 for v in per_doc.values() if v == 3)
    assert 200 < n3 < 400  # md5-uniform ~300
    # deterministic across re-runs and partitioning
    again = {r.doc_id: r.n for r in epoch_repeat(df.repartition(7), "doc_id", F.lit(2300))
             .groupBy("doc_id").agg(F.count("*").alias("n")).collect()}
    assert again == per_doc
    # sub-1.0 epochs downsample: zero-copy docs drop out entirely
    down = epoch_repeat(df, "doc_id", F.lit(400)).collect()
    assert 0 < len(down) < 1000 and all(r.copy_idx == 1 for r in down)
