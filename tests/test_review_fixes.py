"""Regression tests for the round-3 self-review findings."""

import datetime as dt

import pytest
from pyspark.sql import functions as F


def _ts(h):
    return dt.datetime(2026, 1, 1, h)


def test_scd2_null_state_is_its_own_island(spark):
    from aroa_etl_spark.operators.incremental import scd2_from_changelog

    rows = [(1, _ts(1), "A", 1), (1, _ts(2), None, 2), (1, _ts(3), "A", 3)]
    df = spark.createDataFrame(rows, "k bigint, ts timestamp, s string, id bigint")
    out = sorted(
        scd2_from_changelog(df, "k", "ts", "s", tiebreak="id").collect(),
        key=lambda r: r.version,
    )
    assert [(r.s, r.version) for r in out] == [("A", 1), (None, 2), ("A", 3)]
    assert out[0].valid_to == _ts(2) and out[1].valid_to == _ts(3)


def test_scd2_first_row_null_state(spark):
    from aroa_etl_spark.operators.incremental import scd2_from_changelog

    rows = [(1, _ts(1), None, 1), (1, _ts(2), None, 2), (1, _ts(3), "B", 3)]
    df = spark.createDataFrame(rows, "k bigint, ts timestamp, s string, id bigint")
    out = sorted(
        scd2_from_changelog(df, "k", "ts", "s", tiebreak="id").collect(),
        key=lambda r: r.version,
    )
    # the two leading NULLs collapse to ONE island with version 1
    assert [(r.s, r.version) for r in out] == [(None, 1), ("B", 2)]


def test_decode_image_corrupt_blob_falls_back_non_strict(spark):
    from aroa_etl_spark.operators.multimodal import decode_image

    truncated_png = b"\x89PNG\r\n\x1a\n\x00\x00"  # signature + garbage
    meta = {"format": "png", "width": 2, "height": 2, "channels": 3}
    px = decode_image(truncated_png, meta, strict=False)  # must not raise
    assert px.shape == (2, 2, 3)
    with pytest.raises(Exception):
        decode_image(truncated_png, meta, strict=True)


def test_combine_columns_numeric_null_sees_none(spark):
    """A user join_filter written against the documented 'None for SQL
    NULL' contract must see real None for float/int-with-null columns,
    not NaN."""
    from aroa_etl_spark.operators.consensus import EncMatcher

    df = spark.createDataFrame(
        [(1, 5, "x"), (2, None, "y")], "id bigint, num int, s string"
    )
    seen = []

    def keep_non_null(v):
        seen.append(v)
        return v is not None

    out = {
        r.id: r.joined
        for r in EncMatcher(df, "id")
        .combine_columns(["num", "s"], "joined", sep="|", join_filter=keep_non_null)
        .df.collect()
    }
    assert "nan" not in out[2].lower()
    assert out[2] == "y"
    assert out[1] in ("5|x", "5.0|x")


def test_cms_estimate_survives_row_bucket_probe_columns(spark):
    from aroa_etl_spark.operators.sketches import cms_build, cms_estimate

    df = spark.createDataFrame([("a",)] * 5 + [("b",)] * 2, "row string")
    cms = cms_build(df, "row", depth=4, width=64)
    probes = spark.createDataFrame([("a",), ("b",)], "row string")
    est = {r.row: r.cms_count for r in cms_estimate(cms, probes, "row", 4, 64).collect()}
    assert est["a"] >= 5 and est["b"] >= 2


def test_asof_join_map_payload_not_in_tiebreak(spark):
    from aroa_etl_spark.operators.temporal import asof_join

    left = spark.createDataFrame([(1, 100)], "k bigint, t bigint")
    right = spark.createDataFrame(
        [(1, 50, 9.0, {"a": "1"})],
        "k bigint, t bigint, price double, attrs map<string,string>",
    )
    out = asof_join(
        left, right, on="t", by=["k"], right_cols=["price", "attrs"]
    ).collect()
    assert out[0]["price_right"] == 9.0  # no AnalysisException, match attached


def test_chunk_overlap_stride_gt_size_raises():
    from aroa_etl_spark.functions.text import token_chunks_overlap

    with pytest.raises(ValueError, match="gap"):
        token_chunks_overlap(F.col("x"), size=8, stride=12)


def test_funnel_step_name_with_quote(spark):
    from aroa_etl_spark.operators.funnel import funnel_counts

    rows = [(1, "view", _ts(1)), (1, "add's", _ts(2))]
    df = spark.createDataFrame(rows, "u bigint, t string, ts timestamp")
    out = {
        r.step: r.n_users
        for r in funnel_counts(df, "u", "t", "ts", ["view", "add's"]).collect()
    }
    assert out == {"view": 1, "add's": 1}


def test_profile_column_name_with_quote(spark):
    from aroa_etl_spark.operators.profile import profile

    df = spark.createDataFrame([(1,)], "`it's` bigint")
    rows = profile(df).collect()
    assert rows[0].column == "it's" and rows[0].n_rows == 1


def test_weighted_sample_tiny_weight_raises(spark):
    from aroa_etl_spark.operators.sampling import weighted_sample_topk

    df = spark.createDataFrame([(1, 1e-12), (2, 1.0)], "k bigint, w double")
    with pytest.raises(Exception, match="rescale"):
        weighted_sample_topk(df, "k", "w", 2).collect()


def test_excel_sink_row_cap_counts_header(tmp_path, spark):
    # engine-independent since round 6: the row-cap guard fires before
    # any engine is touched, and the stdlib fallback writes the rest
    from aroa_etl_spark.sources.io import write_excel_via_pandas

    df = spark.range(5)
    with pytest.raises(ValueError):
        write_excel_via_pandas(df, str(tmp_path / "t.xlsx"), max_rows=5)


def test_linkage_eval_counts_and_metrics(spark):
    from aroa_etl_spark.operators.evaluation import linkage_eval

    pred = spark.createDataFrame(
        [(1, 2), (2, 1), (3, 4), (5, 6)], "id_a bigint, id_b bigint"
    )  # (1,2) duplicated in both directions -> one canonical pair
    truth = spark.createDataFrame(
        [(1, 2), (3, 4), (7, 8)], "id_a bigint, id_b bigint"
    )
    r = linkage_eval(pred, truth).collect()[0]
    assert (r.tp, r.fp, r.fn) == (2, 1, 1)
    assert abs(r.precision - 2 / 3) < 1e-9
    assert abs(r.recall - 2 / 3) < 1e-9
    assert abs(r.f1 - 2 / 3) < 1e-9


def test_linkage_eval_empty_pred(spark):
    from aroa_etl_spark.operators.evaluation import linkage_eval

    pred = spark.createDataFrame([], "id_a bigint, id_b bigint")
    truth = spark.createDataFrame([(1, 2)], "id_a bigint, id_b bigint")
    r = linkage_eval(pred, truth).collect()[0]
    assert (r.tp, r.fp, r.fn, r.precision, r.recall, r.f1) == (0, 0, 1, 0.0, 0.0, 0.0)


def test_blocking_stats(spark):
    from aroa_etl_spark.operators.evaluation import blocking_stats

    cands = spark.createDataFrame(
        [(1, 2), (3, 4), (5, 6), (7, 8)], "id_a bigint, id_b bigint"
    )
    truth = spark.createDataFrame([(1, 2), (9, 10)], "id_a bigint, id_b bigint")
    r = blocking_stats(cands, truth, n_records=10).collect()[0]
    assert r.n_candidates == 4
    assert abs(r.pairs_completeness - 0.5) < 1e-9
    assert abs(r.reduction_ratio - (1 - 4 / 45)) < 1e-9


def test_unigram_logprob_orders_quality(spark):
    from aroa_etl_spark.functions.text import unigram_logprob_scores

    rows = [
        (1, "the the the common common words"),
        (2, "the common words"),
        (3, "zzyzx qwfp jxqz"),  # all-rare doc must score lowest
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    out = {r.doc_id: r for r in unigram_logprob_scores(df).collect()}
    assert out[3].logprob_mean < out[2].logprob_mean
    assert out[1].logprob_mean > out[3].logprob_mean
    assert out[1].n_tokens == 6
    # partition invariance (fixed-point sums)
    again = {r.doc_id: r.logprob_mean
             for r in unigram_logprob_scores(df.repartition(5)).collect()}
    assert {k: v.logprob_mean for k, v in out.items()} == again


def test_profile_and_funnel_backslash_names(spark):
    from aroa_etl_spark.operators.funnel import funnel_counts
    from aroa_etl_spark.operators.profile import profile

    df = spark.createDataFrame([(1,)], ["a\\b"])
    rows = profile(df).collect()
    assert rows[0].column == "a\\b"

    ev = spark.createDataFrame([(1, "add\\x", _ts(1))], "u bigint, t string, ts timestamp")
    out = {r.step for r in funnel_counts(ev, "u", "t", "ts", ["add\\x"]).collect()}
    assert out == {"add\\x"}


def test_asof_nested_map_payload_not_in_tiebreak(spark):
    from aroa_etl_spark.operators.temporal import asof_join

    left = spark.createDataFrame([(1, 100)], "k bigint, t bigint")
    right = spark.createDataFrame(
        [(1, 50, 9.0, [{"a": "1"}])],
        "k bigint, t bigint, price double, attrs array<map<string,string>>",
    )
    out = asof_join(
        left, right, on="t", by=["k"], right_cols=["price", "attrs"]
    ).collect()
    assert out[0]["price_right"] == 9.0


def test_tz_pin_warns_once_per_session(spark):
    import warnings

    from aroa_etl_spark.session import pin_utc_session_tz

    spark.conf.set("spark.sql.session.timeZone", "America/New_York")
    spark.conf.unset("spark.aroa_etl.tz_pin_warned")
    try:
        with warnings.catch_warnings(record=True) as w1:
            warnings.simplefilter("always")
            pin_utc_session_tz(spark)
        assert any("pins spark.sql.session.timeZone" in str(x.message) for x in w1)
        assert spark.conf.get("spark.sql.session.timeZone") == "UTC"
        # second override in the same session: silent
        spark.conf.set("spark.sql.session.timeZone", "America/New_York")
        with warnings.catch_warnings(record=True) as w2:
            warnings.simplefilter("always")
            pin_utc_session_tz(spark)
        assert not w2
    finally:
        spark.conf.set("spark.sql.session.timeZone", "UTC")
        spark.conf.unset("spark.aroa_etl.tz_pin_warned")


# ---- round-3 advisor findings --------------------------------------------


def test_reserved_internal_columns_rejected(spark):
    """interval_overlap_join / grid_radius_join inject __bucket/__cell;
    inputs already carrying those names must raise, not be silently
    overwritten (r3 advisor finding)."""
    from aroa_etl_spark.operators.geo import grid_radius_join
    from aroa_etl_spark.operators.temporal import interval_overlap_join

    iv = spark.createDataFrame(
        [(0, 10, 1)], "s bigint, e bigint, __bucket bigint"
    )
    other = spark.createDataFrame([(5, 15)], "s2 bigint, e2 bigint")
    with pytest.raises(ValueError, match="reserved internal column"):
        interval_overlap_join(iv, other, "s", "e", "s2", "e2")

    pts = spark.createDataFrame([(0, 0, "x")], "x bigint, y bigint, __cell string")
    qts = spark.createDataFrame([(1, 1)], "x2 bigint, y2 bigint")
    with pytest.raises(ValueError, match="reserved internal column"):
        grid_radius_join(pts, qts, "x", "y", "x2", "y2", 5)


def test_streaming_funnel_string_user_id(spark, tmp_path):
    """streaming_funnel must carry the stream's own user-key type through
    instead of hardcoding LongType (r3 advisor finding)."""
    import os

    from aroa_etl_spark.streaming.pipeline import run_to_memory, streaming_funnel

    src = os.path.join(str(tmp_path), "ev")
    spark.createDataFrame(
        [("u1", "view", 100), ("u1", "click", 200), ("u2", "view", 50)],
        "user_id string, event_type string, ts_us bigint",
    ).coalesce(1).write.parquet(src)
    stream = spark.readStream.schema(
        "user_id string, event_type string, ts_us bigint"
    ).parquet(src)
    out = streaming_funnel(stream)
    run_to_memory(out, "funnel_str_uid")
    got = {
        r.user_id: (r.t_1, r.t_2, r.t_3)
        for r in spark.sql(
            "SELECT user_id, max(t_1) t_1, max(t_2) t_2, max(t_3) t_3 "
            "FROM funnel_str_uid GROUP BY user_id"
        ).collect()
    }
    assert got == {"u1": (100, 200, -1), "u2": (50, -1, -1)}


def test_excel_row_limit_message(spark):
    from aroa_etl_spark.sources.io import write_excel_via_pandas

    df = spark.range(0, 5).selectExpr("id")
    with pytest.raises(ValueError, match="more than 4 data rows"):
        write_excel_via_pandas(df, "/tmp/should_not_exist.xlsx", max_rows=5)


def test_simhash_width_parameterized(spark):
    """60-bit default (sf1 stress fix) and the legacy 32-bit config both
    find a planted near-dup pair; invalid widths raise."""
    import pandas as pd

    from aroa_etl_spark.operators.dedup import release_caches, simhash_dedup

    rows = [(0, "the quick brown fox jumps over the lazy dog tonight"),
            (1, "the quick brown fox jumps over the lazy dog today"),
            (2, "completely different text about spark shuffles and joins")]
    df = spark.createDataFrame(pd.DataFrame(rows, columns=["doc_id", "text"]))
    for kw in (dict(), dict(hash_bits=32, n_bands=4), dict(hash_bits=48, n_bands=4)):
        pairs = {(r.id_a, r.id_b) for r in simhash_dedup(df, max_hamming=12, **kw).collect()}
        release_caches()
        assert (0, 1) in pairs, kw
        assert not any(2 in p for p in pairs), kw

    with pytest.raises(ValueError, match="hash_bits"):
        simhash_dedup(df, hash_bits=64)          # > 60: not BIGINT-safe
    with pytest.raises(ValueError, match="hash_bits"):
        simhash_dedup(df, hash_bits=60, n_bands=7)  # unequal bands


def test_embedding_neardup_banded_modes(spark):
    """Banded sign-LSH (r4 sf1 stress fix): bands recover recall a wider
    band costs; auto width sizes from the corpus; over-length bands
    raise instead of degenerating to an all-pairs bucket."""
    import numpy as np
    import pandas as pd

    from aroa_etl_spark.operators.dedup import embedding_neardup_pairs

    rng = np.random.default_rng(3)
    base = rng.normal(size=(50, 64)).astype("float32")
    rows = [(i, base[i].tolist()) for i in range(50)]
    # planted near-dups: tiny perturbation of vec 0..4 -> ids 100..104
    rows += [(100 + i, (base[i] + 0.001).tolist()) for i in range(5)]
    df = spark.createDataFrame(
        pd.DataFrame(rows, columns=["vec_id", "embedding"])
    )
    planted = {(i, 100 + i) for i in range(5)}
    single = {(r.id_a, r.id_b) for r in
              embedding_neardup_pairs(df, sign_dims=8, threshold=0.99).collect()}
    banded = {(r.id_a, r.id_b) for r in
              embedding_neardup_pairs(df, sign_dims=16, n_bands=4, threshold=0.99).collect()}
    auto = {(r.id_a, r.id_b) for r in
            embedding_neardup_pairs(df, threshold=0.99).collect()}
    assert planted <= single and planted <= banded and planted <= auto

    with pytest.raises(ValueError, match="dimensionality"):
        embedding_neardup_pairs(df, sign_dims=20, n_bands=4)  # 80 > 64
    # r5 advisor fix: the dimensionality probe runs for n_bands == 1 too
    # (oversized single-band keys read NULL dims -> constant '0' bits ->
    # degraded selectivity); explicit oversize raises, auto clamps
    with pytest.raises(ValueError, match="dimensionality"):
        embedding_neardup_pairs(df, sign_dims=80, n_bands=1)
    short_rows = [(i, base[i, :6].tolist()) for i in range(50)]
    short_rows += [(100 + i, (base[i, :6] + 0.0001).tolist()) for i in range(5)]
    short = spark.createDataFrame(
        pd.DataFrame(short_rows, columns=["vec_id", "embedding"])
    )
    # auto width would pick >= 8 from the corpus size; it must clamp to
    # the 6-dim vectors instead of silently reading past them
    clamped = {(r.id_a, r.id_b) for r in
               embedding_neardup_pairs(short, threshold=0.999).collect()}
    assert planted <= clamped


def test_jpeg_fill_bytes_before_marker():
    """T.81 allows 0xFF fill bytes before any marker; the parser must
    skip them (r4 review finding)."""
    import numpy as np

    from aroa_etl_spark.operators.jpegcodec import (
        decode_baseline_jpeg,
        encode_baseline_jpeg,
    )

    img = np.full((8, 8), 77, dtype=np.uint8)
    data = encode_baseline_jpeg(img, quality=90)
    # inject two fill bytes before the DQT marker (FF DB)
    padded = data.replace(b"\xff\xdb", b"\xff\xff\xff\xdb", 1)
    out = decode_baseline_jpeg(padded)
    assert out.shape == (8, 8, 1)


def test_salt_zero_rejected(spark):
    from aroa_etl_spark.operators.skew import salted_hot_join, salted_join

    a = spark.createDataFrame([(1, "x")], ["k", "v"])
    with pytest.raises(ValueError, match="salt"):
        salted_join(a, a.select("k"), "k", salt=0)
    with pytest.raises(ValueError, match="salt"):
        salted_hot_join(a, a.selectExpr("k", "v as w"), "k", a.select("k"), salt=0)


def test_swap_sink_unreadable_identity_raises(spark, tmp_path):
    """A checkpoint whose metadata file is unreadable must fail loudly
    instead of silently re-merging replayed batches (r4 review
    finding)."""
    import os
    import shutil

    from pyspark.sql import functions as F

    from aroa_etl_spark.streaming.pipeline import _swap_table_sink

    src = os.path.join(str(tmp_path), "facts")
    agg = os.path.join(str(tmp_path), "agg")
    ck = os.path.join(str(tmp_path), "ck")
    spark.range(0, 10).select(F.lit("a").alias("k")).coalesce(1).write.parquet(src)

    def merge(current, batch):
        d = batch.groupBy("k").agg(F.count(F.lit(1)).cast("bigint").alias("n"))
        return d if current is None else current.unionByName(d).groupBy("k").agg(
            F.sum("n").cast("bigint").alias("n"))

    # pre-create the checkpoint dir with a corrupt metadata file. Spark
    # itself rejects it at query start (JsonParseException) — and if a
    # future Spark tolerated it, _run_identity()'s None-check raises
    # before any merge. Either way: LOUD failure, never a silent
    # re-merge with replay protection disabled.
    os.makedirs(ck)
    with open(os.path.join(ck, "metadata"), "w") as f:
        f.write("not json")
    stream = spark.readStream.schema("k string").parquet(src)
    with pytest.raises(Exception, match="query id|metadata|Json"):
        _swap_table_sink(stream, agg, merge, ck)
    assert not os.path.isdir(agg)  # nothing was merged
