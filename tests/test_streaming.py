"""Structured Streaming: stateless stages stream unchanged, stateful
consensus accumulates across micro-batches, windowed aggs match batch.

All tests use file sources with availableNow triggers and memory sinks
— no long-running queries."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

DOC_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
    ]
)

TRANS_SCHEMA = T.StructType(
    [
        T.StructField("document_id", T.StringType()),
        T.StructField("last_name", T.StringType()),
        T.StructField("first_name", T.StringType()),
    ]
)


def test_stateless_text_analysis_streams_unchanged(spark, tmp_path):
    from aroa_etl_spark.streaming.pipeline import (
        run_to_memory,
        stream_parquet,
        with_text_analysis,
    )

    src = str(tmp_path / "docs")
    batch = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").select(
        "doc_id", "text"
    ).limit(50)
    batch.write.parquet(src)

    expected = {
        r["doc_id"]: (r["n_tokens"], r["detected_lang"], r["quality_score"], r["fingerprint"])
        for r in with_text_analysis(spark.read.parquet(src)).collect()
    }

    stream = with_text_analysis(stream_parquet(spark, src, DOC_SCHEMA))
    assert stream.isStreaming
    run_to_memory(stream, "t_text", output_mode="append")
    got = {
        r["doc_id"]: (r["n_tokens"], r["detected_lang"], r["quality_score"], r["fingerprint"])
        for r in spark.sql("SELECT * FROM t_text").collect()
    }
    assert got == expected  # identical plan → identical results


def test_streaming_consensus_accumulates_across_batches(spark, tmp_path):
    from aroa_etl_spark.operators.consensus import default_col_matcher
    from aroa_etl_spark.streaming.pipeline import (
        run_to_memory,
        stream_parquet,
        streaming_consensus,
    )

    src = tmp_path / "trans"
    # micro-batch 1: two transcriptions of doc A (agreeing), one of doc B
    spark.createDataFrame(
        [("A", "Müller", "Anna"), ("A", "Müller", "Anna"), ("B", "Schmidt", "Hans")],
        TRANS_SCHEMA,
    ).coalesce(1).write.parquet(str(src / "b1"))
    # micro-batch 2: a late third transcription of doc A + doc B support
    spark.createDataFrame(
        [("A", "Müller", "Anna"), ("B", "Schmidt", "Hans")], TRANS_SCHEMA
    ).coalesce(1).write.parquet(str(src / "b2"))

    stream = stream_parquet(
        spark, f"{src}/*", TRANS_SCHEMA, max_files_per_trigger=1
    )
    out = streaming_consensus(
        stream,
        "document_id",
        {"last_name": default_col_matcher(), "first_name": default_col_matcher()},
    )
    run_to_memory(out, "t_consensus", output_mode="update")

    rows = spark.sql("SELECT * FROM t_consensus").collect()
    # the LAST emission per document carries the full accumulated state
    latest = {}
    for r in rows:
        prev = latest.get(r["document_id"])
        if prev is None or r["n_transcriptions"] > prev["n_transcriptions"]:
            latest[r["document_id"]] = r

    assert latest["A"]["last_name"] == "Müller"
    assert latest["A"]["first_name"] == "Anna"
    assert latest["A"]["n_transcriptions"] == 3  # state crossed batches
    assert latest["B"]["last_name"] == "Schmidt"
    assert latest["B"]["n_transcriptions"] == 2


def test_windowed_event_counts_stream_matches_batch(spark, tmp_path):
    from aroa_etl_spark.streaming.pipeline import (
        run_to_memory,
        stream_parquet,
        windowed_event_counts,
    )

    from aroa_etl_spark.session import load_tables

    src = str(tmp_path / "events")
    # load_tables converts the raw nanos-as-long ts to a real timestamp
    batch = (
        load_tables(spark, "/root/testdata/sf0.001", ("events",))["events"]
        .select("ts", "event_type")
        .limit(500)
    )
    batch.write.parquet(src)
    ev_schema = spark.read.parquet(src).schema

    expected = {
        (r["window_start"], r["event_type"]): r["n_events"]
        for r in windowed_event_counts(spark.read.parquet(src)).collect()
    }
    assert expected  # sanity: windows exist

    stream = windowed_event_counts(stream_parquet(spark, src, ev_schema))
    run_to_memory(stream, "t_windows", output_mode="update")
    got = {
        (r["window_start"], r["event_type"]): r["n_events"]
        for r in spark.sql("SELECT * FROM t_windows").collect()
    }
    assert got == expected


def test_streaming_exact_dedup_across_batches(spark, tmp_path):
    from aroa_etl_spark.streaming.pipeline import (
        run_to_memory,
        stream_parquet,
        streaming_exact_dedup,
    )

    src = tmp_path / "dups"
    spark.createDataFrame(
        [(1, "same text"), (2, "other text")], ["doc_id", "text"]
    ).coalesce(1).write.parquet(str(src / "b1"))
    spark.createDataFrame(
        [(3, "same text"), (4, "third text")], ["doc_id", "text"]
    ).coalesce(1).write.parquet(str(src / "b2"))

    stream = stream_parquet(spark, f"{src}/*", DOC_SCHEMA, max_files_per_trigger=1)
    out = streaming_exact_dedup(stream)
    run_to_memory(out, "t_dedup", output_mode="append")
    texts = sorted(r["text"] for r in spark.sql("SELECT * FROM t_dedup").collect())
    # 'same text' survives once even though its copy arrived a batch later
    assert texts == ["other text", "same text", "third text"]


def test_streaming_neardup_matches_batch(spark, tmp_path):
    """Stream = batch parity for MinHash-LSH near-dup candidates: the
    watermarked stream-stream bucket self-join must find the same
    verified pair SET as the batch operator (band-duplicate emissions
    collapsed)."""
    import datetime

    from pyspark.sql import types as T

    from aroa_etl_spark.operators.dedup import minhash_lsh_dedup, release_caches
    from aroa_etl_spark.streaming.pipeline import (
        run_to_memory,
        stream_parquet,
        streaming_neardup_candidates,
    )

    base = "the quick brown fox jumps over the lazy dog again and again"
    rows = [
        (1, base, datetime.datetime(2024, 1, 1, 10, 0)),
        (2, base + " extra", datetime.datetime(2024, 1, 1, 10, 10)),  # near-dup of 1
        (3, "completely different content with no overlap at all here",
         datetime.datetime(2024, 1, 1, 10, 20)),
        (4, base, datetime.datetime(2024, 1, 1, 10, 30)),              # exact dup of 1
    ]
    schema = T.StructType([
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("ts", T.TimestampType()),
    ])
    df = spark.createDataFrame(rows, schema)

    batch_pairs = {
        (r["id_a"], r["id_b"])
        for r in minhash_lsh_dedup(df, threshold=0.5).collect()
    }
    release_caches()
    assert batch_pairs  # sanity: the planted near-dups are found

    src = tmp_path / "neardup"
    df.filter("doc_id <= 2").coalesce(1).write.parquet(str(src / "b1"))
    df.filter("doc_id >= 3").coalesce(1).write.parquet(str(src / "b2"))
    stream = stream_parquet(spark, f"{src}/*", schema, max_files_per_trigger=1)
    out = streaming_neardup_candidates(stream, threshold=0.5, watermark="2 hours")
    run_to_memory(out, "t_neardup", output_mode="append")
    stream_pairs = {
        (r["id_a"], r["id_b"])
        for r in spark.sql("SELECT * FROM t_neardup").collect()
    }
    assert stream_pairs == batch_pairs


def test_stateful_counts_accumulates_across_batches(spark):
    """st_stateful_counts stages 4 files with maxFilesPerTrigger=1: the
    update-mode sink must then contain MORE rows than distinct users
    (every user appearing in k>1 batches emitted k running totals) —
    the proof that state really crossed micro-batch boundaries."""
    from aroa_etl_spark.plans import catalog

    final = catalog.spec("st_stateful_counts").builder(spark, "/root/testdata/sf0.001")
    n_users = final.count()
    sink_rows = spark.table("st_stateful_counts_sink").count()
    assert sink_rows > n_users, (sink_rows, n_users)


def test_stream_upsert_to_parquet(spark, tmp_path):
    """foreachBatch streaming merge: two waves of updates land in a
    snapshot-manifest table; later batches win per key, untouched rows
    survive.  The seed is a LEGACY plain-parquet dir (the old swap
    sink's layout) — the first manifest commit must adopt its rows."""
    from aroa_etl_spark.operators.table import table_read
    from aroa_etl_spark.streaming.pipeline import stream_upsert_to_parquet

    src = str(tmp_path / "updates")
    tbl = str(tmp_path / "table")
    ckpt = str(tmp_path / "ckpt")

    # seed the table in the LEGACY layout (loose parquet, no manifests)
    spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], "k long, v string"
    ).write.parquet(tbl)
    # two update files -> two micro-batches (maxFilesPerTrigger=1)
    spark.createDataFrame([(2, "B1"), (4, "d")], "k long, v string").coalesce(
        1
    ).write.mode("append").parquet(src)
    spark.createDataFrame([(2, "B2"), (5, "e")], "k long, v string").coalesce(
        1
    ).write.mode("append").parquet(src)

    stream = (
        spark.readStream.schema("k long, v string")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    stream_upsert_to_parquet(stream, tbl, "k", checkpoint=ckpt)

    got = {(r["k"], r["v"]) for r in table_read(spark, tbl).collect()}
    # k=2 must carry ONE of the update values (batch order between the
    # two source files is mtime-dependent); all other keys are exact.
    assert {(1, "a"), (3, "c"), (4, "d"), (5, "e")} <= got
    assert len(got) == 5
    assert any(k == 2 and v in ("B1", "B2") for k, v in got)


def test_streaming_dedup_within_watermark_bounded_state(spark, tmp_path):
    """The watermark-bounded dedup path (dropDuplicatesWithinWatermark):
    duplicates inside the watermark interval are dropped; a key whose
    state has expired past the watermark may legitimately re-emit — the
    bounded-state contract for unbounded corpora."""
    import os

    from aroa_etl_spark.streaming.pipeline import run_to_memory, streaming_exact_dedup

    src = os.path.join(str(tmp_path), "src")
    import datetime as dt

    t0 = dt.datetime(2026, 1, 1, 0, 0)
    rows = [
        ("same text", t0),
        ("same text", t0 + dt.timedelta(minutes=5)),   # inside watermark: dropped
        ("other", t0 + dt.timedelta(minutes=1)),
    ]
    spark.createDataFrame(rows, "text string, ts timestamp").coalesce(1).write.parquet(src)
    stream = spark.readStream.schema("text string, ts timestamp").parquet(src)
    out = streaming_exact_dedup(stream, text_col="text", ts_col="ts", watermark="1 hour")
    before = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "4")
    try:
        run_to_memory(out.select("text"), "t_wm_dedup_sink", output_mode="append")
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", before)
    texts = sorted(r.text for r in spark.table("t_wm_dedup_sink").collect())
    assert texts == ["other", "same text"]


def test_stream_mv_refresh_equals_batch(spark, tmp_path):
    """Four micro-batches delta-merged into the aggregate table must
    equal the one-shot batch aggregate (COUNT/SUM self-maintainability
    across arbitrary batch splits)."""
    import os

    from pyspark.sql import functions as F

    from aroa_etl_spark.streaming.pipeline import stream_refresh_aggregate_to_parquet

    src = os.path.join(str(tmp_path), "facts")
    agg = os.path.join(str(tmp_path), "agg")
    facts = spark.range(0, 400).select(
        (F.col("id") % 7).cast("string").alias("k"),
        (F.col("id") * 3).alias("v"),
    )
    facts.repartition(4).write.parquet(src)
    stream = (
        spark.readStream.schema("k string, v bigint")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    stream_refresh_aggregate_to_parquet(
        stream, agg, "k", count_col="n", sum_cols=["v"],
        checkpoint=os.path.join(str(tmp_path), "ckpt"),
    )
    got = sorted(map(tuple, spark.read.parquet(agg).collect()))
    want = sorted(
        map(
            tuple,
            facts.groupBy("k")
            .agg(F.count(F.lit(1)).cast("bigint").alias("n"), F.sum("v").alias("sum_v"))
            .collect(),
        )
    )
    assert got == want


def test_swap_sink_replay_and_recovery(spark, tmp_path):
    """The shared swap sink must be retry-safe: a replayed batch from the
    SAME checkpoint lineage is a no-op (marker stores run identity +
    batch id), a re-run under a FRESH checkpoint re-merges (batch ids
    restart, so skipping would silently drop new data — advisor
    finding r3), and a crash that left only the __old dir is recovered
    before merging."""
    import os
    import shutil

    from pyspark.sql import functions as F

    from aroa_etl_spark.streaming.pipeline import _swap_table_sink

    src = os.path.join(str(tmp_path), "facts")
    agg = os.path.join(str(tmp_path), "agg")
    ck1 = os.path.join(str(tmp_path), "ck1")
    spark.range(0, 100).select(
        (F.col("id") % 5).cast("string").alias("k"), F.lit(1).alias("v")
    ).coalesce(1).write.parquet(src)

    def merge(current, batch):
        d = batch.groupBy("k").agg(F.count(F.lit(1)).cast("bigint").alias("n"))
        if current is None:
            return d
        return (
            current.unionByName(d)
            .groupBy("k")
            .agg(F.sum("n").cast("bigint").alias("n"))
        )

    def run(ck):
        stream = spark.readStream.schema("k string, v int").parquet(src)
        _swap_table_sink(stream, agg, merge, ck)

    run(ck1)
    first = sorted(map(tuple, spark.read.parquet(agg).collect()))
    # at-least-once replay within the SAME lineage: wipe the commit log so
    # availableNow re-delivers batch 0 with the same checkpoint query id —
    # the marker must skip it
    shutil.rmtree(os.path.join(ck1, "commits"))
    run(ck1)
    assert sorted(map(tuple, spark.read.parquet(agg).collect())) == first
    # FRESH checkpoint: ids restart at 0 but this is a new lineage (the
    # source could hold new data) — the sink must re-merge, not skip
    run(os.path.join(str(tmp_path), "ck2"))
    doubled = sorted(map(tuple, spark.read.parquet(agg).collect()))
    assert doubled == [(k, 2 * n) for k, n in first]
    # crash window: only __old exists -> recovery restores it, then the
    # fresh-lineage batch merges on top of the recovered state
    os.rename(agg, agg + "__old")
    run(os.path.join(str(tmp_path), "ck3"))
    assert sorted(map(tuple, spark.read.parquet(agg).collect())) == [
        (k, 3 * n) for k, n in first
    ]
    assert not os.path.isdir(agg + "__old")


def test_swap_sink_legacy_marker_upgrade(spark, tmp_path):
    """A pre-lineage bare-int marker must be treated as CURRENT-lineage
    during the upgrade window: a replayed batch from the same checkpoint
    skips (its pre-upgrade semantics) instead of re-merging and
    double-counting (r4 advisor finding); the next applied batch
    rewrites the marker in the JSON format."""
    import json
    import os
    import shutil

    from pyspark.sql import functions as F

    from aroa_etl_spark.streaming.pipeline import _swap_table_sink

    src = os.path.join(str(tmp_path), "facts")
    agg = os.path.join(str(tmp_path), "agg")
    ck = os.path.join(str(tmp_path), "ck")
    spark.range(0, 50).select(
        (F.col("id") % 5).cast("string").alias("k"), F.lit(1).alias("v")
    ).coalesce(1).write.parquet(src)

    def merge(current, batch):
        d = batch.groupBy("k").agg(F.count(F.lit(1)).cast("bigint").alias("n"))
        if current is None:
            return d
        return (
            current.unionByName(d).groupBy("k").agg(F.sum("n").cast("bigint").alias("n"))
        )

    def run():
        stream = spark.readStream.schema("k string, v int").parquet(src)
        _swap_table_sink(stream, agg, merge, ck)

    run()
    first = sorted(map(tuple, spark.read.parquet(agg).collect()))
    # downgrade the marker to the legacy bare-int format, then replay
    # batch 0 from the SAME checkpoint (wipe the commit log)
    mpath = os.path.join(agg, "_last_batch_id")
    batch_id = json.load(open(mpath))["batch_id"]
    with open(mpath, "w") as f:
        f.write(str(batch_id))
    shutil.rmtree(os.path.join(ck, "commits"))
    run()
    assert sorted(map(tuple, spark.read.parquet(agg).collect())) == first


def test_swap_sink_requires_checkpoint(spark, tmp_path):
    import pytest as _pytest

    from aroa_etl_spark.streaming.pipeline import _swap_table_sink

    stream = spark.readStream.schema("k string").parquet(str(tmp_path))
    with _pytest.raises(ValueError, match="checkpoint"):
        _swap_table_sink(stream, str(tmp_path) + "/agg", lambda c, b: b, None)


def test_swap_sink_rejects_remote_uri(spark, tmp_path):
    import pytest as _pytest

    from aroa_etl_spark.streaming.pipeline import _swap_table_sink

    stream = spark.readStream.schema("k string").parquet(str(tmp_path))
    with _pytest.raises(ValueError, match="driver-local"):
        _swap_table_sink(stream, "s3a://bucket/agg", lambda c, b: b, None)


def test_streaming_consensus_tws_plan_construction(spark):
    """transformWithStateInPandas twin (modern Spark 4 stateful API with
    initial-state seeding): this one asserts the plan CONSTRUCTION —
    the operator lands in the logical plan with the initial-state
    relation wired per key; execution (the state-server protocol, via
    the vendored mini-protobuf runtime where the real one is absent)
    is proven in the test below."""
    from aroa_etl_spark.operators.consensus import default_col_matcher
    from aroa_etl_spark.streaming.pipeline import streaming_consensus_tws

    early = spark.createDataFrame(
        [("g0", "alpha"), ("g1", "beta")], "group_id string, val string"
    )
    stream = (
        spark.readStream.format("rate").load()
        .selectExpr("CAST(value AS STRING) AS group_id", "'x' AS val")
    )
    out = streaming_consensus_tws(
        stream, "group_id", {"val": default_col_matcher()}, initial_state=early
    )
    plan = out._jdf.queryExecution().logical().toString()
    assert "TransformWithStateInPySpark" in plan
    assert "transformWithStateWithInitStateUDF" in plan
    assert out.schema.fieldNames() == [
        "group_id", "val", "is_ambiguous", "n_transcriptions"
    ]


def test_streaming_consensus_tws_executes_with_protobuf(spark, tmp_path):
    """Execution proof for the transformWithState consensus twin —
    formerly env-gated on protobuf; the vendored mini-protobuf runtime
    (aroa_etl_spark/_vendor, activated by conftest's ensure_protobuf)
    now speaks the state-server protocol in this sandbox too, so this
    runs everywhere (r7 verdict ask #6). Seeded early votes + a late
    streamed vote must reproduce the batch consensus exactly (same
    _consensus_pdf voting)."""
    import os

    from pyspark.sql import functions as F

    from aroa_etl_spark.operators.consensus import default_col_matcher
    from aroa_etl_spark.streaming.pipeline import (
        run_to_memory,
        streaming_consensus_tws,
    )

    src = os.path.join(str(tmp_path), "votes")
    early = spark.createDataFrame(
        [(f"g{i}", "alpha") for i in range(5)] * 2, "group_id string, val string"
    )
    late = spark.createDataFrame(
        [(f"g{i}", "alpha" if i % 2 == 0 else "beta") for i in range(5)],
        "group_id string, val string",
    )
    late.coalesce(1).write.parquet(src)
    stream = spark.readStream.schema("group_id string, val string").parquet(src)
    out = streaming_consensus_tws(
        stream, "group_id", {"val": default_col_matcher()}, initial_state=early
    )
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "4")
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    try:
        run_to_memory(out, "tws_exec_sink", output_mode="update")
        rows = {
            r["group_id"]: (r["val"], r["is_ambiguous"], r["n_transcriptions"])
            for r in spark.sql("SELECT * FROM tws_exec_sink").collect()
        }
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
        spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
    # 2 seeded alphas + 1 streamed vote: majority alpha everywhere
    assert rows == {f"g{i}": ("alpha", False, 3) for i in range(5)}
