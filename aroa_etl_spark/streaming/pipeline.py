"""Structured Streaming extension (SURVEY §2.9, build plan M8).

The reference is batch-only (GCS file handoffs between notebook
stages); this module runs the same capability pillars continuously:

- **Stateless stages stream unchanged.** Unpacking (from_json selects)
  and attribute processing / text analysis are pure column maps, so the
  exact same expressions run under ``readStream`` — ``with_text_analysis``
  below is used verbatim in batch tests and streaming tests.
- **Consensus dedup becomes stateful**: ``streaming_consensus`` keys
  state by document id via ``applyInPandasWithState`` and re-votes the
  consensus every time new transcriptions for that document arrive —
  the streaming analogue of ENCDeduplicater (late transcriptions
  refine the consensus instead of requiring a batch re-run).
- **Event analytics** get watermarked sliding windows
  (``windowed_event_counts``) — bounded state, late data dropped after
  the watermark.

Scale notes: state lives in the state store partitioned by group key
(documents shard across executors); per-document state is bounded
(≤ ~20 transcriptions per document in the reference workload). A
production deploy sets a watermark/timeout to expire document state
once transcription windows close.
"""

from __future__ import annotations

import json
from collections.abc import Iterator
from typing import Any

import pandas as pd
from aroa_etl_spark.session import pin_utc_session_tz
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from aroa_etl_spark.functions import text as X
from aroa_etl_spark.operators.consensus import ColMatcher, _is_empty_value, _success


def stream_parquet(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """File-source stream over a parquet directory. Schema must be
    explicit (streaming sources don't infer)."""
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.parquet(path)


def with_text_analysis(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Stateless text-analysis stage — identical plan in batch and
    streaming (the point: stateless stages stream for free)."""
    return df.select(
        "*",
        X.token_count(text_col).alias("n_tokens"),
        X.detect_language(text_col).alias("detected_lang"),
        X.quality_score(text_col).alias("quality_score"),
        X.fingerprint(text_col).alias("fingerprint"),
    )


def windowed_event_counts(
    events: DataFrame,
    *,
    ts_col: str = "ts",
    key_col: str = "event_type",
    window: str = "1 hour",
    slide: str | None = None,
    watermark: str = "2 hours",
) -> DataFrame:
    """Watermarked (sliding) window counts — works on a stream (bounded
    state, late rows beyond the watermark dropped) and on a batch frame
    (watermark is a no-op there, enabling direct batch parity tests).

    TIMESTAMP_NTZ event time (how Spark 4 reads micros/isAdjustedToUTC=
    false parquet): watermarks demand TIMESTAMP (LTZ), so on a stream
    the column is cast for the watermark and the window bounds are cast
    back — output type matches the batch path. Session tz is pinned UTC
    for those casts: with any non-whole-hour offset the LTZ window grid
    would land off the NTZ wall-clock hour grid the batch path uses."""
    ntz = isinstance(events.schema[ts_col].dataType, T.TimestampNTZType)
    src = events
    if events.isStreaming:
        if ntz:
            pin_utc_session_tz(events.sparkSession)
            src = src.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
        src = src.withWatermark(ts_col, watermark)
    win = F.window(F.col(ts_col), window, slide) if slide else F.window(F.col(ts_col), window)
    out = (
        src.groupBy(win.alias("win"), F.col(key_col))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            key_col,
            "n_events",
        )
    )
    if events.isStreaming and ntz:
        out = out.select(
            F.col("window_start").cast("timestamp_ntz").alias("window_start"),
            F.col("window_end").cast("timestamp_ntz").alias("window_end"),
            key_col,
            "n_events",
        )
    return out


def sessionized_event_counts(
    events: DataFrame,
    *,
    ts_col: str = "ts",
    key_col: str = "user_id",
    gap: str = "30 minutes",
    watermark: str = "2 hours",
) -> DataFrame:
    """Gap-based sessions via native session_window — one definition for
    batch and stream. Streaming: watermarked, append mode; sessions
    finalize once the watermark passes their close (an availableNow
    drain's trailing no-data micro-batch advances the watermark to
    max(event time) − delay, flushing every closed session). Same NTZ
    handling as windowed_event_counts: LTZ only inside the stream, NTZ
    at both output boundaries, session tz pinned UTC for the casts."""
    ntz = isinstance(events.schema[ts_col].dataType, T.TimestampNTZType)
    src = events
    if events.isStreaming:
        if ntz:
            pin_utc_session_tz(events.sparkSession)
            src = src.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
        src = src.withWatermark(ts_col, watermark)
    out = (
        src.groupBy(F.session_window(F.col(ts_col), gap).alias("w"), F.col(key_col))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col(key_col),
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
        )
    )
    if events.isStreaming and ntz:
        out = out.select(
            key_col,
            F.col("session_start").cast("timestamp_ntz").alias("session_start"),
            F.col("session_end").cast("timestamp_ntz").alias("session_end"),
            "n_events",
        )
    return out


def stateful_user_counters(
    stream: DataFrame,
    *,
    key_col: str = "user_id",
    value_col: str = "value",
) -> DataFrame:
    """Arbitrary-stateful streaming via applyInPandasWithState: per-key
    running (event count, fixed-point value sum) accumulated across
    micro-batches; every batch a key appears in emits that key's
    CURRENT totals (update semantics). The value sum is floor(v·100)
    per row in BIGINT — exact, order-free, and replayable in SQL, so
    the drained final state is oracle-checkable against a batch
    aggregate (both metrics are monotone for non-negative values:
    last update == max update).

    State is two BIGINTs per key — bounded regardless of stream length;
    the state store shuffles once on the key, the 100 TB shape for
    running per-entity counters."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    out_schema = T.StructType(
        [
            T.StructField(key_col, T.LongType()),
            T.StructField("n_events", T.LongType()),
            T.StructField("value_fp", T.LongType()),
        ]
    )
    state_schema = T.StructType(
        [T.StructField("n", T.LongType()), T.StructField("s", T.LongType())]
    )

    def update(key, pdfs, state):
        import numpy as np
        import pandas as pd

        n, s = state.get if state.exists else (0, 0)
        for pdf in pdfs:
            n += len(pdf)
            # SQL SUM null semantics: nulls count toward n_events but are
            # skipped by the value fold (np.floor(NaN).astype(int64) is
            # platform-dependent garbage, not a skip).
            v = pdf[value_col].dropna().astype("float64")
            s += int(np.floor(v * 100).astype("int64").sum())
        state.update((n, s))
        yield pd.DataFrame({key_col: [key[0]], "n_events": [n], "value_fp": [s]})

    return stream.groupBy(key_col).applyInPandasWithState(
        update,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def _rows_from_pdf(pdf: "pd.DataFrame", cols: list[str]) -> list[dict[str, Any]]:
    """Vote rows (col -> str|None) from an arriving pandas batch."""
    return [
        {c: (None if pd.isna(v) else str(v)) for c, v in zip(cols, row)}
        for row in pdf[cols].itertuples(index=False, name=None)
    ]


def _consensus_pdf(
    stored: list[dict[str, Any]],
    key_val: Any,
    id_col: str,
    cols: list[str],
    matchers: dict[str, "ColMatcher"],
    no_values_is_a_match: bool,
    out_schema: "T.StructType",
) -> "pd.DataFrame":
    """One consensus output row for a group's accumulated votes — the
    exact batch ColMatcher voting, shared by both stateful kernels
    (applyInPandasWithState and transformWithStateInPandas) so the two
    APIs cannot drift semantically."""
    row: dict[str, Any] = {id_col: key_val, "n_transcriptions": len(stored)}
    ambiguous = []
    for c in cols:
        vals = [r.get(c) for r in stored]
        n_entries = sum(1 for v in vals if not _is_empty_value(v))
        matched = matchers[c](vals)
        if isinstance(matched, list):
            matched = None
        row[c] = matched
        if not _success(matched, n_entries, no_values_is_a_match):
            ambiguous.append(c)
    for c in ambiguous:
        row[c] = "?"
    row["is_ambiguous"] = bool(ambiguous)
    return pd.DataFrame([row], columns=[f.name for f in out_schema.fields])


def streaming_consensus(
    stream: DataFrame,
    id_col: str,
    matchers: dict[str, ColMatcher],
    *,
    no_values_is_a_match: bool = True,
) -> DataFrame:
    """Stateful consensus: per-document transcription state accumulates
    across micro-batches; every batch containing a document re-votes and
    emits that document's current consensus row (output mode 'update').

    State schema: one JSON-serialized row list (bounded by the ~20
    transcriptions/document workload). The per-column voting reuses the
    exact batch ColMatcher pipeline, so batch and streaming consensus
    are the same semantics by construction.
    """
    cols = list(matchers.keys())
    out_schema = T.StructType(
        [T.StructField(id_col, T.StringType())]
        + [T.StructField(c, T.StringType()) for c in cols]
        + [
            T.StructField("is_ambiguous", T.BooleanType()),
            T.StructField("n_transcriptions", T.IntegerType()),
        ]
    )
    state_schema = T.StructType([T.StructField("rows_json", T.StringType())])

    def kernel(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            stored: list[dict[str, Any]] = json.loads(state.get[0])
        else:
            stored = []
        for pdf in pdfs:
            stored.extend(_rows_from_pdf(pdf, cols))
        state.update((json.dumps(stored),))
        yield _consensus_pdf(
            stored, key[0], id_col, cols, matchers, no_values_is_a_match, out_schema
        )

    return (
        stream.groupBy(id_col)
        .applyInPandasWithState(
            kernel, out_schema, state_schema, "update", GroupStateTimeout.NoTimeout
        )
    )


def streaming_consensus_tws(
    stream: DataFrame,
    id_col: str,
    matchers: dict[str, ColMatcher],
    *,
    no_values_is_a_match: bool = True,
    initial_state: DataFrame | None = None,
) -> DataFrame:
    """Stateful consensus on the MODERN arbitrary-state API
    (``transformWithStateInPandas``, Spark 4) with INITIAL-STATE
    SEEDING: ``initial_state`` is a batch DataFrame of already-ingested
    votes (same columns as the stream), delivered per key via
    ``handleInitialState`` on the first batch — the restart/migration
    workflow where a streaming job takes over from a batch-computed
    table without replaying history.

    Semantics are identical to :func:`streaming_consensus` by
    construction (both kernels call the shared ``_consensus_pdf``
    voting); the state layout is the same JSON rows blob, held in a
    ``ValueState``.  Requires the RocksDB state store provider (a
    transformWithState constraint — pass ``rocksdb=True`` to the
    drain or set ``spark.sql.streaming.stateStore.providerClass``)
    AND the ``protobuf`` package (the transformWithState state-server
    protocol; not installed in this sandbox, so execution is proven by
    the env-gated test in tests/test_streaming.py and the
    applyInPandasWithState twin remains the attested default).
    """
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    cols = list(matchers.keys())
    out_schema = T.StructType(
        [T.StructField(id_col, T.StringType())]
        + [T.StructField(c, T.StringType()) for c in cols]
        + [
            T.StructField("is_ambiguous", T.BooleanType()),
            T.StructField("n_transcriptions", T.IntegerType()),
        ]
    )

    class _ConsensusProcessor(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._state = handle.getValueState("rows_json", "rows_json string")

        def handleInitialState(self, key, initialState, timerValues) -> None:
            stored = _rows_from_pdf(initialState, cols)
            if self._state.exists():
                stored = json.loads(self._state.get()[0]) + stored
            self._state.update((json.dumps(stored),))

        def handleInputRows(self, key, rows, timerValues):
            if self._state.exists():
                stored = json.loads(self._state.get()[0])
            else:
                stored = []
            for pdf in rows:
                stored.extend(_rows_from_pdf(pdf, cols))
            self._state.update((json.dumps(stored),))
            yield _consensus_pdf(
                stored, key[0], id_col, cols, matchers,
                no_values_is_a_match, out_schema,
            )

        def close(self) -> None:
            pass

    return stream.groupBy(id_col).transformWithStateInPandas(
        _ConsensusProcessor(),
        outputStructType=out_schema,
        outputMode="Update",
        timeMode="None",
        initialState=(
            initial_state.groupBy(id_col) if initial_state is not None else None
        ),
    )


def streaming_exact_dedup(
    stream: DataFrame,
    *,
    text_col: str = "text",
    ts_col: str | None = None,
    watermark: str = "1 hour",
) -> DataFrame:
    """Streaming exact deduplication: md5-key the text and drop
    duplicates across micro-batches.

    With ``ts_col``, uses ``dropDuplicatesWithinWatermark`` — state for
    a key expires once the watermark passes it (bounded state, the only
    sane contract on an unbounded corpus). Without a timestamp the
    dedup state grows forever — acceptable for bounded backfills only.
    """
    keyed = stream.withColumn("__h", F.md5(F.col(text_col)))
    if ts_col is not None:
        return keyed.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
            ["__h"]
        ).drop("__h")
    return keyed.dropDuplicates(["__h"]).drop("__h")


def _swap_table_sink(
    stream: DataFrame,
    path: str,
    merge_fn,
    checkpoint: str | None,
) -> None:
    """Shared foreachBatch scaffold for the parquet table sinks: per
    micro-batch, ``merge_fn(current_df_or_None, batch_df)`` produces the
    new table, which replaces the old via an atomic-rename protocol
    that is RETRY-SAFE:

    - a ``_last_batch_id`` marker inside the table skips replayed
      batches (foreachBatch is at-least-once; non-idempotent merges
      like count/sum deltas would otherwise double-count).  Batch ids
      are only monotone WITHIN one checkpoint lineage, so the marker
      stores the checkpoint's query id alongside the batch id and a
      batch is skipped only when BOTH match — a re-run against a fresh
      checkpoint (ids restart at 0, possibly with new data) re-merges
      instead of silently dropping it.  That fallback is idempotent
      for keyed upserts; for count/sum delta merges a fresh checkpoint
      over already-merged source files double-counts, which is why the
      checkpoint is REQUIRED (raise on None) and must be kept with the
      table;
    - swap order is tmp-write -> current->__old rename -> tmp->current
      rename -> drop __old, and recovery restores ``__old`` if a crash
      left no current table — no window silently drops prior state;
    - stale ``__tmp_*`` siblings from failed writes are reaped at the
      start of every batch.

    DRIVER-LOCAL paths only (os-level renames): remote URIs raise
    up front instead of failing on the first rename.
    """
    import json
    import os
    import shutil
    import uuid

    if "://" in path:
        raise ValueError(
            f"swap-table sinks need a driver-local path (got {path!r}); "
            "for object stores use a table format with real MERGE"
        )
    if checkpoint is None or "://" in checkpoint:
        raise ValueError(
            "swap-table sinks require a driver-local checkpoint dir: batch "
            "ids are only monotone within one checkpoint lineage, so the "
            "replay guard needs the checkpoint's query id as run identity"
        )
    base = path.rstrip("/")
    old_dir = base + "__old"
    marker = "_last_batch_id"

    def _run_identity() -> str | None:
        """Query id from the checkpoint's metadata file — stable for the
        checkpoint's lifetime, regenerated when the dir is wiped."""
        try:
            with open(os.path.join(checkpoint, "metadata")) as f:
                return json.load(f).get("id")
        except (OSError, ValueError):
            return None

    def _read_marker(d: str) -> tuple[int, str | None]:
        try:
            with open(os.path.join(d, marker)) as f:
                raw = f.read().strip()
        except OSError:
            return -1, None
        try:
            rec = json.loads(raw)
            if isinstance(rec, dict):
                return int(rec.get("batch_id", -1)), rec.get("run_id")
        except ValueError:
            pass
        try:
            return int(raw), None  # legacy bare-int marker: unknown lineage
        except ValueError:
            return -1, None

    def apply_batch(batch: DataFrame, batch_id: int) -> None:
        spark = batch.sparkSession
        parent = os.path.dirname(base) or "."
        for entry in os.listdir(parent) if os.path.isdir(parent) else []:
            if entry.startswith(os.path.basename(base) + "__tmp_"):
                shutil.rmtree(os.path.join(parent, entry), ignore_errors=True)
        if not os.path.isdir(base) and os.path.isdir(old_dir):
            os.rename(old_dir, base)  # crash recovery: restore prior state
        has_table = os.path.isdir(base) and any(
            f.endswith(".parquet") for f in os.listdir(base)
        )
        run_id = _run_identity()
        if run_id is None:
            # the checkpoint is REQUIRED and its metadata file is written
            # at query start, so an unreadable identity means the replay
            # guard cannot work — raise rather than risk a silent
            # double-merge of a replayed batch (r4 review finding)
            raise ValueError(
                f"cannot read query id from checkpoint {checkpoint!r}/metadata; "
                "replay protection needs the checkpoint lineage identity"
            )
        if has_table:
            seen_batch, seen_run = _read_marker(base)
            # A legacy bare-int marker (seen_run None with a real batch
            # id) predates lineage tracking: treat it as belonging to
            # the CURRENT lineage, matching its pre-upgrade semantics —
            # otherwise a replayed batch from the same checkpoint would
            # re-merge once during the upgrade window and double-count
            # non-idempotent merges (r4 advisor finding).  The marker is
            # rewritten in the JSON format on the next applied batch.
            legacy = seen_run is None and seen_batch >= 0
            if (seen_run == run_id or legacy) and seen_batch >= batch_id:
                return  # replayed batch from the SAME checkpoint lineage
        current = spark.read.parquet(base) if has_table else None
        merged = merge_fn(current, batch)
        tmp = base + f"__tmp_{uuid.uuid4().hex[:8]}"
        merged.write.mode("overwrite").parquet(tmp)
        with open(os.path.join(tmp, marker), "w") as f:
            json.dump({"batch_id": batch_id, "run_id": run_id}, f)
        if os.path.isdir(base):
            shutil.rmtree(old_dir, ignore_errors=True)
            os.rename(base, old_dir)
        os.rename(tmp, base)
        shutil.rmtree(old_dir, ignore_errors=True)

    writer = (
        stream.writeStream.foreachBatch(apply_batch)
        .trigger(availableNow=True)
        .option("checkpointLocation", checkpoint)
    )
    writer.start().awaitTermination()


def stream_upsert_to_parquet(
    stream: DataFrame,
    path: str,
    key: str | list[str],
    *,
    checkpoint: str,
) -> None:
    """Streaming keyed upsert into a SNAPSHOT-MANIFEST table
    (operators/table.py) via foreachBatch — re-based in round 10 from
    the bespoke tmp-swap protocol onto the engine's one audited commit
    log: each micro-batch upserts into the current snapshot and
    commits a new manifest version carrying (run_id=checkpoint query
    id, batch_id) as its idempotence key, so a replayed batch is a
    manifest-level NO-OP and a reader never sees a half commit (the
    manifest rename is the single visibility point).  Read the result
    back with ``operators.table.table_read``.  availableNow drain;
    blocks until done.

    At scale you'd partition the table and rewrite only touched
    partitions (finer-grained manifest file lists); the batch upsert
    operator and the commit protocol are the same either way."""
    from aroa_etl_spark.operators.table import table_upsert

    keys = [key] if isinstance(key, str) else list(key)
    if checkpoint is None or "://" in checkpoint:
        raise ValueError(
            "stream_upsert_to_parquet requires a driver-local checkpoint "
            "dir: batch ids are only monotone within one checkpoint "
            "lineage, so the replay guard needs the checkpoint's query id "
            "as run identity"
        )

    def apply_batch(batch: DataFrame, batch_id: int) -> None:
        import json as _json
        import os as _os

        try:
            with open(_os.path.join(checkpoint, "metadata")) as f:
                run_id = _json.load(f).get("id")
        except (OSError, ValueError):
            run_id = None
        if run_id is None:
            # the metadata file is written at query start, so an
            # unreadable identity means the replay guard cannot work —
            # raise rather than risk a silent double-merge
            raise ValueError(
                f"cannot read query id from checkpoint "
                f"{checkpoint!r}/metadata; replay protection needs the "
                "checkpoint lineage identity"
            )
        table_upsert(batch, path, keys, run_id=run_id, batch_id=batch_id)

    (
        stream.writeStream.foreachBatch(apply_batch)
        .trigger(availableNow=True)
        .option("checkpointLocation", checkpoint)
        .start()
        .awaitTermination()
    )


def run_to_memory(
    stream: DataFrame, query_name: str, output_mode: str = "update"
) -> None:
    """Drain a stream into an in-memory sink table (availableNow) and
    block until done — the test/demo harness."""
    q = (
        stream.writeStream.format("memory")
        .queryName(query_name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def streaming_neardup_candidates(
    stream: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    ts_col: str = "ts",
    watermark: str = "1 hour",
    num_perm: int = 8,
    bands: int = 4,
    shingle_n: int = 3,
    threshold: float = 0.7,
) -> DataFrame:
    """Streaming MinHash-LSH near-duplicate candidates: the batch
    operator's shingle → signature → band-bucket pipeline (pure column
    exprs, stream-safe) feeding a watermarked STREAM-STREAM self-join on
    the bucket key. Two documents pair if they share a band bucket and
    arrive within ``watermark`` of each other — the event-time range
    condition is what lets the state store expire old buckets, the only
    bounded-state contract for near-dup detection on an unbounded
    corpus. Candidates are verified by exact Jaccard ≥ threshold before
    they are emitted.

    Pairs are canonicalized (id_a < id_b). A pair sharing multiple band
    buckets is emitted once per shared bucket — dedupe downstream per
    micro-batch sink, or accept at-least-once candidate semantics (the
    usual contract for streaming dedup feeds).
    """
    from aroa_etl_spark.functions.text import (
        lsh_band_keys,
        minhash_from_hashes,
        shingle_hashes,
        shingles_from,
        tokens,
    )

    rows = num_perm // bands
    keyed = (
        stream.select(
            F.col(id_col), F.col(ts_col), tokens(text_col).alias("__t")
        )
        .select(
            F.col(id_col),
            F.col(ts_col),
            F.array_distinct(shingles_from("__t", shingle_n)).alias("__sh"),
        )
        .filter(F.size("__sh") > 0)
        .withColumn("__hh", shingle_hashes("__sh"))
        .withColumn("__sig", minhash_from_hashes("__hh", num_perm))
        .select(
            F.col(id_col),
            F.col(ts_col),
            "__sh",
            F.explode(lsh_band_keys(F.col("__sig"), bands, rows)).alias("__bucket"),
        )
        .withWatermark(ts_col, watermark)
    )

    left = keyed.select(
        F.col(id_col).alias("id_a"),
        F.col(ts_col).alias("__ts_a"),
        F.col("__sh").alias("__sa"),
        "__bucket",
    )
    right = keyed.select(
        F.col(id_col).alias("id_b"),
        F.col(ts_col).alias("__ts_b"),
        F.col("__sh").alias("__sb"),
        "__bucket",
    )
    joined = left.join(
        right,
        (left["__bucket"] == right["__bucket"])
        & (left["id_a"] < right["id_b"])
        & (right["__ts_b"] >= left["__ts_a"] - F.expr(f"INTERVAL {watermark}"))
        & (right["__ts_b"] <= left["__ts_a"] + F.expr(f"INTERVAL {watermark}")),
    )
    return (
        joined.select(
            "id_a",
            "id_b",
            F.size(F.array_intersect("__sa", "__sb")).alias("n_intersect"),
            F.size(F.array_union("__sa", "__sb")).alias("n_union"),
        )
        .filter(
            (F.col("n_union") > 0)
            & (
                F.col("n_intersect").cast("double") / F.col("n_union").cast("double")
                >= F.lit(threshold)
            )
        )
    )


def streaming_cms_counts(
    stream: DataFrame, col: str, depth: int = 4, width: int = 1024
) -> DataFrame:
    """Count-min sketch maintained OVER A STREAM: the same bounded
    (row, bucket, cnt) counter table operators/sketches.py builds in
    batch, kept incrementally by a streaming aggregation. State is at
    most depth*width counters regardless of stream volume — the sketch
    property that makes frequency monitoring viable on an unbounded
    stream (complete mode stays cheap because the result itself is
    bounded). Drained availableNow it equals the batch sketch exactly
    (integer counters, deterministic md5 addressing)."""
    from pyspark.sql import functions as F

    from aroa_etl_spark.operators.sketches import _h60_salted_by_row

    rows = F.array(*[F.lit(j) for j in range(depth)])
    keyed = stream.select(F.col(col).cast("string").alias("__k")).filter(
        F.col("__k").isNotNull()
    )
    addressed = keyed.select(F.explode(rows).alias("row"), "__k").select(
        "row",
        (_h60_salted_by_row(F.col("__k"), F.col("row")) % F.lit(width)).alias(
            "bucket"
        ),
    )
    return addressed.groupBy("row", "bucket").agg(
        F.count(F.lit(1)).cast("bigint").alias("cnt")
    )


def streaming_funnel(
    stream: DataFrame,
    *,
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts_us",
    steps: tuple[str, ...] = ("view", "click", "purchase"),
) -> DataFrame:
    """Ordered-funnel progress as ARBITRARY STATEFUL streaming
    (applyInPandasWithState): per user, the reach time of each funnel
    step (epoch-µs BIGINT, -1 unset), updated across micro-batches.

    Semantics match the batch operator (operators/funnel.py): step i is
    reached at the earliest step-i event at-or-after step i-1's reach
    time. The fold processes each batch sorted by (ts, step index) and
    every reach time is SET ONCE (first eligible event in order == the
    minimum), so emissions are monotone — the drained update stream
    collapses with max() per column. EXACTNESS REQUIRES IN-ORDER
    DELIVERY: micro-batches must partition event time into ascending
    ranges with equal timestamps kept in one batch (the catalog entry
    stages time-sliced files; a production stream gets this from a
    time-ordered source or a watermark+sort pre-stage). State is
    len(steps) BIGINTs per user — bounded for any stream length.
    """
    from pyspark.sql.streaming.state import GroupStateTimeout

    k = len(steps)
    step_idx = {s: i for i, s in enumerate(steps)}
    # the operator is type-agnostic in the user key: carry the stream's
    # own key type through (hardcoding LongType broke string ids — r3
    # advisor finding)
    user_type = stream.schema[user_col].dataType
    out_schema = T.StructType(
        [T.StructField(user_col, user_type)]
        + [T.StructField(f"t_{i + 1}", T.LongType()) for i in range(k)]
    )
    state_schema = T.StructType(
        [T.StructField(f"t_{i + 1}", T.LongType()) for i in range(k)]
    )

    def update(key, pdfs, state):
        import pandas as pd

        t = list(state.get) if state.exists else [-1] * k
        for pdf in pdfs:
            pdf = pdf[[ts_col, type_col]].copy()
            pdf["__si"] = pdf[type_col].map(step_idx)
            pdf = pdf.dropna(subset=["__si"]).sort_values([ts_col, "__si"])
            for ts, si in zip(pdf[ts_col].astype("int64"), pdf["__si"].astype("int64")):
                si = int(si)
                if t[si] != -1:
                    continue
                if si == 0 or (t[si - 1] != -1 and ts >= t[si - 1]):
                    t[si] = int(ts)
        state.update(tuple(t))
        yield pd.DataFrame(
            {user_col: [key[0]], **{f"t_{i + 1}": [t[i]] for i in range(k)}}
        )

    return stream.groupBy(user_col).applyInPandasWithState(
        update,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def stream_refresh_aggregate_to_parquet(
    stream: DataFrame,
    path: str,
    keys: str | list[str],
    *,
    count_col: str = "n",
    sum_cols: list[str] | None = None,
    checkpoint: str,
) -> None:
    """Streaming MATERIALIZED-VIEW maintenance via foreachBatch: each
    micro-batch of fact rows is aggregated and merged into the parquet
    aggregate table with operators/incremental.refresh_aggregate (the
    self-maintainable COUNT/SUM delta merge) — the no-lakehouse
    continuous-aggregate pattern. Because count and sum merges are
    associative and commutative, the final table equals the batch
    aggregate over all facts REGARDLESS of how rows were split into
    micro-batches — which is what makes the result oracle-checkable.
    Atomic swap per batch (side dir + rename), availableNow; blocks.

    At scale: partition the aggregate table and rewrite only touched
    key ranges, or hand the merged frame to a table format with MERGE —
    the delta-aggregation operator is the same either way.

    The checkpoint is required and must be kept with the table: the
    count/sum delta merge is NOT idempotent, so re-running against a
    fresh checkpoint over already-merged source files double-counts
    (the replay guard only skips batches from the same checkpoint
    lineage — see :func:`_swap_table_sink`)."""
    from aroa_etl_spark.operators.incremental import refresh_aggregate

    key_list = [keys] if isinstance(keys, str) else list(keys)
    sums = list(sum_cols or [])

    def merge(current: DataFrame | None, batch: DataFrame) -> DataFrame:
        if current is None:
            return batch.groupBy(*key_list).agg(
                F.count(F.lit(1)).cast("bigint").alias(count_col),
                *[F.sum(c).alias(f"sum_{c}") for c in sums],
            )
        return refresh_aggregate(
            current, batch, key_list, count_col=count_col, sum_cols=sums
        )

    _swap_table_sink(stream, path, merge, checkpoint)
