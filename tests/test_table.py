"""Snapshot-manifest transactional table: commit atomicity, replay
no-ops, time travel, vacuum, and the re-based streaming upsert sink."""

import json
import os

import pytest

from aroa_etl_spark.operators.table import (
    table_commit,
    table_read,
    table_upsert,
    table_vacuum,
    table_versions,
)


def _t(tmp_path):
    return str(tmp_path / "tbl")


def test_commit_read_append_and_time_travel(spark, tmp_path):
    t = _t(tmp_path)
    a = spark.createDataFrame([(1, "a"), (2, "b")], "k long, v string")
    b = spark.createDataFrame([(3, "c")], "k long, v string")
    assert table_commit(a, t) == 1
    assert table_commit(b, t, mode="append") == 2
    assert table_read(spark, t).count() == 3
    # time travel: version 1 still readable; append rewrote nothing
    assert table_read(spark, t, version=1).count() == 2
    m1, m2 = table_versions(t)
    assert m1["files"][0] in m2["files"] and len(m2["files"]) == 2
    assert m2["parent"] == 1 and m2["op"] == "append"
    with pytest.raises(ValueError, match="no version 7"):
        table_read(spark, t, version=7)


def test_empty_table_and_guards(spark, tmp_path):
    t = _t(tmp_path)
    with pytest.raises(ValueError, match="no commits"):
        table_read(spark, t)
    df = spark.createDataFrame([(1,)], "k long")
    with pytest.raises(ValueError, match="driver-local"):
        table_commit(df, "s3://bucket/t")
    with pytest.raises(ValueError, match="mode"):
        table_commit(df, t, mode="merge")
    with pytest.raises(ValueError, match="idempotence key"):
        table_commit(df, t, run_id="r")  # batch_id missing


def test_replay_is_noop_before_any_write(spark, tmp_path):
    t = _t(tmp_path)
    df = spark.createDataFrame([(1, "x")], "k long, v string")
    assert table_commit(df, t, run_id="r1", batch_id=0) == 1
    n_dirs = len(os.listdir(os.path.join(t, "data")))
    # same lineage, same batch: no-op, and NO new data dir was written
    poison = spark.createDataFrame([(1, "BAD")], "k long, v string")
    assert table_commit(poison, t, run_id="r1", batch_id=0) is None
    assert len(os.listdir(os.path.join(t, "data"))) == n_dirs
    # older batch of the same lineage: also a no-op
    assert table_commit(poison, t, run_id="r1", batch_id=-1) is None
    # a DIFFERENT lineage is not blocked
    assert table_commit(df, t, run_id="r2", batch_id=0) == 2
    assert [r.v for r in table_read(spark, t).collect()] == ["x"]


def test_upsert_semantics(spark, tmp_path):
    t = _t(tmp_path)
    base = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], "k long, v string"
    )
    table_commit(base, t)
    upd = spark.createDataFrame(
        [(2, "B"), (4, "d"), (4, "d")], "k long, v string"
    )
    table_upsert(upd, t, "k")
    got = {r.k: r.v for r in table_read(spark, t).collect()}
    assert got == {1: "a", 2: "B", 3: "c", 4: "d"}
    # upsert into an empty table initializes it (de-duplicated)
    t2 = str(tmp_path / "tbl2")
    table_upsert(upd, t2, "k")
    assert table_read(spark, t2).count() == 2


def test_half_commit_invisible_and_vacuum(spark, tmp_path):
    t = _t(tmp_path)
    df = spark.createDataFrame([(1, "a")], "k long, v string")
    table_commit(df, t)
    table_commit(
        spark.createDataFrame([(2, "b")], "k long, v string"), t,
        mode="append",
    )
    # crash simulation: orphan data dir + dot-temp manifest
    os.makedirs(os.path.join(t, "data", "orphan000000"))
    with open(os.path.join(t, "data", "orphan000000", "x.parquet"), "wb") as f:
        f.write(b"junk")
    with open(os.path.join(t, "_manifests", ".tmp-crash"), "w") as f:
        json.dump({"version": 9, "files": ["data/orphan000000"]}, f)
    assert table_read(spark, t).count() == 2  # reader never sees either
    removed = table_vacuum(t, keep_last=1)
    assert any("orphan000000" in r for r in removed)
    assert any(".tmp-crash" in r for r in removed)
    assert len(table_versions(t)) == 1
    assert table_read(spark, t).count() == 2
    # version 1's exclusive data dir is gone; keep_last guard works
    with pytest.raises(ValueError, match="keep_last"):
        table_vacuum(t, keep_last=0)


def test_stream_upsert_sink_commits_manifests(spark, tmp_path):
    from pyspark.sql import functions as F

    from aroa_etl_spark.streaming.pipeline import stream_upsert_to_parquet

    src = str(tmp_path / "src")
    t = _t(tmp_path)
    ckpt = str(tmp_path / "ckpt")
    spark.range(20).select(
        F.col("id").alias("k"), (F.col("id") % 3).cast("string").alias("v")
    ).repartition(4).write.parquet(src)
    stream = (
        spark.readStream.schema("k long, v string")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    stream_upsert_to_parquet(stream, t, "k", checkpoint=ckpt)
    assert table_read(spark, t).count() == 20
    vs = table_versions(t)
    assert len(vs) >= 2  # one commit per drained micro-batch
    assert all(v["op"] == "upsert" and v["run_id"] for v in vs)
    # RESTART over the same checkpoint: every batch replays as a no-op
    n_before = len(vs)
    stream2 = (
        spark.readStream.schema("k long, v string")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    stream_upsert_to_parquet(stream2, t, "k", checkpoint=ckpt)
    assert len(table_versions(t)) == n_before
    assert table_read(spark, t).count() == 20

    with pytest.raises(ValueError, match="checkpoint"):
        stream_upsert_to_parquet(stream, t, "k", checkpoint=None)


def test_file_stats_pruning_and_compaction(spark, tmp_path):
    from aroa_etl_spark.operators.table import pruned_files, table_compact

    t = _t(tmp_path)
    for day in range(4):
        df = spark.createDataFrame(
            [(day * 10 + j, day) for j in range(5)], "k long, day int"
        )
        table_commit(df, t, mode="append", stats_cols=["day"])
    m = table_versions(t)[-1]
    assert len(m["files"]) == 4 and len(m["file_stats"]) == 4
    # interval overlapping days 1-2 plans exactly 2 files
    assert len(pruned_files(m, {"day": (1, 2)})) == 2
    # open-ended bounds: (None, 0] keeps day 0 only
    assert len(pruned_files(m, {"day": (None, 0)})) == 1
    # unknown column: nothing pruned (I/O optimization, never a filter)
    assert len(pruned_files(m, {"nope": (1, 2)})) == 4
    got = sorted(
        r.k for r in table_read(spark, t, prune={"day": (1, 2)})
        .filter("day between 1 and 2").collect()
    )
    assert got == sorted(list(range(10, 15)) + list(range(20, 25)))
    # fully-pruned read: empty frame, schema intact
    empty = table_read(spark, t, prune={"day": (99, 100)})
    assert empty.count() == 0 and set(empty.columns) == {"k", "day"}

    # compaction: one file, content identical, old version still readable
    all_before = sorted(r.k for r in table_read(spark, t).collect())
    v = table_compact(spark, t, stats_cols=["day"])
    m2 = table_versions(t)[-1]
    assert m2["version"] == v and len(m2["files"]) == 1
    assert m2["op"] == "compact"
    assert sorted(r.k for r in table_read(spark, t).collect()) == all_before
    assert len(table_read(spark, t, version=v - 1).inputFiles()) >= 4


def test_append_schema_divergence_raises(spark, tmp_path):
    t = _t(tmp_path)
    table_commit(spark.createDataFrame([(1, "a")], "k long, v string"), t)
    # different column set: loud failure, and the half-written data dir
    # is removed (no orphan accumulation from rejected appends)
    n_dirs = len(os.listdir(os.path.join(t, "data")))
    with pytest.raises(ValueError, match="different schema"):
        table_commit(
            spark.createDataFrame([(2, 5)], "k long, n long"), t,
            mode="append",
        )
    assert len(os.listdir(os.path.join(t, "data"))) == n_dirs
    # same columns, different TYPE: also loud
    with pytest.raises(ValueError, match="different schema"):
        table_commit(
            spark.createDataFrame([(2, 5)], "k long, v long"), t,
            mode="append",
        )
    # schema evolution goes through an overwrite commit
    v = table_commit(
        spark.createDataFrame([(1, "a", 0)], "k long, v string, extra long"),
        t,
    )
    assert set(table_read(spark, t, version=v).columns) == {"k", "v", "extra"}


def test_snapshot_table_datasource_batch_and_incremental(spark, tmp_path):
    from pyspark.sql import functions as F

    from aroa_etl_spark.sources.table_datasource import register_table_source

    t = _t(tmp_path)
    for i in range(2):
        table_commit(
            spark.range(i * 10, i * 10 + 5).select(
                F.col("id").alias("k"),
                (F.col("id") % 3).cast("string").alias("v"),
            ),
            t, mode="append",
        )
    register_table_source(spark)
    # batch: newest snapshot, schema from the manifest
    df = spark.read.format("snapshot_table").load(t)
    assert df.schema.simpleString() == "struct<k:bigint,v:string>"
    assert df.count() == 10

    # streaming: incremental pickup across restarts on one checkpoint
    ckpt = str(tmp_path / "ckpt")
    sink = str(tmp_path / "out")

    def drain():
        q = (
            spark.readStream.format("snapshot_table").load(t)
            .writeStream.format("parquet")
            .option("path", sink)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    drain()
    assert spark.read.parquet(sink).count() == 10
    table_commit(
        spark.range(100, 103).select(
            F.col("id").alias("k"), F.lit("x").alias("v")
        ),
        t, mode="append",
    )
    drain()  # only the NEW commit's rows land
    got = sorted(r.k for r in spark.read.parquet(sink).collect())
    assert got == sorted(list(range(0, 5)) + list(range(10, 15))
                         + [100, 101, 102])


def test_snapshot_table_stream_guards(spark, tmp_path):
    from pyspark.sql import functions as F

    from aroa_etl_spark.sources.table_datasource import (
        SnapshotTableDataSource,
        register_table_source,
    )

    t = _t(tmp_path)
    table_commit(spark.createDataFrame([(1, "a")], "k long, v string"), t)
    table_upsert(
        spark.createDataFrame([(1, "B")], "k long, v string"), t, "k"
    )
    sr = SnapshotTableDataSource.__new__(SnapshotTableDataSource)
    sr.options = {"path": t}
    reader = sr.streamReader(None)
    # version 2 is an upsert (non-append): the change feed must refuse
    with pytest.raises(ValueError, match="append-only"):
        reader.partitions({"version": 0}, {"version": 2})
    # a vacuumed version inside the window: retention-horizon error
    table_commit(
        spark.createDataFrame([(2, "c")], "k long, v string"), t,
        mode="append",
    )
    table_vacuum(t, keep_last=1)
    with pytest.raises(ValueError, match="vacuumed"):
        reader.partitions({"version": 0}, {"version": 3})
    # surfaces as AnalysisException across the Py4J boundary
    register_table_source(spark)
    with pytest.raises(Exception, match="no commits"):
        spark.read.format("snapshot_table").load(str(tmp_path / "nope"))


# --- commit protocols (round 11, r10 verdict #4) ----------------------------


def test_conditional_put_full_matrix(spark, tmp_path):
    """The whole commit/append/upsert/replay/vacuum/compact matrix runs
    unchanged when manifest visibility goes through the object-store
    conditional-put shim instead of POSIX renames."""
    from aroa_etl_spark.operators.table import (
        ConditionalPutCommitProtocol,
        MemoryObjectStore,
        table_compact,
    )

    store = MemoryObjectStore()
    proto = ConditionalPutCommitProtocol(store)
    t = _t(tmp_path)
    a = spark.createDataFrame([(1, "a"), (2, "b"), (5, "e")], "k long, v string")
    b = spark.createDataFrame([(3, "c")], "k long, v string")
    assert table_commit(a, t, protocol=proto) == 1
    assert table_commit(b, t, mode="append", protocol=proto) == 2
    # NO manifest ever touched the local filesystem
    assert not os.path.isdir(os.path.join(t, "_manifests"))
    assert len(store.list_keys(t)) == 2
    assert table_read(spark, t, protocol=proto).count() == 4
    assert table_read(spark, t, version=1, protocol=proto).count() == 3
    # upsert + poisoned replay no-op
    upd = spark.createDataFrame([(1, "UPD")], "k long, v string")
    assert table_upsert(upd, t, "k", run_id="L", batch_id=0, protocol=proto) == 3
    poison = spark.createDataFrame([(1, "BAD")], "k long, v string")
    assert (
        table_upsert(poison, t, "k", run_id="L", batch_id=0, protocol=proto)
        is None
    )
    got = {r.k: r.v for r in table_read(spark, t, protocol=proto).collect()}
    assert got == {1: "UPD", 2: "b", 3: "c", 5: "e"}
    # crash sim: orphan data dir, then vacuum under the shim
    os.makedirs(os.path.join(t, "data", "deadbeefcafe"))
    removed = table_vacuum(t, keep_last=1, protocol=proto)
    assert any("deadbeefcafe" in r for r in removed)
    assert len(table_versions(t, protocol=proto)) == 1
    assert {r.k: r.v for r in table_read(spark, t, protocol=proto).collect()} == got
    # compact still one version further, one file
    table_compact(spark, t, protocol=proto)
    assert len(table_versions(t, protocol=proto)[-1]["files"]) == 1


def _stale_once(base_cls, *args):
    """A protocol whose NEXT list_versions returns a pinned stale view —
    the read half of a read-then-publish race window."""

    class Stale(base_cls):
        def __init__(self):
            super().__init__(*args)
            self.stale = None

        def list_versions(self, root):
            if self.stale is not None:
                v, self.stale = self.stale, None
                return v
            return super().list_versions(root)

    return Stale()


def test_conditional_put_concurrent_writer_conflict(spark, tmp_path):
    """Two writers race from the same parent: the loser's conditional
    put must raise, never fork history."""
    from aroa_etl_spark.operators.table import (
        CommitConflict,
        ConditionalPutCommitProtocol,
        MemoryObjectStore,
    )

    store = MemoryObjectStore()
    proto = ConditionalPutCommitProtocol(store)
    t = _t(tmp_path)
    df = spark.createDataFrame([(1, "x")], "k long, v string")
    assert table_commit(df, t, protocol=proto) == 1
    # writer A reads the table (sees only v1) ...
    loser = _stale_once(ConditionalPutCommitProtocol, store)
    loser.stale = loser.list_versions(t)
    # ... writer B wins the race to v2 ...
    assert table_commit(df, t, mode="append", protocol=proto) == 2
    # ... writer A publishes v2 from its stale view: LOUD conflict
    with pytest.raises(CommitConflict, match="another writer"):
        table_commit(df, t, mode="append", protocol=loser)
    # the winner's v2 is untouched
    assert len(store.list_keys(t)) == 2


def test_rename_protocol_detects_conflict_via_hardlink(spark, tmp_path):
    from aroa_etl_spark.operators.table import (
        CommitConflict,
        RenameCommitProtocol,
    )

    t = _t(tmp_path)
    df = spark.createDataFrame([(1, "x")], "k long, v string")
    assert table_commit(df, t) == 1
    loser = _stale_once(RenameCommitProtocol)
    loser.stale = loser.list_versions(t)
    assert table_commit(df, t, mode="append") == 2
    with pytest.raises(CommitConflict, match="another writer"):
        table_commit(df, t, mode="append", protocol=loser)
    # and no temp residue leaked from the losing publish
    assert not [
        n for n in os.listdir(os.path.join(t, "_manifests"))
        if n.startswith(".tmp-")
    ]


def test_memory_object_store_put_if_absent_is_atomic():
    import threading

    from aroa_etl_spark.operators.table import MemoryObjectStore

    store = MemoryObjectStore()
    wins: list = []
    barrier = threading.Barrier(8)

    def racer(i):
        barrier.wait()
        if store.put_if_absent("k", f"writer-{i}".encode()):
            wins.append(i)

    threads = [threading.Thread(target=racer, args=(i,)) for i in range(8)]
    for th in threads:
        th.start()
    for th in threads:
        th.join()
    assert len(wins) == 1
    assert store.get("k") == f"writer-{wins[0]}".encode()


def test_export_delta_roundtrip_and_time_travel(spark, tmp_path):
    """table_export_delta (round 12): the exported _delta_log reads
    back identically through the public-protocol Delta reader, with
    time travel, stats pruning, schema evolution, and idempotent
    re-export."""
    from pyspark.sql import functions as F

    from aroa_etl_spark.operators.table import (
        table_commit,
        table_export_delta,
        table_read,
    )
    from aroa_etl_spark.sources.delta_log import delta_read

    root = str(tmp_path / "exp")
    d1 = spark.range(10).select(F.col("id").alias("k"),
                                (F.col("id") * 2).alias("v"))
    d2 = spark.range(10, 20).select(F.col("id").alias("k"),
                                    (F.col("id") * 2).alias("v"))
    d3 = spark.range(5).select(F.col("id").alias("k"),
                               (F.col("id") * 3).alias("v"),
                               (F.col("id") % 2 == 0).alias("w"))
    table_commit(d1, root, mode="overwrite", stats_cols=["k"])
    table_commit(d2, root, mode="append", stats_cols=["k"])
    table_commit(d3, root, mode="overwrite", stats_cols=["k"])
    assert table_export_delta(root) == 3
    got = sorted(map(tuple, delta_read(spark, root).collect()))
    assert got == sorted(map(tuple, table_read(spark, root).collect()))
    assert len(got[0]) == 3  # evolved schema came through metaData
    # time travel: delta v1 == manifests v2 (d1 + d2)
    tv = sorted(map(tuple, delta_read(spark, root, version=1).collect()))
    assert tv == sorted(map(tuple, d1.union(d2).collect()))
    # stats pruning: the d1 file (k 0..9) is provably out of range
    pruned = delta_read(spark, root, version=1, prune={"k": (12, None)})
    assert sorted(r.k for r in pruned.collect()) == list(range(10, 20))
    assert len(pruned.inputFiles()) < len(
        delta_read(spark, root, version=1).inputFiles()
    )
    # re-export is idempotent
    assert table_export_delta(root) == 3
    assert sorted(map(tuple, delta_read(spark, root).collect())) == got
