"""Delta transaction-log reader (sources/delta_log.py): snapshot
replay, checkpoints, time travel, partition-value attachment, stats
pruning, and the protocol gates."""

import json
import os
import shutil

import pytest
from pyspark.sql import types as T

from aroa_etl_spark.sources.delta_log import (
    build_delta_table,
    delta_read,
    delta_snapshot,
)

SCHEMA = T.StructType([
    T.StructField("id", T.LongType()),
    T.StructField("v", T.StringType()),
    T.StructField("bucket", T.IntegerType()),  # partition column
])


def _rows(spark, *pairs):
    return spark.createDataFrame(list(pairs), "id long, v string")


def _build(spark, root, *, checkpoint_at=None):
    shutil.rmtree(root, ignore_errors=True)
    commits = [
        {"adds": [({"bucket": 0}, _rows(spark, (1, "a"), (2, "b"))),
                  ({"bucket": 1}, _rows(spark, (3, "c")))]},
        {"adds": [({"bucket": 0}, _rows(spark, (4, "d")))]},
        {"adds": [({"bucket": 2}, _rows(spark, (9, "z")))]},
    ]
    build_delta_table(
        spark, root, SCHEMA, ["bucket"], commits,
        checkpoint_at=checkpoint_at, stats_cols=["id"],
    )


def test_snapshot_read_time_travel_and_partition_values(spark, tmp_path):
    root = str(tmp_path / "d1")
    _build(spark, root)
    got = sorted((r.id, r.v, r.bucket)
                 for r in delta_read(spark, root).collect())
    assert got == [(1, "a", 0), (2, "b", 0), (3, "c", 1), (4, "d", 0),
                   (9, "z", 2)]
    v0 = sorted((r.id, r.bucket)
                for r in delta_read(spark, root, version=0).collect())
    assert v0 == [(1, 0), (2, 0), (3, 1)]
    with pytest.raises(ValueError, match="version 9"):
        delta_read(spark, root, version=9)
    with pytest.raises(ValueError, match="no _delta_log"):
        delta_read(spark, str(tmp_path / "nope"))


def test_remove_actions_and_checkpoint_replay(spark, tmp_path):
    root = str(tmp_path / "d2")
    _build(spark, root, checkpoint_at=1)
    # version 3: remove the bucket-1 file (written manually: the
    # builder's commits list is 0-based and already flushed)
    snap = delta_snapshot(root, version=2)
    f_b1 = [p for p, i in snap["files"].items()
            if i["partitionValues"].get("bucket") == "1"][0]
    with open(os.path.join(root, "_delta_log", f"{3:020d}.json"), "w") as f:
        f.write(json.dumps({"remove": {"path": f_b1, "deletionTimestamp": 0,
                                       "dataChange": True}}) + "\n")
    got = sorted(r.id for r in delta_read(spark, root).collect())
    assert got == [1, 2, 4, 9]
    # the checkpoint carried versions 0-1; only 2 commits replayed
    s = delta_snapshot(root)
    assert s["version"] == 3 and s["n_commits_replayed"] == 2
    # corrupt the PRE-checkpoint commit files: reads must not need them
    for v in (0, 1):
        os.remove(os.path.join(root, "_delta_log", f"{v:020d}.json"))
    assert sorted(r.id for r in delta_read(spark, root).collect()) == \
        [1, 2, 4, 9]


def test_stats_pruning_is_io_only(spark, tmp_path):
    root = str(tmp_path / "d3")
    _build(spark, root)
    full = delta_snapshot(root)
    pruned = delta_read(spark, root, prune={"id": (9, None)})
    assert sorted(r.id for r in pruned.collect()) == [9]
    # prune skipped files, not rows: the plan reads fewer files
    from aroa_etl_spark.sources.delta_log import _stats_prunable

    kept = [p for p, i in full["files"].items()
            if not _stats_prunable(i["stats"], {"id": (9, None)})]
    assert len(kept) < len(full["files"]) and len(kept) >= 1


def test_protocol_and_column_mapping_gates(spark, tmp_path):
    root = str(tmp_path / "d4")
    _build(spark, root)
    log = os.path.join(root, "_delta_log")
    with open(os.path.join(log, f"{3:020d}.json"), "w") as f:
        f.write(json.dumps({"protocol": {
            "minReaderVersion": 3, "minWriterVersion": 7,
            "readerFeatures": ["deletionVectors"]}}) + "\n")
    # deletionVectors became a SUPPORTED reader feature in round 12:
    # a v3 protocol demanding it must now read, not refuse
    assert delta_read(spark, root).count() == 5
    with open(os.path.join(log, f"{3:020d}.json"), "w") as f:
        f.write(json.dumps({"protocol": {
            "minReaderVersion": 3, "minWriterVersion": 7,
            "readerFeatures": ["v2Checkpoint"]}}) + "\n")
    with pytest.raises(NotImplementedError, match="v2Checkpoint"):
        delta_read(spark, root)
    # older versions before the feature bump still read
    assert delta_read(spark, root, version=2).count() == 5
    with open(os.path.join(log, f"{3:020d}.json"), "w") as f:
        f.write(json.dumps({"protocol": {"minReaderVersion": 4,
                                         "minWriterVersion": 7}}) + "\n")
    with pytest.raises(NotImplementedError, match="minReaderVersion 4"):
        delta_read(spark, root)
    # column mapping: NAME mode reads since round 12; ID mode is the
    # remaining metadata gate
    with open(os.path.join(log, f"{3:020d}.json"), "w") as f:
        f.write(json.dumps({"metaData": {
            "id": "x", "schemaString": json.dumps(SCHEMA.jsonValue()),
            "partitionColumns": ["bucket"],
            "configuration": {"delta.columnMapping.mode": "id"}}}) + "\n")
    with pytest.raises(NotImplementedError, match="columnMapping"):
        delta_read(spark, root)


def test_unpartitioned_table_and_null_partition_value(spark, tmp_path):
    root = str(tmp_path / "d5")
    shutil.rmtree(root, ignore_errors=True)
    schema = T.StructType([T.StructField("id", T.LongType()),
                           T.StructField("v", T.StringType())])
    build_delta_table(
        spark, root, schema, [],
        [{"adds": [({}, _rows(spark, (1, "a"), (2, "b")))]}],
        checkpoint_at=0,
    )
    assert sorted((r.id, r.v) for r in delta_read(spark, root).collect()) \
        == [(1, "a"), (2, "b")]
    # null partition value casts to a typed NULL
    root2 = str(tmp_path / "d6")
    build_delta_table(
        spark, root2, SCHEMA, ["bucket"],
        [{"adds": [({"bucket": None}, _rows(spark, (7, "n")))]}],
    )
    row = delta_read(spark, root2).collect()[0]
    assert row.id == 7 and row.bucket is None


def test_malformed_action_is_valueerror(spark, tmp_path):
    root = str(tmp_path / "d7")
    _build(spark, root)
    with open(os.path.join(root, "_delta_log", f"{3:020d}.json"), "w") as f:
        f.write('{"add": {"path"::: garbage\n')
    with pytest.raises(ValueError, match="malformed action"):
        delta_read(spark, root)


def test_fuzz_delta_log_taxonomy(spark, tmp_path):
    """Mutated commit JSON / checkpoint bytes surface as ValueError /
    NotImplementedError, never KeyError/TypeError/json passthroughs."""
    import random

    root = str(tmp_path / "dfz")
    _build(spark, root, checkpoint_at=1)
    log = os.path.join(root, "_delta_log")
    names = sorted(os.listdir(log))
    rng = random.Random(5)
    originals = {n: open(os.path.join(log, n), "rb").read() for n in names}
    for _ in range(250):
        victim = rng.choice(names)
        b = bytearray(originals[victim])
        op = rng.randrange(3)
        if op == 0 and len(b) > 4:
            b = b[: rng.randrange(4, len(b))]
        elif op == 1:
            for _ in range(rng.randrange(1, 6)):
                b[rng.randrange(len(b))] ^= rng.randrange(1, 256)
        else:
            i = rng.randrange(len(b))
            b = b[:i] + bytes(rng.randrange(256) for _ in range(8)) + b[i:]
        with open(os.path.join(log, victim), "wb") as f:
            f.write(bytes(b))
        try:
            delta_snapshot(root)
        except (ValueError, NotImplementedError, KeyError) as e:
            # KeyError would be a taxonomy leak: fail loudly if seen
            assert not isinstance(e, KeyError), (victim, e)
        finally:
            with open(os.path.join(log, victim), "wb") as f:
                f.write(originals[victim])
