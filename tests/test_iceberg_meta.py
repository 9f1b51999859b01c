"""Iceberg metadata reader (sources/iceberg_meta.py): snapshot walk
through REAL Avro manifest lists/manifests (read by the engine's own
OCF reader), time travel, status-2 skipping, partition pruning, and
the merge-on-read refusal gates."""

import json
import os
import shutil

import pytest

from aroa_etl_spark.sources.iceberg_meta import (
    build_iceberg_table,
    iceberg_read,
    iceberg_snapshot,
)

FIELDS = [("id", "long"), ("v", "string"), ("band", "int")]


def _rows(spark, *pairs):
    return spark.createDataFrame(list(pairs), "id long, v string, band int")


def _build(spark, root):
    shutil.rmtree(root, ignore_errors=True)
    return build_iceberg_table(
        spark, root, FIELDS, [("band", "int")],
        [
            # snapshot 1000: TWO manifests in one list
            [{"adds": [({"band": 0}, _rows(spark, (1, "a", 0), (2, "b", 0)))]},
             {"adds": [({"band": 1}, _rows(spark, (3, "c", 1)))]}],
            # snapshot 1001: band 2
            [{"adds": [({"band": 2}, _rows(spark, (9, "z", 2)))]}],
            # snapshot 1002: compaction of band 1 (status-2 rewrite)
            [{"adds": [({"band": 1}, _rows(spark, (3, "c", 1)))],
              "delete_where": {"band": 1}}],
        ],
    )


def test_snapshot_walk_time_travel_and_status2(spark, tmp_path):
    root = str(tmp_path / "i1")
    ids = _build(spark, root)
    assert ids == [1000, 1001, 1002]
    assert sorted((r.id, r.v, r.band)
                  for r in iceberg_read(spark, root).collect()) == \
        [(1, "a", 0), (2, "b", 0), (3, "c", 1), (9, "z", 2)]
    assert sorted(r.id for r in
                  iceberg_read(spark, root, snapshot_id=1000).collect()) == \
        [1, 2, 3]
    # the latest list still carries the REWRITTEN manifest with its
    # status-2 tombstone — content identical across the compaction
    a = sorted(map(tuple, iceberg_read(spark, root,
                                       snapshot_id=1001).collect()))
    b = sorted(map(tuple, iceberg_read(spark, root,
                                       snapshot_id=1002).collect()))
    assert a == b
    with pytest.raises(ValueError, match="snapshot 777"):
        iceberg_read(spark, root, snapshot_id=777)


def test_partition_prune_is_io_only(spark, tmp_path):
    root = str(tmp_path / "i2")
    _build(spark, root)
    got = sorted(r.id for r in iceberg_read(
        spark, root, prune={"band": (1, 2)}
    ).collect())
    assert got == [3, 9]
    snap = iceberg_snapshot(root)
    kept = [p for p, i in snap["files"].items()
            if 1 <= (i["partition"].get("band") or 0) <= 2]
    assert 0 < len(kept) < len(snap["files"])


def test_merge_on_read_gates(spark, tmp_path):
    root = str(tmp_path / "i3")
    _build(spark, root)
    # flip the newest metadata to format-version 3
    from aroa_etl_spark.sources.iceberg_meta import _metadata_path

    mp = _metadata_path(root)
    meta = json.load(open(mp))
    meta["format-version"] = 3
    json.dump(meta, open(mp, "w"))
    with pytest.raises(NotImplementedError, match="format-version 3"):
        iceberg_read(spark, root)
    meta["format-version"] = 2
    json.dump(meta, open(mp, "w"))
    # a DELETE manifest (content=1) in the list must refuse
    from aroa_etl_spark.sources.avro_ocf import build_avro_ocf
    from aroa_etl_spark.sources.iceberg_meta import _MANIFEST_FILE_SCHEMA

    snap_meta = json.load(open(mp))
    ml_rel = [s for s in snap_meta["snapshots"]
              if s["snapshot-id"] == snap_meta["current-snapshot-id"]
              ][0]["manifest-list"]
    from aroa_etl_spark.sources.avro_ocf import parse_avro_blob

    _h, recs = parse_avro_blob(open(os.path.join(root, ml_rel), "rb").read())
    recs[0]["content"] = 1
    with open(os.path.join(root, ml_rel), "wb") as f:
        f.write(build_avro_ocf(_MANIFEST_FILE_SCHEMA, recs))
    # position deletes APPLY since round 12 — but a "delete" manifest
    # whose entries are plain data files (content=0) is malformed and
    # must fail loudly rather than resurrect or drop rows
    with pytest.raises(ValueError, match="delete manifest entry"):
        iceberg_read(spark, root)


def test_version_hint_and_missing_table(spark, tmp_path):
    root = str(tmp_path / "i4")
    _build(spark, root)
    # the hint pins an OLDER metadata file: reads follow it
    with open(os.path.join(root, "metadata", "version-hint.text"), "w") as f:
        f.write("2")
    assert sorted(r.id for r in iceberg_read(spark, root).collect()) == \
        [1, 2, 3, 9]
    with pytest.raises(ValueError, match="no metadata"):
        iceberg_read(spark, str(tmp_path / "nope"))


def test_fuzz_iceberg_metadata_taxonomy(spark, tmp_path):
    """Mutated metadata.json / manifest-list / manifest Avro bytes
    surface as ValueError / NotImplementedError only."""
    import random

    root = str(tmp_path / "ifz")
    _build(spark, root)
    mdir = os.path.join(root, "metadata")
    names = [os.path.join("metadata", n) for n in sorted(os.listdir(mdir))]
    rng = random.Random(6)
    originals = {n: open(os.path.join(root, n), "rb").read() for n in names}
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
        with open(os.path.join(root, victim), "wb") as f:
            f.write(bytes(b))
        try:
            iceberg_snapshot(root)
        except (ValueError, NotImplementedError):
            pass
        except FileNotFoundError:
            pass  # a mutated path pointing nowhere is an I/O miss
        finally:
            with open(os.path.join(root, victim), "wb") as f:
                f.write(originals[victim])
