"""TFRecord source (sources/tfrecord.py): CRC-32C against the public
test vector, framing round-trip and corruption guards, tf.train.Example
codec both directions, DataSource batch/streaming reads, and the
typed-column explode."""

from __future__ import annotations

import os

import pytest

from aroa_etl_spark.sources.tfrecord import (
    build_example,
    crc32c,
    examples_to_columns,
    iter_tfrecords,
    masked_crc32c,
    parse_example,
    register_tfrecord_source,
    write_tfrecords,
)


def test_crc32c_public_vector_and_mask():
    # RFC 3720 / public check value for CRC-32C
    assert crc32c(b"123456789") == 0xE3069283
    assert crc32c(b"") == 0
    # the mask is order-sensitive: rotate-then-add
    c = crc32c(b"abc")
    assert masked_crc32c(b"abc") == (((c >> 15) | (c << 17)) + 0xA282EAD8) & 0xFFFFFFFF


def test_framing_roundtrip_and_corruption():
    recs = [b"hello", b"", b"x" * 1000]
    blob = write_tfrecords(recs)
    assert list(iter_tfrecords(blob)) == recs
    bad = bytearray(blob)
    bad[20] ^= 0xFF  # flip a payload byte of record 0
    with pytest.raises(ValueError, match="payload-CRC"):
        list(iter_tfrecords(bytes(bad)))
    assert list(iter_tfrecords(bytes(bad), strict=False)) == []
    # truncated tail: lenient yields the complete prefix records
    cut = blob[: len(blob) - 2]
    with pytest.raises(ValueError):
        list(iter_tfrecords(cut))
    assert list(iter_tfrecords(cut, strict=False)) == recs[:2]


def test_example_codec_roundtrip():
    ex = build_example({
        "text": "héllo wörld",
        "label": [3, -5],
        "emb": [1.0, 2.5, -3.0],
    })
    parsed = parse_example(ex)
    assert parsed["text"] == ("bytes", ["héllo wörld".encode()])
    assert parsed["label"] == ("int64", [3, -5])
    assert parsed["emb"] == ("float", [1.0, 2.5, -3.0])
    assert parse_example(build_example({})) in ({}, {"": ("bytes", [])})


def _stage(tmp_path, n_files=3):
    for k in range(n_files):
        recs = [f"r{k}{i}".encode() for i in range(k + 1)]
        with open(os.path.join(str(tmp_path), f"s{k}.tfrecord"), "wb") as fh:
            fh.write(write_tfrecords(recs))


def test_datasource_batch_read(spark, tmp_path):
    _stage(tmp_path)
    register_tfrecord_source(spark)
    rows = (
        spark.read.format("tfrecord").load(str(tmp_path))
        .orderBy("path", "record_idx").collect()
    )
    assert len(rows) == 1 + 2 + 3
    assert rows[0].n_bytes == 3 and rows[0].record_idx == 0
    # payload option carries the raw bytes
    with_payload = (
        spark.read.format("tfrecord").option("payload", "true")
        .load(str(tmp_path)).orderBy("path", "record_idx").first()
    )
    assert bytes(with_payload.payload) == b"r00"


def test_datasource_stream_tails_and_rejects_mutation(spark, tmp_path):
    from aroa_etl_spark.sources.tfrecord import TFRecordStreamReader

    _stage(tmp_path, n_files=2)
    reader = TFRecordStreamReader({"path": str(tmp_path)})
    start = reader.initialOffset()
    end = reader.latestOffset()
    parts = reader.partitions(start, end)
    assert len(parts) == 2
    # a mutated (grown) seen shard fails planning loudly
    with open(os.path.join(str(tmp_path), "s0.tfrecord"), "ab") as fh:
        fh.write(write_tfrecords([b"late"]))
    with pytest.raises(ValueError, match="changed size"):
        reader.partitions(end, reader.latestOffset())


def test_examples_to_columns_typed_explode(spark, tmp_path):
    recs = [
        build_example({"text": f"d{i}", "label": [i], "emb": [float(i), 1.0]})
        for i in range(4)
    ]
    with open(os.path.join(str(tmp_path), "e.tfrecord"), "wb") as fh:
        fh.write(write_tfrecords(recs))
    register_tfrecord_source(spark)
    raw = (
        spark.read.format("tfrecord").option("payload", "true")
        .load(str(tmp_path))
    )
    typed = examples_to_columns(
        raw, {"text": "bytes", "label": "int64", "emb": "float",
              "missing": "int64"}
    ).orderBy("record_idx").collect()
    assert [bytes(r.text) for r in typed] == [b"d0", b"d1", b"d2", b"d3"]
    assert [r.label for r in typed] == [[0], [1], [2], [3]]
    assert typed[2].emb == [2.0, 1.0]
    assert all(r.missing is None for r in typed)
    # kind mismatch fails loudly
    with pytest.raises(Exception):
        examples_to_columns(raw, {"text": "int64"}).collect()


def test_write_tfrecord_shards_deterministic_and_readable(spark, tmp_path):
    from aroa_etl_spark.sources.tfrecord import write_tfrecord_shards

    df = spark.createDataFrame(
        [(i, f"text {i}") for i in range(50)], "doc_id long, text string"
    )
    out1 = os.path.join(str(tmp_path), "a")
    out2 = os.path.join(str(tmp_path), "b")
    os.makedirs(out1), os.makedirs(out2)
    m1 = {r.shard_path.split("/")[-1]: (r.n_records, r.shard_bytes)
          for r in write_tfrecord_shards(df, out1, docs_per_shard=10).collect()}
    m2 = {r.shard_path.split("/")[-1]: (r.n_records, r.shard_bytes)
          for r in write_tfrecord_shards(
              df.repartition(7), out2, docs_per_shard=10).collect()}
    assert m1 == m2 and sum(n for n, _ in m1.values()) == 50
    # byte-identical shards across runs/partitionings
    for name in m1:
        with open(os.path.join(out1, name), "rb") as fa, \
             open(os.path.join(out2, name), "rb") as fb:
            assert fa.read() == fb.read()
    # and the engine reads its own shards back, Examples intact
    register_tfrecord_source(spark)
    raw = (
        spark.read.format("tfrecord").option("payload", "true").load(out1)
    )
    typed = examples_to_columns(raw, {"id": "int64", "text": "bytes"})
    got = {r.id[0]: bytes(r.text).decode() for r in typed.collect()}
    assert got == {i: f"text {i}" for i in range(50)}


def test_build_example_mixed_and_empty_lists_fail_or_promote():
    """Review fixes: ANY float promotes the list to FloatList (no
    silent int-truncation); empty lists are kind-ambiguous and raise."""
    mixed = parse_example(build_example({"m": [1, 2.5, 3.0]}))
    assert mixed["m"] == ("float", [1.0, 2.5, 3.0])
    with pytest.raises(TypeError, match="ambiguous"):
        build_example({"e": []})
    with pytest.raises(TypeError, match="int or float"):
        build_example({"b": [1, "x"]})


def test_examples_to_columns_rejects_scan_column_collision(spark, tmp_path):
    with open(os.path.join(str(tmp_path), "c.tfrecord"), "wb") as fh:
        fh.write(write_tfrecords([build_example({"path": b"evil"})]))
    register_tfrecord_source(spark)
    raw = (
        spark.read.format("tfrecord").option("payload", "true")
        .load(str(tmp_path))
    )
    with pytest.raises(ValueError, match="collide"):
        examples_to_columns(raw, {"path": "bytes"})


def test_stream_offsets_monotonic_over_delete_and_replace(tmp_path):
    """Review fix: a seen shard that is deleted and re-placed must NOT
    re-ingest (same size) and must fail loudly (different size) —
    offsets are a monotonic high watermark."""
    from aroa_etl_spark.sources.tfrecord import TFRecordStreamReader

    p = os.path.join(str(tmp_path), "s0.tfrecord")
    blob = write_tfrecords([b"abc"])
    with open(p, "wb") as fh:
        fh.write(blob)
    reader = TFRecordStreamReader({"path": str(tmp_path)})
    o1 = reader.latestOffset()
    assert reader.partitions(reader.initialOffset(), o1)[0].path == p
    os.remove(p)
    o2 = reader.latestOffset()
    assert o2["seen"] == o1["seen"]  # deletion does not forget the shard
    # re-place byte-identical: nothing new to ingest
    with open(p, "wb") as fh:
        fh.write(blob)
    o3 = reader.latestOffset()
    parts = reader.partitions(o1, o3)
    assert [q.path for q in parts if q.path] == []
    # re-place at a different size: loud failure
    with open(p, "wb") as fh:
        fh.write(write_tfrecords([b"abcdef"]))
    with pytest.raises(ValueError, match="changed size"):
        reader.partitions(o1, reader.latestOffset())


def test_streaming_sink_exactly_once_crash_replay(spark, tmp_path):
    """r8 verdict ask #7's 'done' condition: re-running a batch must
    not duplicate records.  Matrix: (a) replay of a committed batch is
    a manifest-gated no-op; (b) crash between shard placement and
    manifest commit (manifest missing) heals by atomic overwrite; (c)
    the read-back multiset equals the input exactly in every case."""
    import glob
    import json

    from aroa_etl_spark.sources.tfrecord import (
        read_tfrecord_manifests,
        register_tfrecord_source,
        tfrecord_batch_writer,
    )

    out = str(tmp_path / "sink")
    os.makedirs(out)
    df = spark.createDataFrame(
        [(i, f"text-{i}") for i in range(37)], "doc_id long, text string"
    )
    writer = tfrecord_batch_writer(out, docs_per_shard=10)
    writer(df, 0)
    mpath = os.path.join(out, "_manifests", "batch-00000.json")
    assert os.path.exists(mpath)
    with open(mpath) as fh:
        m0 = json.load(fh)
    assert sum(s["n_records"] for s in m0["shards"]) == 37

    register_tfrecord_source(spark)

    def read_ids():
        raw = spark.read.format("tfrecord").option("payload", "true").load(
            os.path.join(out, "*.tfrecord")
        )
        from aroa_etl_spark.sources.tfrecord import examples_to_columns

        typed = examples_to_columns(raw, {"id": "int64"})
        return sorted(r[0] for r in typed.selectExpr("element_at(id, 1)").collect())

    assert read_ids() == list(range(37))

    # (a) committed replay: no-op — manifest untouched, no new shards
    shards_before = sorted(glob.glob(os.path.join(out, "*.tfrecord")))
    mtime = os.stat(mpath).st_mtime_ns
    writer(df, 0)
    assert os.stat(mpath).st_mtime_ns == mtime
    assert sorted(glob.glob(os.path.join(out, "*.tfrecord"))) == shards_before
    assert read_ids() == list(range(37))

    # (b) crash before manifest commit: replay heals, never duplicates
    os.remove(mpath)
    writer(df, 0)
    assert os.path.exists(mpath)
    assert sorted(glob.glob(os.path.join(out, "*.tfrecord"))) == shards_before
    assert read_ids() == list(range(37))

    # a second batch lands beside the first without touching it
    df2 = spark.createDataFrame(
        [(100 + i, f"late-{i}") for i in range(5)], "doc_id long, text string"
    )
    writer(df2, 1)
    assert read_ids() == list(range(37)) + [100 + i for i in range(5)]
    mdf = read_tfrecord_manifests(spark, out)
    assert mdf.groupBy("batch_id").count().count() == 2
    # manifests agree with reader counts per shard
    total = mdf.agg({"n_records": "sum"}).first()[0]
    assert total == 42
