"""Multimodal plumbing: schemas, mapInPandas kernels, strict-stub
behavior. Codecs are stubbed (deterministic fakes) — these tests pin
the Spark-side contracts: schema, batch shape, row explosion,
determinism."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


def _media(spark, n=6):
    from aroa_etl_spark.operators.multimodal import attach_binary_from_ids

    ids = spark.range(n).withColumnRenamed("id", "media_id")
    return attach_binary_from_ids(ids)


def test_image_features_schema_and_determinism(spark):
    from aroa_etl_spark.operators.multimodal import IMAGE_FEATURES_SCHEMA, image_features

    media = _media(spark)
    out = image_features(media)
    assert out.schema == IMAGE_FEATURES_SCHEMA
    rows1 = {r["media_id"]: r["phash"] for r in out.collect()}
    rows2 = {r["media_id"]: r["phash"] for r in image_features(media).collect()}
    assert rows1 == rows2  # hash-derived fake decode is deterministic
    assert len(rows1) == 6
    assert len(set(rows1.values())) == 6  # distinct content → distinct phash


def test_image_features_strict_raises(spark):
    from aroa_etl_spark.operators.multimodal import image_features

    with pytest.raises(Exception, match="NotImplementedError|not available"):
        image_features(_media(spark, 2), strict=True).collect()


def test_resize_rewrites_meta_and_content(spark):
    from aroa_etl_spark.operators.multimodal import resize_images

    out = resize_images(_media(spark, 3), width=4, height=2).collect()
    assert len(out) == 3
    for r in out:
        assert r["meta"]["width"] == 4 and r["meta"]["height"] == 2
        assert len(r["content"]) == 4 * 2 * 3  # w*h*c raw bytes


def test_video_frame_sampling_explodes_rows(spark):
    from aroa_etl_spark.operators.multimodal import sample_video_frames

    media = _media(spark, 2).withColumn(
        "meta",
        F.struct(
            F.lit(16).alias("width"), F.lit(8).alias("height"),
            F.lit(25.0).alias("fps"), F.lit(90).cast("long").alias("n_frames"),
            F.lit("fake").alias("format"),
        ),
    )
    out = sample_video_frames(media, every_n=30).collect()
    # frames 0, 30, 60 per video → 3 rows each
    assert len(out) == 6
    idx = sorted(r["frame_index"] for r in out if r["media_id"] == 0)
    assert idx == [0, 30, 60]
    frames = {(r["media_id"], r["frame_index"]): r["frame"] for r in out}
    assert len(set(frames.values())) == 6  # every frame digest distinct


def test_audio_features_schema_and_determinism(spark):
    from aroa_etl_spark.operators.multimodal import (
        AUDIO_META,
        audio_features,
        media_table_schema,
    )

    rows = [
        (1, "a.wav", b"\x01\x02", {"sample_rate": 8000, "n_samples": 1600, "channels": 1, "format": "wav"}),
        (2, "b.wav", None, {"sample_rate": 16000, "n_samples": 3200, "channels": 2, "format": "wav"}),
    ]
    df = spark.createDataFrame(rows, media_table_schema(AUDIO_META))
    got = {r["media_id"]: r for r in audio_features(df).collect()}
    assert got[1]["duration_s"] == 1600 / 8000
    assert got[2]["duration_s"] == 3200 / 16000
    assert 0.0 <= got[1]["rms"] <= 1.0 and got[1]["peak"] <= 1.0
    # deterministic fake decode → identical reruns
    again = {r["media_id"]: r for r in audio_features(df).collect()}
    assert {k: tuple(v) for k, v in got.items()} == {k: tuple(v) for k, v in again.items()}


def test_audio_features_strict_raises(spark):
    import pytest

    from aroa_etl_spark.operators.multimodal import (
        AUDIO_META,
        audio_features,
        media_table_schema,
    )

    df = spark.createDataFrame(
        [(1, "a.wav", b"x", {"sample_rate": 8000, "n_samples": 10, "channels": 1, "format": "wav"})],
        media_table_schema(AUDIO_META),
    )
    with pytest.raises(Exception, match="NotImplementedError|audio codecs"):
        audio_features(df, strict=True).collect()
