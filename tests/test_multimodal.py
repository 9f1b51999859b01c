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
