"""Multimodal (image/audio/video) column handling for training-data
pipelines.

Design: media are opaque ``binary`` columns with a typed metadata
struct, processed by Arrow-batched ``mapInPandas`` kernels. The
Spark-side plumbing — schemas, batch iteration, partition sizing,
output contracts — is real and tested; the actual codecs are stubbed
because media libraries (PIL/ffmpeg/torchaudio) are not in this
container. Each stub is either:

- a clearly-marked ``NotImplementedError`` raised at decode time when
  ``strict=True``, or
- a deterministic fake (hash-derived pixels/waveform) so downstream
  plumbing (feature extraction, resize bookkeeping, frame sampling)
  can be exercised end-to-end in tests.

Reference analogue: the KI-Indizierung pipeline treats GCS card scans
as opaque blobs manifested in a DataFrame and maps an expensive
per-item function over them (indizierung.ipynb cells 15-22); this
module is that pattern productionized on Spark.

Scale notes:
- Media bytes dominate row size: keep ``spark.sql.files.maxPartitionBytes``
  small enough that a partition of blobs fits executor memory, or store
  blobs as paths + lazy-load inside the kernel (``content_col=None``).
- ``mapInPandas`` streams record batches — peak memory is one Arrow
  batch, not one partition; cap ``spark.sql.execution.arrow
  .maxRecordsPerBatch`` (e.g. 64) for large blobs.
- Feature extraction is embarrassingly parallel: no shuffle at all
  until the downstream groupBy/join.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# ---------------------------------------------------------------------------
# schemas
# ---------------------------------------------------------------------------

IMAGE_META = T.StructType(
    [
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("channels", T.IntegerType()),
        T.StructField("format", T.StringType()),
    ]
)

AUDIO_META = T.StructType(
    [
        T.StructField("sample_rate", T.IntegerType()),
        T.StructField("n_samples", T.LongType()),
        T.StructField("channels", T.IntegerType()),
        T.StructField("format", T.StringType()),
    ]
)

VIDEO_META = T.StructType(
    [
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("fps", T.DoubleType()),
        T.StructField("n_frames", T.LongType()),
        T.StructField("format", T.StringType()),
    ]
)


def media_table_schema(meta: T.StructType) -> T.StructType:
    """Canonical media table: id, uri, opaque bytes, typed metadata."""
    return T.StructType(
        [
            T.StructField("media_id", T.LongType()),
            T.StructField("uri", T.StringType()),
            T.StructField("content", T.BinaryType()),
            T.StructField("meta", meta),
        ]
    )


# ---------------------------------------------------------------------------
# decode stubs
# ---------------------------------------------------------------------------

def _fake_pixels(content: bytes, width: int, height: int, channels: int) -> np.ndarray:
    """Deterministic fake decode: pixels derived from sha256 of the
    bytes, tiled to shape. NOT a real codec — stands in for
    PIL.Image.open in this container."""
    digest = hashlib.sha256(content or b"").digest()
    seed = np.frombuffer(digest, dtype=np.uint8)
    n = width * height * channels
    reps = (n + len(seed) - 1) // len(seed)
    return np.tile(seed, reps)[:n].reshape(height, width, channels)


def decode_image(content: bytes, meta: dict, *, strict: bool = False) -> np.ndarray:
    """STUB — real implementation would dispatch on meta['format'] to
    PIL/libjpeg. strict=True raises so callers can't mistake fake
    pixels for real ones."""
    if strict:
        raise NotImplementedError(
            "image codecs are not available in this environment; "
            "run with strict=False for the deterministic fake decoder"
        )
    return _fake_pixels(
        content, meta.get("width") or 8, meta.get("height") or 8, meta.get("channels") or 3
    )


# ---------------------------------------------------------------------------
# mapInPandas kernels
# ---------------------------------------------------------------------------

IMAGE_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("mean_intensity", T.DoubleType()),
        T.StructField("aspect_ratio", T.DoubleType()),
        T.StructField("phash", T.StringType()),
    ]
)


def image_features(df: DataFrame, *, strict: bool = False) -> DataFrame:
    """Per-image features via mapInPandas: byte size, mean intensity,
    aspect ratio, and a perceptual-hash-shaped digest (here: sha256 of
    the decoded/fake pixel grid — deterministic, so tests pin it)."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for _, row in pdf.iterrows():
                meta = row["meta"] if isinstance(row["meta"], dict) else (row["meta"] or {})
                content = bytes(row["content"] or b"")
                px = decode_image(content, dict(meta), strict=strict)
                h, w = px.shape[0], px.shape[1]
                out.append(
                    {
                        "media_id": row["media_id"],
                        "n_bytes": len(content),
                        "mean_intensity": float(px.mean()),
                        "aspect_ratio": (w / h) if h else 0.0,
                        "phash": hashlib.sha256(px.tobytes()).hexdigest()[:16],
                    }
                )
            yield pd.DataFrame(out, columns=[f.name for f in IMAGE_FEATURES_SCHEMA.fields])

    return df.mapInPandas(kernel, IMAGE_FEATURES_SCHEMA)


def resize_images(df: DataFrame, *, width: int, height: int, strict: bool = False) -> DataFrame:
    """Resize plumbing: decodes (stub), 'resizes' by nearest-neighbor
    index sampling on the fake grid, re-encodes as raw bytes, and
    rewrites the meta struct. Shows the full binary-in/binary-out
    mapInPandas contract."""

    out_schema = media_table_schema(IMAGE_META)

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for _, row in pdf.iterrows():
                meta = dict(row["meta"] or {})
                content = bytes(row["content"] or b"")
                px = decode_image(content, meta, strict=strict)
                ys = np.linspace(0, px.shape[0] - 1, height).astype(int)
                xs = np.linspace(0, px.shape[1] - 1, width).astype(int)
                resized = px[np.ix_(ys, xs)]
                rows.append(
                    {
                        "media_id": row["media_id"],
                        "uri": row["uri"],
                        "content": resized.tobytes(),
                        "meta": {
                            "width": width,
                            "height": height,
                            "channels": int(resized.shape[2]),
                            "format": "raw",
                        },
                    }
                )
            yield pd.DataFrame(rows, columns=[f.name for f in out_schema.fields])

    return df.mapInPandas(kernel, out_schema)


FRAME_SAMPLE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("frame_index", T.LongType()),
        T.StructField("frame", T.BinaryType()),
    ]
)


def sample_video_frames(df: DataFrame, *, every_n: int = 30, strict: bool = False) -> DataFrame:
    """Frame sampling plumbing (1 row in → k frame rows out): the
    row-explosion contract of a video pipeline. Frame bytes are
    hash-derived fakes; a real build decodes via ffmpeg in-kernel."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for _, row in pdf.iterrows():
                if strict:
                    raise NotImplementedError("video codecs not available; strict=False")
                meta = dict(row["meta"] or {})
                n_frames = int(meta.get("n_frames") or 0)
                content = bytes(row["content"] or b"")
                for i in range(0, n_frames, every_n):
                    frame = hashlib.sha256(content + i.to_bytes(8, "little")).digest()
                    rows.append(
                        {"media_id": row["media_id"], "frame_index": i, "frame": frame}
                    )
            yield pd.DataFrame(rows, columns=[f.name for f in FRAME_SAMPLE_SCHEMA.fields])

    return df.mapInPandas(kernel, FRAME_SAMPLE_SCHEMA)


def attach_binary_from_ids(df: DataFrame, id_col: str = "media_id") -> DataFrame:
    """Build a deterministic synthetic media table from an id column —
    test/bench harness for the kernels above (hash bytes stand in for
    real blobs)."""
    return df.select(
        F.col(id_col).cast("long").alias("media_id"),
        F.concat(F.lit("synthetic://"), F.col(id_col).cast("string")).alias("uri"),
        F.sha2(F.col(id_col).cast("string"), 256).cast("binary").alias("content"),
        F.struct(
            F.lit(16).alias("width"),
            F.lit(8).alias("height"),
            F.lit(3).alias("channels"),
            F.lit("fake").alias("format"),
        ).alias("meta"),
    )


# ---------------------------------------------------------------------------
# audio
# ---------------------------------------------------------------------------

def _fake_waveform(content: bytes, n_samples: int, channels: int) -> np.ndarray:
    """Deterministic fake decode: float32 waveform in [-1, 1) derived
    from sha256 of the bytes. NOT a real codec — stands in for
    soundfile/torchaudio in this container."""
    digest = hashlib.sha256(content or b"").digest()
    seed = np.frombuffer(digest, dtype=np.uint8).astype(np.float32)
    n = max(0, n_samples) * max(1, channels)
    reps = (n + len(seed) - 1) // len(seed) if n else 1
    flat = np.tile(seed, max(1, reps))[:n]
    return (flat / 128.0 - 1.0).reshape(max(0, n_samples), max(1, channels))


def decode_audio(content: bytes, meta: dict, *, strict: bool = False) -> np.ndarray:
    """STUB — real implementation would dispatch on meta['format'] to
    soundfile/ffmpeg. strict=True raises so callers can't mistake the
    fake waveform for real samples."""
    if strict:
        raise NotImplementedError(
            "audio codecs are not available in this environment; "
            "run with strict=False for the deterministic fake decoder"
        )
    return _fake_waveform(
        content, int(meta.get("n_samples") or 1600), int(meta.get("channels") or 1)
    )


AUDIO_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("duration_s", T.DoubleType()),
        T.StructField("rms", T.DoubleType()),
        T.StructField("peak", T.DoubleType()),
    ]
)


def audio_features(df: DataFrame, *, strict: bool = False) -> DataFrame:
    """Per-clip audio features via mapInPandas: byte size, duration from
    metadata, RMS energy and absolute peak over the (fake-)decoded
    waveform — the audio leg of the modality triple, same streaming
    batch contract as image_features."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for _, row in pdf.iterrows():
                meta = row["meta"] if isinstance(row["meta"], dict) else (row["meta"] or {})
                content = bytes(row["content"] or b"")
                wave = decode_audio(content, dict(meta), strict=strict)
                sr = int(meta.get("sample_rate") or 16000)
                n = wave.shape[0]
                out.append(
                    {
                        "media_id": row["media_id"],
                        "n_bytes": len(content),
                        "duration_s": (n / sr) if sr else 0.0,
                        "rms": float(np.sqrt(np.mean(wave**2))) if n else 0.0,
                        "peak": float(np.abs(wave).max()) if n else 0.0,
                    }
                )
            yield pd.DataFrame(out, columns=[f.name for f in AUDIO_FEATURES_SCHEMA.fields])

    return df.mapInPandas(kernel, AUDIO_FEATURES_SCHEMA)
