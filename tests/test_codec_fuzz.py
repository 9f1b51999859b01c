"""Mutation-fuzz for the vendored MEDIA codecs (r10 verdict #7): the
round-10 pass fuzzed the container walkers (zip/avro/warc, 3000-8000
trials) but not the codecs.  Contract under truncate / bit-flip /
splice mutations of valid seeds: decode raises ValueError or
NotImplementedError ONLY — never IndexError / KeyError / struct.error
/ UnicodeDecodeError / OverflowError — and never hangs or allocates
unboundedly (the VP8L decoder grew a PIL-style decompression-bomb
pixel cap for exactly this reason).  Escapes found by these loops are
pinned as seeded regressions the same way the container fuzz pass
pinned theirs.
"""

import random

import numpy as np
import pytest

from aroa_etl_spark.operators.flaccodec import decode_flac, encode_flac
from aroa_etl_spark.operators.jpegcodec import (
    decode_baseline_jpeg,
    encode_baseline_jpeg,
    encode_progressive_jpeg,
)
from aroa_etl_spark.operators.vp8lcodec import (
    decode_webp_vp8l,
    encode_webp_vp8l,
)

_OK = (ValueError, NotImplementedError)


def _mutate(blob: bytes, rng: random.Random) -> bytes:
    b = bytearray(blob)
    op = rng.randrange(3)
    if op == 0 and len(b) > 4:
        b = b[: rng.randrange(4, len(b))]
    elif op == 1:
        for _ in range(rng.randrange(1, 6)):
            b[rng.randrange(len(b))] ^= rng.randrange(1, 256)
    else:
        i = rng.randrange(len(b))
        b = b[:i] + bytes(rng.randrange(256) for _ in range(8)) + b[i:]
    return bytes(b)


def _fuzz(seeds, decode, trials, seed):
    rng = random.Random(seed)
    for t in range(trials):
        blob = _mutate(seeds[t % len(seeds)], rng)
        try:
            decode(blob)
        except _OK:
            pass  # the documented taxonomy


def _gradient(h, w, k=5):
    r = np.arange(h, dtype=np.int64)[:, None]
    c = np.arange(w, dtype=np.int64)[None, :]
    v = ((k + r * 5 + c * 3) % 256).astype(np.uint8)
    return np.stack([v, (v * 2 % 256).astype(np.uint8), 255 - v], axis=2)


def test_fuzz_vp8l_taxonomy():
    img = _gradient(16, 32)
    pal = np.array([[10, 20, 30], [200, 5, 90], [1, 2, 3]], np.uint8)
    seeds = [
        encode_webp_vp8l(img),
        encode_webp_vp8l(img, subtract_green=True, cache_bits=4),
        encode_webp_vp8l(img, predictor=True, cross_color=True),
        encode_webp_vp8l(pal[np.arange(64).reshape(8, 8) % 3], palette=True),
    ]
    # the pixel cap keeps fuzzed 14-bit dims from turning one trial
    # into minutes of work; production default is 1 << 24
    _fuzz(seeds, lambda b: decode_webp_vp8l(b, max_pixels=1 << 16), 1200, 11)


def test_vp8l_pixel_cap_is_a_named_boundary():
    img = _gradient(8, 8)
    blob = encode_webp_vp8l(img)
    with pytest.raises(NotImplementedError, match="pixel"):
        decode_webp_vp8l(blob, max_pixels=63)
    assert decode_webp_vp8l(blob, max_pixels=64).shape == (8, 8, 3)


def test_fuzz_jpeg_taxonomy():
    img = _gradient(24, 33)
    seeds = [
        encode_baseline_jpeg(img, quality=80),
        encode_baseline_jpeg(img[:, :, 0:1], quality=90),
        encode_baseline_jpeg(img, subsampling="420", restart_interval=2),
        encode_progressive_jpeg(img),
    ]
    _fuzz(seeds, decode_baseline_jpeg, 1200, 13)


def test_fuzz_flac_taxonomy():
    t = np.arange(2048)
    mono = (1000 * np.sin(t / 9)).astype(np.int16)
    stereo = np.stack([mono, (mono // 3).astype(np.int16)], axis=1)
    seeds = [
        encode_flac(mono, block_size=512),
        encode_flac(stereo, stereo_mode="mid_side", block_size=256),
    ]
    _fuzz(seeds, decode_flac, 1200, 17)


def test_fuzz_pdf_objstm_taxonomy():
    """The r10 fuzz pass covered classic-layout PDFs; this seeds the
    1.5+ xref-stream/objstm layout specifically (verdict #7 named
    pdf-objstm), through both the triage scan and the text extractor."""
    from aroa_etl_spark.operators.pdfscan import (
        _extract_blob_text,
        _scan_blob,
        build_pdf_with_text,
    )

    seeds = [
        build_pdf_with_text(
            ["Hello fuzz", "page two"], version="1.5",
            xref_stream=True, objstm=True, compress=True,
        ),
        build_pdf_with_text(
            ["hex (strings) \\ here"], version="1.6",
            xref_stream=True, objstm=True, hex_strings=True,
        ),
    ]

    def both(blob):
        _scan_blob(blob, True)
        _extract_blob_text(blob, True)

    _fuzz(seeds, both, 900, 19)
    # lenient mode must never raise at all
    rng = random.Random(23)
    for t in range(300):
        blob = _mutate(seeds[t % 2], rng)
        _scan_blob(blob, False)
        _extract_blob_text(blob, False)
