"""VP8L codec tests: round-trips across the format machinery, pinned
constants, container guards, and the strict decode path."""

import numpy as np
import pytest

from aroa_etl_spark.operators.vp8lcodec import (
    _DIST_MAP,
    _prefix_encode,
    _prefix_value,
    decode_webp_vp8l,
    encode_webp_vp8l,
)


def _ramp(h=16, w=32, k=7):
    r = np.arange(h, dtype=np.int64)[:, None]
    c = np.arange(w, dtype=np.int64)[None, :]
    v = ((k + r * 5 + c * 3) % 256).astype(np.uint8)
    return np.stack([v, (v * 2 % 256).astype(np.uint8), 255 - v], axis=2)


@pytest.mark.parametrize(
    "kw",
    [
        {},
        {"subtract_green": True},
        {"cache_bits": 4},
        {"subtract_green": True, "cache_bits": 6},
    ],
)
def test_roundtrip_variants(kw):
    img = _ramp()
    assert np.array_equal(decode_webp_vp8l(encode_webp_vp8l(img, **kw)), img)


@pytest.mark.parametrize("ncol,shape", [(2, (8, 37)), (4, (9, 21)),
                                        (16, (16, 32)), (200, (20, 25))])
def test_roundtrip_palette_bundling(ncol, shape):
    rng = np.random.RandomState(ncol)
    pal = rng.randint(0, 256, (ncol, 3)).astype(np.uint8)
    img = pal[rng.randint(0, ncol, shape)]
    assert np.array_equal(decode_webp_vp8l(encode_webp_vp8l(img, palette=True)), img)


def test_roundtrip_noise_runs_and_1x1():
    rng = np.random.RandomState(3)
    noise = rng.randint(0, 256, (13, 17, 3)).astype(np.uint8)
    assert np.array_equal(decode_webp_vp8l(encode_webp_vp8l(noise)), noise)
    runny = np.tile(np.array([[[10, 20, 30]]], dtype=np.uint8), (8, 40, 1))
    runny[0, :5] = [1, 2, 3]
    blob = encode_webp_vp8l(runny)
    assert np.array_equal(decode_webp_vp8l(blob), runny)
    assert len(blob) < 120  # LZ77 actually engaged
    one = np.array([[[9, 8, 7]]], dtype=np.uint8)
    assert np.array_equal(decode_webp_vp8l(encode_webp_vp8l(one)), one)


def test_prefix_value_law_and_dist_map_pins():
    # encode/decode law over the whole LZ77 value range the codes span
    class FakeBR:
        def __init__(self, v, n):
            self.v, self.n = v, n

        def bits(self, n):
            assert n == self.n
            return self.v

    for value in list(range(1, 70)) + [255, 1024, 4096]:
        code, extra, nbits = _prefix_encode(value)
        assert _prefix_value(code, FakeBR(extra, nbits)) == value
    # spec-pinned first map entries + the two the encoder uses
    assert _DIST_MAP[0] == (0, 1)   # code 1: pixel above
    assert _DIST_MAP[1] == (1, 0)   # code 2: pixel left
    assert _DIST_MAP[2] == (1, 1) and _DIST_MAP[3] == (-1, 1)
    assert _DIST_MAP[4] == (0, 2) and len(_DIST_MAP) == 120
    # exact window coverage, each offset once: dy 0..7 with dx -7..8
    # (dx >= 1 on the dy=0 row) is exactly 120 offsets
    want = {(dx, 0) for dx in range(1, 9)} | {
        (dx, dy) for dy in range(1, 8) for dx in range(-7, 9)
    }
    assert set(_DIST_MAP) == want and len(set(_DIST_MAP)) == 120


def test_container_guards():
    img = _ramp(4, 4)
    blob = bytearray(encode_webp_vp8l(img))
    with pytest.raises(ValueError, match="RIFF/WEBP"):
        decode_webp_vp8l(b"GIF89a definitely not webp")
    lossy = bytes(blob).replace(b"VP8L", b"VP8 ", 1)
    with pytest.raises(NotImplementedError, match="VP8"):
        decode_webp_vp8l(lossy)
    bad_sig = bytearray(blob)
    bad_sig[20] = 0x2E
    with pytest.raises(ValueError, match="signature"):
        decode_webp_vp8l(bytes(bad_sig))
    with pytest.raises(ValueError, match="overrun"):
        decode_webp_vp8l(bytes(blob[:-4]))


def test_strict_image_features_path(spark):
    from aroa_etl_spark.operators.multimodal import image_features
    from pyspark.sql import functions as F

    img = _ramp(8, 8)
    df = spark.createDataFrame(
        [(1, bytearray(encode_webp_vp8l(img)))], "media_id long, content binary"
    ).select(
        "media_id", "content",
        F.lit("mem://w").alias("uri"),
        F.struct(
            F.lit(8).cast("int").alias("width"),
            F.lit(8).cast("int").alias("height"),
            F.lit(3).cast("int").alias("channels"),
            F.lit("webp").alias("format"),
        ).alias("meta"),
    )
    row = image_features(df, strict=True).collect()[0]
    assert row.mean_intensity == pytest.approx(float(img.mean()))
    assert row.aspect_ratio == 1.0


def test_alpha_roundtrip_rgba():
    rng = np.random.RandomState(12)
    img = rng.randint(0, 256, (9, 14, 4)).astype(np.uint8)
    img[0, 0, 3] = 7  # definitely not opaque
    back = decode_webp_vp8l(encode_webp_vp8l(img))
    assert back.shape == (9, 14, 4) and np.array_equal(back, img)
    # palette path carries alpha through the ARGB palette entries
    pal = rng.randint(0, 256, (5, 4)).astype(np.uint8)
    pimg = pal[rng.randint(0, 5, (8, 11))]
    back2 = decode_webp_vp8l(encode_webp_vp8l(pimg, palette=True))
    if back2.shape[2] == 3:  # random palette happened to be opaque
        pimg = pimg[:, :, :3]
    assert np.array_equal(back2, pimg)
    # a fully-opaque RGBA input decodes to compact RGB
    op = rng.randint(0, 256, (4, 5, 4)).astype(np.uint8)
    op[:, :, 3] = 255
    back3 = decode_webp_vp8l(encode_webp_vp8l(op))
    assert back3.shape == (4, 5, 3)
    assert np.array_equal(back3, op[:, :, :3])


def test_predictor_transform_roundtrip_and_boundary():
    rng = np.random.RandomState(21)
    for shape in ((16, 32), (33, 50), (5, 7)):
        img = rng.randint(0, 256, (*shape, 3)).astype(np.uint8)
        blob = encode_webp_vp8l(img, predictor=True)
        assert np.array_equal(decode_webp_vp8l(blob), img)
    # a smooth gradient must COMPRESS under prediction (residuals are
    # tiny constants) — proof the transform actually engages
    r = np.arange(48)[:, None] + np.arange(64)[None, :]
    smooth = np.repeat((r % 256).astype(np.uint8)[..., None], 3, 2)
    assert len(encode_webp_vp8l(smooth, predictor=True)) < \
        len(encode_webp_vp8l(smooth)) // 5
    # out-of-range predictor modes are corrupt data, not a boundary
    from aroa_etl_spark.operators.vp8lcodec import _predict

    with pytest.raises(ValueError, match="out of range"):
        _predict(14, 0, 0, 0, 0)
    with pytest.raises(ValueError, match="palette excludes"):
        encode_webp_vp8l(smooth, predictor=True, palette=True)


def _px(a, r, g, b):
    return (a << 24) | (r << 16) | (g << 8) | b


def test_predictor_modes_11_13_pinned():
    """Spec-pinned values for Select / ClampAddSubtractFull / -Half
    (RFC 9649 §4.1.1): the tie-break and clamping details."""
    from aroa_etl_spark.operators.vp8lcodec import _predict

    # Select: pL = sum|T-TL|, pT = sum|L-TL|; pL < pT -> L, tie -> T
    left, top, tl = _px(255, 10, 20, 30), _px(255, 11, 21, 31), _px(255, 11, 21, 31)
    # T == TL -> pL = 0, pT = 3 -> left wins
    assert _predict(11, left, top, tl, 0) == left
    # L == TL -> pL = 3, pT = 0 -> top wins
    assert _predict(11, left, top, _px(255, 10, 20, 30), 0) == top
    # exact tie -> top (pL < pT is strict)
    assert _predict(11, left, left, left, 0) == left  # degenerate: all equal
    t2 = _px(255, 12, 20, 30)  # |T-TL|=2 on red only
    l2 = _px(255, 8, 20, 30)   # |L-TL|=2 on red only
    assert _predict(11, l2, t2, _px(255, 10, 20, 30), 0) == t2
    # ClampAddSubtractFull: clamp(L + T - TL) per channel
    assert _predict(12, _px(0, 250, 10, 0), _px(0, 10, 250, 0),
                    _px(0, 5, 255, 0), 0) == _px(0, 255, 5, 0)
    # ClampAddSubtractHalf: ave = (L+T)>>1; clamp(ave + (ave-TL)/2)
    # with C-truncating division of the (possibly negative) delta
    # ave=15, TL=20 -> d=-5 -> trunc(-5/2) = -2 -> 13   (floor would give -3)
    assert _predict(13, _px(0, 10, 0, 0), _px(0, 20, 0, 0),
                    _px(0, 20, 0, 0), 0) == _px(0, 13, 0, 0)
    # ave=200, TL=10 -> 200 + 95 = 295 -> clamps to 255
    assert _predict(13, _px(0, 200, 0, 0), _px(0, 200, 0, 0),
                    _px(0, 10, 0, 0), 0) == _px(0, 255, 0, 0)


def test_transform_combinations_roundtrip():
    """All encoder transform combinations (subtract-green x cross-color
    x predictor, with and without the color cache) decode bit-exactly,
    including the full predictor mode family 0-13 and RGBA."""
    rng = np.random.RandomState(44)
    for sg in (False, True):
        for cc in (False, True):
            for pr in (False, True):
                img = rng.randint(0, 256, (21, 37, 3)).astype(np.uint8)
                blob = encode_webp_vp8l(
                    img, subtract_green=sg, cross_color=cc, predictor=pr,
                    cache_bits=5 if (sg or cc) else 0,
                )
                assert np.array_equal(decode_webp_vp8l(blob), img), (sg, cc, pr)
    # a big-enough image to cycle every predictor mode 0-13 (16x16
    # tiles; 64x224 -> 4x14 = 56 tiles covers the %14 cycle 4 times)
    img = rng.randint(0, 256, (64, 224, 4)).astype(np.uint8)
    img[0, 0, 3] = 3
    blob = encode_webp_vp8l(img, predictor=True, cross_color=True)
    assert np.array_equal(decode_webp_vp8l(blob), img)


def test_inverse_predictor_np_matches_scalar():
    """Differential law: the vectorized NumPy inverse predictor equals
    the scalar reference kernel on random residual planes for every
    tile-mode assignment."""
    from aroa_etl_spark.operators.vp8lcodec import (
        _apply_predictor,
        _inverse_predictor_np,
    )

    rng = np.random.RandomState(9)
    for trial in range(6):
        h, w = int(rng.randint(2, 40)), int(rng.randint(2, 40))
        size_bits = int(rng.randint(2, 5))
        tw = (w + (1 << size_bits) - 1) >> size_bits
        th = (h + (1 << size_bits) - 1) >> size_bits
        modes = [int(m) for m in rng.randint(0, 14, tw * th)]
        resid = [int(p) for p in rng.randint(0, 2**32, h * w, dtype=np.uint64)]
        want = _apply_predictor(resid, w, modes, size_bits, tw, inverse=True)
        got = _inverse_predictor_np(
            np.array(resid, np.uint32).reshape(h, w), modes, size_bits, tw
        )
        assert got.reshape(-1).tolist() == want, (h, w, size_bits, trial)


def test_cross_color_transform_pinned_and_inverse():
    """Cross-color delta law: (int8(t) * int8(c)) >> 5 arithmetic
    shift, r2b applied from the reconstructed red — forward then
    inverse is the identity, and one hand-computed pixel pins the
    fixed-point rules."""
    from aroa_etl_spark.operators.vp8lcodec import _cross_color_np

    # hand-pinned: g2r=0x90 (-112), g2b=0x20 (32), r2b=0xFF (-1)
    coeffs = [(0xFF << 16) | (0x20 << 8) | 0x90]
    A = np.array([[_px(255, 100, 200, 50)]], np.uint32)
    fwd = _cross_color_np(A.copy(), coeffs, 4, 1, inverse=False)
    # green=200 -> int8 -56; d_r = (-112 * -56) >> 5 = 196
    # new_red = (100 - 196) & 255 = 160
    # d_b1 = (32 * -56) >> 5 = -56; d_b2 = (-1 * int8(100)=100) >> 5 = -4
    # new_blue = (50 + 56 + 4) & 255 = 110
    assert int(fwd[0, 0]) == _px(255, 160, 200, 110)
    inv = _cross_color_np(fwd, coeffs, 4, 1, inverse=True)
    assert int(inv[0, 0]) == _px(255, 100, 200, 50)
    # property: forward o inverse == id on random planes
    rng = np.random.RandomState(17)
    plane = rng.randint(0, 2**32, (24, 33), dtype=np.uint64).astype(np.uint32)
    cs = [int(c) for c in rng.randint(0, 2**24, 2 * 3, dtype=np.uint64)]
    f = _cross_color_np(plane.copy(), cs, 4, 3, inverse=False)
    assert np.array_equal(
        _cross_color_np(f, cs, 4, 3, inverse=True), plane
    )


def test_vp8x_extended_container_roundtrip_and_boundary():
    """VP8X-wrapped VP8L (round 11): the chunk walk finds the lossless
    stream; VP8X wrapping only a lossy VP8 chunk stays a named
    boundary."""
    rng = np.random.RandomState(31)
    img = rng.randint(0, 256, (11, 23, 3)).astype(np.uint8)
    blob = encode_webp_vp8l(img, extended=True, predictor=True,
                            cross_color=True)
    assert blob[12:16] == b"VP8X"
    assert np.array_equal(decode_webp_vp8l(blob), img)
    # RGBA through the wrapper
    imga = rng.randint(0, 256, (6, 9, 4)).astype(np.uint8)
    imga[0, 0, 3] = 9
    assert np.array_equal(
        decode_webp_vp8l(encode_webp_vp8l(imga, extended=True)), imga
    )
    from aroa_etl_spark.operators.multimodal import build_webp

    with pytest.raises(NotImplementedError, match="VP8L"):
        decode_webp_vp8l(build_webp("vp8x", 20, 10))
