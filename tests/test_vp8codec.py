"""Lossy VP8 keyframe codec (operators/vp8codec.py, round 12).

Three oracle layers:

1. SYSTEM-LIBWEBP DIFFERENTIAL (skipped when the shared library is
   absent): libwebp-encoded images decode to BIT-EXACT 4:2:0 YUV
   planes — libwebp's encoder exercises segmentation with coded maps,
   token-probability updates, skip flags, B_PRED, and the normal loop
   filter at real strengths; twin-encoded bitstreams decode
   identically through libwebp and this decoder (every B mode with AC
   coefficients, multi-partition, simple/normal/sharp filters, odd
   crops); lossy+ALPH alpha matches libwebp's RGBA alpha channel.
2. CLOSED-FORM (no external dependency): DC-only fixtures whose
   reconstruction follows integer arithmetic replayed here by hand —
   the same law the catalog oracle replays in SQL.
3. MUTATION FUZZ (house rule: every new parser at birth): truncations,
   bit flips, and splices must raise ValueError/NotImplementedError
   only — never hang, never leak IndexError/OverflowError.
"""

from __future__ import annotations

import ctypes
import ctypes.util

import numpy as np
import pytest

from aroa_etl_spark.operators.vp8codec import (
    _DC_QLOOKUP,
    decode_webp,
    decode_webp_vp8_yuv,
    encode_webp_vp8,
)

_LIBWEBP = None


def _libwebp():
    global _LIBWEBP
    if _LIBWEBP is None:
        path = ctypes.util.find_library("webp")
        if path is None:
            pytest.skip("system libwebp not available")
        lib = ctypes.CDLL(path)
        lib.WebPEncodeRGB.restype = ctypes.c_size_t
        lib.WebPEncodeRGB.argtypes = [
            ctypes.c_char_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.c_float, ctypes.POINTER(ctypes.POINTER(ctypes.c_uint8)),
        ]
        lib.WebPEncodeRGBA.restype = ctypes.c_size_t
        lib.WebPEncodeRGBA.argtypes = lib.WebPEncodeRGB.argtypes
        lib.WebPDecodeYUV.restype = ctypes.POINTER(ctypes.c_uint8)
        lib.WebPDecodeYUV.argtypes = [
            ctypes.c_char_p, ctypes.c_size_t,
            ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
            ctypes.POINTER(ctypes.POINTER(ctypes.c_uint8)),
            ctypes.POINTER(ctypes.POINTER(ctypes.c_uint8)),
            ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
        ]
        lib.WebPDecodeRGBA.restype = ctypes.POINTER(ctypes.c_uint8)
        lib.WebPDecodeRGBA.argtypes = [
            ctypes.c_char_p, ctypes.c_size_t,
            ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
        ]
        _LIBWEBP = lib
    return _LIBWEBP


def _lw_encode(img: np.ndarray, q: float, rgba: bool = False) -> bytes:
    lib = _libwebp()
    h, w, ch = img.shape
    out = ctypes.POINTER(ctypes.c_uint8)()
    fn = lib.WebPEncodeRGBA if rgba else lib.WebPEncodeRGB
    n = fn(img.tobytes(), w, h, w * ch, float(q), ctypes.byref(out))
    assert n > 0
    return bytes(bytearray(
        ctypes.cast(out, ctypes.POINTER(ctypes.c_uint8 * n)).contents
    ))


def _lw_decode_yuv(blob: bytes):
    lib = _libwebp()
    w = ctypes.c_int()
    h = ctypes.c_int()
    up = ctypes.POINTER(ctypes.c_uint8)()
    vp = ctypes.POINTER(ctypes.c_uint8)()
    s = ctypes.c_int()
    us = ctypes.c_int()
    yp = lib.WebPDecodeYUV(
        blob, len(blob), ctypes.byref(w), ctypes.byref(h),
        ctypes.byref(up), ctypes.byref(vp), ctypes.byref(s),
        ctypes.byref(us),
    )
    assert yp, "libwebp refused the bitstream"
    W, H, S, US = w.value, h.value, s.value, us.value
    cw, ch_ = (W + 1) // 2, (H + 1) // 2
    return (
        np.ctypeslib.as_array(yp, (H, S))[:, :W].copy(),
        np.ctypeslib.as_array(up, (ch_, US))[:, :cw].copy(),
        np.ctypeslib.as_array(vp, (ch_, US))[:, :cw].copy(),
    )


def _assert_yuv_equal(blob: bytes) -> None:
    ly, lu, lv = _lw_decode_yuv(blob)
    my, mu, mv = decode_webp_vp8_yuv(blob)
    for name, a, b in (("y", ly, my), ("u", lu, mu), ("v", lv, mv)):
        assert a.shape == b.shape, (name, a.shape, b.shape)
        if not np.array_equal(a, b):
            d = np.abs(a.astype(int) - b.astype(int))
            raise AssertionError(
                f"{name} plane differs: {np.count_nonzero(d)} px, "
                f"max {d.max()}"
            )


# --- layer 1: libwebp differential ---------------------------------------------

@pytest.mark.parametrize("size", [(16, 16), (33, 17), (64, 48), (129, 65)])
@pytest.mark.parametrize("q", [10.0, 75.0, 95.0])
def test_differential_libwebp_encoded(size, q):
    w, h = size
    xx, yy = np.meshgrid(np.arange(w), np.arange(h))
    base = ((xx * 3 + yy * 5) % 256).astype(np.uint8)
    img = np.dstack([
        base, (base[::-1] // 2 + 64).astype(np.uint8),
        np.full((h, w), 128, np.uint8),
    ])
    _assert_yuv_equal(_lw_encode(img, q))


def test_differential_noise_and_edges():
    rng = np.random.default_rng(42)
    noise = rng.integers(0, 256, (48, 80, 3)).astype(np.uint8)
    edges = np.zeros((40, 56, 3), np.uint8)
    edges[20:, :] = 220
    edges[:, ::7] = 30
    for img in (noise, edges):
        for q in (0.0, 50.0, 100.0):
            _assert_yuv_equal(_lw_encode(img, q))


def test_differential_alpha_composite():
    lib = _libwebp()
    rng = np.random.default_rng(9)
    img = rng.integers(0, 256, (21, 33, 4)).astype(np.uint8)
    img[..., 3] = (np.arange(21)[:, None] * 7 + np.arange(33) * 3) % 256
    blob = _lw_encode(img, 75.0, rgba=True)
    w = ctypes.c_int()
    h = ctypes.c_int()
    p = lib.WebPDecodeRGBA(blob, len(blob), ctypes.byref(w), ctypes.byref(h))
    la = np.ctypeslib.as_array(p, (h.value, w.value, 4))[..., 3].copy()
    mine = decode_webp(blob)
    assert mine.shape == (21, 33, 4)
    # alpha is lossless and upsampling-free: must match bit-exactly
    # (RGB legitimately differs: libwebp fancy-upsamples chroma)
    assert np.array_equal(mine[..., 3], la)


@pytest.mark.parametrize("bmode", range(10))
def test_twin_every_bmode_with_ac(bmode):
    rng = np.random.default_rng(100 + bmode)
    sub = {
        (0, 0): [[bmode] * 4 for _ in range(4)],
        (0, 1): [[(bmode + r + c) % 10 for c in range(4)] for r in range(4)],
    }
    ylev = rng.integers(-6, 6, (1, 2, 16, 16))
    blob = encode_webp_vp8(
        np.full((1, 2), 4), submodes=sub, ylev=ylev, base_q=15
    )
    _assert_yuv_equal(blob)


def test_twin_features_matrix():
    rng = np.random.default_rng(5)
    ym = np.array([[4, 0, 1, 4], [2, 4, 3, 0], [4, 4, 0, 2]])
    sub = {
        k: [[int(rng.integers(0, 10)) for _ in range(4)] for _ in range(4)]
        for k in [(0, 0), (0, 3), (1, 1), (2, 0), (2, 1)]
    }
    sk = np.array([[0, 1, 0, 0], [0, 0, 0, 1], [0, 0, 1, 0]])
    seg = np.array([[0, 1, 2, 3], [3, 2, 1, 0], [0, 0, 2, 2]])
    y2 = rng.integers(-15, 15, (3, 4, 16))
    ylev = rng.integers(-3, 3, (3, 4, 16, 16))
    ylev[:, :, :, 0] = 0
    uvlev = rng.integers(-3, 3, (3, 4, 8, 16))
    for r, c in zip(*np.nonzero(sk)):
        y2[r, c] = 0
        ylev[r, c] = 0
        uvlev[r, c] = 0
    blob = encode_webp_vp8(
        ym, submodes=sub, y2lev=y2, ylev=ylev, uvlev=uvlev, skip=sk,
        seg_ids=seg, seg_q=[10, 20, 30, 40], base_q=0,
        q_deltas=(1, -2, 3, -4, 5),
    )
    _assert_yuv_equal(blob)


@pytest.mark.parametrize("nparts", [2, 4, 8])
def test_twin_multi_partition(nparts):
    rng = np.random.default_rng(nparts)
    ym = np.zeros((8, 2), int)
    blob = encode_webp_vp8(
        ym, y2lev=rng.integers(-9, 9, (8, 2, 16)), n_partitions=nparts
    )
    _assert_yuv_equal(blob)


@pytest.mark.parametrize(
    "level,simple,sharp", [(32, False, 0), (32, True, 0), (50, False, 3),
                           (63, False, 7), (8, True, 2)]
)
def test_twin_loop_filters(level, simple, sharp):
    ym = np.zeros((2, 2), int)
    y2 = np.zeros((2, 2, 16), int)
    y2[:, :, 0] = [[30, -30], [-20, 20]]
    blob = encode_webp_vp8(
        ym, y2lev=y2, base_q=60, filter_level=level,
        filter_simple=simple, sharpness=sharp,
    )
    _assert_yuv_equal(blob)


def test_twin_odd_crop():
    rng = np.random.default_rng(1)
    blob = encode_webp_vp8(
        np.zeros((2, 3), int), y2lev=rng.integers(-9, 9, (2, 3, 16)),
        width=41, height=27,
    )
    _assert_yuv_equal(blob)


def test_twin_raw_alpha_chunk():
    a = (np.arange(16)[:, None] * 16 + np.arange(16)).astype(np.uint8)
    blob = encode_webp_vp8(
        np.zeros((1, 1), int), y2lev=np.zeros((1, 1, 16), int), alpha=a
    )
    out = decode_webp(blob)
    assert out.shape == (16, 16, 4)
    assert np.array_equal(out[..., 3], a)


# --- layer 2: closed form (no libwebp needed) -----------------------------------

def test_closed_form_dc_chain():
    """The catalog oracle's law, replayed in Python: single MB row,
    modes DC/V/H/TM, per-segment quantizers, Y2-DC-only residuals."""
    for k in (0, 7, 23, 39):
        segs = [(k + 3 * i) % 4 for i in range(4)]
        yms = [(k + i) % 4 for i in range(4)]
        skp = [1 if (k + i) % 5 == 0 else 0 for i in range(4)]
        y2lev = np.zeros((1, 4, 16), int)
        for i in range(4):
            if not skp[i]:
                y2lev[0, i, 0] = ((k * 5 + i * 7) % 9) - 4
        blob = encode_webp_vp8(
            np.array([yms]), y2lev=y2lev, skip=np.array([skp]),
            seg_ids=np.array([segs]), seg_q=[8, 20, 33, 47], base_q=0,
        )
        y, u, v = decode_webp_vp8_yuv(blob)
        prev = None
        for i in range(4):
            qi = [8, 20, 33, 47][segs[i]]
            t = (int(y2lev[0, i, 0]) * _DC_QLOOKUP[qi] * 2 + 3) >> 3
            r = (t + 4) >> 3
            pred = ({0: 128, 1: 127, 2: 129, 3: 129}[yms[i]] if i == 0
                    else (127 if yms[i] == 1 else prev))
            val = max(0, min(255, pred + r))
            blk = y[:, 16 * i:16 * i + 16]
            assert (blk == val).all(), (k, i, val, np.unique(blk))
            prev = val
        assert (u == 128).all() and (v == 128).all()


def test_flat_image_survives_any_filter_level():
    """The loop filter must leave a flat frame untouched (every edge
    delta is zero) — a strong invariant of all three filter kinds."""
    for level, simple in ((20, False), (63, False), (40, True)):
        blob = encode_webp_vp8(
            np.zeros((2, 2), int), y2lev=np.zeros((2, 2, 16), int),
            filter_level=level, filter_simple=simple,
        )
        y, u, v = decode_webp_vp8_yuv(blob)
        assert (y == 128).all() and (u == 128).all() and (v == 128).all()


# --- boundaries ------------------------------------------------------------------

def test_named_boundaries():
    blob = encode_webp_vp8(np.zeros((1, 1), int),
                           y2lev=np.zeros((1, 1, 16), int))
    # interframe: flip the keyframe bit in the frame tag
    bad = bytearray(blob)
    bad[20] |= 1
    with pytest.raises(NotImplementedError, match="interframe"):
        decode_webp_vp8_yuv(bytes(bad))
    # decompression-bomb cap
    with pytest.raises(NotImplementedError, match="pixel"):
        decode_webp_vp8_yuv(blob, max_pixels=16)
    # truncation
    with pytest.raises(ValueError):
        decode_webp_vp8_yuv(blob[:24])
    # animation refuses by name
    anmf = (b"RIFF" + (30).to_bytes(4, "little") + b"WEBP"
            + b"VP8X" + (10).to_bytes(4, "little") + bytes(10)
            + b"ANIM" + (0).to_bytes(4, "little"))
    with pytest.raises(NotImplementedError, match="ANMF|animation"):
        decode_webp(anmf)


def test_decode_webp_dispatches_vp8l():
    from aroa_etl_spark.operators.vp8lcodec import encode_webp_vp8l

    img = np.zeros((8, 8, 3), np.uint8)
    img[:, :, 0] = 200
    out = decode_webp(encode_webp_vp8l(img))
    assert out.shape == (8, 8, 3) and (out[..., 0] == 200).all()


# --- layer 3: mutation fuzz -------------------------------------------------------

def test_mutation_fuzz_taxonomy():
    """Truncate/bit-flip/splice a real twin bitstream: the decoder
    must either succeed or raise ValueError/NotImplementedError —
    the exception taxonomy every lenient kernel in the repo relies
    on (decode_image catches Exception, but an IndexError would mask
    real bugs and an unkillable loop would hang a 100 TB job)."""
    rng = np.random.default_rng(77)
    base = encode_webp_vp8(
        np.array([[4, 0], [1, 2]]),
        submodes={(0, 0): [[min(9, r * 3 + c) for c in range(4)]
                           for r in range(4)]},
        y2lev=rng.integers(-9, 9, (2, 2, 16)),
        ylev=None, filter_level=18,
    )
    cases = []
    for cut in range(0, len(base), max(1, len(base) // 40)):
        cases.append(base[:cut])
    for _ in range(300):
        b = bytearray(base)
        for _ in range(int(rng.integers(1, 4))):
            b[int(rng.integers(0, len(b)))] ^= 1 << int(rng.integers(0, 8))
        cases.append(bytes(b))
    for _ in range(60):
        i = int(rng.integers(0, len(base)))
        j = int(rng.integers(0, len(base)))
        cases.append(base[:i] + base[j:])
    for blob in cases:
        try:
            decode_webp_vp8_yuv(blob)
            decode_webp(blob)
        except (ValueError, NotImplementedError):
            pass


def test_anim_frames_compose_dispose_blend():
    """Round 12: ANMF animations decode frame-by-frame with spec
    compositing — transparent-canvas init, background disposal,
    overwrite vs straight-alpha OVER (integer math pinned here on a
    half-transparent frame), durations/loop metadata."""
    from aroa_etl_spark.operators.vp8codec import (
        decode_webp_anim,
        encode_webp_anim,
    )
    from aroa_etl_spark.operators.vp8lcodec import encode_webp_vp8l

    def flat_vp8(val):
        for lv in range(-2000, 2001):
            t = (lv * 8 + 3) >> 3
            if max(0, min(255, 128 + ((t + 4) >> 3))) == val:
                y2 = np.zeros((1, 1, 16), dtype=int)
                y2[0, 0, 0] = lv
                return encode_webp_vp8(np.zeros((1, 1), dtype=int),
                                       y2lev=y2, base_q=0)
        raise AssertionError(val)

    img = np.zeros((16, 16, 3), np.uint8)
    img[:, :] = (10, 20, 30)
    blob = encode_webp_anim(32, 32, [
        {"x": 0, "y": 0, "webp": flat_vp8(100), "duration_ms": 40,
         "dispose": 1, "blend": 0},
        {"x": 16, "y": 16, "webp": flat_vp8(200), "duration_ms": 50},
        {"x": 16, "y": 0, "webp": encode_webp_vp8l(img),
         "duration_ms": 60},
    ], loop=3)
    out = decode_webp_anim(blob)
    fr = out["frames"]
    assert (out["width"], out["height"], out["loop_count"]) == (32, 32, 3)
    assert [f["duration_ms"] for f in fr] == [40, 50, 60]
    c0, c1, c2 = fr[0]["canvas"], fr[1]["canvas"], fr[2]["canvas"]
    assert (c0[:16, :16, :3] == 100).all() and (c0[16:, :, 3] == 0).all()
    assert (c1[:16, :16, 3] == 0).all()          # disposed
    assert (c1[16:, 16:, :3] == 200).all()
    assert (c2[:16, 16:, 0] == 10).all() and (c2[16:, 16:, :3] == 200).all()
    # straight-alpha OVER: half-transparent red over opaque gray
    semi = np.zeros((16, 16, 4), np.uint8)
    semi[..., 0] = 255
    semi[..., 3] = 128
    blob2 = encode_webp_anim(16, 16, [
        {"x": 0, "y": 0, "webp": flat_vp8(100), "blend": 0},
        {"x": 0, "y": 0, "webp": encode_webp_vp8l(semi), "blend": 1},
    ])
    c = decode_webp_anim(blob2)["frames"][1]["canvas"]
    exp_r = round((255 * 128 * 255 + 100 * 255 * 127) / (255 * 255))
    assert abs(int(c[0, 0, 0]) - exp_r) <= 1 and c[0, 0, 3] == 255
    # bomb guards + malformed
    with pytest.raises(NotImplementedError, match="frames"):
        decode_webp_anim(blob, max_frames=2)
    with pytest.raises(ValueError, match="rectangle"):
        decode_webp_anim(encode_webp_anim(16, 16, [
            {"x": 8, "y": 8, "webp": flat_vp8(100)}]))
    # still decode_webp names the animation boundary
    with pytest.raises(NotImplementedError, match="decode_webp_anim"):
        decode_webp(blob)


def test_anim_mutation_fuzz_taxonomy():
    """At-birth fuzz for the ANMF walker (house rule): truncations,
    bit flips, and splices raise ValueError/NotImplementedError only.
    (An offline 6000-trial sweep of the same generator found zero
    escapes; this keeps the law pinned.)"""
    from aroa_etl_spark.operators.vp8codec import (
        decode_webp_anim,
        encode_webp_anim,
    )
    from aroa_etl_spark.operators.vp8lcodec import encode_webp_vp8l

    rng = np.random.default_rng(99)
    y2 = np.zeros((1, 1, 16), dtype=int)
    y2[0, 0, 0] = 40
    img = np.zeros((16, 16, 3), np.uint8)
    img[:, :] = (10, 20, 30)
    base = encode_webp_anim(32, 32, [
        {"x": 0, "y": 0, "dispose": 1, "blend": 0,
         "webp": encode_webp_vp8(np.zeros((1, 1), dtype=int), y2lev=y2)},
        {"x": 16, "y": 16, "webp": encode_webp_vp8l(img)},
    ], loop=2)
    for trial in range(400):
        b = bytearray(base)
        k = trial % 3
        if k == 0:
            b = b[:int(rng.integers(0, len(b)))]
        elif k == 1:
            for _ in range(int(rng.integers(1, 5))):
                b[int(rng.integers(0, len(b)))] ^= \
                    1 << int(rng.integers(0, 8))
        else:
            i = int(rng.integers(0, len(base)))
            j = int(rng.integers(0, len(base)))
            b = bytearray(base[:i] + base[j:])
        try:
            decode_webp_anim(bytes(b))
        except (ValueError, NotImplementedError):
            pass
