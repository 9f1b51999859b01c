"""WebP lossy VP8 keyframe DECODER (RFC 6386) + fixture-twin encoder.

Most real crawled ``.webp`` is LOSSY VP8 — the round-11 verdict ranked
this the single biggest remaining format gap: triage handled the
headers, but the multimodal pipeline refused every lossy pixel decode.
This module closes it with the same vendored-pure-Python discipline as
the JPEG/FLAC/VP8L codecs: the RFC 6386 keyframe decode path —

- the BOOLEAN ARITHMETIC DECODER (section 7) and its encoder twin;
- keyframe headers (section 9): frame tag + start code, segmentation
  (quantizer/loop-filter features + coded segment map), loop-filter
  params and per-MB delta adjustments, multi-partition token streams,
  quantizer indices with per-plane deltas, token-probability updates;
- per-macroblock INTRA MODE parsing (section 11): the keyframe
  16x16/chroma/4x4 mode trees with their fixed keyframe probabilities,
  B_PRED submodes contexted on above/left submodes;
- RESIDUAL TOKENS (section 13): the 12-token coefficient tree over
  [block type][coeff band][nonzero context] probabilities, category
  extra bits, the zero-token EOB exclusion, and the above/left
  nonzero-context bookkeeping (including the Y2 carry-over quirk for
  macroblocks without a Y2 block);
- DEQUANTIZATION (section 14.1), the 4x4 inverse WHT for Y2 (14.3)
  and the 20091/35468 fixed-point inverse DCT (14.4), exactly as the
  RFC's reference C lays them out, in integer arithmetic;
- INTRA PREDICTION (section 12): all four 16x16/chroma modes with the
  127/129 off-frame borders, and all ten 4x4 B modes including the
  above-right rules at macroblock and frame edges;
- the LOOP FILTER (section 15): normal + simple filters, per-segment
  levels, per-MB delta adjustment, the interior/edge/high-edge-
  variance thresholds, and the no-coefficients interior-skip rule.

The constant tables (dequant lookups, default/update token
probabilities, keyframe B-mode probabilities, coefficient bands, zig
zag, category probabilities) are the PUBLIC normative constants of
RFC 6386 sections 13.4/13.5/14.1, embedded as literals.

Correctness posture — three independent oracles:

1. the catalog entry's DuckDB oracle replays closed-form fixtures
   (single-MB-row images whose per-MB uniform reconstruction follows
   a left-to-right integer recurrence through the real dequant/IWHT/
   IDCT rounding);
2. ``tests/test_vp8codec.py`` differential-tests the decoder BIT-EXACTLY
   (YUV planes, post-loop-filter) against libwebp via ctypes when the
   system library is present — libwebp's encoder exercises
   segmentation, token-probability updates, skip, B_PRED, and the
   normal loop filter at many qualities;
3. ``encode_webp_vp8`` (the fixture twin below) emits real keyframe
   bitstreams from chosen modes/levels and computes the expected
   reconstruction through an INDEPENDENT vectorized numpy formulation
   of the same transforms/predictors, so round-trip equality is a law,
   not a tautology.

Output convention: the normative product is the YUV 4:2:0
reconstruction (``decode_webp_vp8_yuv``).  ``decode_webp`` converts to
RGB with the repo's JPEG convention (pixel-repetition chroma
upsampling + float JFIF matrix) — decoders differ legitimately here
(libwebp does fancy upsampling), so RGB is a documented convention
while YUV is the conformance surface.  ALPH chunks (raw or
VP8L-compressed, with the container spec's horizontal/vertical/
gradient filters) composite into an RGBA result.

Reference analogue: the image-ingestion role of
``scripts/ki_indizierung/indizierung.ipynb`` (multimodal training-data
pipelines); extension inventory SURVEY §2.11.

Scale: per-blob kernel under ``multimodal.image_features``'s
mapInPandas (broadcast dims, zero shuffle).  Token decoding is
inherently bit-serial Python; reconstruction and the loop filter are
vectorized along rows/edges.  The decompression-bomb cap matches the
other codecs.
"""

from __future__ import annotations

import numpy as np

__all__ = [
    "decode_webp",
    "decode_webp_vp8_yuv",
    "encode_webp_vp8",
]

# --- RFC 6386 constant tables --------------------------------------------------
# Dequantization lookups (section 14.1): DC fits uint8, AC does not.

_DC_QLOOKUP = (
    4, 5, 6, 7, 8, 9, 10, 10, 11, 12, 13, 14, 15, 16, 17, 17,
    18, 19, 20, 20, 21, 21, 22, 22, 23, 23, 24, 25, 25, 26, 27, 28,
    29, 30, 31, 32, 33, 34, 35, 36, 37, 37, 38, 39, 40, 41, 42, 43,
    44, 45, 46, 46, 47, 48, 49, 50, 51, 52, 53, 54, 55, 56, 57, 58,
    59, 60, 61, 62, 63, 64, 65, 66, 67, 68, 69, 70, 71, 72, 73, 74,
    75, 76, 76, 77, 78, 79, 80, 81, 82, 83, 84, 85, 86, 87, 88, 89,
    91, 93, 95, 96, 98, 100, 101, 102, 104, 106, 108, 110, 112, 114, 116, 118,
    122, 124, 126, 128, 130, 132, 134, 136, 138, 140, 143, 145, 148, 151, 154,
    157,
)

_AC_QLOOKUP = (
    4, 5, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15, 16, 17, 18, 19,
    20, 21, 22, 23, 24, 25, 26, 27, 28, 29, 30, 31, 32, 33, 34, 35,
    36, 37, 38, 39, 40, 41, 42, 43, 44, 45, 46, 47, 48, 49, 50, 51,
    52, 53, 54, 55, 56, 57, 58, 60, 62, 64, 66, 68, 70, 72, 74, 76,
    78, 80, 82, 84, 86, 88, 90, 92, 94, 96, 98, 100, 102, 104, 106, 108,
    110, 112, 114, 116, 119, 122, 125, 128, 131, 134, 137, 140, 143, 146, 149,
    152, 155, 158, 161, 164, 167, 170, 173, 177, 181, 185, 189, 193, 197, 201,
    205, 209, 213, 217, 221, 225, 229, 234, 239, 245, 249, 254, 259, 264, 269,
    274, 279, 284,
)

# Coefficient bands (section 13.3): coefficient position -> band.
_COEFF_BANDS = (0, 1, 2, 3, 6, 4, 5, 6, 6, 6, 6, 6, 6, 6, 6, 7)

# Zigzag scan (section 13.3).
_ZIGZAG = (0, 1, 4, 8, 5, 2, 3, 6, 9, 12, 13, 10, 7, 11, 14, 15)

# Token tree (section 13.2); leaves are -(token index).
_EOB, _ZERO, _ONE, _TWO, _THREE, _FOUR = 0, 1, 2, 3, 4, 5
_CAT1, _CAT2, _CAT3, _CAT4, _CAT5, _CAT6 = 6, 7, 8, 9, 10, 11
_COEFF_TREE = (
    -_EOB, 2,
    -_ZERO, 4,
    -_ONE, 6,
    8, 12,
    -_TWO, 10,
    -_THREE, -_FOUR,
    14, 16,
    -_CAT1, -_CAT2,
    18, 20,
    -_CAT3, -_CAT4,
    -_CAT5, -_CAT6,
)
_TOKEN_BASE = {_ONE: 1, _TWO: 2, _THREE: 3, _FOUR: 4,
               _CAT1: 5, _CAT2: 7, _CAT3: 11, _CAT4: 19, _CAT5: 35,
               _CAT6: 67}
# Category extra-bit probabilities (section 13.2, Pcat1..Pcat6).
_CAT_PROBS = {
    _CAT1: (159,),
    _CAT2: (165, 145),
    _CAT3: (173, 148, 140),
    _CAT4: (176, 155, 140, 135),
    _CAT5: (180, 157, 141, 134, 130),
    _CAT6: (254, 254, 243, 230, 196, 177, 153, 140, 133, 130, 129),
}

# Keyframe intra mode trees + fixed probabilities (sections 11.2/11.3).
# 16x16 y modes: DC=0 V=1 H=2 TM=3 B_PRED=4.
DC_PRED, V_PRED, H_PRED, TM_PRED, B_PRED = 0, 1, 2, 3, 4
_KF_YMODE_TREE = (-B_PRED, 2, 4, 6, -DC_PRED, -V_PRED, -H_PRED, -TM_PRED)
_KF_YMODE_PROBS = (145, 156, 163, 128)
_UV_MODE_TREE = (-DC_PRED, 2, -V_PRED, 4, -H_PRED, -TM_PRED)
_KF_UV_PROBS = (142, 114, 183)
# 4x4 b modes: B_DC=0 B_TM=1 B_VE=2 B_HE=3 B_LD=4 B_RD=5 B_VR=6 B_VL=7
# B_HD=8 B_HU=9.
_BMODE_TREE = (
    -0, 2,
    -1, 4,
    -2, 6,
    8, 12,
    -3, 10,
    -5, -6,
    -4, 14,
    -7, 16,
    -8, -9,
)
# 16x16 mode -> equivalent b mode for above/left context (section 11.3).
_I16_TO_BMODE = (0, 2, 3, 1)  # DC->B_DC, V->B_VE, H->B_HE, TM->B_TM


class _BoolDecoder:
    """RFC 6386 section 7 boolean arithmetic decoder (8-bit refill;
    reads past the end yield zero bytes, as the RFC's reference decoder
    does — truncation is caught by the container length checks)."""

    __slots__ = ("_data", "_pos", "_value", "_range", "_shift")

    def __init__(self, data: bytes):
        self._data = data
        b0 = data[0] if len(data) > 0 else 0
        b1 = data[1] if len(data) > 1 else 0
        self._value = (b0 << 8) | b1
        self._pos = 2
        self._range = 255
        self._shift = 0

    def read(self, prob: int) -> int:
        rng = self._range
        split = 1 + (((rng - 1) * prob) >> 8)
        big = split << 8
        v = self._value
        if v >= big:
            bit = 1
            rng -= split
            v -= big
        else:
            bit = 0
            rng = split
        shift = self._shift
        data = self._data
        pos = self._pos
        while rng < 128:
            v <<= 1
            rng <<= 1
            shift += 1
            if shift == 8:
                shift = 0
                v |= data[pos] if pos < len(data) else 0
                pos += 1
        self._value = v
        self._range = rng
        self._shift = shift
        self._pos = pos
        return bit

    def literal(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read(128)
        return v

    def signed(self, n: int) -> int:
        v = self.literal(n)
        return -v if self.read(128) else v

    def tree(self, tree, probs, start: int = 0) -> int:
        i = start
        while True:
            i = tree[i + self.read(probs[i >> 1])]
            if i <= 0:
                return -i


class _BoolEncoder:
    """RFC 6386 section 7.3 boolean encoder (the decoder's twin for
    fixture bitstreams); transcribed from the reference C with a
    Python-int guard on the 32-bit accumulator."""

    def __init__(self) -> None:
        self._range = 255
        self._bottom = 0
        self._bit_count = 24
        self._out = bytearray()

    def _carry(self) -> None:
        i = len(self._out) - 1
        while i >= 0 and self._out[i] == 255:
            self._out[i] = 0
            i -= 1
        if i >= 0:
            self._out[i] += 1

    def put(self, prob: int, bit: int) -> None:
        split = 1 + (((self._range - 1) * prob) >> 8)
        if bit:
            self._bottom += split
            if self._bottom >> 32:  # add overflowed the 32-bit register
                self._carry()
                self._bottom &= 0xFFFFFFFF
            self._range -= split
        else:
            self._range = split
        while self._range < 128:
            self._range <<= 1
            if self._bottom & (1 << 31):
                self._carry()
            self._bottom = (self._bottom << 1) & 0xFFFFFFFF
            self._bit_count -= 1
            if self._bit_count == 0:
                self._out.append((self._bottom >> 24) & 0xFF)
                self._bottom &= (1 << 24) - 1
                self._bit_count = 8

    def literal(self, value: int, n: int) -> None:
        for k in range(n - 1, -1, -1):
            self.put(128, (value >> k) & 1)

    def signed(self, value: int, n: int) -> None:
        self.literal(abs(value), n)
        self.put(128, 1 if value < 0 else 0)

    def tree(self, tree, probs, value: int, start: int = 0) -> None:
        # walk from `start` to the leaf -value, emitting branch bits
        path = self._tree_path(tree, value, start)
        for node, bit in path:
            self.put(probs[node >> 1], bit)

    @staticmethod
    def _tree_path(tree, value: int, start: int):
        # depth-first search for the leaf; trees here are tiny
        def walk(i, acc):
            for bit in (0, 1):
                nxt = tree[i + bit]
                if nxt == -value and nxt <= 0:
                    return acc + [(i, bit)]
                if nxt > 0:
                    r = walk(nxt, acc + [(i, bit)])
                    if r is not None:
                        return r
            return None

        path = walk(start, [])
        if path is None:
            raise ValueError(f"vp8: value {value} not in tree")
        return path

    def flush(self) -> bytes:
        c = self._bit_count
        v = self._bottom
        if v & (1 << (32 - c)):
            self._carry()
        v = (v << (c & 7)) & 0xFFFFFFFF
        c >>= 3
        while c > 0:
            v = (v << 8) & 0xFFFFFFFF
            c -= 1
        for _ in range(4):
            self._out.append((v >> 24) & 0xFF)
            v = (v << 8) & 0xFFFFFFFF
        return bytes(self._out)


# --- inverse transforms (RFC 6386 sections 14.3/14.4) --------------------------

def _iwht_many(c: np.ndarray) -> np.ndarray:
    """Vectorized inverse Walsh-Hadamard over (n, 16) int64 blocks ->
    (n, 16) outputs (the Y2 DC distribution transform)."""
    c = c.reshape(-1, 4, 4)
    i0, i1, i2, i3 = c[:, 0], c[:, 1], c[:, 2], c[:, 3]
    a1 = i0 + i3
    b1 = i1 + i2
    c1 = i1 - i2
    d1 = i0 - i3
    o = np.empty_like(c)
    o[:, 0] = a1 + b1
    o[:, 1] = c1 + d1
    o[:, 2] = a1 - b1
    o[:, 3] = d1 - c1
    j0, j1, j2, j3 = o[:, :, 0], o[:, :, 1], o[:, :, 2], o[:, :, 3]
    a1 = j0 + j3
    b1 = j1 + j2
    c1 = j1 - j2
    d1 = j0 - j3
    out = np.empty_like(c)
    out[:, :, 0] = (a1 + b1 + 3) >> 3
    out[:, :, 1] = (c1 + d1 + 3) >> 3
    out[:, :, 2] = (a1 - b1 + 3) >> 3
    out[:, :, 3] = (d1 - c1 + 3) >> 3
    return out.reshape(-1, 16)


def _idct_many(c: np.ndarray) -> np.ndarray:
    """Vectorized 4x4 inverse DCT (the 20091/35468 fixed-point
    approximation) over (n, 16) int64 blocks -> (n, 4, 4) residuals."""
    c = c.reshape(-1, 4, 4)
    # pass 1: columns (RFC walks ip[0], ip[4], ip[8], ip[12])
    i0, i1, i2, i3 = c[:, 0], c[:, 1], c[:, 2], c[:, 3]
    a1 = i0 + i2
    b1 = i0 - i2
    c1 = ((i1 * 35468) >> 16) - (i3 + ((i3 * 20091) >> 16))
    d1 = (i1 + ((i1 * 20091) >> 16)) + ((i3 * 35468) >> 16)
    o = np.empty_like(c)
    o[:, 0] = a1 + d1
    o[:, 3] = a1 - d1
    o[:, 1] = b1 + c1
    o[:, 2] = b1 - c1
    # pass 2: rows, with the final (x + 4) >> 3
    j0, j1, j2, j3 = o[:, :, 0], o[:, :, 1], o[:, :, 2], o[:, :, 3]
    a1 = j0 + j2
    b1 = j0 - j2
    c1 = ((j1 * 35468) >> 16) - (j3 + ((j3 * 20091) >> 16))
    d1 = (j1 + ((j1 * 20091) >> 16)) + ((j3 * 35468) >> 16)
    out = np.empty_like(c)
    out[:, :, 0] = (a1 + d1 + 4) >> 3
    out[:, :, 3] = (a1 - d1 + 4) >> 3
    out[:, :, 1] = (b1 + c1 + 4) >> 3
    out[:, :, 2] = (b1 - c1 + 4) >> 3
    return out


# --- intra prediction (RFC 6386 section 12) ------------------------------------

def _pred_16(mode, P, y0, x0, size, mb_x, mb_y):
    """16x16 luma / 8x8 chroma prediction into an (size, size) int
    array.  ``P`` is the margined plane (margin row 0 = 127, margin
    col 0 = 129); DC uses AVAILABILITY, the directional modes use the
    margin values."""
    above = P[y0 - 1, x0:x0 + size].astype(np.int64)
    left = P[y0:y0 + size, x0 - 1].astype(np.int64)
    if mode == DC_PRED:
        have_a, have_l = mb_y > 0, mb_x > 0
        if have_a and have_l:
            dc = (int(above.sum()) + int(left.sum()) + size) >> (
                5 if size == 16 else 4)
        elif have_a:
            dc = (int(above.sum()) + size // 2) >> (4 if size == 16 else 3)
        elif have_l:
            dc = (int(left.sum()) + size // 2) >> (4 if size == 16 else 3)
        else:
            dc = 128
        return np.full((size, size), dc, dtype=np.int64)
    if mode == V_PRED:
        return np.broadcast_to(above, (size, size)).copy()
    if mode == H_PRED:
        return np.broadcast_to(left[:, None], (size, size)).copy()
    # TM_PRED
    tl = int(P[y0 - 1, x0 - 1])
    return np.clip(left[:, None] + above[None, :] - tl, 0, 255)


def _avg2(a, b):
    return (a + b + 1) >> 1


def _avg3(a, b, c):
    return (a + 2 * b + c + 2) >> 2


def _pred_b(mode, A, L, C):
    """One 4x4 B_PRED block (RFC 6386 section 12.3).  ``A`` is the 8
    above/above-right pixels, ``L`` the 4 left pixels, ``C`` the
    above-left corner — all plain ints."""
    p = np.empty((4, 4), dtype=np.int64)
    if mode == 0:  # B_DC
        p[:] = (sum(A[:4]) + sum(L) + 4) >> 3
    elif mode == 1:  # B_TM
        for r in range(4):
            for c in range(4):
                p[r, c] = min(255, max(0, L[r] + A[c] - C))
    elif mode == 2:  # B_VE: filtered above row
        row = [_avg3(C, A[0], A[1]), _avg3(A[0], A[1], A[2]),
               _avg3(A[1], A[2], A[3]), _avg3(A[2], A[3], A[4])]
        p[:] = np.array(row)
    elif mode == 3:  # B_HE: filtered left column
        col = [_avg3(C, L[0], L[1]), _avg3(L[0], L[1], L[2]),
               _avg3(L[1], L[2], L[3]), _avg3(L[2], L[3], L[3])]
        p[:] = np.array(col)[:, None]
    elif mode == 4:  # B_LD: down-left over A[0..7]
        for r in range(4):
            for c in range(4):
                i = r + c
                p[r, c] = (_avg3(A[6], A[7], A[7]) if i == 6
                           else _avg3(A[i], A[i + 1], A[i + 2]))
    elif mode == 5:  # B_RD: down-right over L(rev)+C+A
        E = [L[3], L[2], L[1], L[0], C, A[0], A[1], A[2], A[3]]
        for r in range(4):
            for c in range(4):
                d = c - r
                p[r, c] = _avg3(E[d + 3], E[d + 4], E[d + 5])
    elif mode == 6:  # B_VR
        p[0] = [_avg2(C, A[0]), _avg2(A[0], A[1]),
                _avg2(A[1], A[2]), _avg2(A[2], A[3])]
        p[1] = [_avg3(L[0], C, A[0]), _avg3(C, A[0], A[1]),
                _avg3(A[0], A[1], A[2]), _avg3(A[1], A[2], A[3])]
        p[2] = [_avg3(L[1], L[0], C), p[0, 0], p[0, 1], p[0, 2]]
        p[3] = [_avg3(L[2], L[1], L[0]), p[1, 0], p[1, 1], p[1, 2]]
    elif mode == 7:  # B_VL
        p[0] = [_avg2(A[0], A[1]), _avg2(A[1], A[2]),
                _avg2(A[2], A[3]), _avg2(A[3], A[4])]
        p[1] = [_avg3(A[0], A[1], A[2]), _avg3(A[1], A[2], A[3]),
                _avg3(A[2], A[3], A[4]), _avg3(A[3], A[4], A[5])]
        p[2] = [p[0, 1], p[0, 2], p[0, 3], _avg3(A[4], A[5], A[6])]
        p[3] = [p[1, 1], p[1, 2], p[1, 3], _avg3(A[5], A[6], A[7])]
    elif mode == 8:  # B_HD
        p[0] = [_avg2(L[0], C), _avg3(L[0], C, A[0]),
                _avg3(C, A[0], A[1]), _avg3(A[0], A[1], A[2])]
        p[1] = [_avg2(L[1], L[0]), _avg3(L[1], L[0], C), p[0, 0], p[0, 1]]
        p[2] = [_avg2(L[2], L[1]), _avg3(L[2], L[1], L[0]), p[1, 0], p[1, 1]]
        p[3] = [_avg2(L[3], L[2]), _avg3(L[3], L[2], L[1]), p[2, 0], p[2, 1]]
    elif mode == 9:  # B_HU
        p[0] = [_avg2(L[0], L[1]), _avg3(L[0], L[1], L[2]),
                _avg2(L[1], L[2]), _avg3(L[1], L[2], L[3])]
        p[1] = [p[0, 2], p[0, 3], _avg2(L[2], L[3]),
                _avg3(L[2], L[3], L[3])]
        p[2] = [p[1, 2], p[1, 3], L[3], L[3]]
        p[3] = [L[3], L[3], L[3], L[3]]
    else:
        raise ValueError(f"vp8: unknown b mode {mode}")
    return p


# --- header / residual parsing --------------------------------------------------

def _clamp_q(q: int) -> int:
    return 0 if q < 0 else (127 if q > 127 else q)


def _segment_quants(base_q, seg_enabled, seg_abs, seg_q, deltas):
    """Per-segment (y1dc, y1ac, y2dc, y2ac, uvdc, uvac) dequant
    factors (RFC 6386 sections 9.6/14.1; the chroma-DC index cap at
    117 IS the spec's 132 value cap)."""
    ydc_d, y2dc_d, y2ac_d, uvdc_d, uvac_d = deltas
    out = []
    for s in range(4):
        if seg_enabled:
            qi = seg_q[s] if seg_abs else base_q + seg_q[s]
        else:
            qi = base_q
        qi = _clamp_q(qi)
        y1dc = _DC_QLOOKUP[_clamp_q(qi + ydc_d)]
        y1ac = _AC_QLOOKUP[qi]
        y2dc = _DC_QLOOKUP[_clamp_q(qi + y2dc_d)] * 2
        y2ac = _AC_QLOOKUP[_clamp_q(qi + y2ac_d)] * 155 // 100
        if y2ac < 8:
            y2ac = 8
        uvdc = _DC_QLOOKUP[min(117, _clamp_q(qi + uvdc_d))]
        uvac = _AC_QLOOKUP[_clamp_q(qi + uvac_d)]
        out.append((y1dc, y1ac, y2dc, y2ac, uvdc, uvac))
    return out


def _decode_block_coeffs(bd, probs, btype, first, ctx, qdc, qac):
    """Token-decode one 4x4 block (RFC 6386 section 13.3) ->
    (dequantized coeff list in RASTER order, had_nonzero)."""
    out = [0] * 16
    nz = False
    n = first
    start = 0
    while n < 16:
        p = probs[btype][_COEFF_BANDS[n]][ctx]
        tok = bd.tree(_COEFF_TREE, p, start)
        if tok == _EOB:
            break
        if tok == _ZERO:
            ctx = 0
            start = 2  # EOB cannot follow a zero token
            n += 1
            continue
        start = 0
        if tok == _ONE:
            val = 1
            ctx = 1
        else:
            if tok <= _FOUR:
                val = _TOKEN_BASE[tok]
            else:
                extra = 0
                for pb in _CAT_PROBS[tok]:
                    extra = (extra << 1) | bd.read(pb)
                val = _TOKEN_BASE[tok] + extra
            ctx = 2
        if bd.read(128):
            val = -val
        out[_ZIGZAG[n]] = val * (qdc if n == 0 else qac)
        nz = True
        n += 1
    return out, nz


def _parse_header(bd, probs):
    """First-partition keyframe header AFTER the dimension bytes
    (RFC 6386 section 9.2..9.11) -> header dict.  ``probs`` is the
    mutable 4x8x3x11 token-probability table (updated in place)."""
    h = {}
    bd.read(128)  # color space (0 = YCbCr as specified)
    bd.read(128)  # clamping type (pixels are clamped either way here)
    h["seg_enabled"] = bd.read(128)
    h["seg_update_map"] = 0
    h["seg_abs"] = 0
    h["seg_q"] = [0, 0, 0, 0]
    h["seg_lf"] = [0, 0, 0, 0]
    h["seg_tree_probs"] = [255, 255, 255]
    if h["seg_enabled"]:
        h["seg_update_map"] = bd.read(128)
        update_data = bd.read(128)
        if update_data:
            h["seg_abs"] = bd.read(128)
            for s in range(4):
                if bd.read(128):
                    h["seg_q"][s] = bd.signed(7)
            for s in range(4):
                if bd.read(128):
                    h["seg_lf"][s] = bd.signed(6)
        if h["seg_update_map"]:
            for i in range(3):
                if bd.read(128):
                    h["seg_tree_probs"][i] = bd.literal(8)
    h["filter_simple"] = bd.read(128)
    h["filter_level"] = bd.literal(6)
    h["sharpness"] = bd.literal(3)
    h["lf_delta_enabled"] = bd.read(128)
    h["ref_lf_deltas"] = [0, 0, 0, 0]
    h["mode_lf_deltas"] = [0, 0, 0, 0]
    if h["lf_delta_enabled"]:
        if bd.read(128):  # mode_ref_lf_delta_update
            for i in range(4):
                if bd.read(128):
                    h["ref_lf_deltas"][i] = bd.signed(6)
            for i in range(4):
                if bd.read(128):
                    h["mode_lf_deltas"][i] = bd.signed(6)
    h["n_parts"] = 1 << bd.literal(2)
    base_q = bd.literal(7)
    deltas = []
    for _ in range(5):  # y1dc, y2dc, y2ac, uvdc, uvac
        deltas.append(bd.signed(4) if bd.read(128) else 0)
    h["base_q"] = base_q
    h["q_deltas"] = deltas
    bd.read(128)  # refresh entropy probs (single-frame decode: ignored)
    for t in range(4):
        for b in range(8):
            for c in range(3):
                for i in range(11):
                    if bd.read(_COEFF_UPDATE_PROBS_A[t][b][c][i]):
                        probs[t][b][c][i] = bd.literal(8)
    h["use_skip"] = bd.read(128)
    h["prob_skip"] = bd.literal(8) if h["use_skip"] else 0
    return h


# Default token probabilities (RFC 6386 section 13.5):
# [block_type][band][context][tree_position], 4*8*3*11
_DEFAULT_COEFF_PROBS = (
    128, 128, 128, 128, 128, 128, 128, 128, 128, 128, 128,
    128, 128, 128, 128, 128, 128, 128, 128, 128, 128, 128,
    128, 128, 128, 128, 128, 128, 128, 128, 128, 128, 128,
    253, 136, 254, 255, 228, 219, 128, 128, 128, 128, 128,
    189, 129, 242, 255, 227, 213, 255, 219, 128, 128, 128,
    106, 126, 227, 252, 214, 209, 255, 255, 128, 128, 128,
    1, 98, 248, 255, 236, 226, 255, 255, 128, 128, 128,
    181, 133, 238, 254, 221, 234, 255, 154, 128, 128, 128,
    78, 134, 202, 247, 198, 180, 255, 219, 128, 128, 128,
    1, 185, 249, 255, 243, 255, 128, 128, 128, 128, 128,
    184, 150, 247, 255, 236, 224, 128, 128, 128, 128, 128,
    77, 110, 216, 255, 236, 230, 128, 128, 128, 128, 128,
    1, 101, 251, 255, 241, 255, 128, 128, 128, 128, 128,
    170, 139, 241, 252, 236, 209, 255, 255, 128, 128, 128,
    37, 116, 196, 243, 228, 255, 255, 255, 128, 128, 128,
    1, 204, 254, 255, 245, 255, 128, 128, 128, 128, 128,
    207, 160, 250, 255, 238, 128, 128, 128, 128, 128, 128,
    102, 103, 231, 255, 211, 171, 128, 128, 128, 128, 128,
    1, 152, 252, 255, 240, 255, 128, 128, 128, 128, 128,
    177, 135, 243, 255, 234, 225, 128, 128, 128, 128, 128,
    80, 129, 211, 255, 194, 224, 128, 128, 128, 128, 128,
    1, 1, 255, 128, 128, 128, 128, 128, 128, 128, 128,
    246, 1, 255, 128, 128, 128, 128, 128, 128, 128, 128,
    255, 128, 128, 128, 128, 128, 128, 128, 128, 128, 128,
    198, 35, 237, 223, 193, 187, 162, 160, 145, 155, 62,
    131, 45, 198, 221, 172, 176, 220, 157, 252, 221, 1,
    68, 47, 146, 208, 149, 167, 221, 162, 255, 223, 128,
    1, 149, 241, 255, 221, 224, 255, 255, 128, 128, 128,
    184, 141, 234, 253, 222, 220, 255, 199, 128, 128, 128,
    81, 99, 181, 242, 176, 190, 249, 202, 255, 255, 128,
    1, 129, 232, 253, 214, 197, 242, 196, 255, 255, 128,
    99, 121, 210, 250, 201, 198, 255, 202, 128, 128, 128,
    23, 91, 163, 242, 170, 187, 247, 210, 255, 255, 128,
    1, 200, 246, 255, 234, 255, 128, 128, 128, 128, 128,
    109, 178, 241, 255, 231, 245, 255, 255, 128, 128, 128,
    44, 130, 201, 253, 205, 192, 255, 255, 128, 128, 128,
    1, 132, 239, 251, 219, 209, 255, 165, 128, 128, 128,
    94, 136, 225, 251, 218, 190, 255, 255, 128, 128, 128,
    22, 100, 174, 245, 186, 161, 255, 199, 128, 128, 128,
    1, 182, 249, 255, 232, 235, 128, 128, 128, 128, 128,
    124, 143, 241, 255, 227, 234, 128, 128, 128, 128, 128,
    35, 77, 181, 251, 193, 211, 255, 205, 128, 128, 128,
    1, 157, 247, 255, 236, 231, 255, 255, 128, 128, 128,
    121, 141, 235, 255, 225, 227, 255, 255, 128, 128, 128,
    45, 99, 188, 251, 195, 217, 255, 224, 128, 128, 128,
    1, 1, 251, 255, 213, 255, 128, 128, 128, 128, 128,
    203, 1, 248, 255, 255, 128, 128, 128, 128, 128, 128,
    137, 1, 177, 255, 224, 255, 128, 128, 128, 128, 128,
    253, 9, 248, 251, 207, 208, 255, 192, 128, 128, 128,
    175, 13, 224, 243, 193, 185, 249, 198, 255, 255, 128,
    73, 17, 171, 221, 161, 179, 236, 167, 255, 234, 128,
    1, 95, 247, 253, 212, 183, 255, 255, 128, 128, 128,
    239, 90, 244, 250, 211, 209, 255, 255, 128, 128, 128,
    155, 77, 195, 248, 188, 195, 255, 255, 128, 128, 128,
    1, 24, 239, 251, 218, 219, 255, 205, 128, 128, 128,
    201, 51, 219, 255, 196, 186, 128, 128, 128, 128, 128,
    69, 46, 190, 239, 201, 218, 255, 228, 128, 128, 128,
    1, 191, 251, 255, 255, 128, 128, 128, 128, 128, 128,
    223, 165, 249, 255, 213, 255, 128, 128, 128, 128, 128,
    141, 124, 248, 255, 255, 128, 128, 128, 128, 128, 128,
    1, 16, 248, 255, 255, 128, 128, 128, 128, 128, 128,
    190, 36, 230, 255, 236, 255, 128, 128, 128, 128, 128,
    149, 1, 255, 128, 128, 128, 128, 128, 128, 128, 128,
    1, 226, 255, 128, 128, 128, 128, 128, 128, 128, 128,
    247, 192, 255, 128, 128, 128, 128, 128, 128, 128, 128,
    240, 128, 255, 128, 128, 128, 128, 128, 128, 128, 128,
    1, 134, 252, 255, 255, 128, 128, 128, 128, 128, 128,
    213, 62, 250, 255, 255, 128, 128, 128, 128, 128, 128,
    55, 93, 255, 128, 128, 128, 128, 128, 128, 128, 128,
    128, 128, 128, 128, 128, 128, 128, 128, 128, 128, 128,
    128, 128, 128, 128, 128, 128, 128, 128, 128, 128, 128,
    128, 128, 128, 128, 128, 128, 128, 128, 128, 128, 128,
    202, 24, 213, 235, 186, 191, 220, 160, 240, 175, 255,
    126, 38, 182, 232, 169, 184, 228, 174, 255, 187, 128,
    61, 46, 138, 219, 151, 178, 240, 170, 255, 216, 128,
    1, 112, 230, 250, 199, 191, 247, 159, 255, 255, 128,
    166, 109, 228, 252, 211, 215, 255, 174, 128, 128, 128,
    39, 77, 162, 232, 172, 180, 245, 178, 255, 255, 128,
    1, 52, 220, 246, 198, 199, 249, 220, 255, 255, 128,
    124, 74, 191, 243, 183, 193, 250, 221, 255, 255, 128,
    24, 71, 130, 219, 154, 170, 243, 182, 255, 255, 128,
    1, 182, 225, 249, 219, 240, 255, 224, 128, 128, 128,
    149, 150, 226, 252, 216, 205, 255, 171, 128, 128, 128,
    28, 108, 170, 242, 183, 194, 254, 223, 255, 255, 128,
    1, 81, 230, 252, 204, 203, 255, 192, 128, 128, 128,
    123, 102, 209, 247, 188, 196, 255, 233, 128, 128, 128,
    20, 95, 153, 243, 164, 173, 255, 203, 128, 128, 128,
    1, 222, 248, 255, 216, 213, 128, 128, 128, 128, 128,
    168, 175, 246, 252, 235, 205, 255, 255, 128, 128, 128,
    47, 116, 215, 255, 211, 212, 255, 255, 128, 128, 128,
    1, 121, 236, 253, 212, 214, 255, 255, 128, 128, 128,
    141, 84, 213, 252, 201, 202, 255, 219, 128, 128, 128,
    42, 80, 160, 240, 162, 185, 255, 205, 128, 128, 128,
    1, 1, 255, 128, 128, 128, 128, 128, 128, 128, 128,
    244, 1, 255, 128, 128, 128, 128, 128, 128, 128, 128,
    238, 1, 255, 128, 128, 128, 128, 128, 128, 128, 128,
)
# Token probability update flags' probabilities (RFC 6386 13.4)
_COEFF_UPDATE_PROBS = (
    255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255,
    255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255,
    255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255,
    176, 246, 255, 255, 255, 255, 255, 255, 255, 255, 255,
    223, 241, 252, 255, 255, 255, 255, 255, 255, 255, 255,
    249, 253, 253, 255, 255, 255, 255, 255, 255, 255, 255,
    255, 244, 252, 255, 255, 255, 255, 255, 255, 255, 255,
    234, 254, 254, 255, 255, 255, 255, 255, 255, 255, 255,
    253, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255,
    255, 246, 254, 255, 255, 255, 255, 255, 255, 255, 255,
    239, 253, 254, 255, 255, 255, 255, 255, 255, 255, 255,
    254, 255, 254, 255, 255, 255, 255, 255, 255, 255, 255,
    255, 248, 254, 255, 255, 255, 255, 255, 255, 255, 255,
    251, 255, 254, 255, 255, 255, 255, 255, 255, 255, 255,
    255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255,
    255, 253, 254, 255, 255, 255, 255, 255, 255, 255, 255,
    251, 254, 254, 255, 255, 255, 255, 255, 255, 255, 255,
    254, 255, 254, 255, 255, 255, 255, 255, 255, 255, 255,
    255, 254, 253, 255, 254, 255, 255, 255, 255, 255, 255,
    250, 255, 254, 255, 254, 255, 255, 255, 255, 255, 255,
    254, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255,
    255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255,
    255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255,
    255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255,
    217, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255,
    225, 252, 241, 253, 255, 255, 254, 255, 255, 255, 255,
    234, 250, 241, 250, 253, 255, 253, 254, 255, 255, 255,
    255, 254, 255, 255, 255, 255, 255, 255, 255, 255, 255,
    223, 254, 254, 255, 255, 255, 255, 255, 255, 255, 255,
    238, 253, 254, 254, 255, 255, 255, 255, 255, 255, 255,
    255, 248, 254, 255, 255, 255, 255, 255, 255, 255, 255,
    249, 254, 255, 255, 255, 255, 255, 255, 255, 255, 255,
    255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255,
    255, 253, 255, 255, 255, 255, 255, 255, 255, 255, 255,
    247, 254, 255, 255, 255, 255, 255, 255, 255, 255, 255,
    255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255,
    255, 253, 254, 255, 255, 255, 255, 255, 255, 255, 255,
    252, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255,
    255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255,
    255, 254, 254, 255, 255, 255, 255, 255, 255, 255, 255,
    253, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255,
    255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255,
    255, 254, 253, 255, 255, 255, 255, 255, 255, 255, 255,
    250, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255,
    254, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255,
    255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255,
    255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255,
    255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255,
    186, 251, 250, 255, 255, 255, 255, 255, 255, 255, 255,
    234, 251, 244, 254, 255, 255, 255, 255, 255, 255, 255,
    251, 251, 243, 253, 254, 255, 254, 255, 255, 255, 255,
    255, 253, 254, 255, 255, 255, 255, 255, 255, 255, 255,
    236, 253, 254, 255, 255, 255, 255, 255, 255, 255, 255,
    251, 253, 253, 254, 254, 255, 255, 255, 255, 255, 255,
    255, 254, 254, 255, 255, 255, 255, 255, 255, 255, 255,
    254, 254, 254, 255, 255, 255, 255, 255, 255, 255, 255,
    255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255,
    255, 254, 255, 255, 255, 255, 255, 255, 255, 255, 255,
    254, 254, 255, 255, 255, 255, 255, 255, 255, 255, 255,
    254, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255,
    255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255,
    254, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255,
    255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255,
    255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255,
    255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255,
    255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255,
    255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255,
    255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255,
    255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255,
    255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255,
    255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255,
    255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255,
    248, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255,
    250, 254, 252, 254, 255, 255, 255, 255, 255, 255, 255,
    248, 254, 249, 253, 255, 255, 255, 255, 255, 255, 255,
    255, 253, 253, 255, 255, 255, 255, 255, 255, 255, 255,
    246, 253, 253, 255, 255, 255, 255, 255, 255, 255, 255,
    252, 254, 251, 254, 254, 255, 255, 255, 255, 255, 255,
    255, 254, 252, 255, 255, 255, 255, 255, 255, 255, 255,
    248, 254, 253, 255, 255, 255, 255, 255, 255, 255, 255,
    253, 255, 254, 254, 255, 255, 255, 255, 255, 255, 255,
    255, 251, 254, 255, 255, 255, 255, 255, 255, 255, 255,
    245, 251, 254, 255, 255, 255, 255, 255, 255, 255, 255,
    253, 253, 254, 255, 255, 255, 255, 255, 255, 255, 255,
    255, 251, 253, 255, 255, 255, 255, 255, 255, 255, 255,
    252, 253, 254, 255, 255, 255, 255, 255, 255, 255, 255,
    255, 254, 255, 255, 255, 255, 255, 255, 255, 255, 255,
    255, 252, 255, 255, 255, 255, 255, 255, 255, 255, 255,
    249, 255, 254, 255, 255, 255, 255, 255, 255, 255, 255,
    255, 255, 254, 255, 255, 255, 255, 255, 255, 255, 255,
    255, 255, 253, 255, 255, 255, 255, 255, 255, 255, 255,
    250, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255,
    255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255,
    255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255,
    254, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255,
    255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255,
)
# Keyframe 4x4 intra mode probabilities [above][left][9] (RFC 6386 11.5)
_KF_BMODE_PROBS = (
    231, 120, 48, 89, 115, 113, 120, 152, 112,
    152, 179, 64, 126, 170, 118, 46, 70, 95,
    175, 69, 143, 80, 85, 82, 72, 155, 103,
    56, 58, 10, 171, 218, 189, 17, 13, 152,
    114, 26, 17, 163, 44, 195, 21, 10, 173,
    121, 24, 80, 195, 26, 62, 44, 64, 85,
    144, 71, 10, 38, 171, 213, 144, 34, 26,
    170, 46, 55, 19, 136, 160, 33, 206, 71,
    63, 20, 8, 114, 114, 208, 12, 9, 226,
    81, 40, 11, 96, 182, 84, 29, 16, 36,
    134, 183, 89, 137, 98, 101, 106, 165, 148,
    72, 187, 100, 130, 157, 111, 32, 75, 80,
    66, 102, 167, 99, 74, 62, 40, 234, 128,
    41, 53, 9, 178, 241, 141, 26, 8, 107,
    74, 43, 26, 146, 73, 166, 49, 23, 157,
    65, 38, 105, 160, 51, 52, 31, 115, 128,
    104, 79, 12, 27, 217, 255, 87, 17, 7,
    87, 68, 71, 44, 114, 51, 15, 186, 23,
    47, 41, 14, 110, 182, 183, 21, 17, 194,
    66, 45, 25, 102, 197, 189, 23, 18, 22,
    88, 88, 147, 150, 42, 46, 45, 196, 205,
    43, 97, 183, 117, 85, 38, 35, 179, 61,
    39, 53, 200, 87, 26, 21, 43, 232, 171,
    56, 34, 51, 104, 114, 102, 29, 93, 77,
    39, 28, 85, 171, 58, 165, 90, 98, 64,
    34, 22, 116, 206, 23, 34, 43, 166, 73,
    107, 54, 32, 26, 51, 1, 81, 43, 31,
    68, 25, 106, 22, 64, 171, 36, 225, 114,
    34, 19, 21, 102, 132, 188, 16, 76, 124,
    62, 18, 78, 95, 85, 57, 50, 48, 51,
    193, 101, 35, 159, 215, 111, 89, 46, 111,
    60, 148, 31, 172, 219, 228, 21, 18, 111,
    112, 113, 77, 85, 179, 255, 38, 120, 114,
    40, 42, 1, 196, 245, 209, 10, 25, 109,
    88, 43, 29, 140, 166, 213, 37, 43, 154,
    61, 63, 30, 155, 67, 45, 68, 1, 209,
    100, 80, 8, 43, 154, 1, 51, 26, 71,
    142, 78, 78, 16, 255, 128, 34, 197, 171,
    41, 40, 5, 102, 211, 183, 4, 1, 221,
    51, 50, 17, 168, 209, 192, 23, 25, 82,
    138, 31, 36, 171, 27, 166, 38, 44, 229,
    67, 87, 58, 169, 82, 115, 26, 59, 179,
    63, 59, 90, 180, 59, 166, 93, 73, 154,
    40, 40, 21, 116, 143, 209, 34, 39, 175,
    47, 15, 16, 183, 34, 223, 49, 45, 183,
    46, 17, 33, 183, 6, 98, 15, 32, 183,
    57, 46, 22, 24, 128, 1, 54, 17, 37,
    65, 32, 73, 115, 28, 128, 23, 128, 205,
    40, 3, 9, 115, 51, 192, 18, 6, 223,
    87, 37, 9, 115, 59, 77, 64, 21, 47,
    104, 55, 44, 218, 9, 54, 53, 130, 226,
    64, 90, 70, 205, 40, 41, 23, 26, 57,
    54, 57, 112, 184, 5, 41, 38, 166, 213,
    30, 34, 26, 133, 152, 116, 10, 32, 134,
    39, 19, 53, 221, 26, 114, 32, 73, 255,
    31, 9, 65, 234, 2, 15, 1, 118, 73,
    75, 32, 12, 51, 192, 255, 160, 43, 51,
    88, 31, 35, 67, 102, 85, 55, 186, 85,
    56, 21, 23, 111, 59, 205, 45, 37, 192,
    55, 38, 70, 124, 73, 102, 1, 34, 98,
    125, 98, 42, 88, 104, 85, 117, 175, 82,
    95, 84, 53, 89, 128, 100, 113, 101, 45,
    75, 79, 123, 47, 51, 128, 81, 171, 1,
    57, 17, 5, 71, 102, 57, 53, 41, 49,
    38, 33, 13, 121, 57, 73, 26, 1, 85,
    41, 10, 67, 138, 77, 110, 90, 47, 114,
    115, 21, 2, 10, 102, 255, 166, 23, 6,
    101, 29, 16, 10, 85, 128, 101, 196, 26,
    57, 18, 10, 102, 102, 213, 34, 20, 43,
    117, 20, 15, 36, 163, 128, 68, 1, 26,
    102, 61, 71, 37, 34, 53, 31, 243, 192,
    69, 60, 71, 38, 73, 119, 28, 222, 37,
    68, 45, 128, 34, 1, 47, 11, 245, 171,
    62, 17, 19, 70, 146, 85, 55, 62, 70,
    37, 43, 37, 154, 100, 163, 85, 160, 1,
    63, 9, 92, 136, 28, 64, 32, 201, 85,
    75, 15, 9, 9, 64, 255, 184, 119, 16,
    86, 6, 28, 5, 64, 255, 25, 248, 1,
    56, 8, 17, 132, 137, 255, 55, 116, 128,
    58, 15, 20, 82, 135, 57, 26, 121, 40,
    164, 50, 31, 137, 154, 133, 25, 35, 218,
    51, 103, 44, 131, 131, 123, 31, 6, 158,
    86, 40, 64, 135, 148, 224, 45, 183, 128,
    22, 26, 17, 131, 240, 154, 14, 1, 209,
    45, 16, 21, 91, 64, 222, 7, 1, 197,
    56, 21, 39, 155, 60, 138, 23, 102, 213,
    83, 12, 13, 54, 192, 255, 68, 47, 28,
    85, 26, 85, 85, 128, 128, 32, 146, 171,
    18, 11, 7, 63, 144, 171, 4, 4, 246,
    35, 27, 10, 146, 174, 171, 12, 26, 128,
    190, 80, 35, 99, 180, 80, 126, 54, 45,
    85, 126, 47, 87, 176, 51, 41, 20, 32,
    101, 75, 128, 139, 118, 146, 116, 128, 85,
    56, 41, 15, 176, 236, 85, 37, 9, 62,
    71, 30, 17, 119, 118, 255, 17, 18, 138,
    101, 38, 60, 138, 55, 70, 43, 26, 142,
    146, 36, 19, 30, 171, 255, 97, 27, 20,
    138, 45, 61, 62, 219, 1, 81, 188, 64,
    32, 41, 20, 117, 151, 142, 20, 21, 163,
    112, 19, 12, 61, 195, 128, 48, 4, 24,
)


def _nest4(flat):
    """flat 1056 -> [4][8][3][11] nested mutable lists."""
    it = iter(flat)
    return [[[[next(it) for _ in range(11)] for _ in range(3)]
             for _ in range(8)] for _ in range(4)]


_COEFF_UPDATE_PROBS_A = _nest4(_COEFF_UPDATE_PROBS)
# The flat table is stored in an implementation enum order that swaps
# the three diagonal modes relative to RFC 6386's (RD,VR,LD at 4,5,6
# instead of LD,RD,VR) — remap both context dimensions to the RFC
# order this module uses throughout (found empirically: decoding a
# fixture with above/left context B_VR,B_DC diverged from the system
# libwebp until remapped; tree node order is identical either way).
_BMODE_STORE_ORDER = (0, 1, 2, 3, 6, 4, 5, 7, 8, 9)
_KF_BMODE_PROBS_A = tuple(
    tuple(
        _KF_BMODE_PROBS[
            (_BMODE_STORE_ORDER[a] * 10 + _BMODE_STORE_ORDER[le]) * 9:
            (_BMODE_STORE_ORDER[a] * 10 + _BMODE_STORE_ORDER[le]) * 9 + 9
        ]
        for le in range(10)
    )
    for a in range(10)
)


def _default_probs():
    """A fresh mutable copy of the default token probabilities (the
    header's update pass mutates it per frame)."""
    return _nest4(_DEFAULT_COEFF_PROBS)


# --- frame decode ----------------------------------------------------------------

def _parse_modes(bd, h, mb_w, mb_h):
    """Pass 1 over partition 0: per-MB segment ids, skip flags, y/uv
    modes, and B_PRED submodes (RFC 6386 sections 10/11.3; submode
    probabilities context on the above/left SUBMODES, with B_DC for
    off-frame neighbors and the 16x16 equivalents for i16 ones)."""
    seg_ids = [0] * (mb_w * mb_h)
    skips = [0] * (mb_w * mb_h)
    ymodes = [0] * (mb_w * mb_h)
    uvmodes = [0] * (mb_w * mb_h)
    submodes = [None] * (mb_w * mb_h)
    above_sub = [0] * (4 * mb_w)
    stp = h["seg_tree_probs"]
    for mb_y in range(mb_h):
        left_sub = [0, 0, 0, 0]
        for mb_x in range(mb_w):
            i = mb_y * mb_w + mb_x
            if h["seg_enabled"] and h["seg_update_map"]:
                if bd.read(stp[0]):
                    seg_ids[i] = 2 + bd.read(stp[2])
                else:
                    seg_ids[i] = bd.read(stp[1])
            if h["use_skip"]:
                skips[i] = bd.read(h["prob_skip"])
            ym = bd.tree(_KF_YMODE_TREE, _KF_YMODE_PROBS)
            ymodes[i] = ym
            if ym == B_PRED:
                sub = [[0] * 4 for _ in range(4)]
                for r in range(4):
                    for c in range(4):
                        a = above_sub[4 * mb_x + c] if r == 0 else sub[r - 1][c]
                        ls = left_sub[r] if c == 0 else sub[r][c - 1]
                        sub[r][c] = bd.tree(
                            _BMODE_TREE, _KF_BMODE_PROBS_A[a][ls]
                        )
                submodes[i] = sub
                above_sub[4 * mb_x:4 * mb_x + 4] = sub[3]
                left_sub = [sub[r][3] for r in range(4)]
            else:
                eq = _I16_TO_BMODE[ym]
                above_sub[4 * mb_x:4 * mb_x + 4] = [eq] * 4
                left_sub = [eq] * 4
            uvmodes[i] = bd.tree(_UV_MODE_TREE, _KF_UV_PROBS)
    return seg_ids, skips, ymodes, uvmodes, submodes


def _decode_frame(payload: bytes, *, max_pixels: int = 1 << 24):
    """VP8 chunk payload -> (y, u, v planes uint8, width, height,
    header dict).  Keyframes only — interframes need reference frames
    a still-image pipeline does not have and raise by name."""
    if len(payload) < 10:
        raise ValueError("vp8: payload shorter than the uncompressed header")
    tag = payload[0] | (payload[1] << 8) | (payload[2] << 16)
    if tag & 1:
        raise NotImplementedError(
            "vp8: interframe (P-frame) decode is not supported; still "
            "WebP is always a keyframe"
        )
    if ((tag >> 1) & 7) > 3:
        raise ValueError("vp8: bad version in frame tag")
    part0_size = tag >> 5
    if payload[3:6] != b"\x9d\x01\x2a":
        raise ValueError("vp8: bad keyframe start code")
    wr = payload[6] | (payload[7] << 8)
    hr = payload[8] | (payload[9] << 8)
    width, height = wr & 0x3FFF, hr & 0x3FFF
    if width == 0 or height == 0:
        raise ValueError("vp8: zero frame dimension")
    if width * height > max_pixels:
        raise NotImplementedError(
            f"vp8: {width}x{height} exceeds the decoder's {max_pixels}-"
            "pixel cap (decompression-bomb guard)"
        )
    if 10 + part0_size > len(payload):
        raise ValueError("vp8: first partition overruns the payload")
    mb_w, mb_h = (width + 15) >> 4, (height + 15) >> 4
    bd = _BoolDecoder(payload[10:10 + part0_size])
    probs = _default_probs()
    h = _parse_header(bd, probs)
    rest = payload[10 + part0_size:]
    n_parts = h["n_parts"]
    off = 3 * (n_parts - 1)
    if len(rest) < off:
        raise ValueError("vp8: missing token partition size table")
    parts = []
    for i in range(n_parts):
        if i < n_parts - 1:
            size = rest[3 * i] | (rest[3 * i + 1] << 8) | (rest[3 * i + 2] << 16)
            seg = rest[off:off + size]
            if len(seg) < size:
                raise ValueError("vp8: token partition overruns the payload")
            off += size
        else:
            seg = rest[off:]
        parts.append(_BoolDecoder(seg))
    quants = _segment_quants(
        h["base_q"], h["seg_enabled"], h["seg_abs"], h["seg_q"],
        h["q_deltas"],
    )
    seg_ids, skips, ymodes, uvmodes, submodes = _parse_modes(bd, h, mb_w, mb_h)

    # margined reconstruction planes: margin row 0 = 127 (above), margin
    # col 0 = 129 (left); +4 columns on Y for above-right prediction
    Y = np.empty((1 + 16 * mb_h, 1 + 16 * mb_w + 4), dtype=np.uint8)
    U = np.empty((1 + 8 * mb_h, 1 + 8 * mb_w), dtype=np.uint8)
    V = np.empty_like(U)
    for P in (Y, U, V):
        P[0, :] = 127
        P[1:, 0] = 129
    has_coeffs = [False] * (mb_w * mb_h)

    above_y = [[0] * 4 for _ in range(mb_w)]
    above_u = [[0] * 2 for _ in range(mb_w)]
    above_v = [[0] * 2 for _ in range(mb_w)]
    above_y2 = [0] * mb_w
    zero16 = [0] * 16
    for mb_y in range(mb_h):
        bt = parts[mb_y % n_parts]
        left_y, left_u, left_v, left_y2 = [0] * 4, [0] * 2, [0] * 2, 0
        for mb_x in range(mb_w):
            i = mb_y * mb_w + mb_x
            ym = ymodes[i]
            i4 = ym == B_PRED
            q = quants[seg_ids[i]]
            y2 = None
            ycoef = [zero16] * 16
            ucoef = [zero16] * 4
            vcoef = [zero16] * 4
            ynz = [[0] * 4 for _ in range(4)]
            unz = [[0] * 2 for _ in range(2)]
            vnz = [[0] * 2 for _ in range(2)]
            if skips[i]:
                left_y, above_y[mb_x] = [0] * 4, [0] * 4
                left_u, above_u[mb_x] = [0] * 2, [0] * 2
                left_v, above_v[mb_x] = [0] * 2, [0] * 2
                if not i4:
                    # MBs WITHOUT a Y2 block leave the Y2 context
                    # untouched (RFC 6386 section 13.3's carry-over)
                    left_y2 = above_y2[mb_x] = 0
            else:
                hc = False
                if not i4:
                    ctx = above_y2[mb_x] + left_y2
                    y2, nz2 = _decode_block_coeffs(
                        bt, probs, 1, 0, ctx, q[2], q[3]
                    )
                    above_y2[mb_x] = left_y2 = int(nz2)
                    hc = hc or nz2
                    btype, first = 0, 1
                else:
                    btype, first = 3, 0
                for r in range(4):
                    for c in range(4):
                        ctx = (above_y[mb_x][c] if r == 0 else ynz[r - 1][c]) \
                            + (left_y[r] if c == 0 else ynz[r][c - 1])
                        blk, nzf = _decode_block_coeffs(
                            bt, probs, btype, first, ctx, q[0], q[1]
                        )
                        ycoef[4 * r + c] = blk
                        ynz[r][c] = int(nzf)
                        hc = hc or nzf
                above_y[mb_x] = list(ynz[3])
                left_y = [ynz[r][3] for r in range(4)]
                for plane, coefs, nzg, ab, lf in (
                    ("u", ucoef, unz, above_u, left_u),
                    ("v", vcoef, vnz, above_v, left_v),
                ):
                    for r in range(2):
                        for c in range(2):
                            ctx = (ab[mb_x][c] if r == 0 else nzg[r - 1][c]) \
                                + (lf[r] if c == 0 else nzg[r][c - 1])
                            blk, nzf = _decode_block_coeffs(
                                bt, probs, 2, 0, ctx, q[4], q[5]
                            )
                            coefs[2 * r + c] = blk
                            nzg[r][c] = int(nzf)
                            hc = hc or nzf
                    ab[mb_x] = list(nzg[1])
                    if plane == "u":
                        left_u = [nzg[r][1] for r in range(2)]
                    else:
                        left_v = [nzg[r][1] for r in range(2)]
                has_coeffs[i] = bool(hc)

            # --- reconstruction ---
            y0, x0 = 1 + 16 * mb_y, 1 + 16 * mb_x
            if not i4:
                pred = _pred_16(ym, Y, y0, x0, 16, mb_x, mb_y)
                carr = np.array(ycoef, dtype=np.int64)
                if y2 is not None:
                    dcs = _iwht_many(np.array(y2, dtype=np.int64))[0]
                    carr[:, 0] = dcs
                res = _idct_many(carr)
                # both terms as (block_row, block_col, px_row, px_col)
                out = pred.reshape(4, 4, 4, 4).transpose(0, 2, 1, 3) \
                    + res.reshape(4, 4, 4, 4)
                blk = out.transpose(0, 2, 1, 3).reshape(16, 16)
                Y[y0:y0 + 16, x0:x0 + 16] = np.clip(blk, 0, 255)
            else:
                sub = submodes[i]
                resid = _idct_many(np.array(ycoef, dtype=np.int64))
                for r in range(4):
                    for c in range(4):
                        by, bx = y0 + 4 * r, x0 + 4 * c
                        a_row = Y[by - 1, bx:bx + 4]
                        if c < 3:
                            ar = Y[by - 1, bx + 4:bx + 8]
                        else:
                            ar = Y[16 * mb_y, x0 + 16:x0 + 20]
                        A = [int(t) for t in a_row] + [int(t) for t in ar]
                        L = [int(t) for t in Y[by:by + 4, bx - 1]]
                        C = int(Y[by - 1, bx - 1])
                        p = _pred_b(sub[r][c], A, L, C)
                        Y[by:by + 4, bx:bx + 4] = np.clip(
                            p + resid[4 * r + c], 0, 255
                        )
            cy0, cx0 = 1 + 8 * mb_y, 1 + 8 * mb_x
            um = uvmodes[i]
            for P, coefs in ((U, ucoef), (V, vcoef)):
                pred = _pred_16(um, P, cy0, cx0, 8, mb_x, mb_y)
                res = _idct_many(np.array(coefs, dtype=np.int64))
                out = pred.reshape(2, 4, 2, 4).transpose(0, 2, 1, 3)
                out = out + res.reshape(2, 2, 4, 4)
                blk = out.transpose(0, 2, 1, 3).reshape(8, 8)
                P[cy0:cy0 + 8, cx0:cx0 + 8] = np.clip(blk, 0, 255)
        # above-right margin for the next MB row: replicate the last
        # reconstructed pixel of this row's bottom line
        row = 16 * (mb_y + 1)
        Y[row, 1 + 16 * mb_w:] = Y[row, 16 * mb_w]

    _loop_filter_frame(Y, U, V, mb_w, mb_h, h, seg_ids, ymodes, has_coeffs)
    y = Y[1:1 + height, 1:1 + width]
    cw, ch = (width + 1) >> 1, (height + 1) >> 1
    return (
        np.ascontiguousarray(y),
        np.ascontiguousarray(U[1:1 + ch, 1:1 + cw]),
        np.ascontiguousarray(V[1:1 + ch, 1:1 + cw]),
        width, height, h,
    )


# --- loop filter (RFC 6386 section 15) -------------------------------------------

def _c128(x):
    return np.clip(x, -128, 127)


def _filter_common(win, mask, use_outer):
    """Shared p0/q0 adjustment (RFC 15.2 common_adjust) on a (n, 8)
    signed window; returns the F values (for the !hev outer-tap
    spread).  ``use_outer`` is a per-row bool vector."""
    p1, p0, q0, q1 = win[:, 2], win[:, 3], win[:, 4], win[:, 5]
    a = _c128(np.where(use_outer, _c128(p1 - q1), 0) + 3 * (q0 - p0))
    F = _c128(a + 4) >> 3
    E = _c128(a + 3) >> 3
    win[:, 4] = np.where(mask, q0 - F, q0)
    win[:, 3] = np.where(mask, p0 + E, p0)
    return F


def _filter_normal(win, elim, ilim, hev_t, mb_edge):
    """Normal loop filter on a (n, 8) int64 window [p3..q3] around a
    vertical edge (callers transpose for horizontal edges); values in
    UNSIGNED domain in, out.  RFC 15.2/15.3."""
    u = win
    d = [u[:, k] for k in range(8)]
    mask = (np.abs(d[3] - d[4]) * 2 + (np.abs(d[2] - d[5]) >> 1)) <= elim
    for k in (0, 1, 2):
        mask &= np.abs(d[k] - d[k + 1]) <= ilim
    for k in (5, 6):
        mask &= np.abs(d[k + 1] - d[k]) <= ilim
    mask &= np.abs(d[4 + 1] - d[4]) <= ilim  # |q1-q0|
    hev = (np.abs(d[2] - d[3]) > hev_t) | (np.abs(d[5] - d[4]) > hev_t)
    s = win.astype(np.int64) - 128
    if not mb_edge:
        F = _filter_common(s, mask, hev)
        a = (F + 1) >> 1
        nh = mask & ~hev
        s[:, 5] = np.where(nh, s[:, 5] - a, s[:, 5])
        s[:, 2] = np.where(nh, s[:, 2] + a, s[:, 2])
    else:
        _filter_common(s, mask & hev, np.ones(len(s), dtype=bool))
        nh = mask & ~hev
        p2, p1, p0 = s[:, 1], s[:, 2], s[:, 3]
        q0, q1, q2 = s[:, 4], s[:, 5], s[:, 6]
        w = _c128(_c128(p1 - q1) + 3 * (q0 - p0))
        a = _c128((27 * w + 63) >> 7)
        s[:, 4] = np.where(nh, q0 - a, s[:, 4])
        s[:, 3] = np.where(nh, p0 + a, s[:, 3])
        a = _c128((18 * w + 63) >> 7)
        s[:, 5] = np.where(nh, q1 - a, s[:, 5])
        s[:, 2] = np.where(nh, p1 + a, s[:, 2])
        a = _c128((9 * w + 63) >> 7)
        s[:, 6] = np.where(nh, q2 - a, s[:, 6])
        s[:, 1] = np.where(nh, p2 + a, s[:, 1])
    win[:] = np.clip(s + 128, 0, 255)


def _filter_simple(win, elim):
    """Simple loop filter (luma only): common adjust with outer taps
    when (|p0-q0|*2 + |p1-q1|/2) <= edge limit.  ``win`` is (n, 4)
    [p1, p0, q0, q1] unsigned."""
    p1, p0, q0, q1 = (win[:, k].astype(np.int64) for k in range(4))
    mask = (np.abs(p0 - q0) * 2 + (np.abs(p1 - q1) >> 1)) <= elim
    s = win.astype(np.int64) - 128
    sp1, sp0, sq0, sq1 = s[:, 0], s[:, 1], s[:, 2], s[:, 3]
    a = _c128(_c128(sp1 - sq1) + 3 * (sq0 - sp0))
    F = _c128(a + 4) >> 3
    E = _c128(a + 3) >> 3
    s[:, 2] = np.where(mask, sq0 - F, sq0)
    s[:, 1] = np.where(mask, sp0 + E, sp0)
    win[:] = np.clip(s + 128, 0, 255)


def _edge_v(P, x, y0, n, fn, *args):
    w = 4 if fn is _filter_normal else 2
    win = P[y0:y0 + n, x - w:x + w].astype(np.int64)
    fn(win, *args)
    P[y0:y0 + n, x - w:x + w] = win


def _edge_h(P, y, x0, n, fn, *args):
    w = 4 if fn is _filter_normal else 2
    win = P[y - w:y + w, x0:x0 + n].astype(np.int64).T.copy()
    fn(win, *args)
    P[y - w:y + w, x0:x0 + n] = win.T


def _loop_filter_frame(Y, U, V, mb_w, mb_h, h, seg_ids, ymodes, has_coeffs):
    """Whole-frame loop filter, macroblocks in raster order, the RFC's
    per-MB edge order (left, interior vertical, top, interior
    horizontal); interior edges are skipped for coefficient-free i16
    macroblocks."""
    base = h["filter_level"]
    if base == 0:
        return
    sharp = h["sharpness"]
    simple = h["filter_simple"]
    for mb_y in range(mb_h):
        for mb_x in range(mb_w):
            i = mb_y * mb_w + mb_x
            lvl = base
            if h["seg_enabled"]:
                lvl = h["seg_lf"][seg_ids[i]] if h["seg_abs"] \
                    else base + h["seg_lf"][seg_ids[i]]
                lvl = min(63, max(0, lvl))
            if h["lf_delta_enabled"]:
                lvl += h["ref_lf_deltas"][0]  # intra frame
                if ymodes[i] == B_PRED:
                    lvl += h["mode_lf_deltas"][0]
                lvl = min(63, max(0, lvl))
            if lvl == 0:
                continue
            ilim = lvl
            if sharp:
                ilim >>= 2 if sharp > 4 else 1
                if ilim > 9 - sharp:
                    ilim = 9 - sharp
            if ilim < 1:
                ilim = 1
            hev_t = 2 if lvl >= 40 else (1 if lvl >= 15 else 0)
            mb_lim = ((lvl + 2) * 2) + ilim
            sub_lim = (lvl * 2) + ilim
            inner = has_coeffs[i] or ymodes[i] == B_PRED
            y0, x0 = 1 + 16 * mb_y, 1 + 16 * mb_x
            cy0, cx0 = 1 + 8 * mb_y, 1 + 8 * mb_x
            if simple:
                if mb_x > 0:
                    _edge_v(Y, x0, y0, 16, _filter_simple, mb_lim)
                if inner:
                    for dx in (4, 8, 12):
                        _edge_v(Y, x0 + dx, y0, 16, _filter_simple, sub_lim)
                if mb_y > 0:
                    _edge_h(Y, y0, x0, 16, _filter_simple, mb_lim)
                if inner:
                    for dy in (4, 8, 12):
                        _edge_h(Y, y0 + dy, x0, 16, _filter_simple, sub_lim)
                continue
            if mb_x > 0:
                _edge_v(Y, x0, y0, 16, _filter_normal, mb_lim, ilim, hev_t, True)
                _edge_v(U, cx0, cy0, 8, _filter_normal, mb_lim, ilim, hev_t, True)
                _edge_v(V, cx0, cy0, 8, _filter_normal, mb_lim, ilim, hev_t, True)
            if inner:
                for dx in (4, 8, 12):
                    _edge_v(Y, x0 + dx, y0, 16, _filter_normal,
                            sub_lim, ilim, hev_t, False)
                _edge_v(U, cx0 + 4, cy0, 8, _filter_normal,
                        sub_lim, ilim, hev_t, False)
                _edge_v(V, cx0 + 4, cy0, 8, _filter_normal,
                        sub_lim, ilim, hev_t, False)
            if mb_y > 0:
                _edge_h(Y, y0, x0, 16, _filter_normal, mb_lim, ilim, hev_t, True)
                _edge_h(U, cy0, cx0, 8, _filter_normal, mb_lim, ilim, hev_t, True)
                _edge_h(V, cy0, cx0, 8, _filter_normal, mb_lim, ilim, hev_t, True)
            if inner:
                for dy in (4, 8, 12):
                    _edge_h(Y, y0 + dy, x0, 16, _filter_normal,
                            sub_lim, ilim, hev_t, False)
                _edge_h(U, cy0 + 4, cx0, 8, _filter_normal,
                        sub_lim, ilim, hev_t, False)
                _edge_h(V, cy0 + 4, cx0, 8, _filter_normal,
                        sub_lim, ilim, hev_t, False)


# --- container / alpha / color conversion ----------------------------------------

def decode_webp_vp8_yuv(content: bytes, *, max_pixels: int = 1 << 24):
    """RIFF/WEBP (plain ``VP8 `` or VP8X-wrapped) -> (y, u, v) uint8
    planes at 4:2:0 — the normative reconstruction surface, bit-exact
    with any conformant decoder (this is what the libwebp differential
    test compares)."""
    kind, payload, _alpha = _walk_container(content)
    if kind != "vp8":
        raise ValueError("webp: not a lossy VP8 file")
    y, u, v, _w, _h, _hdr = _decode_frame(payload, max_pixels=max_pixels)
    return y, u, v


def _walk_container(content: bytes):
    """RIFF walk -> (kind, payload, alpha_chunk_or_None) where kind is
    'vp8' or 'vp8l'."""
    if content[:4] != b"RIFF" or content[8:12] != b"WEBP":
        raise ValueError("webp: missing RIFF/WEBP header")
    fourcc = content[12:16]
    if fourcc in (b"VP8 ", b"VP8L"):
        size = int.from_bytes(content[16:20], "little")
        payload = content[20:20 + size]
        if len(payload) != size:
            raise ValueError("webp: chunk overruns the file")
        return ("vp8" if fourcc == b"VP8 " else "vp8l"), payload, None
    if fourcc != b"VP8X":
        raise ValueError(f"webp: unknown chunk {fourcc!r}")
    pos = 12
    alpha = None
    saw = []
    while pos + 8 <= len(content):
        fc = content[pos:pos + 4]
        size = int.from_bytes(content[pos + 4:pos + 8], "little")
        body = content[pos + 8:pos + 8 + size]
        if len(body) != size:
            raise ValueError("webp: chunk overruns the file")
        if fc == b"ANMF" or fc == b"ANIM":
            raise NotImplementedError(
                "webp: this is an ANMF animation — a single still is "
                "ill-defined; decode_webp_anim returns the frames and "
                "composited canvases"
            )
        if fc == b"ALPH":
            alpha = body
        elif fc == b"VP8 ":
            return "vp8", body, alpha
        elif fc == b"VP8L":
            return "vp8l", body, None  # VP8L carries its own alpha
        else:
            saw.append(fc.decode("latin-1").strip())
        pos += 8 + size + (size & 1)
    raise ValueError(f"webp: VP8X without an image chunk (saw {saw})")


def _decode_alpha(data: bytes, w: int, h: int, *, max_pixels: int) -> np.ndarray:
    """ALPH chunk -> (h, w) uint8 alpha plane (WebP container spec:
    2-bit compression method, 2-bit filtering method, 2-bit
    preprocessing; filtering is reversed AFTER decompression)."""
    if not data:
        raise ValueError("webp: empty ALPH chunk")
    b0 = data[0]
    method = b0 & 3
    filt = (b0 >> 2) & 3
    if method == 0:
        raw = np.frombuffer(data[1:1 + w * h], dtype=np.uint8)
        if raw.size != w * h:
            raise ValueError("webp: raw ALPH plane shorter than the image")
        plane = raw.reshape(h, w).astype(np.int64)
    elif method == 1:
        from aroa_etl_spark.operators.vp8lcodec import (
            decode_vp8l_alpha_stream,
        )

        plane = decode_vp8l_alpha_stream(
            data[1:], w, h, max_pixels=max_pixels
        ).astype(np.int64)
    else:
        raise ValueError(f"webp: reserved ALPH compression method {method}")
    if filt == 0:
        return plane.astype(np.uint8)
    out = np.zeros_like(plane)
    for y in range(h):
        for x in range(w):
            if x == 0 and y == 0:
                pred = 0
            elif filt == 1:  # horizontal
                pred = out[y, x - 1] if x > 0 else out[y - 1, x]
            elif filt == 2:  # vertical
                pred = out[y - 1, x] if y > 0 else out[y, x - 1]
            else:  # gradient
                if y == 0:
                    pred = out[y, x - 1]
                elif x == 0:
                    pred = out[y - 1, x]
                else:
                    pred = min(255, max(
                        0,
                        int(out[y, x - 1]) + int(out[y - 1, x])
                        - int(out[y - 1, x - 1]),
                    ))
            out[y, x] = (plane[y, x] + pred) & 0xFF
    return out.astype(np.uint8)


def _yuv420_to_rgb(y, u, v, w, h):
    """Pixel-repetition chroma upsampling + the float JFIF matrix — the
    repo's JPEG convention (operators/jpegcodec._planes_to_image);
    decoders legitimately differ here, the normative surface is YUV."""
    uf = np.repeat(np.repeat(u, 2, axis=0), 2, axis=1)[:h, :w].astype(np.float64)
    vf = np.repeat(np.repeat(v, 2, axis=0), 2, axis=1)[:h, :w].astype(np.float64)
    yf = y.astype(np.float64)
    cb, cr = uf - 128.0, vf - 128.0
    rgb = np.stack(
        [yf + 1.402 * cr, yf - 0.344136 * cb - 0.714136 * cr,
         yf + 1.772 * cb],
        axis=2,
    )
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8)


def decode_webp(content: bytes, *, max_pixels: int = 1 << 24) -> np.ndarray:
    """Any still RIFF/WEBP -> (H, W, 3) uint8 RGB, or (H, W, 4) RGBA
    when alpha is present (VP8L alpha channel, or a lossy VP8 frame
    with an ALPH chunk).  Lossy VP8 keyframes decode for REAL (round
    12); VP8L was round 10/11; ANMF animation stays a named boundary."""
    kind, payload, alpha_chunk = _walk_container(content)
    if kind == "vp8l":
        from aroa_etl_spark.operators.vp8lcodec import decode_vp8l_payload

        arr, w, h = decode_vp8l_payload(payload, max_pixels=max_pixels)
        a = ((arr >> 24) & 0xFF).astype(np.uint8)
        opaque = bool((a == 255).all())
        out = np.empty((h, w, 3 if opaque else 4), dtype=np.uint8)
        out[:, :, 0] = (arr >> 16) & 0xFF
        out[:, :, 1] = (arr >> 8) & 0xFF
        out[:, :, 2] = arr & 0xFF
        if not opaque:
            out[:, :, 3] = a
        return out
    y, u, v, w, h, _hdr = _decode_frame(payload, max_pixels=max_pixels)
    rgb = _yuv420_to_rgb(y, u, v, w, h)
    if alpha_chunk is None:
        return rgb
    a = _decode_alpha(alpha_chunk, w, h, max_pixels=max_pixels)
    return np.dstack([rgb, a])


# --- fixture-twin encoder ----------------------------------------------------------

def _encode_block_coeffs(be, probs, btype, first, ctx, levels):
    """Token-encode one block's RASTER-order levels (the decoder's
    exact inverse); returns had_nonzero."""
    zz = [levels[_ZIGZAG[n]] for n in range(16)]
    last = -1
    for n in range(first, 16):
        if zz[n]:
            last = n
    nz = last >= 0
    start = 0
    n = first
    while n <= last:
        val = zz[n]
        p = probs[btype][_COEFF_BANDS[n]][ctx]
        if val == 0:
            be.tree(_COEFF_TREE, p, _ZERO, start)
            ctx = 0
            start = 2
            n += 1
            continue
        mag = abs(val)
        if mag <= 4:
            tok = (_ONE, _TWO, _THREE, _FOUR)[mag - 1]
            be.tree(_COEFF_TREE, p, tok, start)
        else:
            for tok in (_CAT1, _CAT2, _CAT3, _CAT4, _CAT5, _CAT6):
                hi = _TOKEN_BASE[tok] + (1 << len(_CAT_PROBS[tok])) - 1
                if mag <= hi:
                    break
            else:
                raise ValueError(f"vp8: coefficient {mag} beyond category 6")
            be.tree(_COEFF_TREE, p, tok, start)
            extra = mag - _TOKEN_BASE[tok]
            cps = _CAT_PROBS[tok]
            for k, pb in enumerate(cps):
                be.put(pb, (extra >> (len(cps) - 1 - k)) & 1)
        be.put(128, 1 if val < 0 else 0)
        ctx = 1 if mag == 1 else 2
        start = 0
        n += 1
    if last < 15:
        p = probs[btype][_COEFF_BANDS[max(first, last + 1)]][ctx]
        be.tree(_COEFF_TREE, p, _EOB, start)
    return nz


def encode_webp_vp8(
    ymodes,
    uvmodes=None,
    *,
    submodes=None,
    y2lev=None,
    ylev=None,
    uvlev=None,
    skip=None,
    seg_ids=None,
    seg_q=None,
    seg_abs=True,
    base_q=40,
    q_deltas=(0, 0, 0, 0, 0),
    filter_level=0,
    filter_simple=False,
    sharpness=0,
    n_partitions=1,
    width=None,
    height=None,
    alpha=None,
) -> bytes:
    """Emit a real RIFF/WEBP lossy VP8 KEYFRAME from chosen modes and
    coefficient levels — the fixture twin of ``decode_webp_vp8_yuv``
    (levels and modes in, conformant bitstream out; expected pixels
    come from the closed-form constructions in the catalog entry and
    from libwebp in the differential tests, never from this module's
    own decoder).

    ``ymodes``/``uvmodes``: (mb_h, mb_w) mode grids (0..3, or 4 =
    B_PRED in ymodes with per-MB 4x4 ``submodes``); ``y2lev``: (mb_h,
    mb_w, 16) Y2 levels (raster positions); ``ylev``: (mb_h, mb_w, 16,
    16) per-Y-block levels (position 0 must be 0 for i16 MBs — the DC
    rides in Y2); ``uvlev``: (mb_h, mb_w, 8, 16) U then V block
    levels; ``seg_ids`` + ``seg_q`` enable segmentation with per-
    segment quantizer features; ``alpha`` attaches an (h, w) uint8
    plane as a raw ALPH chunk in a VP8X container."""
    ymodes = np.asarray(ymodes)
    mb_h, mb_w = ymodes.shape
    if uvmodes is None:
        uvmodes = np.zeros((mb_h, mb_w), dtype=int)
    uvmodes = np.asarray(uvmodes)
    width = 16 * mb_w if width is None else width
    height = 16 * mb_h if height is None else height
    skip = np.zeros((mb_h, mb_w), dtype=int) if skip is None \
        else np.asarray(skip)
    seg_enabled = seg_ids is not None
    if seg_enabled:
        seg_ids = np.asarray(seg_ids)
        seg_q = list(seg_q)
    probs = _default_probs()

    be = _BoolEncoder()
    be.put(128, 0)  # color space
    be.put(128, 0)  # clamping
    be.put(128, 1 if seg_enabled else 0)
    if seg_enabled:
        be.put(128, 1)  # update map
        be.put(128, 1)  # update feature data
        be.put(128, 1 if seg_abs else 0)
        for s in range(4):
            be.put(128, 1)
            be.signed(seg_q[s], 7)
        for _s in range(4):
            be.put(128, 0)  # no per-segment filter features
        for _i in range(3):
            be.put(128, 1)
            be.literal(128, 8)  # flat segment-tree probs
    be.put(128, 1 if filter_simple else 0)
    be.literal(filter_level, 6)
    be.literal(sharpness, 3)
    be.put(128, 0)  # no lf deltas
    logn = {1: 0, 2: 1, 4: 2, 8: 3}[n_partitions]
    be.literal(logn, 2)
    be.literal(base_q, 7)
    for d in q_deltas:
        if d:
            be.put(128, 1)
            be.signed(d, 4)
        else:
            be.put(128, 0)
    be.put(128, 1)  # refresh entropy probs
    for t in range(4):
        for b in range(8):
            for c in range(3):
                for i in range(11):
                    be.put(_COEFF_UPDATE_PROBS_A[t][b][c][i], 0)
    be.put(128, 1)  # mb_no_coeff_skip
    be.literal(128, 8)  # prob_skip_false

    above_sub = [0] * (4 * mb_w)
    for mb_y in range(mb_h):
        left_sub = [0, 0, 0, 0]
        for mb_x in range(mb_w):
            if seg_enabled:
                s = int(seg_ids[mb_y, mb_x])
                be.put(128, 1 if s >= 2 else 0)
                be.put(128, s & 1)
            be.put(128, int(skip[mb_y, mb_x]))
            ym = int(ymodes[mb_y, mb_x])
            be.tree(_KF_YMODE_TREE, _KF_YMODE_PROBS, ym)
            if ym == B_PRED:
                sub = submodes[(mb_y, mb_x)]
                for r in range(4):
                    for c in range(4):
                        a = above_sub[4 * mb_x + c] if r == 0 else sub[r - 1][c]
                        ls = left_sub[r] if c == 0 else sub[r][c - 1]
                        be.tree(_BMODE_TREE, _KF_BMODE_PROBS_A[a][ls],
                                sub[r][c])
                above_sub[4 * mb_x:4 * mb_x + 4] = sub[3]
                left_sub = [sub[r][3] for r in range(4)]
            else:
                eq = _I16_TO_BMODE[ym]
                above_sub[4 * mb_x:4 * mb_x + 4] = [eq] * 4
                left_sub = [eq] * 4
            be.tree(_UV_MODE_TREE, _KF_UV_PROBS, int(uvmodes[mb_y, mb_x]))
    part0 = be.flush()

    zeros16 = [0] * 16
    parts = [_BoolEncoder() for _ in range(n_partitions)]
    above_y = [[0] * 4 for _ in range(mb_w)]
    above_u = [[0] * 2 for _ in range(mb_w)]
    above_v = [[0] * 2 for _ in range(mb_w)]
    above_y2 = [0] * mb_w
    for mb_y in range(mb_h):
        bt = parts[mb_y % n_partitions]
        left_y, left_u, left_v, left_y2 = [0] * 4, [0] * 2, [0] * 2, 0
        for mb_x in range(mb_w):
            ym = int(ymodes[mb_y, mb_x])
            i4 = ym == B_PRED
            if skip[mb_y, mb_x]:
                left_y, above_y[mb_x] = [0] * 4, [0] * 4
                left_u, above_u[mb_x] = [0] * 2, [0] * 2
                left_v, above_v[mb_x] = [0] * 2, [0] * 2
                if not i4:
                    left_y2 = above_y2[mb_x] = 0
                continue
            if not i4:
                lv = list(y2lev[mb_y][mb_x]) if y2lev is not None else zeros16
                ctx = above_y2[mb_x] + left_y2
                nz2 = _encode_block_coeffs(bt, probs, 1, 0, ctx, lv)
                above_y2[mb_x] = left_y2 = int(nz2)
                btype, first = 0, 1
            else:
                btype, first = 3, 0
            ynz = [[0] * 4 for _ in range(4)]
            for r in range(4):
                for c in range(4):
                    lv = list(ylev[mb_y][mb_x][4 * r + c]) \
                        if ylev is not None else zeros16
                    if not i4 and lv[0]:
                        raise ValueError(
                            "vp8: i16 luma DC must ride in y2lev"
                        )
                    ctx = (above_y[mb_x][c] if r == 0 else ynz[r - 1][c]) \
                        + (left_y[r] if c == 0 else ynz[r][c - 1])
                    nzf = _encode_block_coeffs(
                        bt, probs, btype, first, ctx, lv
                    )
                    ynz[r][c] = int(nzf)
            above_y[mb_x] = list(ynz[3])
            left_y = [ynz[r][3] for r in range(4)]
            for half, (ab, lf_) in enumerate(
                ((above_u, left_u), (above_v, left_v))
            ):
                nzg = [[0] * 2 for _ in range(2)]
                for r in range(2):
                    for c in range(2):
                        lv = list(uvlev[mb_y][mb_x][4 * half + 2 * r + c]) \
                            if uvlev is not None else zeros16
                        ctx = (ab[mb_x][c] if r == 0 else nzg[r - 1][c]) \
                            + (lf_[r] if c == 0 else nzg[r][c - 1])
                        nzf = _encode_block_coeffs(
                            bt, probs, 2, 0, ctx, lv
                        )
                        nzg[r][c] = int(nzf)
                ab[mb_x] = list(nzg[1])
                if half == 0:
                    left_u = [nzg[r][1] for r in range(2)]
                else:
                    left_v = [nzg[r][1] for r in range(2)]
    bodies = [p.flush() for p in parts]

    tag = (0 << 0) | (0 << 1) | (1 << 4) | (len(part0) << 5)
    payload = bytearray()
    payload += bytes((tag & 0xFF, (tag >> 8) & 0xFF, (tag >> 16) & 0xFF))
    payload += b"\x9d\x01\x2a"
    payload += bytes((width & 0xFF, (width >> 8) & 0x3F))
    payload += bytes((height & 0xFF, (height >> 8) & 0x3F))
    payload += part0
    for b in bodies[:-1]:
        payload += len(b).to_bytes(3, "little")
    for b in bodies:
        payload += b
    return _mux_webp(bytes(payload), width, height, alpha)


def _mux_webp(vp8_payload: bytes, width: int, height: int, alpha) -> bytes:
    def chunk(fourcc, body):
        pad = b"\x00" if len(body) & 1 else b""
        return fourcc + len(body).to_bytes(4, "little") + body + pad

    if alpha is None:
        inner = chunk(b"VP8 ", vp8_payload)
    else:
        a = np.asarray(alpha, dtype=np.uint8)
        alph = bytes([0]) + a.tobytes()  # raw, unfiltered
        vp8x = bytes([0x10, 0, 0, 0]) \
            + (width - 1).to_bytes(3, "little") \
            + (height - 1).to_bytes(3, "little")
        inner = chunk(b"VP8X", vp8x) + chunk(b"ALPH", alph) \
            + chunk(b"VP8 ", vp8_payload)
    riff = b"WEBP" + inner
    return b"RIFF" + len(riff).to_bytes(4, "little") + riff


# --- ANMF animation (WebP container spec) ------------------------------------

def decode_webp_anim(
    content: bytes, *, max_pixels: int = 1 << 24, max_frames: int = 256,
    composite: bool = True,
):
    """Animated WebP (VP8X + ANIM + ANMF chains) -> {'width', 'height',
    'loop_count', 'bg_bgra', 'frames': [...]} — closing the last WebP
    boundary (round 12).  Each frame dict carries the container
    metadata (x, y, w, h, duration_ms, dispose, blend), the decoded
    frame ``pixels`` (RGBA; lossy VP8 with optional ALPH, or VP8L),
    and, with ``composite=True``, the full ``canvas`` after the frame
    is composited: canvas starts transparent black, 'background'
    disposal clears the previous frame's rectangle, and frames either
    alpha-blend (straight-alpha over operator, the spec's formulas in
    integer math) or overwrite per their blend bit.  (The ANIM
    background color is surfaced but not painted — the convention of
    the reference animation decoder; transparent initialization keeps
    frame sampling for training data well-defined.)  The frame COUNT
    cap is the animation twin of the pixel bomb guard."""
    if content[:4] != b"RIFF" or content[8:12] != b"WEBP":
        raise ValueError("webp: missing RIFF/WEBP header")
    if content[12:16] != b"VP8X":
        raise ValueError("webp: animations require a VP8X container")
    pos = 12
    canvas_w = canvas_h = None
    loop = 0
    bg = (0, 0, 0, 0)
    frames = []
    while pos + 8 <= len(content):
        fc = content[pos:pos + 4]
        size = int.from_bytes(content[pos + 4:pos + 8], "little")
        body = content[pos + 8:pos + 8 + size]
        if len(body) != size:
            raise ValueError("webp: chunk overruns the file")
        if fc == b"VP8X":
            if size < 10:
                raise ValueError("webp: short VP8X chunk")
            canvas_w = int.from_bytes(body[4:7], "little") + 1
            canvas_h = int.from_bytes(body[7:10], "little") + 1
            if canvas_w * canvas_h > max_pixels:
                raise NotImplementedError(
                    f"webp-anim: {canvas_w}x{canvas_h} canvas exceeds the "
                    f"{max_pixels}-pixel cap"
                )
        elif fc == b"ANIM":
            if size < 6:
                raise ValueError("webp: short ANIM chunk")
            bg = tuple(body[0:4])  # BGRA per the container spec
            loop = int.from_bytes(body[4:6], "little")
        elif fc == b"ANMF":
            if size < 16:
                raise ValueError("webp: short ANMF chunk")
            if len(frames) >= max_frames:
                raise NotImplementedError(
                    f"webp-anim: more than {max_frames} frames "
                    "(decompression-bomb guard)"
                )
            fx = int.from_bytes(body[0:3], "little") * 2
            fy = int.from_bytes(body[3:6], "little") * 2
            fw = int.from_bytes(body[6:9], "little") + 1
            fh = int.from_bytes(body[9:12], "little") + 1
            dur = int.from_bytes(body[12:15], "little")
            flags = body[15]
            frames.append({
                "x": fx, "y": fy, "w": fw, "h": fh,
                "duration_ms": dur,
                "dispose": flags & 1,          # 1 = dispose to background
                "blend": 0 if flags & 2 else 1,  # 1 = alpha-blend
                "_payload": body[16:],
            })
        pos += 8 + size + (size & 1)
    if canvas_w is None:
        raise ValueError("webp: VP8X chunk missing")
    if not frames:
        raise ValueError("webp-anim: no ANMF frames (still VP8X image?)")

    from aroa_etl_spark.operators.vp8lcodec import decode_vp8l_payload

    canvas = np.zeros((canvas_h, canvas_w, 4), dtype=np.uint8) \
        if composite else None
    for f in frames:
        sub = f.pop("_payload")
        # frame data = optional ALPH chunk + one VP8/VP8L chunk
        spos = 0
        alpha_chunk = None
        px = None
        while spos + 8 <= len(sub):
            sfc = sub[spos:spos + 4]
            ssz = int.from_bytes(sub[spos + 4:spos + 8], "little")
            sbody = sub[spos + 8:spos + 8 + ssz]
            if len(sbody) != ssz:
                raise ValueError("webp-anim: frame chunk overruns ANMF")
            if sfc == b"ALPH":
                alpha_chunk = sbody
            elif sfc == b"VP8 ":
                y, u, v, w, h, _hdr = _decode_frame(
                    sbody, max_pixels=max_pixels
                )
                rgb = _yuv420_to_rgb(y, u, v, w, h)
                if alpha_chunk is not None:
                    a = _decode_alpha(alpha_chunk, w, h,
                                      max_pixels=max_pixels)
                else:
                    a = np.full((h, w), 255, dtype=np.uint8)
                px = np.dstack([rgb, a])
            elif sfc == b"VP8L":
                arr, w, h = decode_vp8l_payload(sbody, max_pixels=max_pixels)
                px = np.empty((h, w, 4), dtype=np.uint8)
                px[:, :, 0] = (arr >> 16) & 0xFF
                px[:, :, 1] = (arr >> 8) & 0xFF
                px[:, :, 2] = arr & 0xFF
                px[:, :, 3] = (arr >> 24) & 0xFF
            spos += 8 + ssz + (ssz & 1)
        if px is None:
            raise ValueError("webp-anim: ANMF frame without image data")
        if px.shape[:2] != (f["h"], f["w"]):
            raise ValueError(
                f"webp-anim: frame pixels {px.shape[1]}x{px.shape[0]} != "
                f"declared {f['w']}x{f['h']}"
            )
        if f["x"] + f["w"] > canvas_w or f["y"] + f["h"] > canvas_h:
            raise ValueError("webp-anim: frame rectangle outside the canvas")
        f["pixels"] = px
        if composite:
            ys, xs = slice(f["y"], f["y"] + f["h"]), \
                slice(f["x"], f["x"] + f["w"])
            if f["blend"]:
                # straight-alpha OVER in integer math (the spec's
                # formulas, rounding via the +127 // 255 idiom)
                dst = canvas[ys, xs].astype(np.int64)
                src = px.astype(np.int64)
                sa, da = src[..., 3], dst[..., 3]
                oa = sa + (da * (255 - sa) + 127) // 255
                num = (src[..., :3] * sa[..., None] * 255
                       + dst[..., :3] * da[..., None] * (255 - sa[..., None]))
                den = np.maximum(oa[..., None], 1) * 255
                out = np.empty_like(src)
                out[..., :3] = (num + den // 2) // den
                out[..., 3] = oa
                out[oa == 0] = 0
                canvas[ys, xs] = out.astype(np.uint8)
            else:
                canvas[ys, xs] = px
            f["canvas"] = canvas.copy()
            if f["dispose"]:
                canvas[ys, xs] = 0
    return {
        "width": canvas_w, "height": canvas_h, "loop_count": loop,
        "bg_bgra": bg, "frames": frames,
    }


def encode_webp_anim(
    canvas_w: int, canvas_h: int,
    frames: "list[dict]", *, loop: int = 0, bg=(255, 255, 255, 255),
) -> bytes:
    """Fixture-twin animation muxer: each frame dict carries x, y,
    duration_ms, dispose, blend, and ``webp`` (a full still RIFF from
    ``encode_webp_vp8`` / ``encode_webp_vp8l`` whose image + ALPH
    chunks are rewrapped into the ANMF)."""
    def chunk(fourcc, body):
        pad = b"\x00" if len(body) & 1 else b""
        return fourcc + len(body).to_bytes(4, "little") + body + pad

    out = bytearray()
    vp8x = bytes([0x02, 0, 0, 0]) \
        + (canvas_w - 1).to_bytes(3, "little") \
        + (canvas_h - 1).to_bytes(3, "little")
    out += chunk(b"VP8X", vp8x)
    out += chunk(b"ANIM", bytes(bg) + int(loop).to_bytes(2, "little"))
    for f in frames:
        still = f["webp"]
        kind, payload, alpha = _walk_container(still)
        if kind == "vp8":
            w = (int.from_bytes(payload[6:8], "little")) & 0x3FFF
            h = (int.from_bytes(payload[8:10], "little")) & 0x3FFF
            inner = (chunk(b"ALPH", alpha) if alpha is not None else b"") \
                + chunk(b"VP8 ", payload)
        else:
            from aroa_etl_spark.operators.vp8lcodec import (
                decode_vp8l_payload,  # dims only; cheap for fixtures
            )

            _arr, w, h = decode_vp8l_payload(payload)
            inner = chunk(b"VP8L", payload)
        hdr = (f["x"] // 2).to_bytes(3, "little") \
            + (f["y"] // 2).to_bytes(3, "little") \
            + (w - 1).to_bytes(3, "little") \
            + (h - 1).to_bytes(3, "little") \
            + int(f.get("duration_ms", 100)).to_bytes(3, "little") \
            + bytes([(0 if f.get("blend", 1) else 2) | (f.get("dispose", 0) & 1)])
        out += chunk(b"ANMF", hdr + inner)
    riff = b"WEBP" + bytes(out)
    return b"RIFF" + len(riff).to_bytes(4, "little") + riff
