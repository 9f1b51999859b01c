"""Vendored WebP VP8L (lossless) codec — pure Python, no DCT.

VP8L is the lossless half of WebP (public spec: "WebP Lossless
Bitstream Specification", RFC 9649 §4; container §2): an LSB-first
bitstream of canonical prefix (Huffman) codes driving an LZ77 decoder
over ARGB pixels, with optional per-image transforms.  Same vendoring
pattern as the JPEG (jpegcodec.py) and FLAC (flaccodec.py) codecs:
``encode_webp_vp8l`` is the fixture-side twin, ``decode_webp_vp8l``
the real decoder, and everything outside the supported set raises
``NotImplementedError`` by name.

Supported (round 10; completed + vectorized round 11):

- RIFF/WEBP container with a VP8L chunk — bare OR wrapped in a VP8X
  extended container (the still-image-with-metadata layout; the chunk
  walk finds the top-level VP8L stream) — 14+14-bit dimensions;
- prefix codes in BOTH forms — simple (1-2 symbols) and normal
  (code-length code over the 19-symbol kCodeLengthCodeOrder with the
  16/17/18 repeat codes and the optional max_symbol short-circuit);
- LZ77 back-references: length/distance prefix values, the 120-entry
  2D neighbor distance map, and plain (code-120) distances;
- color cache (hash 0x1e35a7bd, 1..11 bits) for literals AND copied
  pixels;
- meta prefix images (spatial Huffman-group switching at level 0);
- ALL FOUR transforms: SUBTRACT_GREEN, COLOR_INDEXING (palette,
  including the mandatory pixel bundling at <=16 colors, delta-coded
  palette), CROSS_COLOR (per-tile ColorTransformElements, int8 3.5
  fixed-point deltas with arithmetic shift), and the PREDICTOR
  transform's FULL family — tile-mode sub-image + modes 0-13 (black /
  L / T / TR / TL / the four Average2 pairs / double-average / Select
  with the spec's Manhattan tie-break / ClampAddSubtractFull / -Half
  with C-truncating halving), with the spec edge rules (top row
  predicts L, left column predicts T, origin predicts opaque black,
  last-column TR wraps to the current row's first pixel by buffer
  contiguity).

Named boundaries: the lossy VP8 codec (a full DCT predictor, out of
the vendored-codec family's scope) and ANMF-animated files raise by
name.

Decode hot path (round 11, r10 verdict #2): the bit reader is
word-buffered (O(1) per read), prefix decode is a flat-table peek
(zlib-style root+subtable), LZ77 copies extend in slices, and the
inverse transforms run as vectorized NumPy lane arithmetic over the
packed ARGB plane — only the left-dependent nonlinear predictor
modes (5/6/7/10/11/12/13) fall back to a segment-local scalar
kernel.

Scale: decode is a per-blob kernel under mapInPandas (multimodal.py's
image_features) — zero shuffle; cost O(pixels).
"""

from __future__ import annotations

import numpy as np

__all__ = ["encode_webp_vp8l", "decode_webp_vp8l"]

# CL symbol transmission order (RFC 9649 §4.2.1.1; libwebp
# kCodeLengthCodeOrder)
_CL_ORDER = (17, 18, 0, 1, 2, 3, 4, 5, 16, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15)

# 2D neighbor map for distance codes 1..120 (RFC 9649 §4.2.2.3): (dx, dy)
# offsets over the window dy in 0..7, dx in -7..8 (dx >= 1 on the dy=0
# row) — exactly 120 offsets; dist = dx + dy * xsize (clamped to >= 1).
# Transcribed from the published table, near-distance-first; the unit
# tests pin the leading rows, the entries the fixture encoder uses, and
# the exact window coverage (each offset once).
_DIST_MAP = (
    (0, 1), (1, 0), (1, 1), (-1, 1), (0, 2), (2, 0), (1, 2), (-1, 2),
    (2, 1), (-2, 1), (2, 2), (-2, 2), (0, 3), (3, 0), (1, 3), (-1, 3),
    (3, 1), (-3, 1), (2, 3), (-2, 3), (3, 2), (-3, 2), (0, 4), (4, 0),
    (1, 4), (-1, 4), (4, 1), (-4, 1), (3, 3), (-3, 3), (2, 4), (-2, 4),
    (4, 2), (-4, 2), (0, 5), (3, 4), (-3, 4), (4, 3), (-4, 3), (5, 0),
    (1, 5), (-1, 5), (5, 1), (-5, 1), (2, 5), (-2, 5), (5, 2), (-5, 2),
    (4, 4), (-4, 4), (3, 5), (-3, 5), (5, 3), (-5, 3), (0, 6), (6, 0),
    (1, 6), (-1, 6), (6, 1), (-6, 1), (2, 6), (-2, 6), (6, 2), (-6, 2),
    (4, 5), (-4, 5), (5, 4), (-5, 4), (3, 6), (-3, 6), (6, 3), (-6, 3),
    (0, 7), (7, 0), (1, 7), (-1, 7), (5, 5), (-5, 5), (7, 1), (-7, 1),
    (4, 6), (-4, 6), (6, 4), (-6, 4), (2, 7), (-2, 7), (7, 2), (-7, 2),
    (3, 7), (-3, 7), (7, 3), (-7, 3), (5, 6), (-5, 6), (6, 5), (-6, 5),
    (8, 0), (4, 7), (-4, 7), (7, 4), (-7, 4), (8, 1), (8, 2), (6, 6),
    (-6, 6), (8, 3), (6, 7), (-6, 7), (7, 6), (-7, 6), (8, 4), (5, 7),
    (-5, 7), (7, 5), (-7, 5), (8, 5), (8, 6), (7, 7), (-7, 7), (8, 7),
)


class _BitReader:
    """LSB-first bit reader over the VP8L payload, word-buffered: a
    64-bit window is reloaded from the byte buffer only when a read
    crosses it, so ``bits``/``peek``/``skip`` are O(1) int ops (the
    round-10 per-bit loop dominated decode wall).  ``peek`` zero-pads
    past the end of data (prefix peeks near the stream tail are
    legitimate); only actually CONSUMING past the end raises."""

    __slots__ = ("data", "nbits", "pos", "_cur", "_base", "_top")

    def __init__(self, data: bytes):
        self.data = data
        self.nbits = len(data) * 8
        self.pos = 0
        self._cur = 0
        self._base = 0
        self._top = 0  # exclusive bit bound of the loaded window

    def _load(self) -> None:
        byte = self.pos >> 3
        self._cur = int.from_bytes(self.data[byte:byte + 8], "little")
        self._base = byte << 3
        self._top = self._base + 8 * min(8, len(self.data) - byte)

    def bits(self, n: int) -> int:
        pos = self.pos
        if pos + n > self.nbits:
            raise ValueError("vp8l: bitstream overrun")
        if pos + n > self._top:
            self._load()
        self.pos = pos + n
        return (self._cur >> (pos - self._base)) & ((1 << n) - 1)

    def peek(self, n: int) -> int:
        pos = self.pos
        if pos + n > self._top:
            self._load()
        return (self._cur >> (pos - self._base)) & ((1 << n) - 1)

    def skip(self, n: int) -> None:
        pos = self.pos + n
        if pos > self.nbits:
            raise ValueError("vp8l: bitstream overrun")
        self.pos = pos


class _BitWriter:
    def __init__(self) -> None:
        self.buf = bytearray()
        self.bit = 0

    def write(self, value: int, n: int) -> None:
        for i in range(n):
            if self.bit == 0:
                self.buf.append(0)
            if (value >> i) & 1:
                self.buf[-1] |= 1 << self.bit
            self.bit = (self.bit + 1) & 7

    def write_code(self, code: int, length: int) -> None:
        # prefix codes are matched MSB-of-code first
        for i in range(length - 1, -1, -1):
            self.write((code >> i) & 1, 1)


_REV8 = tuple(
    sum(((i >> b) & 1) << (7 - b) for b in range(8)) for i in range(256)
)


def _rev_bits(code: int, n: int) -> int:
    # bit-reverse the low n (<= 16) bits via the byte-reverse table
    return ((_REV8[code & 0xFF] << 8) | _REV8[(code >> 8) & 0xFF]) >> (16 - n)


class _PrefixCode:
    """Canonical prefix decoder via a flat lookup table: peek
    ``root_bits`` stream bits (LSB-first), one list index gives
    (symbol, consumed length) — the zlib-style replacement for the
    round-10 per-bit dict walk.  Codes longer than the 10-bit root
    spill into per-prefix subtables (VP8L caps lengths at 15, so at
    most 5 extra bits).  A code with a SINGLE used symbol consumes 0
    bits (degenerate trees per the reference decoder's table builder),
    whatever length it declared — the fixture encoder emits matching
    0-bit codes.  Over-subscribed length sets (canonical code
    overflow, only reachable from corrupt streams) raise ValueError."""

    __slots__ = ("single", "root_bits", "root_mask", "root_sym", "root_len", "subs")
    _ROOT = 10

    def __init__(self, lengths: "dict[int, int]"):
        # lengths: symbol -> code length (>0)
        if not lengths:
            raise ValueError("vp8l: empty prefix code")
        if len(lengths) == 1:
            self.single = next(iter(lengths))
            return
        self.single = None
        by_len: dict[int, list[int]] = {}
        for s, v in lengths.items():
            by_len.setdefault(v, []).append(s)
        maxlen = max(by_len)
        if maxlen > 15:
            raise ValueError("vp8l: prefix code length > 15")
        items = []  # (symbol, canonical code, length)
        code = 0
        for ln in range(1, maxlen + 1):
            for sym in sorted(by_len.get(ln, ())):
                if code >= (1 << ln):
                    raise ValueError("vp8l: over-subscribed prefix code")
                items.append((sym, code, ln))
                code += 1
            code <<= 1
        root = self.root_bits = min(maxlen, self._ROOT)
        self.root_mask = (1 << root) - 1
        size = 1 << root
        self.root_sym = [0] * size
        self.root_len = [0] * size
        self.subs: list = []
        sub_index: dict[int, int] = {}
        for sym, c, ln in items:
            if ln <= root:
                # stream sends the code MSB-first; the peeked LSB-first
                # window therefore holds its bit-reversal
                pat = _rev_bits(c, ln)
                step = 1 << ln
                cnt = size >> ln
                self.root_sym[pat::step] = [sym] * cnt
                self.root_len[pat::step] = [ln] * cnt
            else:
                pat = _rev_bits(c >> (ln - root), root)
                si = sub_index.get(pat)
                if si is None:
                    si = len(self.subs)
                    sub_index[pat] = si
                    sb = maxlen - root
                    self.subs.append((sb, [0] * (1 << sb), [0] * (1 << sb)))
                    self.root_sym[pat] = si
                    self.root_len[pat] = 255  # subtable marker
                sb, ssym, slen = self.subs[self.root_sym[pat]]
                extra = ln - root
                pat2 = _rev_bits(c & ((1 << extra) - 1), extra)
                step = 1 << extra
                cnt = (1 << sb) >> extra
                ssym[pat2::step] = [sym] * cnt
                slen[pat2::step] = [extra] * cnt

    def read(self, br: _BitReader) -> int:
        # the hot path of the whole decoder: reader state is inlined
        # (peek+skip as direct field ops) to shave two method calls
        # per symbol
        if self.single is not None:
            return self.single
        pos = br.pos
        if pos + self.root_bits > br._top:
            br._load()
        v = (br._cur >> (pos - br._base)) & self.root_mask
        ln = self.root_len[v]
        if ln == 0:
            raise ValueError("vp8l: invalid prefix code in stream")
        if ln != 255:
            pos += ln
            if pos > br.nbits:
                raise ValueError("vp8l: bitstream overrun")
            br.pos = pos
            return self.root_sym[v]
        sb, ssym, slen = self.subs[self.root_sym[v]]
        br.skip(self.root_bits)
        v2 = br.peek(sb)
        l2 = slen[v2]
        if l2 == 0:
            raise ValueError("vp8l: invalid prefix code in stream")
        br.skip(l2)
        return ssym[v2]


def _canonical_lengths(freqs: "dict[int, int]", cap: int = 15) -> "dict[int, int]":
    """Huffman code lengths from frequencies (package-merge-free: plain
    Huffman; fixture alphabets never exceed the 15-bit cap, enforced)."""
    import heapq

    items = [(f, i, {s: 0}) for i, (s, f) in enumerate(sorted(freqs.items()))]
    if not items:
        raise ValueError("vp8l: empty alphabet")
    if len(items) == 1:
        return {next(iter(freqs)): 1}
    heapq.heapify(items)
    counter = len(items)
    while len(items) > 1:
        fa, _ia, a = heapq.heappop(items)
        fb, _ib, b = heapq.heappop(items)
        merged = {s: d + 1 for s, d in a.items()}
        merged.update({s: d + 1 for s, d in b.items()})
        counter += 1
        heapq.heappush(items, (fa + fb, counter, merged))
    lengths = items[0][2]
    if max(lengths.values()) > cap:
        raise ValueError("vp8l: fixture alphabet needs >15-bit codes")
    return lengths


def _canonical_codes(lengths: "dict[int, int]") -> "dict[int, tuple[int, int]]":
    out = {}
    code = 0
    for ln in range(1, max(lengths.values()) + 1):
        for sym in sorted(s for s, v in lengths.items() if v == ln):
            out[sym] = (code, ln)
            code += 1
        code <<= 1
    return out


# --- prefix-code (de)serialization ------------------------------------------

def _read_prefix_code(br: _BitReader, alphabet_size: int) -> _PrefixCode:
    if br.bits(1):  # simple code
        n_sym = br.bits(1) + 1
        if br.bits(1):  # first symbol in 8 bits
            sym0 = br.bits(8)
        else:
            sym0 = br.bits(1)
        if n_sym == 1:
            return _PrefixCode({sym0: 1})
        sym1 = br.bits(8)
        if sym0 == sym1:
            raise ValueError("vp8l: simple code repeats its symbol")
        return _PrefixCode({sym0: 1, sym1: 1})
    n_cl = 4 + br.bits(4)
    cl_lengths = {}
    for i in range(n_cl):
        ln = br.bits(3)
        if ln:
            cl_lengths[_CL_ORDER[i]] = ln
    cl_code = _PrefixCode(cl_lengths)
    if br.bits(1):  # max_symbol short-circuit
        length_nbits = 2 + 2 * br.bits(3)
        max_symbol = 2 + br.bits(length_nbits)
    else:
        max_symbol = alphabet_size
    lengths: dict[int, int] = {}
    prev = 8
    sym = 0
    while sym < alphabet_size and max_symbol > 0:
        max_symbol -= 1
        s = cl_code.read(br)
        if s < 16:
            if s:
                lengths[sym] = s
                prev = s
            sym += 1
        elif s == 16:
            for _ in range(3 + br.bits(2)):
                if sym < alphabet_size:
                    lengths[sym] = prev
                    sym += 1
        elif s == 17:
            sym += 3 + br.bits(3)
        else:  # 18
            sym += 11 + br.bits(7)
    return _PrefixCode(lengths)


def _write_prefix_code(bw: _BitWriter, freqs: "dict[int, int]") -> "dict[int, tuple[int, int]]":
    """Serialize a prefix code for ``freqs`` and return symbol ->
    (code, length) for payload writing."""
    syms = sorted(freqs)
    if len(syms) <= 2 and syms[-1] < 256:
        bw.write(1, 1)  # simple
        bw.write(len(syms) - 1, 1)
        bw.write(1, 1)  # always 8-bit first symbol
        bw.write(syms[0], 8)
        if len(syms) == 1:
            return {syms[0]: (0, 0)}
        bw.write(syms[1], 8)
        return {syms[0]: (0, 1), syms[1]: (1, 1)}
    bw.write(0, 1)  # normal code
    if len(syms) == 1:
        # degenerate: declare one length-1 symbol; both sides consume
        # 0 payload bits for it (see _PrefixCode)
        lengths = {syms[0]: 1}
    else:
        lengths = _canonical_lengths(freqs)
    max_sym = max(lengths)
    # code-length alphabet: literal lengths only (no RLE on the write
    # side — decode handles 16/17/18 from real encoders)
    cl_freq: dict[int, int] = {}
    for s in range(max_sym + 1):
        cl_freq[lengths.get(s, 0)] = cl_freq.get(lengths.get(s, 0), 0) + 1
    cl_lengths = (
        {next(iter(cl_freq)): 1}
        if len(cl_freq) == 1
        else _canonical_lengths(cl_freq, cap=7)
    )
    cl_codes = (
        {next(iter(cl_freq)): (0, 0)}
        if len(cl_freq) == 1
        else _canonical_codes(cl_lengths)
    )
    bw.write(15, 4)  # 4 + 15 = all 19 CL slots transmitted
    by_order = {s: i for i, s in enumerate(_CL_ORDER)}
    slots = [0] * 19
    for s, ln in cl_lengths.items():
        slots[by_order[s]] = ln
    for ln in slots:
        bw.write(ln, 3)
    # max_symbol short-circuit: stop after the last used symbol
    bw.write(1, 1)
    length_nbits = 14  # 2 + 2*6
    bw.write(6, 3)
    bw.write(max_sym + 1 - 2, length_nbits)
    for s in range(max_sym + 1):
        c, ln = cl_codes[lengths.get(s, 0)]
        bw.write_code(c, ln)
    if len(lengths) == 1:
        return {syms[0]: (0, 0)}
    return _canonical_codes(lengths)


# --- LZ77 prefix values ------------------------------------------------------

def _prefix_value(code: int, br: _BitReader) -> int:
    if code < 4:
        return code + 1
    xb = (code - 2) >> 1
    offset = (2 + (code & 1)) << xb
    return offset + br.bits(xb) + 1


def _prefix_encode(value: int) -> "tuple[int, int, int]":
    """value -> (code, extra_bits_value, extra_bits_count)."""
    if value <= 4:
        return value - 1, 0, 0
    v = value - 1
    xb = v.bit_length() - 2
    code = 2 * xb + ((v >> xb) & 1)
    rest = v & ((1 << xb) - 1)
    return code + 2, rest, xb

# --- predictor transform (RFC 9649 §4.1.1) ----------------------------------

def _avg2(a: int, b: int) -> int:
    """Per-channel (a + b) >> 1 over packed ARGB."""
    return (
        (((((a >> 24) & 0xFF) + ((b >> 24) & 0xFF)) >> 1) << 24)
        | (((((a >> 16) & 0xFF) + ((b >> 16) & 0xFF)) >> 1) << 16)
        | (((((a >> 8) & 0xFF) + ((b >> 8) & 0xFF)) >> 1) << 8)
        | (((a & 0xFF) + (b & 0xFF)) >> 1)
    )


def _predict(mode: int, left: int, top: int, tl: int, tr: int) -> int:
    """Predictor modes 0-13 — the full spec family: the linear modes
    0-10 (black/neighbor/Average2 combinations), 11 Select (Manhattan
    tie-break: ``pL < pT`` picks LEFT, ties go TOP — RFC 9649 §4.1.1,
    matching libwebp's ``pa_minus_pb <= 0 ? top : left``), 12
    ClampAddSubtractFull (per-channel ``clamp(L + T - TL)``), and 13
    ClampAddSubtractHalf (per-channel ``clamp(avg + (avg - TL) / 2)``
    with C-style TRUNCATING division of the possibly-negative delta).
    A mode byte above 13 is corrupt data, not a boundary."""
    if mode == 0:
        return 0xFF000000
    if mode == 1:
        return left
    if mode == 2:
        return top
    if mode == 3:
        return tr
    if mode == 4:
        return tl
    if mode == 5:
        return _avg2(_avg2(left, tr), top)
    if mode == 6:
        return _avg2(left, tl)
    if mode == 7:
        return _avg2(left, top)
    if mode == 8:
        return _avg2(tl, top)
    if mode == 9:
        return _avg2(top, tr)
    if mode == 10:
        return _avg2(_avg2(left, tl), _avg2(top, tr))
    if mode == 11:
        # P = L + T - TL per channel; pL = Manhattan(P, L) = sum|T-TL|,
        # pT = Manhattan(P, T) = sum|L-TL|; pL < pT -> L, else T.
        p_l = 0
        p_t = 0
        for s in (24, 16, 8, 0):
            tl_c = (tl >> s) & 0xFF
            p_l += abs(((top >> s) & 0xFF) - tl_c)
            p_t += abs(((left >> s) & 0xFF) - tl_c)
        return left if p_l < p_t else top
    if mode == 12:
        out = 0
        for s in (24, 16, 8, 0):
            v = ((left >> s) & 0xFF) + ((top >> s) & 0xFF) - ((tl >> s) & 0xFF)
            out |= (0 if v < 0 else (255 if v > 255 else v)) << s
        return out
    if mode == 13:
        out = 0
        for s in (24, 16, 8, 0):
            ave = (((left >> s) & 0xFF) + ((top >> s) & 0xFF)) >> 1
            d = ave - ((tl >> s) & 0xFF)
            # C (a - b) / 2 truncates toward zero; Python // floors
            v = ave + (d // 2 if d >= 0 else -((-d) // 2))
            out |= (0 if v < 0 else (255 if v > 255 else v)) << s
        return out
    raise ValueError(f"vp8l: predictor mode {mode} out of range (0-13)")


def _px_add(residual: int, pred: int) -> int:
    return (
        ((((residual >> 24) + (pred >> 24)) & 0xFF) << 24)
        | ((((residual >> 16) + (pred >> 16)) & 0xFF) << 16)
        | ((((residual >> 8) + (pred >> 8)) & 0xFF) << 8)
        | ((residual + pred) & 0xFF)
    )


def _px_sub(pixel: int, pred: int) -> int:
    return (
        ((((pixel >> 24) - (pred >> 24)) & 0xFF) << 24)
        | ((((pixel >> 16) - (pred >> 16)) & 0xFF) << 16)
        | ((((pixel >> 8) - (pred >> 8)) & 0xFF) << 8)
        | ((pixel - pred) & 0xFF)
    )


def _predictor_context(out: "list[int]", pos: int, w: int):
    """(left, top, tl, tr) for pixel ``pos`` in a contiguous buffer.
    TR of the last column wraps to the CURRENT row's first pixel —
    the contiguous-indexing behavior (pos - w + 1), already decoded."""
    return out[pos - 1], out[pos - w], out[pos - w - 1], out[pos - w + 1]


def _apply_predictor(
    px: "list[int]", w: int, modes: "list[int]", size_bits: int, tw: int,
    *, inverse: bool,
) -> "list[int]":
    """Forward (encode: pixel -> residual) or inverse (decode:
    residual -> pixel) predictor transform.  Edge rules: (0,0) predicts
    opaque black, the top row predicts L, the left column predicts T —
    whatever the tile mode says."""
    out = list(px)
    src = out if inverse else px  # prediction context is RECONSTRUCTED
    for pos in range(len(out)):
        x, y = pos % w, pos // w
        if pos == 0:
            pred = 0xFF000000
        elif y == 0:
            pred = src[pos - 1]
        elif x == 0:
            pred = src[pos - w]
        else:
            mode = modes[(y >> size_bits) * tw + (x >> size_bits)]
            pred = _predict(mode, *_predictor_context(src, pos, w))
        out[pos] = (
            _px_add(px[pos], pred) if inverse else _px_sub(px[pos], pred)
        )
    return out


# --- vectorized inverse transforms (decode hot path) -------------------------
#
# Decode-side transform inversion runs over the whole pixel plane as
# NumPy lane arithmetic on packed ARGB uint32 (r10 verdict #2: the
# per-pixel Python predictor dominated decode wall).  Predictor rows
# vectorize per tile-segment for the modes whose context is the row
# above (0/2/3/4/8/9) and as a per-channel modular cumsum for mode 1
# (left); only the left-dependent nonlinear modes (5/6/7/10/11/12/13)
# fall back to the scalar kernel, segment-local.

def _addpx_np(a, b):
    """Per-channel modular (mod 256) add over packed ARGB lanes."""
    lo = ((a & 0x00FF00FF) + (b & 0x00FF00FF)) & 0x00FF00FF
    hi = (((a >> 8) & 0x00FF00FF) + ((b >> 8) & 0x00FF00FF)) & 0x00FF00FF
    return (lo | (hi << 8)).astype(np.uint32)


def _avg2_np(a, b):
    """Per-channel (a + b) >> 1 over packed ARGB lanes (carry-free:
    (a & b) + ((a ^ b) >> 1 per lane))."""
    return ((a & b) + (((a ^ b) & 0xFEFEFEFE) >> 1)).astype(np.uint32)


def _row_cumsum_px(seg: np.ndarray, seed: int) -> np.ndarray:
    """Mode-1 (predict-left) inverse over a row segment: per-channel
    modular cumulative sum seeded by the reconstructed left pixel."""
    out = np.zeros(len(seg), np.uint32)
    for s in (24, 16, 8, 0):
        ch = (np.cumsum((seg >> s) & 0xFF, dtype=np.uint64) + ((seed >> s) & 0xFF)) & 0xFF
        out |= ch.astype(np.uint32) << s
    return out


def _inverse_predictor_np(
    A: np.ndarray, modes: "list[int]", size_bits: int, tw: int
) -> np.ndarray:
    """Inverse predictor transform over a packed (h, w) uint32 residual
    plane, in place.  Edge rules as in the scalar kernel: (0,0)
    predicts opaque black, row 0 predicts L, column 0 predicts T, and
    the last column's TR wraps to the CURRENT row's first pixel."""
    h, w = A.shape
    A[0] = _row_cumsum_px(A[0], 0xFF000000)
    for y in range(1, h):
        prev = A[y - 1]
        row = A[y]
        resid = row.copy()
        row[0] = _addpx_np(resid[0:1], prev[0:1])[0]
        trow = (y >> size_bits) * tw
        for tx in range(tw):
            xs = max(1, tx << size_bits)
            xe = min(w, (tx + 1) << size_bits)
            if xs >= xe:
                continue
            mode = modes[trow + tx]
            rs = resid[xs:xe]
            if mode == 0:
                row[xs:xe] = _addpx_np(rs, np.uint32(0xFF000000))
            elif mode == 1:
                row[xs:xe] = _row_cumsum_px(rs, int(row[xs - 1]))
            elif mode == 2:
                row[xs:xe] = _addpx_np(rs, prev[xs:xe])
            elif mode in (3, 9):
                tr = np.empty(xe - xs, np.uint32)
                if xe < w:
                    tr[:] = prev[xs + 1:xe + 1]
                else:
                    tr[:-1] = prev[xs + 1:w]
                    tr[-1] = row[0]
                pred = tr if mode == 3 else _avg2_np(prev[xs:xe], tr)
                row[xs:xe] = _addpx_np(rs, pred)
            elif mode == 4:
                row[xs:xe] = _addpx_np(rs, prev[xs - 1:xe - 1])
            elif mode == 8:
                row[xs:xe] = _addpx_np(
                    rs, _avg2_np(prev[xs - 1:xe - 1], prev[xs:xe])
                )
            elif mode <= 13:
                # left-dependent nonlinear family: scalar, segment-local
                seg = rs.tolist()
                top_l = prev[xs:xe].tolist()
                tl_l = prev[xs - 1:xe - 1].tolist()
                if xe < w:
                    tr_l = prev[xs + 1:xe + 1].tolist()
                else:
                    tr_l = prev[xs + 1:w].tolist()
                    tr_l.append(int(row[0]))
                left = int(row[xs - 1])
                out = []
                for i in range(xe - xs):
                    pred = _predict(mode, left, top_l[i], tl_l[i], tr_l[i])
                    left = _px_add(seg[i], pred)
                    out.append(left)
                row[xs:xe] = out
            else:
                raise ValueError(
                    f"vp8l: predictor mode {mode} out of range (0-13)"
                )
    return A


def _s8_np(x: np.ndarray) -> np.ndarray:
    """Reinterpret a 0..255 lane as two's-complement int8 (the spec's
    required conversion before ColorTransformDelta)."""
    return ((x.astype(np.int32) + 128) & 255) - 128


def _cross_color_np(
    A: np.ndarray, coeffs: "list[int]", size_bits: int, tw: int,
    *, inverse: bool,
) -> np.ndarray:
    """Cross-color transform (RFC 9649 §4.1.2) over a packed (h, w)
    uint32 plane: per-tile ColorTransformElements (green_to_red in the
    BLUE byte, green_to_blue in GREEN, red_to_blue in RED), deltas
    ``(int8(t) * int8(c)) >> 5`` with an arithmetic shift.  The r2b
    delta is computed from the ORIGINAL red in both directions (the
    inverse reconstructs red first).  Element-local, so fully
    vectorized — no sequential dependency."""
    h, w = A.shape
    th = (len(coeffs) + tw - 1) // tw
    C = np.asarray(coeffs, np.uint32).reshape(th, tw)
    grid = np.repeat(
        np.repeat(C, 1 << size_bits, axis=0), 1 << size_bits, axis=1
    )[:h, :w]
    g2r = _s8_np(grid & 0xFF)
    g2b = _s8_np((grid >> 8) & 0xFF)
    r2b = _s8_np((grid >> 16) & 0xFF)
    red = ((A >> 16) & 0xFF).astype(np.int32)
    green = ((A >> 8) & 0xFF).astype(np.int32)
    blue = (A & 0xFF).astype(np.int32)
    gs = _s8_np(green)
    if inverse:
        new_red = (red + ((g2r * gs) >> 5)) & 255
        new_blue = (
            blue + ((g2b * gs) >> 5) + ((r2b * _s8_np(new_red)) >> 5)
        ) & 255
    else:
        new_red = (red - ((g2r * gs) >> 5)) & 255
        new_blue = (
            blue - ((g2b * gs) >> 5) - ((r2b * _s8_np(red)) >> 5)
        ) & 255
    return (
        (A & np.uint32(0xFF00FF00))
        | (new_red.astype(np.uint32) << 16)
        | new_blue.astype(np.uint32)
    )


# --- entropy-coded image (RFC 9649 §4.2.2) ----------------------------------

_GREEN_BASE = 256 + 24  # literals + length prefix codes


def _cache_key(argb: int, bits: int) -> int:
    return ((0x1E35A7BD * argb) & 0xFFFFFFFF) >> (32 - bits)


def _read_group(br: _BitReader, cache_size: int) -> "list[_PrefixCode]":
    sizes = (_GREEN_BASE + cache_size, 256, 256, 256, 40)
    return [_read_prefix_code(br, s) for s in sizes]


def _decode_image_stream(
    br: _BitReader, w: int, h: int, *, level0: bool
):
    """Decode one entropy-coded image.  Sub-images (meta/palette/tile,
    level0=False) return ``(argb pixel list, w, h)``; the level-0 call
    reads transforms, applies them inversely as vectorized NumPy plane
    ops, and returns ``(packed (h, w) uint32 ndarray, w, h)`` with the
    FINAL dimensions."""
    transforms = []
    final_w = w
    if level0:
        seen = set()
        while br.bits(1):
            t = br.bits(2)
            if t in seen:
                raise ValueError(f"vp8l: transform {t} repeated")
            seen.add(t)
            if t == 0:  # predictor transform: tile-mode sub-image
                size_bits = br.bits(3) + 2
                tw = (w + (1 << size_bits) - 1) >> size_bits
                th = (h + (1 << size_bits) - 1) >> size_bits
                tile_px, _tw2, _th2 = _decode_image_stream(
                    br, tw, th, level0=False
                )
                modes = [(p >> 8) & 0xFF for p in tile_px]  # green channel
                transforms.append(("predictor", modes, size_bits, tw))
            elif t == 1:  # cross-color: tile ColorTransformElements
                size_bits = br.bits(3) + 2
                tw = (w + (1 << size_bits) - 1) >> size_bits
                th = (h + (1 << size_bits) - 1) >> size_bits
                tile_px, _tw2, _th2 = _decode_image_stream(
                    br, tw, th, level0=False
                )
                coeffs = [p & 0xFFFFFF for p in tile_px]
                transforms.append(("cross_color", coeffs, size_bits, tw))
            elif t == 2:  # subtract green: no payload
                transforms.append(("subtract_green",))
            else:  # color indexing
                n_colors = br.bits(8) + 1
                pal_px, _pw, _ph = _decode_image_stream(
                    br, n_colors, 1, level0=False
                )
                palette = []
                prev = 0
                for p in pal_px:
                    # component-wise delta from the previous entry
                    s = (
                        (((p >> 24) + (prev >> 24)) & 0xFF) << 24
                        | (((p >> 16) + (prev >> 16)) & 0xFF) << 16
                        | (((p >> 8) + (prev >> 8)) & 0xFF) << 8
                        | ((p + prev) & 0xFF)
                    )
                    palette.append(s)
                    prev = s
                if n_colors <= 2:
                    wbits = 3
                elif n_colors <= 4:
                    wbits = 2
                elif n_colors <= 16:
                    wbits = 1
                else:
                    wbits = 0
                transforms.append(("color_index", palette, wbits))
                w = (w + (1 << wbits) - 1) >> wbits  # bundled sub-width
    cache_bits = br.bits(4) if br.bits(1) else 0
    if cache_bits > 11:
        raise ValueError(f"vp8l: color cache bits {cache_bits} > 11")
    cache_size = (1 << cache_bits) if cache_bits else 0
    ck_shift = 32 - cache_bits if cache_bits else 0
    meta = None
    meta_bits = 0
    n_groups = 1
    if level0 and br.bits(1):  # meta prefix image
        meta_bits = 2 + br.bits(3)
        mw = (w + (1 << meta_bits) - 1) >> meta_bits
        mh = (h + (1 << meta_bits) - 1) >> meta_bits
        meta_px, _w2, _h2 = _decode_image_stream(br, mw, mh, level0=False)
        meta = [((p >> 8) & 0xFFFF) for p in meta_px]  # (red<<8)|green
        n_groups = max(meta) + 1
    groups = [_read_group(br, cache_size) for _ in range(n_groups)]
    cache = [0] * cache_size
    px: "list[int]" = []
    append = px.append
    total = w * h
    mw = ((w + (1 << meta_bits) - 1) >> meta_bits) if meta else 0
    g = groups[0]
    g0, g1, g2, g3, g4 = g
    n = 0
    while n < total:
        if meta is not None:
            x, y = n % w, n // w
            g = groups[meta[(y >> meta_bits) * mw + (x >> meta_bits)]]
            g0, g1, g2, g3, g4 = g
        s = g0.read(br)
        if s < 256:
            r = g1.read(br)
            b = g2.read(br)
            a = g3.read(br)
            p = (a << 24) | (r << 16) | (s << 8) | b
            append(p)
            n += 1
            if cache_size:
                cache[((0x1E35A7BD * p) & 0xFFFFFFFF) >> ck_shift] = p
        elif s < _GREEN_BASE:
            length = _prefix_value(s - 256, br)
            dist_code = _prefix_value(g4.read(br), br)
            if dist_code <= 120:
                dx, dy = _DIST_MAP[dist_code - 1]
                dist = max(1, dx + dy * w)
            else:
                dist = dist_code - 120
            if dist > n:
                raise ValueError("vp8l: back-reference before image start")
            if n + length > total:
                raise ValueError("vp8l: back-reference overruns the image")
            if dist >= length:
                seg = px[n - dist:n - dist + length]
            else:  # overlapping run: the source repeats with period dist
                pattern = px[n - dist:]
                seg = (pattern * (-(-length // dist)))[:length]
            px.extend(seg)
            n += length
            if cache_size:
                for p in seg:
                    cache[((0x1E35A7BD * p) & 0xFFFFFFFF) >> ck_shift] = p
        else:
            if s - _GREEN_BASE >= cache_size:
                raise ValueError("vp8l: color cache index out of range")
            append(cache[s - _GREEN_BASE])
            n += 1
    if not level0:
        return px, w, h
    # inverse transforms as NumPy plane ops, in reverse read order
    A = np.array(px, dtype=np.uint32).reshape(h, w)
    for t in reversed(transforms):
        if t[0] == "predictor":
            _, modes, size_bits, tw = t
            A = _inverse_predictor_np(A, modes, size_bits, tw)
        elif t[0] == "cross_color":
            _, coeffs, size_bits, tw = t
            A = _cross_color_np(A, coeffs, size_bits, tw, inverse=True)
        elif t[0] == "subtract_green":
            green = (A >> 8) & 0xFF
            red = (((A >> 16) & 0xFF) + green) & 0xFF
            blue = ((A & 0xFF) + green) & 0xFF
            A = (A & np.uint32(0xFF00FF00)) | (red << 16) | blue
        else:  # color_index
            _, palette, wbits = t
            ibits = 8 >> wbits
            mask = (1 << ibits) - 1
            xs = np.arange(final_w)
            src = (A[:, xs >> wbits] >> 8) & 0xFF  # green holds indices
            idx = (src >> ((xs & ((1 << wbits) - 1)) * ibits)[None, :]) & mask
            if int(idx.max(initial=0)) >= len(palette):
                raise ValueError("vp8l: palette index out of range")
            A = np.asarray(palette, dtype=np.uint32)[idx]
            w = final_w
    return A, w, h


# --- container ---------------------------------------------------------------

def decode_vp8l_payload(
    payload: bytes, *, max_pixels: int = 1 << 24
) -> "tuple[np.ndarray, int, int]":
    """A bare VP8L chunk payload (signature byte + 14+14-bit dims +
    image stream) -> (flat uint32 ARGB array, w, h).  Split out of
    ``decode_webp_vp8l`` (r12) so the extended-container and lossy
    alpha paths share one stream decoder."""
    if not payload or payload[0] != 0x2F:
        raise ValueError("webp: bad VP8L signature byte")
    br = _BitReader(payload[1:])
    w = br.bits(14) + 1
    h = br.bits(14) + 1
    br.bits(1)  # alpha hint
    if br.bits(3) != 0:
        raise ValueError("webp: unknown VP8L version")
    if w * h > max_pixels:
        raise NotImplementedError(
            f"vp8l: {w}x{h} exceeds the decoder's {max_pixels}-pixel "
            "cap (decompression-bomb guard)"
        )
    return _decode_image_stream(br, w, h, level0=True)


def decode_vp8l_alpha_stream(
    data: bytes, w: int, h: int, *, max_pixels: int = 1 << 24
) -> np.ndarray:
    """A HEADERLESS VP8L image stream (the lossy-WebP ALPH chunk's
    compression method 1: no signature byte, no dims — they come from
    the VP8 frame header) -> (h, w) uint8 alpha plane taken from the
    GREEN channel, per the WebP container spec's alpha section."""
    if w * h > max_pixels:
        raise NotImplementedError(
            f"vp8l-alpha: {w}x{h} exceeds the {max_pixels}-pixel cap"
        )
    arr, w2, _h2 = _decode_image_stream(_BitReader(data), w, h, level0=True)
    if w2 != w:
        raise ValueError("vp8l-alpha: color-indexing changed the width")
    return ((arr >> 8) & 0xFF).astype(np.uint8).reshape(h, w)


def decode_webp_vp8l(content: bytes, *, max_pixels: int = 1 << 24) -> np.ndarray:
    """RIFF/WEBP VP8L bytes -> (H, W, 3) uint8 RGB for fully-opaque
    images, (H, W, 4) RGBA when any pixel carries alpha (lossless WebP
    is the usual PNG replacement, so alpha is common).  Lossy VP8 /
    extended VP8X raise by name.

    ``max_pixels`` (default 16.7M ~ 16 MP) is a decompression-bomb
    guard, the same defense PIL ships: a corrupt or hostile header can
    declare 16384x16384 dims over a degenerate zero-bit-per-pixel
    stream, turning decode into unbounded work.  Over-cap images raise
    NotImplementedError by name (a capability bound of the vendored
    pure-Python codec, not corrupt data)."""
    if content[:4] != b"RIFF" or content[8:12] != b"WEBP":
        raise ValueError("webp: missing RIFF/WEBP header")
    fourcc = content[12:16]
    if fourcc == b"VP8 ":
        raise NotImplementedError(
            "webp: VP8 (lossy) decode is not supported; VP8L lossless is"
        )
    if fourcc == b"VP8X":
        # extended container (round 11): walk the RIFF chunks for a
        # top-level lossless VP8L stream — the still-image-with-
        # metadata layout real encoders emit (cwebp -lossless -metadata
        # …).  Lossy VP8 payloads and ANMF-animated files stay the
        # named boundary.
        pos = 12
        payload = None
        saw = []
        while pos + 8 <= len(content):
            fc = content[pos:pos + 4]
            size = int.from_bytes(content[pos + 4:pos + 8], "little")
            body = content[pos + 8:pos + 8 + size]
            if len(body) != size:
                raise ValueError("webp: chunk overruns the file")
            if fc == b"VP8L":
                payload = body
                break
            saw.append(fc.decode("latin-1").strip())
            pos += 8 + size + (size & 1)
        if payload is None:
            raise NotImplementedError(
                "webp: VP8X without a top-level VP8L chunk "
                f"(saw {saw}) — lossy VP8 and ANMF animation are not "
                "supported; extended-wrapped VP8L is"
            )
    elif fourcc != b"VP8L":
        raise ValueError(f"webp: unknown chunk {fourcc!r}")
    else:
        size = int.from_bytes(content[16:20], "little")
        payload = content[20:20 + size]
        if len(payload) != size:
            raise ValueError("webp: VP8L chunk overruns the file")
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


def _emit_tokens(
    bw: _BitWriter, tokens: list, cache_bits: int
) -> None:
    """Count symbol frequencies, serialize the five prefix codes, then
    the token payload.  tokens: ('lit', argb) | ('copy', length, dist_code)
    | ('cache', index)."""
    cache_size = (1 << cache_bits) if cache_bits else 0
    freqs = [dict() for _ in range(5)]

    def bump(i, s):
        freqs[i][s] = freqs[i].get(s, 0) + 1

    plan = []
    for t in tokens:
        if t[0] == "lit":
            p = t[1]
            g, r, b, a = (p >> 8) & 0xFF, (p >> 16) & 0xFF, p & 0xFF, (p >> 24) & 0xFF
            bump(0, g), bump(1, r), bump(2, b), bump(3, a)
            plan.append(("lit", g, r, b, a))
        elif t[0] == "copy":
            lc, lx, lxb = _prefix_encode(t[1])
            dc, dx, dxb = _prefix_encode(t[2])
            bump(0, 256 + lc), bump(4, dc)
            plan.append(("copy", 256 + lc, lx, lxb, dc, dx, dxb))
        else:
            bump(0, _GREEN_BASE + t[1])
            plan.append(("cache", _GREEN_BASE + t[1]))
    # every alphabet needs at least one symbol for a valid code
    for i, default in ((1, 0), (2, 0), (3, 255), (4, 0)):
        if not freqs[i]:
            freqs[i][default] = 1
    codes = [_write_prefix_code(bw, f) for f in freqs]
    for t in plan:
        if t[0] == "lit":
            _, g, r, b, a = t
            bw.write_code(*codes[0][g])
            bw.write_code(*codes[1][r])
            bw.write_code(*codes[2][b])
            bw.write_code(*codes[3][a])
        elif t[0] == "copy":
            _, gs, lx, lxb, dc, dx, dxb = t
            bw.write_code(*codes[0][gs])
            bw.write(lx, lxb)
            bw.write_code(*codes[4][dc])
            bw.write(dx, dxb)
        else:
            bw.write_code(*codes[0][t[1]])


def _tokenize(px: "list[int]", w: int, cache_bits: int) -> list:
    """Greedy LZ77 over the pixel list: runs equal to the left neighbor
    (dist 1 -> map code 2) or the pixel above (dist w -> map code 1),
    color-cache hits when enabled, literals otherwise.  Also emits one
    plain (code > 120) distance per image when a long left-run exists,
    so both distance forms are exercised."""
    cache_size = (1 << cache_bits) if cache_bits else 0
    cache = [None] * cache_size
    tokens = []
    i = 0
    used_plain = False
    n = len(px)
    while i < n:
        # longest run matching distance 1 (left) or w (above)
        best_len, best_dist = 0, 0
        for dist in (1, w):
            if dist == 0 or i < dist:
                continue
            ln = 0
            while i + ln < n and ln < 4096 and px[i + ln] == px[i + ln - dist]:
                ln += 1
            if ln > best_len:
                best_len, best_dist = ln, dist
        if best_len >= 3:
            if best_dist == 1:
                if used_plain:
                    code = 2  # (1, 0) is map entry 2
                else:
                    code = best_dist + 120  # plain form, once per image
                    used_plain = True
            else:
                code = 1  # (0, 1) is map entry 1
            for j in range(i, i + best_len):
                if cache_size:
                    cache[_cache_key(px[j], cache_bits)] = px[j]
            tokens.append(("copy", best_len, code))
            i += best_len
            continue
        p = px[i]
        if cache_size and cache[_cache_key(p, cache_bits)] == p:
            tokens.append(("cache", _cache_key(p, cache_bits)))
        else:
            tokens.append(("lit", p))
            if cache_size:
                cache[_cache_key(p, cache_bits)] = p
        i += 1
    return tokens


def encode_webp_vp8l(
    pixels: np.ndarray,
    *,
    subtract_green: bool = False,
    palette: bool = False,
    predictor: bool = False,
    predictor_size_bits: int = 4,
    cross_color: bool = False,
    cache_bits: int = 0,
    extended: bool = False,
) -> bytes:
    """Fixture-side VP8L encoder: (H, W, 3) RGB or (H, W, 4) RGBA
    uint8 -> RIFF/WEBP bytes.  Optional transforms — subtract-green,
    cross-color (per-tile deterministic ColorTransformElements),
    predictor (tile modes cycling the FULL family 0-13), and
    color-indexing (palette with bundling when <=16 colors; exclusive
    with the others, as real encoders treat it) — freely combinable
    plus a color cache; LZ77 runs against the left/above neighbors
    exercise both distance-code forms.  Transforms are signalled in
    stream order subtract-green, cross-color, predictor and applied
    forward in that same order, so the decoder's reverse-order inverse
    unwinds them exactly.  Output decodes bit-exactly with
    :func:`decode_webp_vp8l` (and any spec decoder)."""
    if (
        pixels.ndim != 3
        or pixels.shape[2] not in (3, 4)
        or pixels.dtype != np.uint8
    ):
        raise ValueError("encode_webp_vp8l wants (H, W, 3|4) uint8")
    h, w = pixels.shape[:2]
    has_alpha = pixels.shape[2] == 4
    if not (1 <= w <= 16384 and 1 <= h <= 16384):
        raise ValueError("vp8l: dimensions must be 1..16384")
    px = [
        ((int(pixels[y, x, 3]) if has_alpha else 0xFF) << 24)
        | (int(pixels[y, x, 0]) << 16)
        | (int(pixels[y, x, 1]) << 8)
        | int(pixels[y, x, 2])
        for y in range(h)
        for x in range(w)
    ]
    bw = _BitWriter()
    bw.write(0x2F, 8)
    bw.write(w - 1, 14)
    bw.write(h - 1, 14)
    bw.write(1 if has_alpha else 0, 1)  # alpha hint
    bw.write(0, 3)  # version
    enc_w = w
    if palette and (subtract_green or predictor or cross_color):
        raise ValueError(
            "fixture encoder: palette excludes the other transforms"
        )
    if subtract_green:
        bw.write(1, 1)
        bw.write(2, 2)
        px = [
            (p & 0xFF000000)
            | ((((p >> 16) - (p >> 8)) & 0xFF) << 16)
            | (p & 0xFF00)
            | ((p - (p >> 8)) & 0xFF)
            for p in px
        ]
    if cross_color:
        size_bits = 4  # 16x16 tiles
        tw = (w + 15) >> 4
        th = (h + 15) >> 4
        # deterministic per-tile elements: r2b<<16 | g2b<<8 | g2r
        coeffs = [
            (((i * 41 + 11) & 0xFF) << 16)
            | (((i * 29 + 7) & 0xFF) << 8)
            | ((i * 17 + 3) & 0xFF)
            for i in range(tw * th)
        ]
        bw.write(1, 1)
        bw.write(1, 2)
        bw.write(size_bits - 2, 3)
        bw.write(0, 1)  # tile image: no color cache
        _emit_tokens(bw, [("lit", (0xFF << 24) | c) for c in coeffs], 0)
        arr = np.array(px, dtype=np.uint32).reshape(h, w)
        arr = _cross_color_np(arr, coeffs, size_bits, tw, inverse=False)
        px = [int(p) for p in arr.reshape(-1)]
    if predictor:
        size_bits = predictor_size_bits  # default 16x16 tiles
        if not 2 <= size_bits <= 9:
            raise ValueError("vp8l: predictor_size_bits must be 2..9")
        tw = (w + (1 << size_bits) - 1) >> size_bits
        th = (h + (1 << size_bits) - 1) >> size_bits
        # tile modes cycle through the full spec family 0..13
        modes = [(i * 7 + 3) % 14 for i in range(tw * th)]
        bw.write(1, 1)
        bw.write(0, 2)
        bw.write(size_bits - 2, 3)
        bw.write(0, 1)  # tile image: no color cache
        _emit_tokens(
            bw, [("lit", (0xFF << 24) | (m << 8)) for m in modes], 0
        )
        px = _apply_predictor(px, w, modes, size_bits, tw, inverse=False)
    if palette:
        colors = sorted(set(px))
        if len(colors) > 256:
            raise ValueError("palette fixture needs <= 256 distinct colors")
        lookup = {c: i for i, c in enumerate(colors)}
        bw.write(1, 1)
        bw.write(3, 2)
        bw.write(len(colors) - 1, 8)
        # delta-coded palette as its own entropy image (no cache)
        deltas = []
        prev = 0
        for c in colors:
            deltas.append(
                (((c >> 24) - (prev >> 24)) & 0xFF) << 24
                | (((c >> 16) - (prev >> 16)) & 0xFF) << 16
                | (((c >> 8) - (prev >> 8)) & 0xFF) << 8
                | ((c - prev) & 0xFF)
            )
            prev = c
        bw.write(0, 1)  # palette image: no color cache
        _emit_tokens(bw, [("lit", d) for d in deltas], 0)
        n_colors = len(colors)
        if n_colors <= 2:
            wbits = 3
        elif n_colors <= 4:
            wbits = 2
        elif n_colors <= 16:
            wbits = 1
        else:
            wbits = 0
        enc_w = (w + (1 << wbits) - 1) >> wbits
        ibits = 8 >> wbits
        packed = []
        for y in range(h):
            row = px[y * w:(y + 1) * w]
            for bx in range(enc_w):
                g = 0
                for k in range(1 << wbits):
                    x = (bx << wbits) + k
                    if x < w:
                        g |= lookup[row[x]] << (k * ibits)
                packed.append((0xFF << 24) | (g << 8))
            # (alpha 255, red 0, blue 0 — only green carries indices)
        px = packed
    bw.write(0, 1)  # end of transforms
    if cache_bits:
        bw.write(1, 1)
        bw.write(cache_bits, 4)
    else:
        bw.write(0, 1)
    bw.write(0, 1)  # no meta prefix image
    _emit_tokens(bw, _tokenize(px, enc_w, cache_bits), cache_bits)
    payload = b"\x2f"[:0] + bytes(bw.buf)  # signature already in stream
    chunk = b"VP8L" + len(payload).to_bytes(4, "little") + payload
    if len(payload) & 1:
        chunk += b"\x00"  # RIFF even padding
    if extended:
        flags = (1 << 4) if has_alpha else 0
        vp8x = (
            bytes([flags, 0, 0, 0])
            + (w - 1).to_bytes(3, "little")
            + (h - 1).to_bytes(3, "little")
        )
        chunk = (
            b"VP8X" + len(vp8x).to_bytes(4, "little") + vp8x + chunk
        )
    return b"RIFF" + (4 + len(chunk)).to_bytes(4, "little") + b"WEBP" + chunk
