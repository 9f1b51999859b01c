"""Vendored WebP VP8L (lossless) codec — pure Python, no DCT.

VP8L is the lossless half of WebP (public spec: "WebP Lossless
Bitstream Specification", RFC 9649 §4; container §2): an LSB-first
bitstream of canonical prefix (Huffman) codes driving an LZ77 decoder
over ARGB pixels, with optional per-image transforms.  Same vendoring
pattern as the JPEG (jpegcodec.py) and FLAC (flaccodec.py) codecs:
``encode_webp_vp8l`` is the fixture-side twin, ``decode_webp_vp8l``
the real decoder, and everything outside the supported set raises
``NotImplementedError`` by name.

Supported (round 10):

- RIFF/WEBP container with a VP8L chunk; 14+14-bit dimensions;
- prefix codes in BOTH forms — simple (1-2 symbols) and normal
  (code-length code over the 19-symbol kCodeLengthCodeOrder with the
  16/17/18 repeat codes and the optional max_symbol short-circuit);
- LZ77 back-references: length/distance prefix values, the 120-entry
  2D neighbor distance map, and plain (code-120) distances;
- color cache (hash 0x1e35a7bd, 1..11 bits) for literals AND copied
  pixels;
- meta prefix images (spatial Huffman-group switching at level 0);
- transforms: SUBTRACT_GREEN, COLOR_INDEXING (palette, including the
  mandatory pixel bundling at <=16 colors, delta-coded palette), and
  the PREDICTOR transform's linear family — tile-mode sub-image +
  modes 0-10 (black / L / T / TR / TL / the four Average2 pairs /
  double-average), with the spec edge rules (top row predicts L, left
  column predicts T, origin predicts opaque black, last-column TR
  wraps to the current row's first pixel by buffer contiguity).

Named boundaries: predictor modes 11-13 (Select /
ClampAddSubtractFull / -Half — their tie-break and clamping details
are where silent misdecodes hide) and the CROSS-COLOR transform
raise by name, as does the lossy VP8 codec (a full DCT predictor,
out of the vendored-codec family's scope).

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
    """LSB-first bit reader over the VP8L payload."""

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0  # bit position

    def bits(self, n: int) -> int:
        out = 0
        for i in range(n):
            byte = self.pos >> 3
            if byte >= len(self.data):
                raise ValueError("vp8l: bitstream overrun")
            out |= ((self.data[byte] >> (self.pos & 7)) & 1) << i
            self.pos += 1
        return out


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


class _PrefixCode:
    """Canonical prefix decoder: (length, code) -> symbol.  A code with
    a SINGLE used symbol consumes 0 bits (degenerate trees per the
    reference decoder's table builder), whatever length it declared —
    the fixture encoder emits matching 0-bit codes."""

    def __init__(self, lengths: "dict[int, int]"):
        # lengths: symbol -> code length (>0)
        if not lengths:
            raise ValueError("vp8l: empty prefix code")
        if len(lengths) == 1:
            self.single = next(iter(lengths))
            self.table: dict = {}
            return
        self.single = None
        self.table = {}
        code = 0
        for ln in range(1, max(lengths.values()) + 1):
            for sym in sorted(s for s, v in lengths.items() if v == ln):
                self.table[(ln, code)] = sym
                code += 1
            code <<= 1

    def read(self, br: _BitReader) -> int:
        if self.single is not None:
            return self.single
        code = 0
        for ln in range(1, 16):
            code = (code << 1) | br.bits(1)
            sym = self.table.get((ln, code))
            if sym is not None:
                return sym
        raise ValueError("vp8l: invalid prefix code in stream")


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
    """Predictor modes 0-10 — the linear family (black/neighbor/
    Average2 combinations), arithmetically unambiguous in the spec.
    Modes 11-13 (Select / ClampAddSubtractFull / -Half) raise by name:
    their tie-break and clamping details are where silent misdecodes
    hide, so they stay an explicit boundary."""
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
    raise NotImplementedError(
        f"vp8l: predictor mode {mode} (Select/ClampAddSubtract) is not "
        "supported; the linear modes 0-10 are"
    )


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


# --- entropy-coded image (RFC 9649 §4.2.2) ----------------------------------

_GREEN_BASE = 256 + 24  # literals + length prefix codes


def _cache_key(argb: int, bits: int) -> int:
    return ((0x1E35A7BD * argb) & 0xFFFFFFFF) >> (32 - bits)


def _read_group(br: _BitReader, cache_size: int) -> "list[_PrefixCode]":
    sizes = (_GREEN_BASE + cache_size, 256, 256, 256, 40)
    return [_read_prefix_code(br, s) for s in sizes]


def _decode_image_stream(
    br: _BitReader, w: int, h: int, *, level0: bool
) -> "tuple[list[int], int, int]":
    """Decode one entropy-coded image -> (argb pixel list, w, h).
    At level 0, transforms are read (and applied inversely) here; the
    returned (w, h) are the FINAL dimensions after inverse transforms.
    Sub-images (meta/palette) recurse with level0=False."""
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
            elif t == 2:  # subtract green: no payload
                transforms.append(("subtract_green",))
            elif t == 3:  # color indexing
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
            else:
                raise NotImplementedError(
                    "vp8l: the CROSS_COLOR transform is not supported "
                    "(predictor, subtract-green, and color-indexing are)"
                )
    cache_bits = br.bits(4) if br.bits(1) else 0
    if cache_bits > 11:
        raise ValueError(f"vp8l: color cache bits {cache_bits} > 11")
    cache_size = (1 << cache_bits) if cache_bits else 0
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
    total = w * h
    mw = ((w + (1 << meta_bits) - 1) >> meta_bits) if meta else 0
    while len(px) < total:
        if meta is not None:
            x, y = len(px) % w, len(px) // w
            g = groups[meta[(y >> meta_bits) * mw + (x >> meta_bits)]]
        else:
            g = groups[0]
        s = g[0].read(br)
        if s < 256:
            r = g[1].read(br)
            b = g[2].read(br)
            a = g[3].read(br)
            p = (a << 24) | (r << 16) | (s << 8) | b
            px.append(p)
            if cache_size:
                cache[_cache_key(p, cache_bits)] = p
        elif s < _GREEN_BASE:
            length = _prefix_value(s - 256, br)
            dist_code = _prefix_value(g[4].read(br), br)
            if dist_code <= 120:
                dx, dy = _DIST_MAP[dist_code - 1]
                dist = max(1, dx + dy * w)
            else:
                dist = dist_code - 120
            if dist > len(px):
                raise ValueError("vp8l: back-reference before image start")
            for _ in range(length):
                p = px[-dist]
                px.append(p)
                if cache_size:
                    cache[_cache_key(p, cache_bits)] = p
            if len(px) > total:
                raise ValueError("vp8l: back-reference overruns the image")
        else:
            if s - _GREEN_BASE >= cache_size:
                raise ValueError("vp8l: color cache index out of range")
            px.append(cache[s - _GREEN_BASE])
    # inverse transforms, in reverse read order
    for t in reversed(transforms):
        if t[0] == "predictor":
            _, modes, size_bits, tw = t
            px = _apply_predictor(
                px, w, modes, size_bits, tw, inverse=True
            )
        elif t[0] == "subtract_green":
            px = [
                (p & 0xFF000000)
                | ((((p >> 16) + (p >> 8)) & 0xFF) << 16)
                | (p & 0xFF00)
                | ((p + (p >> 8)) & 0xFF)
                for p in px
            ]
        else:  # color_index
            _, palette, wbits = t
            ibits = 8 >> wbits
            mask = (1 << ibits) - 1
            out = []
            for y in range(h):
                row = px[y * w:(y + 1) * w]
                for x in range(final_w):
                    packed = (row[x >> wbits] >> 8) & 0xFF  # green holds it
                    idx = (packed >> ((x & ((1 << wbits) - 1)) * ibits)) & mask
                    if idx >= len(palette):
                        raise ValueError("vp8l: palette index out of range")
                    out.append(palette[idx])
            px = out
            w = final_w
    return px, w, h


# --- container ---------------------------------------------------------------

def decode_webp_vp8l(content: bytes) -> np.ndarray:
    """RIFF/WEBP VP8L bytes -> (H, W, 3) uint8 RGB for fully-opaque
    images, (H, W, 4) RGBA when any pixel carries alpha (lossless WebP
    is the usual PNG replacement, so alpha is common).  Lossy VP8 /
    extended VP8X raise by name."""
    if content[:4] != b"RIFF" or content[8:12] != b"WEBP":
        raise ValueError("webp: missing RIFF/WEBP header")
    fourcc = content[12:16]
    if fourcc in (b"VP8 ", b"VP8X"):
        raise NotImplementedError(
            f"webp: {fourcc.decode().strip()} (lossy/extended) decode is "
            "not supported; VP8L lossless is"
        )
    if fourcc != b"VP8L":
        raise ValueError(f"webp: unknown chunk {fourcc!r}")
    size = int.from_bytes(content[16:20], "little")
    payload = content[20:20 + size]
    if len(payload) != size:
        raise ValueError("webp: VP8L chunk overruns the file")
    if payload[0] != 0x2F:
        raise ValueError("webp: bad VP8L signature byte")
    br = _BitReader(payload[1:])
    w = br.bits(14) + 1
    h = br.bits(14) + 1
    br.bits(1)  # alpha hint
    if br.bits(3) != 0:
        raise ValueError("webp: unknown VP8L version")
    px, w, h = _decode_image_stream(br, w, h, level0=True)
    arr = np.array(px, dtype=np.uint32).reshape(h, w)
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
    cache_bits: int = 0,
) -> bytes:
    """Fixture-side VP8L encoder: (H, W, 3) RGB or (H, W, 4) RGBA
    uint8 -> RIFF/WEBP bytes.  Optional subtract-green transform,
    color-indexing transform (palette with bundling when <=16 colors),
    and color cache; LZ77 runs against the left/above neighbors
    exercise both distance-code forms.  Output decodes bit-exactly
    with :func:`decode_webp_vp8l` (and any spec decoder)."""
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
    if sum((subtract_green, palette, predictor)) > 1:
        raise ValueError("fixture encoder: pick one transform per blob")
    if predictor:
        size_bits = 4  # 16x16 tiles
        tw = (w + 15) >> 4
        th = (h + 15) >> 4
        # tile modes cycle through the full supported family 0..10
        modes = [(i * 7 + 3) % 11 for i in range(tw * th)]
        bw.write(1, 1)
        bw.write(0, 2)
        bw.write(size_bits - 2, 3)
        bw.write(0, 1)  # tile image: no color cache
        _emit_tokens(
            bw, [("lit", (0xFF << 24) | (m << 8)) for m in modes], 0
        )
        px = _apply_predictor(px, w, modes, size_bits, tw, inverse=False)
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
    elif palette:
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
    return b"RIFF" + (4 + len(chunk)).to_bytes(4, "little") + b"WEBP" + chunk
