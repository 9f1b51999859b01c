"""Pure-NumPy baseline JPEG codec (no external dependencies).

The sandbox has no PIL/libjpeg, but JPEG is the dominant real-world
format for the reference's scanned-card corpus (S8; indizierung
notebook inputs are JPEG/TIFF scans), so the engine vendors a minimal
BASELINE SEQUENTIAL codec implemented from the public JPEG standard
(ITU-T T.81 / ISO 10918-1) — the same public spec every libjpeg
implements:

- ``decode_baseline_jpeg``: marker parse (DQT/SOF0/SOF1/SOF2/DHT/DRI/
  SOS), table-driven canonical Huffman decode with byte-unstuffing and
  restart-marker support, dequantize + inverse zigzag + 8x8 IDCT-III,
  chroma upsampling for sampling factors in {1, 2} (4:4:4 / 4:2:2 /
  4:2:0), JFIF YCbCr -> RGB.  PROGRESSIVE (SOF2) streams decode for
  real since round 5 (T.81 Annex G: spectral selection + successive
  approximation, DC/AC first + refinement scans, EOB runs) —
  coefficients accumulate across scans and reconstruct once at EOI.
  Arithmetic coding, lossless/hierarchical modes, and 12-bit precision
  raise ``NotImplementedError`` — dispatch then falls through to PIL
  when installed (operators/multimodal.py).
- ``encode_baseline_jpeg``: the inverse pipeline with the standard
  Annex K quantization + Huffman tables (quality-scaled the libjpeg
  way), 4:4:4 or 4:2:0, optional restart intervals.  Exists so tests
  can create REAL JPEG fixtures in a container with no encoder, and
  round-trip (encode -> decode ~= original within quantization error)
  validates both directions against each other.
- ``encode_progressive_jpeg``: SOF2 encoder with a libjpeg-style scan
  script (DC-first with point transform, spectral AC bands, two AC
  refinement passes, DC refinement) so progressive fixtures — and the
  mm_jpeg_progressive_real oracle — exercise every Annex G decode
  path including EOBn run symbols (a universal 256-symbol AC Huffman
  table is emitted because the Annex K tables lack EOBn codes).

Throughput: a few ms per small image (python block loop) — honest
"real codec, not fast codec".  The Spark integration stays Arrow-
batched mapInPandas either way; production deployments with PIL get
libjpeg speed through the same dispatch seam.
"""

from __future__ import annotations

import struct

import numpy as np

# zig-zag scan order: position i in the coded sequence is flat index
# ZIGZAG[i] of the row-major 8x8 block (T.81 Figure 5)
ZIGZAG = np.array([
    0, 1, 8, 16, 9, 2, 3, 10,
    17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63,
], dtype=np.int64)

# Annex K quantization tables (luminance / chrominance)
QT_LUMA = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
], dtype=np.int64)
QT_CHROMA = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
], dtype=np.int64)

# Annex K Huffman specs: (bits[1..16], values)
HUFF_DC_LUMA = ([0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
                list(range(12)))
HUFF_DC_CHROMA = ([0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
                  list(range(12)))
HUFF_AC_LUMA = ([0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D], [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
    0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
    0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
    0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
    0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
    0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
    0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
    0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
    0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
    0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
    0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
    0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
])
HUFF_AC_CHROMA = ([0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77], [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12,
    0x41, 0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14,
    0x42, 0x91, 0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15,
    0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17,
    0x18, 0x19, 0x1A, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37,
    0x38, 0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A,
    0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65,
    0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
    0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A,
    0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
    0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5,
    0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
    0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9,
    0xDA, 0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2,
    0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
])

# orthonormal 8x8 DCT-II matrix: dct2(B) = D @ B @ D.T, idct = D.T @ C @ D
_k = np.arange(8)
_D = np.cos((2 * _k[None, :] + 1) * _k[:, None] * np.pi / 16) * np.sqrt(2 / 8)
_D[0, :] = np.sqrt(1 / 8)


def _canonical_codes(bits: list[int], values: list[int]) -> dict[int, tuple[int, int]]:
    """symbol -> (code, length) canonical Huffman assignment (T.81 C.2)."""
    out: dict[int, tuple[int, int]] = {}
    code = 0
    idx = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            if code >= (1 << length):
                # only reachable from corrupt DHT data (fuzz, r11)
                raise ValueError("JPEG: over-subscribed Huffman BITS counts")
            out[values[idx]] = (code, length)
            code += 1
            idx += 1
        code <<= 1
    return out


def _decode_table(bits: list[int], values: list[int]) -> dict[tuple[int, int], int]:
    """(length, code) -> symbol for the decoder."""
    return {(ln, code): sym for sym, (code, ln) in _canonical_codes(bits, values).items()}


# ---------------------------------------------------------------------------
# bit I/O with JPEG byte stuffing
# ---------------------------------------------------------------------------


class _BitReader:
    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos          # next byte index
        self.acc = 0
        self.nbits = 0

    def _fill(self) -> None:
        while self.nbits <= 24:
            if self.pos >= len(self.data):
                # pad with 1-bits past the end (decoder stops at EOB/MCU count)
                self.acc = (self.acc << 8) | 0xFF
                self.nbits += 8
                continue
            b = self.data[self.pos]
            if b == 0xFF:
                nxt = self.data[self.pos + 1] if self.pos + 1 < len(self.data) else 0xD9
                if nxt == 0x00:
                    self.pos += 2          # stuffed 0xFF
                    self.acc = (self.acc << 8) | 0xFF
                    self.nbits += 8
                    continue
                # a real marker: stop feeding real bytes (pad instead);
                # restart()/caller consumes the marker explicitly
                self.acc = (self.acc << 8) | 0xFF
                self.nbits += 8
                continue
            self.pos += 1
            self.acc = (self.acc << 8) | b
            self.nbits += 8

    def bits(self, n: int) -> int:
        if n == 0:
            return 0
        self._fill()
        v = (self.acc >> (self.nbits - n)) & ((1 << n) - 1)
        self.nbits -= n
        self.acc &= (1 << self.nbits) - 1
        return v

    def restart(self) -> None:
        """Byte-align and consume an RSTn marker."""
        self.acc = 0
        self.nbits = 0
        while self.pos + 1 < len(self.data):
            if self.data[self.pos] == 0xFF and 0xD0 <= self.data[self.pos + 1] <= 0xD7:
                self.pos += 2
                return
            self.pos += 1
        raise ValueError("expected restart marker")


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            b = (self.acc >> (self.nbits - 8)) & 0xFF
            self.out.append(b)
            if b == 0xFF:
                self.out.append(0x00)  # byte stuffing
            self.nbits -= 8
            self.acc &= (1 << self.nbits) - 1

    def flush(self) -> None:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)  # pad with 1-bits


def _extend(v: int, s: int) -> int:
    """T.81 F.12: map an s-bit magnitude to its signed value."""
    return v if s == 0 or v >= (1 << (s - 1)) else v - (1 << s) + 1


def _category(v: int) -> int:
    return int(abs(v)).bit_length()


# ---------------------------------------------------------------------------
# decoder
# ---------------------------------------------------------------------------


def decode_baseline_jpeg(
    content: bytes, *, max_pixels: int = 1 << 24
) -> np.ndarray:
    """Decode a baseline-sequential (SOF0/SOF1) or progressive (SOF2)
    JPEG to an (H, W, C) uint8 array (C = 1 grayscale, 3 RGB).  Raises
    NotImplementedError for arithmetic / lossless / hierarchical /
    12-bit streams and ValueError for malformed data.  ``max_pixels``
    (default 16.7M ~ 16 MP) is a decompression-bomb guard (fuzz, r11):
    corrupt SOF dims of 65535x65535 would otherwise allocate tens of
    GB of planes before any entropy data is read."""
    if content[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    pos = 2
    qtables: dict[int, np.ndarray] = {}
    htables: dict[tuple[int, int], dict[tuple[int, int], int]] = {}
    frame = None
    restart_interval = 0
    coefs: list[np.ndarray] | None = None  # progressive coefficient store
    while pos < len(content):
        if content[pos] != 0xFF:
            pos += 1
            continue
        # T.81 B.1.1.2 allows any number of 0xFF fill bytes before a
        # marker: skip to the last 0xFF of the run
        while pos + 1 < len(content) and content[pos + 1] == 0xFF:
            pos += 1
        if pos + 1 >= len(content):
            raise ValueError("truncated JPEG stream")
        marker = content[pos + 1]
        pos += 2
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            continue
        if marker == 0xD9:  # EOI
            break
        if pos + 2 > len(content):
            raise ValueError("truncated JPEG stream")
        (seglen,) = struct.unpack(">H", content[pos:pos + 2])
        if seglen < 2:
            # fuzz finding (r11): a zero seglen would re-parse the same
            # marker forever
            raise ValueError("JPEG: segment length < 2")
        seg = content[pos + 2:pos + seglen]
        if marker == 0xDB:  # DQT
            p = 0
            while p < len(seg):
                pq, tq = seg[p] >> 4, seg[p] & 15
                p += 1
                need = 64 if pq == 0 else 128
                if len(seg) - p < need:
                    raise ValueError("JPEG: truncated DQT segment")
                if pq == 0:
                    tbl = np.frombuffer(seg[p:p + 64], dtype=np.uint8).astype(np.int64)
                    p += 64
                else:
                    tbl = np.frombuffer(seg[p:p + 128], dtype=">u2").astype(np.int64)
                    p += 128
                qtables[tq] = tbl  # zigzag order
        elif marker in (0xC0, 0xC1, 0xC2):  # SOF0/SOF1 sequential, SOF2 progressive
            precision = seg[0]
            if precision != 8:
                raise NotImplementedError(f"{precision}-bit JPEG not supported")
            if len(seg) < 6:
                raise ValueError("JPEG: truncated SOF segment")
            h, w = struct.unpack(">HH", seg[1:5])
            ncomp = seg[5]
            if ncomp == 0 or len(seg) < 6 + 3 * ncomp:
                raise ValueError("JPEG: truncated SOF component list")
            if h == 0 or w == 0:
                raise ValueError("JPEG: zero frame dimension")
            if h * w > max_pixels:
                raise NotImplementedError(
                    f"JPEG: {w}x{h} exceeds the decoder's {max_pixels}-pixel "
                    "cap (decompression-bomb guard)"
                )
            comps = []
            for i in range(ncomp):
                cid, hv, tq = seg[6 + 3 * i], seg[7 + 3 * i], seg[8 + 3 * i]
                if not (1 <= hv >> 4 <= 4 and 1 <= hv & 15 <= 4):
                    raise ValueError("JPEG: sampling factor out of range 1-4")
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 15, "tq": tq})
            frame = {"h": h, "w": w, "comps": comps,
                     "progressive": marker == 0xC2}
            if frame["progressive"]:
                hmax = max(c["h"] for c in comps)
                vmax = max(c["v"] for c in comps)
                mcux = -(-w // (8 * hmax))
                mcuy = -(-h // (8 * vmax))
                coefs = [
                    np.zeros((mcuy * c["v"], mcux * c["h"], 64), dtype=np.int32)
                    for c in comps
                ]
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                f"JPEG SOF marker 0x{marker:02X} (arithmetic/lossless/"
                "hierarchical) not supported by this codec"
            )
        elif marker == 0xC4:  # DHT
            p = 0
            while p < len(seg):
                tc, th = seg[p] >> 4, seg[p] & 15
                bits = list(seg[p + 1:p + 17])
                # fuzz finding (r11): a truncated DHT slices short and
                # the canonical builder walked off the value list
                if len(bits) < 16:
                    raise ValueError("JPEG: truncated DHT segment")
                nv = sum(bits)
                values = list(seg[p + 17:p + 17 + nv])
                if len(values) < nv:
                    raise ValueError(
                        "JPEG: DHT value list shorter than its BITS counts"
                    )
                htables[(tc, th)] = _decode_table(bits, values)
                p += 17 + nv
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack(">H", seg[:2])
        elif marker == 0xDA:  # SOS
            if frame is None:
                raise ValueError("SOS before SOF")
            if not seg:
                raise ValueError("JPEG: empty SOS segment")
            ns = seg[0]
            # T.81 B.2.3: the SOS header is 1 + 2*Ns component specs +
            # the 3 spectral-selection bytes, in every mode
            if len(seg) < 1 + 2 * ns + 3:
                raise ValueError("JPEG: truncated SOS segment")
            comp_ids = {c["id"] for c in frame["comps"]}
            scan = {}
            order = []
            for i in range(ns):
                cs, tt = seg[1 + 2 * i], seg[2 + 2 * i]
                if cs not in comp_ids:
                    raise ValueError(
                        "JPEG: scan references a component not in the frame"
                    )
                scan[cs] = (tt >> 4, tt & 15)
                order.append(cs)
            data_start = pos + seglen
            if not frame["progressive"]:
                return _decode_scan(
                    content, data_start, frame, scan, qtables, htables,
                    restart_interval,
                )
            ss, se, ahal = seg[1 + 2 * ns], seg[2 + 2 * ns], seg[3 + 2 * ns]
            if not (ss <= se <= 63):
                raise ValueError("JPEG: spectral selection out of range")
            pos = _decode_progressive_scan(
                content, data_start, frame, order, scan, htables, coefs,
                ss, se, ahal >> 4, ahal & 15, restart_interval,
            )
            frame["nscans"] = frame.get("nscans", 0) + 1
            continue
        pos += seglen
    if frame is not None and frame.get("progressive") and frame.get("nscans", 0):
        return _reconstruct_progressive(frame, coefs, qtables)
    raise ValueError("no SOS marker found")


def _huff_decode(r: _BitReader, table: dict[tuple[int, int], int]) -> int:
    code = 0
    for length in range(1, 17):
        code = (code << 1) | r.bits(1)
        sym = table.get((length, code))
        if sym is not None:
            return sym
    raise ValueError("invalid Huffman code")


def _decode_scan(content, pos, frame, scan, qtables, htables, ri):
    H, W = frame["h"], frame["w"]
    comps = frame["comps"]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcux = -(-W // (8 * hmax))
    mcuy = -(-H // (8 * vmax))
    planes = [
        np.zeros((mcuy * c["v"] * 8, mcux * c["h"] * 8), dtype=np.float64)
        for c in comps
    ]
    pred = [0] * len(comps)
    r = _BitReader(content, pos)
    nmcu = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if ri and nmcu and nmcu % ri == 0:
                r.restart()
                pred = [0] * len(comps)
            nmcu += 1
            for ci, c in enumerate(comps):
                dc_t = htables.get((0, scan[c["id"]][0]))
                ac_t = htables.get((1, scan[c["id"]][1]))
                if dc_t is None or ac_t is None:
                    raise ValueError(
                        "malformed JPEG: scan references an undeclared "
                        "Huffman table"
                    )
                q = qtables.get(c["tq"])
                if q is None or len(q) != 64:
                    raise ValueError(
                        "malformed JPEG: scan references an undeclared "
                        "quantization table"
                    )
                for by in range(c["v"]):
                    for bx in range(c["h"]):
                        zz = np.zeros(64, dtype=np.int64)
                        s = _huff_decode(r, dc_t)
                        diff = _extend(r.bits(s), s)
                        pred[ci] += diff
                        zz[0] = pred[ci]
                        k = 1
                        while k < 64:
                            rs = _huff_decode(r, ac_t)
                            rr, s = rs >> 4, rs & 15
                            if s == 0:
                                if rr == 15:
                                    k += 16
                                    continue
                                break  # EOB
                            k += rr
                            if k > 63:
                                raise ValueError("AC index out of range")
                            zz[k] = _extend(r.bits(s), s)
                            k += 1
                        block = np.zeros(64, dtype=np.float64)
                        block[ZIGZAG] = (zz * q).astype(np.float64)
                        px = _D.T @ block.reshape(8, 8) @ _D + 128.0
                        y0 = (my * c["v"] + by) * 8
                        x0 = (mx * c["h"] + bx) * 8
                        planes[ci][y0:y0 + 8, x0:x0 + 8] = px

    return _planes_to_image(planes, comps, H, W, hmax, vmax)


def _planes_to_image(planes, comps, H, W, hmax, vmax) -> np.ndarray:
    """Upsample component pixel planes to full resolution and apply the
    JFIF YCbCr -> RGB transform (shared by the sequential and
    progressive reconstruction paths)."""
    out_planes = []
    for ci, c in enumerate(comps):
        p = planes[ci]
        # upsample to full resolution by pixel repetition
        ry, rx = vmax // c["v"], hmax // c["h"]
        if ry > 1 or rx > 1:
            p = np.repeat(np.repeat(p, ry, axis=0), rx, axis=1)
        out_planes.append(p[:H, :W])
    if len(out_planes) == 1:
        gray = np.clip(np.round(out_planes[0]), 0, 255).astype(np.uint8)
        return gray[:, :, None]
    y, cb, cr = out_planes[0], out_planes[1] - 128.0, out_planes[2] - 128.0
    rgb = np.stack(
        [y + 1.402 * cr, y - 0.344136 * cb - 0.714136 * cr, y + 1.772 * cb],
        axis=2,
    )
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8)


# ---------------------------------------------------------------------------
# progressive decoding (T.81 Annex G: spectral selection + successive
# approximation; scan structure mirrors the public spec's figures G.6/G.7
# and the behavior every libjpeg-compatible decoder implements)
# ---------------------------------------------------------------------------


def _comp_block_dims(frame, c) -> tuple[int, int]:
    """Non-interleaved block grid for one component (T.81 A.2.2):
    ceil(ceil(dim * sampling / max_sampling) / 8)."""
    hmax = max(k["h"] for k in frame["comps"])
    vmax = max(k["v"] for k in frame["comps"])
    w_samp = -(-(frame["w"] * c["h"]) // hmax)
    h_samp = -(-(frame["h"] * c["v"]) // vmax)
    return -(-h_samp // 8), -(-w_samp // 8)


def _next_marker_pos(content: bytes, pos: int) -> int:
    """Byte offset of the next real marker (not a stuffed 0x00, not an
    RSTn) at or after ``pos`` — the end of a scan's entropy data."""
    i = pos
    while i + 1 < len(content):
        if content[i] == 0xFF and content[i + 1] != 0x00 and not (
            0xD0 <= content[i + 1] <= 0xD7
        ):
            # (0xFF 0xFF fill runs return the run start; the main
            # marker loop skips fill bytes itself)
            return i
        i += 1
    return len(content)


def _decode_progressive_scan(
    content, pos, frame, order, scan, htables, coefs, ss, se, ah, al, ri
):
    """Decode one progressive scan into the per-component coefficient
    arrays (zigzag order).  Returns the byte offset of the marker that
    terminates the scan's entropy data."""
    comps = frame["comps"]
    idx = {c["id"]: i for i, c in enumerate(comps)}
    r = _BitReader(content, pos)
    if ss == 0:
        if se != 0:
            raise ValueError("progressive DC scan must have Se == 0")
        _scan_dc(r, frame, order, scan, htables, coefs, ah, al, ri)
    else:
        if len(order) != 1:
            raise ValueError("progressive AC scans are single-component")
        ci = idx[order[0]]
        table = htables.get((1, scan[order[0]][1]))
        if table is None:
            # module contract: malformed data raises ValueError, never a
            # bare KeyError/AttributeError (same class as the r4 TIFF
            # missing-tag finding)
            raise ValueError(
                f"malformed JPEG: AC scan references undeclared Huffman "
                f"table {scan[order[0]][1]}"
            )
        if ah == 0:
            _scan_ac_first(r, frame, comps[ci], coefs[ci], table, ss, se, al, ri)
        else:
            _scan_ac_refine(r, frame, comps[ci], coefs[ci], table, ss, se, al, ri)
    return _next_marker_pos(content, r.pos)


def _require_dc_table(htables, scan, cid):
    t = htables.get((0, scan[cid][0]))
    if t is None:
        raise ValueError(
            f"malformed JPEG: DC scan references undeclared Huffman "
            f"table {scan[cid][0]}"
        )
    return t


def _scan_dc(r, frame, order, scan, htables, coefs, ah, al, ri):
    comps = frame["comps"]
    idx = {c["id"]: i for i, c in enumerate(comps)}
    if len(order) == 1:
        # non-interleaved DC scan: block order over the component grid
        ci = idx[order[0]]
        c = comps[ci]
        bh, bw = _comp_block_dims(frame, c)
        pred = 0
        n = 0
        for by in range(bh):
            for bx in range(bw):
                if ri and n and n % ri == 0:
                    r.restart()
                    pred = 0
                n += 1
                if ah == 0:
                    t = _require_dc_table(htables, scan, c["id"])
                    s = _huff_decode(r, t)
                    pred += _extend(r.bits(s), s)
                    coefs[ci][by, bx, 0] = pred << al
                else:
                    if r.bits(1):
                        coefs[ci][by, bx, 0] |= 1 << al
        return
    # interleaved DC scan: MCU order, every component's v x h blocks
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcux = -(-frame["w"] // (8 * hmax))
    mcuy = -(-frame["h"] // (8 * vmax))
    pred = [0] * len(comps)
    n = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if ri and n and n % ri == 0:
                r.restart()
                pred = [0] * len(comps)
            n += 1
            for cid in order:
                ci = idx[cid]
                c = comps[ci]
                for by in range(c["v"]):
                    for bx in range(c["h"]):
                        yy = my * c["v"] + by
                        xx = mx * c["h"] + bx
                        if ah == 0:
                            t = _require_dc_table(htables, scan, cid)
                            s = _huff_decode(r, t)
                            pred[ci] += _extend(r.bits(s), s)
                            coefs[ci][yy, xx, 0] = pred[ci] << al
                        else:
                            if r.bits(1):
                                coefs[ci][yy, xx, 0] |= 1 << al


def _scan_ac_first(r, frame, c, coef, table, ss, se, al, ri):
    bh, bw = _comp_block_dims(frame, c)
    eobrun = 0
    n = 0
    for by in range(bh):
        for bx in range(bw):
            if ri and n and n % ri == 0:
                r.restart()
                eobrun = 0
            n += 1
            if eobrun > 0:
                eobrun -= 1
                continue
            zz = coef[by, bx]
            k = ss
            while k <= se:
                rs = _huff_decode(r, table)
                rr, s = rs >> 4, rs & 15
                if s == 0:
                    if rr != 15:
                        eobrun = (1 << rr) - 1
                        if rr:
                            eobrun += r.bits(rr)
                        break
                    k += 16  # ZRL
                    continue
                k += rr
                if k > se:
                    raise ValueError("AC index out of band")
                zz[k] = _extend(r.bits(s), s) << al
                k += 1


def _scan_ac_refine(r, frame, c, coef, table, ss, se, al, ri):
    p1 = 1 << al
    m1 = -1 << al
    bh, bw = _comp_block_dims(frame, c)
    eobrun = 0
    n = 0
    for by in range(bh):
        for bx in range(bw):
            if ri and n and n % ri == 0:
                r.restart()
                eobrun = 0
            n += 1
            zz = coef[by, bx]
            k = ss
            if eobrun == 0:
                while k <= se:
                    rs = _huff_decode(r, table)
                    rr, s = rs >> 4, rs & 15
                    val = 0
                    if s == 0:
                        if rr != 15:
                            eobrun = 1 << rr
                            if rr:
                                eobrun += r.bits(rr)
                            break
                        # rr == 15: ZRL — skip 16 zero-history coeffs
                    else:
                        if s != 1:
                            raise ValueError("AC refinement size must be 1")
                        val = p1 if r.bits(1) else m1
                    # advance over rr zero-history coefficients, emitting
                    # correction bits for nonzero-history ones passed over
                    while k <= se:
                        t = int(zz[k])
                        if t != 0:
                            if r.bits(1) and (t & p1) == 0:
                                zz[k] = t + (p1 if t >= 0 else m1)
                        else:
                            if rr == 0:
                                break
                            rr -= 1
                        k += 1
                    if val and k <= se:
                        zz[k] = val
                    k += 1
            if eobrun > 0:
                # end-of-band: correction bits for the remaining
                # nonzero-history coefficients of this block
                while k <= se:
                    t = int(zz[k])
                    if t != 0:
                        if r.bits(1) and (t & p1) == 0:
                            zz[k] = t + (p1 if t >= 0 else m1)
                    k += 1
                eobrun -= 1


def _reconstruct_progressive(frame, coefs, qtables) -> np.ndarray:
    """Dequantize + inverse zigzag + IDCT the accumulated coefficient
    arrays and hand off to the shared upsample/color tail."""
    comps = frame["comps"]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    planes = []
    for ci, c in enumerate(comps):
        q = qtables[c["tq"]]
        arr = coefs[ci]
        bh, bw, _ = arr.shape
        deq = arr.astype(np.int64) * q[None, None, :]
        blocks = np.zeros((bh, bw, 64), dtype=np.float64)
        blocks[:, :, ZIGZAG] = deq
        # batched IDCT over all blocks: (bh, bw, 8, 8)
        b4 = blocks.reshape(bh, bw, 8, 8)
        px = np.einsum("ij,abjk,kl->abil", _D.T, b4, _D) + 128.0
        plane = px.transpose(0, 2, 1, 3).reshape(bh * 8, bw * 8)
        planes.append(plane)
    return _planes_to_image(planes, comps, frame["h"], frame["w"], hmax, vmax)


# ---------------------------------------------------------------------------
# encoder (fixture generation + round-trip validation)
# ---------------------------------------------------------------------------


def _quality_scale(table: np.ndarray, quality: int) -> np.ndarray:
    quality = min(100, max(1, quality))
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    return np.clip((table * scale + 50) // 100, 1, 255)


def _emit_quantized_block(
    w: _BitWriter, zz: np.ndarray, pred: int, dc_codes, ac_codes
) -> int:
    """Baseline-sequential entropy emission of one already-quantized
    zigzag block (the back half of the forward pipeline; coefficients
    come from :func:`_forward_coefs` so the sequential and progressive
    encoders share ONE forward path — r5 review finding)."""
    diff = int(zz[0]) - pred
    s = _category(diff)
    code, ln = dc_codes[s]
    w.write(code, ln)
    if s:
        w.write(diff if diff >= 0 else diff + (1 << s) - 1, s)
    run = 0
    last_nz = int(np.max(np.nonzero(zz)[0])) if np.any(zz[1:]) else 0
    for k in range(1, 64):
        v = int(zz[k])
        if v == 0:
            if k > last_nz:
                code, ln = ac_codes[0x00]  # EOB
                w.write(code, ln)
                break
            run += 1
            if run == 16:
                code, ln = ac_codes[0xF0]  # ZRL
                w.write(code, ln)
                run = 0
            continue
        s = _category(v)
        code, ln = ac_codes[(run << 4) | s]
        w.write(code, ln)
        w.write(v if v >= 0 else v + (1 << s) - 1, s)
        run = 0
    return int(zz[0])


def encode_baseline_jpeg(
    pixels: np.ndarray, *, quality: int = 85, subsampling: str = "444",
    restart_interval: int = 0,
) -> bytes:
    """Encode an (H, W, 1|3) uint8 array as baseline JFIF JPEG.

    ``subsampling``: '444' (no chroma subsampling) or '420'.  Gray
    input always encodes as single-component.  ``restart_interval`` in
    MCUs (0 = none) — exists mainly so tests can exercise the
    decoder's restart path."""
    coef_arrays, samp, qy, qc, H, W, mcux, mcuy, gray = _forward_coefs(
        pixels, quality, subsampling
    )
    ncomps = len(coef_arrays)

    dc_l = _canonical_codes(*HUFF_DC_LUMA)
    ac_l = _canonical_codes(*HUFF_AC_LUMA)
    dc_c = _canonical_codes(*HUFF_DC_CHROMA)
    ac_c = _canonical_codes(*HUFF_AC_CHROMA)

    w = _BitWriter()
    pred = [0] * ncomps
    nmcu = 0
    restarts: list[int] = []  # byte offsets where RST markers go
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and nmcu and nmcu % restart_interval == 0:
                w.flush()
                restarts.append(len(w.out))
                pred = [0] * ncomps
            nmcu += 1
            for ci in range(ncomps):
                dc_codes = dc_l if ci == 0 else dc_c
                ac_codes = ac_l if ci == 0 else ac_c
                hh, vv = samp[ci]
                for by in range(vv):
                    for bx in range(hh):
                        zz = coef_arrays[ci][my * vv + by, mx * hh + bx]
                        pred[ci] = _emit_quantized_block(
                            w, zz, pred[ci], dc_codes, ac_codes
                        )
    w.flush()
    scan = bytes(w.out)
    # splice restart markers in (recorded at byte-aligned offsets)
    if restarts:
        parts = []
        prev = 0
        for i, off in enumerate(restarts):
            parts.append(scan[prev:off])
            parts.append(bytes([0xFF, 0xD0 + (i % 8)]))
            prev = off
        parts.append(scan[prev:])
        scan = b"".join(parts)

    def seg(marker: int, payload: bytes) -> bytes:
        return bytes([0xFF, marker]) + struct.pack(">H", len(payload) + 2) + payload

    out = bytearray(b"\xff\xd8")
    out += seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    out += seg(0xDB, bytes([0x00]) + bytes(qy[ZIGZAG].astype(np.uint8)))
    if not gray:
        out += seg(0xDB, bytes([0x01]) + bytes(qc[ZIGZAG].astype(np.uint8)))
    ncomp = 1 if gray else 3
    sof = bytes([8]) + struct.pack(">HH", H, W) + bytes([ncomp])
    for ci in range(ncomp):
        sof += bytes([ci + 1, (samp[ci][0] << 4) | samp[ci][1], 0 if ci == 0 else 1])
    out += seg(0xC0, sof)

    def dht(tc: int, th: int, spec) -> bytes:
        bits, values = spec
        return seg(0xC4, bytes([(tc << 4) | th]) + bytes(bits) + bytes(values))

    out += dht(0, 0, HUFF_DC_LUMA) + dht(1, 0, HUFF_AC_LUMA)
    if not gray:
        out += dht(0, 1, HUFF_DC_CHROMA) + dht(1, 1, HUFF_AC_CHROMA)
    if restart_interval:
        out += seg(0xDD, struct.pack(">H", restart_interval))
    sos = bytes([ncomp])
    for ci in range(ncomp):
        sos += bytes([ci + 1, 0x00 if ci == 0 else 0x11])
    sos += bytes([0, 63, 0])
    out += seg(0xDA, sos)
    out += scan
    out += b"\xff\xd9"
    return bytes(out)


# ---------------------------------------------------------------------------
# progressive encoder (T.81 Annex G fixtures)
# ---------------------------------------------------------------------------

# Universal AC Huffman table for progressive scans: all 256 symbols, 255
# at 9 bits + one at 10 (DHT caps a length's count at 255).  The Annex K
# AC tables lack the EOBn symbols (r<<4, r>0) progressive coding needs;
# this table is deliberately simple rather than optimal — fixtures, not
# archival compression.  The all-ones code of each length stays unused
# (canonical codes 0..254 at 9 bits, 510 at 10 bits), as T.81 requires.
PROG_AC_TABLE = (
    [0, 0, 0, 0, 0, 0, 0, 0, 255, 1, 0, 0, 0, 0, 0, 0],
    list(range(256)),
)


def _forward_coefs(pixels: np.ndarray, quality: int, subsampling: str):
    """Quantized DCT coefficient arrays per component (padded MCU block
    grid, zigzag order) + geometry — the shared front half of any
    multi-scan encoder."""
    if pixels.ndim == 2:
        pixels = pixels[:, :, None]
    H, W, C = pixels.shape
    if C not in (1, 3):
        raise ValueError("need 1 or 3 channels")
    if subsampling not in ("444", "420"):
        raise ValueError("subsampling must be '444' or '420'")
    gray = C == 1
    qy = _quality_scale(QT_LUMA, quality)
    qc = _quality_scale(QT_CHROMA, quality)
    px = pixels.astype(np.float64)
    if gray:
        comps_px = [px[:, :, 0]]
    else:
        rr, g, b = px[:, :, 0], px[:, :, 1], px[:, :, 2]
        y = 0.299 * rr + 0.587 * g + 0.114 * b
        cb = -0.168736 * rr - 0.331264 * g + 0.5 * b + 128.0
        cr = 0.5 * rr - 0.418688 * g - 0.081312 * b + 128.0
        comps_px = [y, cb, cr]
    sub = 2 if (subsampling == "420" and not gray) else 1
    if sub == 2:
        def pool(p):
            pe = np.pad(p, ((0, p.shape[0] % 2), (0, p.shape[1] % 2)), mode="edge")
            return (pe[0::2, 0::2] + pe[0::2, 1::2] + pe[1::2, 0::2] + pe[1::2, 1::2]) / 4.0

        comps_px = [comps_px[0], pool(comps_px[1]), pool(comps_px[2])]
    samp = [(sub, sub), (1, 1), (1, 1)] if not gray else [(1, 1)]
    hmax = max(s[0] for s in samp)
    vmax = max(s[1] for s in samp)
    mcux = -(-W // (8 * hmax))
    mcuy = -(-H // (8 * vmax))
    coef_arrays = []
    for ci, p in enumerate(comps_px):
        hh, vv = samp[ci]
        ph, pw = mcuy * vv * 8, mcux * hh * 8
        p = np.pad(p, ((0, ph - p.shape[0]), (0, pw - p.shape[1])), mode="edge")
        q = qy if ci == 0 else qc
        arr = np.zeros((mcuy * vv, mcux * hh, 64), dtype=np.int32)
        for by in range(mcuy * vv):
            for bx in range(mcux * hh):
                block = p[by * 8:by * 8 + 8, bx * 8:bx * 8 + 8]
                coef = _D @ (block - 128.0) @ _D.T
                arr[by, bx] = np.round(coef.reshape(64)[ZIGZAG] / q[ZIGZAG]).astype(
                    np.int32
                )
        coef_arrays.append(arr)
    return coef_arrays, samp, qy, qc, H, W, mcux, mcuy, gray


def _emit_sign_bits(w: _BitWriter, v: int, s: int) -> None:
    w.write(v if v >= 0 else v + (1 << s) - 1, s)


class _EobState:
    """EOB-run accumulator shared by the AC-first/refine scan emitters;
    ``bebits`` buffers the refinement correction bits that must follow
    the next EOBn symbol (T.81 G.1.2.2 / figure G.7 semantics)."""

    def __init__(self, w: _BitWriter, ac_codes):
        self.w = w
        self.ac = ac_codes
        self.eobrun = 0
        self.bebits: list[int] = []

    def flush(self) -> None:
        if self.eobrun:
            rbits = self.eobrun.bit_length() - 1
            code, ln = self.ac[rbits << 4]
            self.w.write(code, ln)
            if rbits:
                self.w.write(self.eobrun & ((1 << rbits) - 1), rbits)
            self.eobrun = 0
        for b in self.bebits:
            self.w.write(b, 1)
        self.bebits.clear()


def _emit_dc_scan(w, coef_arrays, samp, order, mcux, mcuy, ah, al, dc_codes_by_comp):
    """Interleaved DC scan: first pass (ah == 0) codes point-transformed
    diffs, refinement passes emit bit ``al`` of each DC coefficient."""
    pred = [0] * len(coef_arrays)
    for my in range(mcuy):
        for mx in range(mcux):
            for ci in order:
                hh, vv = samp[ci]
                for by in range(vv):
                    for bx in range(hh):
                        c0 = int(coef_arrays[ci][my * vv + by, mx * hh + bx, 0])
                        if ah == 0:
                            v = c0 >> al  # arithmetic shift, like the decoder
                            diff = v - pred[ci]
                            pred[ci] = v
                            s = _category(diff)
                            code, ln = dc_codes_by_comp[ci][s]
                            w.write(code, ln)
                            if s:
                                _emit_sign_bits(w, diff, s)
                        else:
                            w.write((c0 >> al) & 1, 1)


def _emit_ac_first_scan(w, arr, bh, bw, ss, se, al, ac_codes):
    st = _EobState(w, ac_codes)
    for by in range(bh):
        for bx in range(bw):
            zz = arr[by, bx]
            r = 0
            for k in range(ss, se + 1):
                v = int(zz[k])
                t = (v >> al) if v >= 0 else -((-v) >> al)
                if t == 0:
                    r += 1
                    continue
                st.flush()
                while r > 15:
                    code, ln = ac_codes[0xF0]
                    w.write(code, ln)
                    r -= 16
                s = _category(t)
                code, ln = ac_codes[(r << 4) | s]
                w.write(code, ln)
                _emit_sign_bits(w, t, s)
                r = 0
            if r > 0:
                st.eobrun += 1
                if st.eobrun == 0x7FFF:
                    st.flush()
    st.flush()


def _emit_ac_refine_scan(w, arr, bh, bw, ss, se, al, ac_codes):
    st = _EobState(w, ac_codes)
    for by in range(bh):
        for bx in range(bw):
            zz = arr[by, bx]
            absv = [abs(int(zz[k])) >> al for k in range(ss, se + 1)]
            eobpos = ss - 1  # position of the last newly-nonzero coef
            for k in range(ss, se + 1):
                if absv[k - ss] == 1:
                    eobpos = k
            r = 0
            br: list[int] = []
            for k in range(ss, se + 1):
                t = absv[k - ss]
                if t == 0:
                    r += 1
                    continue
                while r > 15 and k <= eobpos:
                    st.flush()
                    code, ln = ac_codes[0xF0]
                    w.write(code, ln)
                    r -= 16
                    for b in br:
                        w.write(b, 1)
                    br = []
                if t > 1:
                    # previously-nonzero coefficient: buffer its next
                    # magnitude bit as a correction bit
                    br.append(t & 1)
                    continue
                # newly-nonzero (|coef|>>al == 1): huffman symbol + sign
                st.flush()
                code, ln = ac_codes[(r << 4) | 1]
                w.write(code, ln)
                w.write(1 if int(zz[k]) >= 0 else 0, 1)
                for b in br:
                    w.write(b, 1)
                br = []
                r = 0
            if r > 0 or br:
                st.eobrun += 1
                st.bebits.extend(br)
                if st.eobrun == 0x7FFF or len(st.bebits) > 900:
                    st.flush()
    st.flush()


def encode_progressive_jpeg(
    pixels: np.ndarray, *, quality: int = 85, subsampling: str = "444"
) -> bytes:
    """Encode an (H, W, 1|3) uint8 array as a PROGRESSIVE (SOF2) JFIF
    JPEG with a libjpeg-style scan script:

      1. DC first, interleaved, Al=1
      2. per component: AC first Ss=1..5, Al=2 (low-frequency band)
      3. per component: AC first Ss=6..63, Al=2 (high-frequency band)
      4. per component: AC refine Ah=2 -> Al=1
      5. per component: AC refine Ah=1 -> Al=0
      6. DC refine, interleaved, Ah=1 -> Al=0

    — six to sixteen scans exercising every Annex G decode path
    (spectral selection, successive approximation, DC/AC refinement,
    EOB runs across blocks)."""
    coef_arrays, samp, qy, qc, H, W, mcux, mcuy, gray = _forward_coefs(
        pixels, quality, subsampling
    )
    ncomp = 1 if gray else 3
    comps_geo = [{"h": samp[i][0], "v": samp[i][1]} for i in range(ncomp)]
    frame_geo = {"w": W, "h": H, "comps": comps_geo}

    dc_l = _canonical_codes(*HUFF_DC_LUMA)
    dc_c = _canonical_codes(*HUFF_DC_CHROMA)
    dc_by_comp = [dc_l] + [dc_c] * (ncomp - 1)
    ac_u = _canonical_codes(*PROG_AC_TABLE)

    def seg(marker: int, payload: bytes) -> bytes:
        return bytes([0xFF, marker]) + struct.pack(">H", len(payload) + 2) + payload

    out = bytearray(b"\xff\xd8")
    out += seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    out += seg(0xDB, bytes([0x00]) + bytes(qy[ZIGZAG].astype(np.uint8)))
    if not gray:
        out += seg(0xDB, bytes([0x01]) + bytes(qc[ZIGZAG].astype(np.uint8)))
    sof = bytes([8]) + struct.pack(">HH", H, W) + bytes([ncomp])
    for ci in range(ncomp):
        sof += bytes([ci + 1, (samp[ci][0] << 4) | samp[ci][1], 0 if ci == 0 else 1])
    out += seg(0xC2, sof)  # SOF2: progressive DCT, Huffman

    def dht(tc: int, th: int, spec) -> bytes:
        bits, values = spec
        return seg(0xC4, bytes([(tc << 4) | th]) + bytes(bits) + bytes(values))

    out += dht(0, 0, HUFF_DC_LUMA)
    if not gray:
        out += dht(0, 1, HUFF_DC_CHROMA)
    out += dht(1, 0, PROG_AC_TABLE)

    def sos(comp_ids: list[int], ss: int, se: int, ah: int, al: int,
            entropy: bytes) -> bytes:
        hdr = bytes([len(comp_ids)])
        for cid in comp_ids:
            td = 0 if cid == 1 else 1  # DC table id (ignored in AC scans)
            hdr += bytes([cid, (td << 4) | 0x00])  # AC table 0 (universal)
        hdr += bytes([ss, se, (ah << 4) | al])
        return seg(0xDA, hdr) + entropy

    def entropy(emit) -> bytes:
        w = _BitWriter()
        emit(w)
        w.flush()
        return bytes(w.out)

    all_ids = list(range(1, ncomp + 1))
    order = list(range(ncomp))
    # 1. DC first (Al=1), interleaved
    out += sos(all_ids, 0, 0, 0, 1, entropy(
        lambda w: _emit_dc_scan(w, coef_arrays, samp, order, mcux, mcuy, 0, 1,
                                dc_by_comp)))
    # 2-3. AC first scans per component, two spectral bands, Al=2
    for ci in range(ncomp):
        bh, bw = _comp_block_dims(frame_geo, comps_geo[ci])
        arr = coef_arrays[ci]
        for lo, hi in ((1, 5), (6, 63)):
            out += sos([ci + 1], lo, hi, 0, 2, entropy(
                lambda w, a=arr, b=bh, c=bw, x=lo, y=hi:
                    _emit_ac_first_scan(w, a, b, c, x, y, 2, ac_u)))
    # 4-5. AC refinement passes per component: Ah=2->Al=1, Ah=1->Al=0
    for ah, al in ((2, 1), (1, 0)):
        for ci in range(ncomp):
            bh, bw = _comp_block_dims(frame_geo, comps_geo[ci])
            arr = coef_arrays[ci]
            out += sos([ci + 1], 1, 63, ah, al, entropy(
                lambda w, a=arr, b=bh, c=bw, z=al:
                    _emit_ac_refine_scan(w, a, b, c, 1, 63, z, ac_u)))
    # 6. DC refinement (Ah=1 -> Al=0), interleaved
    out += sos(all_ids, 0, 0, 1, 0, entropy(
        lambda w: _emit_dc_scan(w, coef_arrays, samp, order, mcux, mcuy, 1, 0,
                                dc_by_comp)))
    out += b"\xff\xd9"
    return bytes(out)
