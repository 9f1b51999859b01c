"""Pure-NumPy baseline JPEG codec (no external dependencies).

The sandbox has no PIL/libjpeg, but JPEG is the dominant real-world
format for the reference's scanned-card corpus (S8; indizierung
notebook inputs are JPEG/TIFF scans), so the engine vendors a minimal
BASELINE SEQUENTIAL codec implemented from the public JPEG standard
(ITU-T T.81 / ISO 10918-1) — the same public spec every libjpeg
implements:

- ``decode_baseline_jpeg``: marker parse (DQT/SOF0/SOF1/DHT/DRI/SOS),
  table-driven canonical Huffman decode with byte-unstuffing and
  restart-marker support, dequantize + inverse zigzag + 8x8 IDCT-III,
  chroma upsampling for sampling factors in {1, 2} (4:4:4 / 4:2:2 /
  4:2:0), JFIF YCbCr -> RGB.  Progressive (SOF2), arithmetic coding,
  and 12-bit precision raise ``NotImplementedError`` — dispatch then
  falls through to PIL when installed (operators/multimodal.py).
- ``encode_baseline_jpeg``: the inverse pipeline with the standard
  Annex K quantization + Huffman tables (quality-scaled the libjpeg
  way), 4:4:4 or 4:2:0, optional restart intervals.  Exists so tests
  can create REAL JPEG fixtures in a container with no encoder, and
  round-trip (encode -> decode ~= original within quantization error)
  validates both directions against each other.

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


def decode_baseline_jpeg(content: bytes) -> np.ndarray:
    """Decode a baseline-sequential JPEG to an (H, W, C) uint8 array
    (C = 1 grayscale, 3 RGB).  Raises NotImplementedError for
    progressive / arithmetic / 12-bit streams and ValueError for
    malformed data."""
    if content[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    pos = 2
    qtables: dict[int, np.ndarray] = {}
    htables: dict[tuple[int, int], dict[tuple[int, int], int]] = {}
    frame = None
    restart_interval = 0
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
        (seglen,) = struct.unpack(">H", content[pos:pos + 2])
        seg = content[pos + 2:pos + seglen]
        if marker == 0xDB:  # DQT
            p = 0
            while p < len(seg):
                pq, tq = seg[p] >> 4, seg[p] & 15
                p += 1
                if pq == 0:
                    tbl = np.frombuffer(seg[p:p + 64], dtype=np.uint8).astype(np.int64)
                    p += 64
                else:
                    tbl = np.frombuffer(seg[p:p + 128], dtype=">u2").astype(np.int64)
                    p += 128
                qtables[tq] = tbl  # zigzag order
        elif marker in (0xC0, 0xC1):  # SOF0 baseline / SOF1 ext sequential
            precision = seg[0]
            if precision != 8:
                raise NotImplementedError(f"{precision}-bit JPEG not supported")
            h, w = struct.unpack(">HH", seg[1:5])
            ncomp = seg[5]
            comps = []
            for i in range(ncomp):
                cid, hv, tq = seg[6 + 3 * i], seg[7 + 3 * i], seg[8 + 3 * i]
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 15, "tq": tq})
            frame = {"h": h, "w": w, "comps": comps}
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                f"JPEG SOF marker 0x{marker:02X} (progressive/arithmetic/"
                "hierarchical) not supported by the baseline codec"
            )
        elif marker == 0xC4:  # DHT
            p = 0
            while p < len(seg):
                tc, th = seg[p] >> 4, seg[p] & 15
                bits = list(seg[p + 1:p + 17])
                nv = sum(bits)
                values = list(seg[p + 17:p + 17 + nv])
                htables[(tc, th)] = _decode_table(bits, values)
                p += 17 + nv
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack(">H", seg[:2])
        elif marker == 0xDA:  # SOS
            if frame is None:
                raise ValueError("SOS before SOF")
            ns = seg[0]
            scan = {}
            for i in range(ns):
                cs, tt = seg[1 + 2 * i], seg[2 + 2 * i]
                scan[cs] = (tt >> 4, tt & 15)
            data_start = pos + seglen
            return _decode_scan(
                content, data_start, frame, scan, qtables, htables, restart_interval
            )
        pos += seglen
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
                dc_t = htables[(0, scan[c["id"]][0])]
                ac_t = htables[(1, scan[c["id"]][1])]
                q = qtables[c["tq"]]
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
# encoder (fixture generation + round-trip validation)
# ---------------------------------------------------------------------------


def _quality_scale(table: np.ndarray, quality: int) -> np.ndarray:
    quality = min(100, max(1, quality))
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    return np.clip((table * scale + 50) // 100, 1, 255)


def _encode_block(
    w: _BitWriter, block: np.ndarray, q: np.ndarray, pred: int,
    dc_codes, ac_codes,
) -> int:
    coef = _D @ (block - 128.0) @ _D.T
    zz = np.round(coef.reshape(64)[ZIGZAG] / q[ZIGZAG]).astype(np.int64)
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
        comps = [px[:, :, 0]]
    else:
        rr, g, b = px[:, :, 0], px[:, :, 1], px[:, :, 2]
        y = 0.299 * rr + 0.587 * g + 0.114 * b
        cb = -0.168736 * rr - 0.331264 * g + 0.5 * b + 128.0
        cr = 0.5 * rr - 0.418688 * g - 0.081312 * b + 128.0
        comps = [y, cb, cr]

    sub = 2 if (subsampling == "420" and not gray) else 1
    if sub == 2 and not gray:
        # average-pool chroma 2x2 (pad to even first)
        def pool(p):
            pe = np.pad(p, ((0, p.shape[0] % 2), (0, p.shape[1] % 2)), mode="edge")
            return (pe[0::2, 0::2] + pe[0::2, 1::2] + pe[1::2, 0::2] + pe[1::2, 1::2]) / 4.0

        comps = [comps[0], pool(comps[1]), pool(comps[2])]

    samp = [(sub, sub)] + [(1, 1), (1, 1)] if not gray else [(1, 1)]
    hmax = max(s[0] for s in samp)
    vmax = max(s[1] for s in samp)
    mcux = -(-W // (8 * hmax))
    mcuy = -(-H // (8 * vmax))
    padded = []
    for ci, p in enumerate(comps):
        ph = mcuy * samp[ci][1] * 8
        pw = mcux * samp[ci][0] * 8
        padded.append(
            np.pad(p, ((0, ph - p.shape[0]), (0, pw - p.shape[1])), mode="edge")
        )

    dc_l = _canonical_codes(*HUFF_DC_LUMA)
    ac_l = _canonical_codes(*HUFF_AC_LUMA)
    dc_c = _canonical_codes(*HUFF_DC_CHROMA)
    ac_c = _canonical_codes(*HUFF_AC_CHROMA)

    w = _BitWriter()
    pred = [0] * len(comps)
    nmcu = 0
    restarts: list[int] = []  # byte offsets where RST markers go
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and nmcu and nmcu % restart_interval == 0:
                w.flush()
                restarts.append(len(w.out))
                pred = [0] * len(comps)
            nmcu += 1
            for ci in range(len(comps)):
                q = qy if ci == 0 else qc
                dc_codes = dc_l if ci == 0 else dc_c
                ac_codes = ac_l if ci == 0 else ac_c
                hh, vv = samp[ci]
                for by in range(vv):
                    for bx in range(hh):
                        y0 = (my * vv + by) * 8
                        x0 = (mx * hh + bx) * 8
                        block = padded[ci][y0:y0 + 8, x0:x0 + 8]
                        pred[ci] = _encode_block(w, block, q, pred[ci], dc_codes, ac_codes)
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
