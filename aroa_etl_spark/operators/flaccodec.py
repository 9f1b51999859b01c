"""Pure-Python/NumPy FLAC codec (subset) — real lossless compressed
audio for the multimodal column path, no external dependency.

Implemented from the public FLAC format specification
(https://xiph.org/flac/format.html / RFC 9639):

- stream: ``fLaC`` magic, STREAMINFO + skipped metadata blocks;
- frames: fixed blocking strategy, UTF-8-coded frame numbers, CRC-8
  verified headers and CRC-16 verified frames;
- subframes: CONSTANT, VERBATIM, FIXED predictors (orders 0-4) and
  LPC (quantized linear predictors, any order), wasted-bits handling;
- residuals: Rice / Rice2 partitions including the escape-to-raw code;
- channel assignments: independent, left/side, right/side, mid/side
  (the side channel carries bits-per-sample + 1 per the spec).

The encoder emits fixed-predictor subframes with per-partition Rice
parameters and any of the four stereo decorrelation modes, which is
enough to generate real spec-conformant files for fixtures and the
catalog oracle — and because FLAC is lossless, decode(encode(x)) == x
BIT-EXACTLY, so tests and oracles are exact, not band-limited like
JPEG.  Out-of-subset streams (variable blocking, non-8/12/16/20/24
bps) raise NotImplementedError per the strict-mode contract (the
audio dispatch falls back to soundfile for those when installed).

Sequential bit-level work stays per-blob Python inside the
Arrow-batched kernels (operators/multimodal.py), the same cost profile
as the vendored JPEG codec.
"""

from __future__ import annotations

import numpy as np

__all__ = ["decode_flac", "encode_flac"]


# ---------------------------------------------------------------------------
# bit I/O
# ---------------------------------------------------------------------------

class _BitReader:
    __slots__ = ("data", "pos", "bit")

    def __init__(self, data: bytes, pos: int = 0):
        self.data = data
        self.pos = pos
        self.bit = 0

    def read(self, n: int) -> int:
        """Read n bits MSB-first."""
        out = 0
        pos, bit, data = self.pos, self.bit, self.data
        while n > 0:
            if pos >= len(data):
                raise ValueError("malformed FLAC: bitstream truncated")
            avail = 8 - bit
            take = min(n, avail)
            byte = data[pos]
            out = (out << take) | ((byte >> (avail - take)) & ((1 << take) - 1))
            bit += take
            if bit == 8:
                bit = 0
                pos += 1
            n -= take
        self.pos, self.bit = pos, bit
        return out

    def sread(self, n: int) -> int:
        """n-bit two's-complement signed read."""
        v = self.read(n)
        return v - (1 << n) if v >> (n - 1) else v

    def unary(self) -> int:
        """Count zero bits up to the terminating 1."""
        q = 0
        while self.read(1) == 0:
            q += 1
        return q

    def align(self) -> None:
        if self.bit:
            self.bit = 0
            self.pos += 1


class _BitWriter:
    __slots__ = ("buf", "acc", "nacc")

    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.nacc = 0

    def write(self, v: int, n: int) -> None:
        if n == 0:
            return
        self.acc = (self.acc << n) | (v & ((1 << n) - 1))
        self.nacc += n
        while self.nacc >= 8:
            self.nacc -= 8
            self.buf.append((self.acc >> self.nacc) & 0xFF)
        self.acc &= (1 << self.nacc) - 1

    def unary(self, q: int) -> None:
        while q >= 32:
            self.write(0, 32)
            q -= 32
        self.write(1, q + 1)

    def align(self) -> None:
        if self.nacc:
            self.write(0, 8 - self.nacc)

    def bytes(self) -> bytes:
        assert self.nacc == 0
        return bytes(self.buf)


# ---------------------------------------------------------------------------
# CRCs (FLAC frame integrity: CRC-8 poly 0x07, CRC-16 poly 0x8005)
# ---------------------------------------------------------------------------

def _crc_table(poly: int, width: int) -> list[int]:
    top = 1 << (width - 1)
    mask = (1 << width) - 1
    table = []
    for b in range(256):
        r = b << (width - 8)
        for _ in range(8):
            r = ((r << 1) ^ poly) & mask if r & top else (r << 1) & mask
        table.append(r)
    return table


_CRC8 = _crc_table(0x07, 8)
_CRC16 = _crc_table(0x8005, 16)


def crc8(data: bytes) -> int:
    r = 0
    for b in data:
        r = _CRC8[r ^ b]
    return r


def crc16(data: bytes) -> int:
    r = 0
    for b in data:
        r = _CRC16[((r >> 8) ^ b) & 0xFF] ^ ((r << 8) & 0xFFFF)
    return r


# ---------------------------------------------------------------------------
# shared coding tables
# ---------------------------------------------------------------------------

_BPS_CODE = {8: 0b001, 12: 0b010, 16: 0b100, 20: 0b101, 24: 0b110}
_BPS_FROM_CODE = {v: k for k, v in _BPS_CODE.items()}

# FIXED predictor: residual = prediction error of order-k polynomial
_FIXED_COEFFS = {
    0: [],
    1: [1],
    2: [2, -1],
    3: [3, -3, 1],
    4: [4, -6, 4, -1],
}


def _utf8_number(n: int) -> bytes:
    """FLAC's UTF-8-style coded number (frame index)."""
    if n < 0x80:
        return bytes([n])
    out = []
    bits = n.bit_length()
    nbytes = 2
    # payload capacity of an n-byte coding: (7 - nbytes) lead bits +
    # 6 * (nbytes - 1) continuation bits = 5*nbytes + 1  (the round-6
    # review found the old formula DECREASING in nbytes — an infinite
    # loop from frame index 1024 on)
    while bits > 5 * nbytes + 1:
        nbytes += 1
    if nbytes > 7:
        raise ValueError(f"coded number too large: {n}")
    lead = (0xFF << (8 - nbytes)) & 0xFF | (n >> (6 * (nbytes - 1)))
    out.append(lead & 0xFF)
    for i in range(nbytes - 2, -1, -1):
        out.append(0x80 | ((n >> (6 * i)) & 0x3F))
    return bytes(out)


def _read_utf8_number(r: _BitReader) -> int:
    first = r.read(8)
    if first < 0x80:
        return first
    nbytes = 0
    probe = first
    while probe & 0x80:
        nbytes += 1
        probe <<= 1
    if nbytes < 2 or nbytes > 7:
        raise ValueError("malformed FLAC: bad UTF-8 coded number")
    v = first & (0x7F >> nbytes)
    for _ in range(nbytes - 1):
        b = r.read(8)
        if b & 0xC0 != 0x80:
            raise ValueError("malformed FLAC: bad UTF-8 continuation")
        v = (v << 6) | (b & 0x3F)
    return v


# ---------------------------------------------------------------------------
# decoder
# ---------------------------------------------------------------------------

def _read_residual(r: _BitReader, block_size: int, order: int) -> list[int]:
    method = r.read(2)
    if method > 1:
        raise ValueError("malformed FLAC: reserved residual method")
    pbits = 4 if method == 0 else 5
    escape = (1 << pbits) - 1
    po = r.read(4)
    nparts = 1 << po
    if block_size % nparts or (block_size >> po) <= order:
        raise ValueError("malformed FLAC: bad partition order")
    res: list[int] = []
    for p in range(nparts):
        n = (block_size >> po) - (order if p == 0 else 0)
        param = r.read(pbits)
        if param == escape:
            raw = r.read(5)
            res.extend(r.sread(raw) if raw else 0 for _ in range(n))
        else:
            for _ in range(n):
                q = r.unary()
                v = (q << param) | r.read(param) if param else q
                res.append((v >> 1) ^ -(v & 1))  # zigzag
    return res


def _predict(warmup: list[int], residual: list[int], coeffs: list[int],
             shift: int) -> list[int]:
    out = list(warmup)
    order = len(coeffs)
    for e in residual:
        pred = sum(c * out[-i - 1] for i, c in enumerate(coeffs)) >> shift
        out.append(e + pred)
    return out


def _read_subframe(r: _BitReader, block_size: int, bps: int) -> list[int]:
    if r.read(1):
        raise ValueError("malformed FLAC: subframe padding bit set")
    ftype = r.read(6)
    wasted = 0
    if r.read(1):
        wasted = r.unary() + 1
    eff = bps - wasted
    if ftype == 0:  # CONSTANT
        out = [r.sread(eff)] * block_size
    elif ftype == 1:  # VERBATIM
        out = [r.sread(eff) for _ in range(block_size)]
    elif 8 <= ftype <= 12:  # FIXED order 0-4
        order = ftype - 8
        warmup = [r.sread(eff) for _ in range(order)]
        res = _read_residual(r, block_size, order)
        out = _predict(warmup, res, _FIXED_COEFFS[order], 0)
    elif ftype >= 32:  # LPC
        order = (ftype & 31) + 1
        warmup = [r.sread(eff) for _ in range(order)]
        precision = r.read(4) + 1
        if precision == 16:
            raise ValueError("malformed FLAC: invalid LPC precision")
        shift = r.sread(5)
        if shift < 0:
            raise ValueError("malformed FLAC: negative LPC shift")
        coeffs = [r.sread(precision) for _ in range(order)]
        res = _read_residual(r, block_size, order)
        out = _predict(warmup, res, coeffs, shift)
    else:
        raise ValueError(f"malformed FLAC: reserved subframe type {ftype}")
    if wasted:
        out = [v << wasted for v in out]
    return out


_BLOCKSIZE_FIXED = {
    1: 192, 2: 576, 3: 1152, 4: 2304, 5: 4608,
    8: 256, 9: 512, 10: 1024, 11: 2048, 12: 4096,
    13: 8192, 14: 16384, 15: 32768,
}


def decode_flac(content: bytes) -> tuple[np.ndarray, int, int]:
    """Decode a FLAC stream → (int32 samples (n, channels), rate, bps).

    Verifies frame-header CRC-8 and whole-frame CRC-16; trusts
    STREAMINFO for rate/channels/bps and requires frames to agree."""
    if content[:4] != b"fLaC":
        raise ValueError("not a FLAC stream")
    pos = 4
    info = None
    while True:
        if pos + 4 > len(content):
            raise ValueError("malformed FLAC: truncated metadata")
        head = content[pos]
        size = int.from_bytes(content[pos + 1:pos + 4], "big")
        body = content[pos + 4:pos + 4 + size]
        if head & 0x7F == 0:  # STREAMINFO
            if size < 34:
                raise ValueError("malformed FLAC: short STREAMINFO")
            br = _BitReader(body)
            br.read(16), br.read(16), br.read(24), br.read(24)
            rate = br.read(20)
            channels = br.read(3) + 1
            bps = br.read(5) + 1
            total = br.read(36)
            info = (rate, channels, bps, total)
        pos += 4 + size
        if head & 0x80:
            break
    if info is None:
        raise ValueError("malformed FLAC: no STREAMINFO")
    rate, channels, bps, total = info
    if bps not in _BPS_CODE:
        raise NotImplementedError(f"FLAC subset: {bps} bits/sample unsupported")

    chunks: list[np.ndarray] = []
    got = 0
    while (total == 0 or got < total) and pos < len(content):
        frame_start = pos
        r = _BitReader(content, pos)
        if r.read(14) != 0b11111111111110:
            raise ValueError("malformed FLAC: lost frame sync")
        if r.read(1):
            raise ValueError("malformed FLAC: reserved bit set")
        if r.read(1):
            raise NotImplementedError("FLAC subset: variable blocksize strategy")
        bs_code = r.read(4)
        sr_code = r.read(4)
        ch_code = r.read(4)
        ss_code = r.read(3)
        if r.read(1):
            raise ValueError("malformed FLAC: reserved header bit")
        _frame_no = _read_utf8_number(r)
        if bs_code == 0 or bs_code in (6, 7):
            if bs_code == 6:
                block_size = r.read(8) + 1
            elif bs_code == 7:
                block_size = r.read(16) + 1
            else:
                raise ValueError("malformed FLAC: reserved blocksize code")
        else:
            block_size = _BLOCKSIZE_FIXED[bs_code]
        if sr_code == 12:
            r.read(8)
        elif sr_code in (13, 14):
            r.read(16)
        elif sr_code == 15:
            raise ValueError("malformed FLAC: invalid sample-rate code")
        if ss_code not in (0, *_BPS_FROM_CODE):
            raise ValueError("malformed FLAC: reserved sample-size code")
        if ss_code and _BPS_FROM_CODE[ss_code] != bps:
            raise ValueError("malformed FLAC: frame bps != STREAMINFO")
        r.align()
        hcrc = r.read(8)
        if crc8(content[frame_start:r.pos - 1]) != hcrc:
            raise ValueError("malformed FLAC: frame header CRC-8 mismatch")

        if ch_code < 8:
            n_ch = ch_code + 1
            side = None
        elif ch_code in (8, 9, 10):
            n_ch = 2
            side = ch_code
        else:
            raise ValueError("malformed FLAC: reserved channel assignment")
        if n_ch != channels:
            raise ValueError("malformed FLAC: frame channels != STREAMINFO")

        subs: list[list[int]] = []
        for c in range(n_ch):
            ch_bps = bps
            if side == 8 and c == 1:      # left/side: side has bps+1
                ch_bps += 1
            elif side == 9 and c == 0:    # right/side
                ch_bps += 1
            elif side == 10 and c == 1:   # mid/side
                ch_bps += 1
            subs.append(_read_subframe(r, block_size, ch_bps))
        r.align()
        fcrc = r.read(16)
        if crc16(content[frame_start:r.pos - 2]) != fcrc:
            raise ValueError("malformed FLAC: frame CRC-16 mismatch")
        pos = r.pos

        a = np.array(subs, dtype=np.int64)
        if side == 8:    # left/side: right = left - side
            left, s = a[0], a[1]
            a = np.stack([left, left - s])
        elif side == 9:  # right/side: left = right + side
            s, right = a[0], a[1]
            a = np.stack([right + s, right])
        elif side == 10:  # mid/side
            mid, s = a[0], a[1]
            left = (2 * mid + (s & 1) + s) >> 1
            a = np.stack([left, left - s])
        chunks.append(a.T.astype(np.int32))
        got += block_size
    if total and got < total:
        raise ValueError("malformed FLAC: stream ended early")
    out = np.concatenate(chunks, axis=0) if chunks else np.zeros((0, channels), np.int32)
    return (out[:total] if total else out), rate, bps


# ---------------------------------------------------------------------------
# encoder (fixed predictors, per-partition Rice, 4 stereo modes)
# ---------------------------------------------------------------------------

def _best_fixed_order(x: np.ndarray) -> int:
    """Pick the fixed-predictor order with the smallest absolute
    residual sum (the standard cheap heuristic)."""
    best, best_cost = 0, None
    d = x.astype(np.int64)
    for order in range(5):
        if len(d) < 1:
            break
        cost = int(np.abs(d).sum())
        if best_cost is None or cost < best_cost:
            best, best_cost = order, cost
        d = np.diff(d)
    return best


def _rice_param(res: np.ndarray) -> int:
    """Smallest k with mean(zigzag) < 2^k — the textbook estimate."""
    if len(res) == 0:
        return 0
    zz = (np.abs(res.astype(np.int64)) << 1).mean()
    k = 0
    while (1 << k) < zz and k < 14:
        k += 1
    return k


def _write_residual(w: _BitWriter, res: np.ndarray, order: int,
                    block_size: int) -> None:
    po = 0  # partition order 0 unless the block splits evenly in 4
    if block_size % 4 == 0 and (block_size >> 2) > order and len(res) >= 16:
        po = 2
    w.write(0, 2)   # RICE (4-bit params)
    w.write(po, 4)
    nparts = 1 << po
    start = 0
    for p in range(nparts):
        n = (block_size >> po) - (order if p == 0 else 0)
        part = res[start:start + n]
        start += n
        k = min(_rice_param(part), 14)
        w.write(k, 4)
        for v in part.tolist():
            zz = (abs(v) << 1) - 1 if v < 0 else (v << 1)
            w.unary(zz >> k)
            if k:
                w.write(zz & ((1 << k) - 1), k)


def _write_subframe(w: _BitWriter, x: np.ndarray, bps: int) -> None:
    w.write(0, 1)
    if bool((x == x[0]).all()):
        w.write(0, 6)   # CONSTANT
        w.write(0, 1)
        w.write(int(x[0]), bps)
        return
    order = _best_fixed_order(x)
    order = min(order, max(0, len(x) - 1))
    w.write(8 + order, 6)  # FIXED
    w.write(0, 1)          # no wasted bits
    for v in x[:order].tolist():
        w.write(int(v), bps)
    res = x.astype(np.int64)
    for _ in range(order):
        res = np.diff(res)
    _write_residual(w, res, order, len(x))


def encode_flac(
    samples: np.ndarray,
    rate: int = 8000,
    *,
    block_size: int = 4096,
    stereo_mode: str = "independent",
) -> bytes:
    """Encode int16 samples (n,) or (n, channels) as a FLAC stream.

    Fixed-predictor subframes with per-partition Rice coding;
    ``stereo_mode`` one of independent / left_side / right_side /
    mid_side (2-channel input only) exercises every decoder
    decorrelation path.  Lossless: decode_flac(encode_flac(x))[0] == x.
    """
    if samples.ndim == 1:
        samples = samples[:, None]
    if samples.dtype != np.int16:
        raise ValueError("encode_flac: int16 samples only")
    n, channels = samples.shape
    bps = 16
    if stereo_mode != "independent" and channels != 2:
        raise ValueError("stereo decorrelation needs exactly 2 channels")

    out = bytearray(b"fLaC")
    si = _BitWriter()
    si.write(block_size, 16)
    si.write(block_size, 16)
    si.write(0, 24)
    si.write(0, 24)
    si.write(rate, 20)
    si.write(channels - 1, 3)
    si.write(bps - 1, 5)
    si.write(n, 36)
    body = si.bytes() + b"\x00" * 16  # md5 unset (all zero = unknown)
    out += bytes([0x80]) + len(body).to_bytes(3, "big") + body

    ch_code = {
        "independent": channels - 1,
        "left_side": 8,
        "right_side": 9,
        "mid_side": 10,
    }[stereo_mode]

    for fi, start in enumerate(range(0, n, block_size)):
        block = samples[start:start + block_size].astype(np.int64)
        bs = block.shape[0]
        w = _BitWriter()
        w.write(0b11111111111110, 14)
        w.write(0, 1)
        w.write(0, 1)  # fixed blocksize strategy
        w.write(7, 4)  # blocksize: 16-bit value - 1 follows
        w.write(0, 4)  # sample rate: from STREAMINFO
        w.write(ch_code, 4)
        w.write(_BPS_CODE[bps], 3)
        w.write(0, 1)
        for b in _utf8_number(fi):
            w.write(b, 8)
        w.write(bs - 1, 16)
        w.align()
        hdr = w.bytes()
        hdr += bytes([crc8(hdr)])

        w = _BitWriter()
        if stereo_mode == "independent":
            plan = [(block[:, c], bps) for c in range(channels)]
        else:
            left, right = block[:, 0], block[:, 1]
            s = left - right
            if stereo_mode == "left_side":
                plan = [(left, bps), (s, bps + 1)]
            elif stereo_mode == "right_side":
                plan = [(s, bps + 1), (right, bps)]
            else:
                mid = (left + right) >> 1
                plan = [(mid, bps), (s, bps + 1)]
        for x, ch_bps in plan:
            _write_subframe(w, x, ch_bps)
        w.align()
        frame = hdr + w.bytes()
        frame += crc16(frame).to_bytes(2, "big")
        out += frame
    return bytes(out)
