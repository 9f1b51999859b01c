"""Delta Lake DELETION VECTORS — the public serialization, decoded.

Modern Delta writers default to deletion vectors for row-level
deletes: instead of rewriting a data file, a commit attaches a
``deletionVector`` descriptor to the file's add action, naming the
row indexes that no longer exist.  A reader that refuses DVs (the
round-11 posture) refuses most actively-updated tables; a reader that
ignores them resurrects deleted rows.  Everything needed is public
(delta-io PROTOCOL.md "Deletion Vectors" + the RoaringFormatSpec;
nothing here reads Delta source code):

- the descriptor: ``storageType`` 'i' (inline), 'u' (UUID-named file
  relative to the table), or 'p' (absolute path); ``pathOrInlineDv``;
  ``offset`` (file storage only); ``sizeInBytes``; ``cardinality``;
- Z85 (ZeroMQ base85, 4 bytes -> 5 chars) encodes inline payloads and
  the UUID in 'u' paths;
- the payload: a "RoaringBitmapArray" — magic 1681511377 (LE), an
  int64 LE count of 32-bit buckets, then per bucket an int32 LE key
  (the row index's high 32 bits) followed by a STANDARD 32-bit
  RoaringBitmap in the portable interoperable serialization
  (RoaringFormatSpec: cookies 12346/12347, array/bitset/run
  containers);
- on-disk framing (format version 1): a 1-byte version, then each
  stored DV as [int32 BE size][payload][int32 BE CRC-32 of payload],
  with the add action's ``offset`` pointing at the size word.

``build_dv_file`` / ``encode_inline_dv`` are the fixture twins: they
emit the same bytes a Delta writer would, choosing array, bitset, or
run containers by the same cardinality rules as the reference
roaring implementation, so the catalog oracle exercises every
container kind the reader must parse.

Reference analogue: none (no lakehouse surface in the reference);
extension inventory SURVEY §2.11.
"""

from __future__ import annotations

import struct
import zlib

__all__ = [
    "z85_decode",
    "z85_encode",
    "decode_roaring_array",
    "encode_roaring_array",
    "read_dv_descriptor",
    "build_dv_file",
    "encode_inline_dv",
]

_Z85_CHARS = (
    "0123456789abcdefghijklmnopqrstuvwxyz"
    "ABCDEFGHIJKLMNOPQRSTUVWXYZ.-:+=^!/*?&<>()[]{}@%$#"
)
_Z85_INDEX = {c: i for i, c in enumerate(_Z85_CHARS)}


def z85_encode(data: bytes) -> str:
    if len(data) % 4:
        raise ValueError("z85: input length must be a multiple of 4")
    out = []
    for i in range(0, len(data), 4):
        v = int.from_bytes(data[i:i + 4], "big")
        chunk = []
        for _ in range(5):
            chunk.append(_Z85_CHARS[v % 85])
            v //= 85
        out.extend(reversed(chunk))
    return "".join(out)


def z85_decode(text: str) -> bytes:
    if len(text) % 5:
        raise ValueError("z85: input length must be a multiple of 5")
    out = bytearray()
    for i in range(0, len(text), 5):
        v = 0
        for ch in text[i:i + 5]:
            try:
                v = v * 85 + _Z85_INDEX[ch]
            except KeyError:
                raise ValueError(f"z85: invalid character {ch!r}") from None
        if v >> 32:
            raise ValueError("z85: 5-character group overflows 32 bits")
        out += v.to_bytes(4, "big")
    return bytes(out)


# --- standard 32-bit roaring bitmap (RoaringFormatSpec) -------------------------

_SERIAL_COOKIE_NO_RUN = 12346
_SERIAL_COOKIE = 12347
_ROARING_ARRAY_MAGIC = 1681511377


def _decode_roaring32(buf: bytes, at: int) -> "tuple[list[int], int]":
    """One 32-bit roaring bitmap at ``buf[at:]`` -> (sorted values,
    bytes consumed)."""
    if at + 4 > len(buf):
        raise ValueError("roaring: truncated cookie")
    cookie = struct.unpack_from("<I", buf, at)[0]
    pos = at + 4
    run_bits = b""
    if (cookie & 0xFFFF) == _SERIAL_COOKIE:
        n = (cookie >> 16) + 1
        nb = (n + 7) // 8
        run_bits = buf[pos:pos + nb]
        if len(run_bits) < nb:
            raise ValueError("roaring: truncated run bitset")
        pos += nb
        has_offsets = n >= 4
    elif cookie == _SERIAL_COOKIE_NO_RUN:
        if pos + 4 > len(buf):
            raise ValueError("roaring: truncated container count")
        n = struct.unpack_from("<I", buf, pos)[0]
        pos += 4
        has_offsets = True
    else:
        raise ValueError(f"roaring: unknown cookie {cookie & 0xFFFF}")
    if n > (1 << 16):
        raise ValueError("roaring: container count beyond the key space")
    if pos + 4 * n > len(buf):
        raise ValueError("roaring: truncated descriptive headers")
    keys = [0] * n
    cards = [0] * n
    for i in range(n):
        keys[i], c = struct.unpack_from("<HH", buf, pos + 4 * i)
        cards[i] = c + 1
    pos += 4 * n
    if has_offsets:
        pos += 4 * n  # container offsets: recomputed by sequential walk
    out: list[int] = []
    for i in range(n):
        base = keys[i] << 16
        is_run = bool(run_bits and (run_bits[i // 8] >> (i % 8)) & 1)
        if is_run:
            if pos + 2 > len(buf):
                raise ValueError("roaring: truncated run count")
            n_runs = struct.unpack_from("<H", buf, pos)[0]
            pos += 2
            if pos + 4 * n_runs > len(buf):
                raise ValueError("roaring: truncated run container")
            for r in range(n_runs):
                start, length = struct.unpack_from("<HH", buf, pos + 4 * r)
                out.extend(range(base + start, base + start + length + 1))
            pos += 4 * n_runs
        elif cards[i] > 4096:  # bitset container
            if pos + 8192 > len(buf):
                raise ValueError("roaring: truncated bitset container")
            words = struct.unpack_from("<1024Q", buf, pos)
            pos += 8192
            for wi, w in enumerate(words):
                while w:
                    b = w & -w
                    out.append(base + (wi << 6) + b.bit_length() - 1)
                    w ^= b
        else:  # array container
            end = pos + 2 * cards[i]
            if end > len(buf):
                raise ValueError("roaring: truncated array container")
            vals = struct.unpack_from(f"<{cards[i]}H", buf, pos)
            out.extend(base + v for v in vals)
            pos = end
    return out, pos - at


def _encode_roaring32(values: "list[int]") -> bytes:
    """Sorted 32-bit values -> portable serialization, choosing the
    container kind the reference implementation would (run when it is
    smallest, bitset above 4096, else array); always writes the
    run-aware cookie when any run container is used."""
    buckets: dict[int, list[int]] = {}
    for v in values:
        buckets.setdefault(v >> 16, []).append(v & 0xFFFF)
    keys = sorted(buckets)
    payloads = []
    runflags = []
    for k in keys:
        lows = sorted(buckets[k])
        runs = []
        s = p = lows[0]
        for v in lows[1:]:
            if v == p + 1:
                p = v
            else:
                runs.append((s, p - s))
                s = p = v
        runs.append((s, p - s))
        run_size = 2 + 4 * len(runs)
        arr_size = 2 * len(lows)
        if run_size < min(arr_size, 8192):
            payloads.append(
                struct.pack("<H", len(runs))
                + b"".join(struct.pack("<HH", a, b) for a, b in runs)
            )
            runflags.append(True)
        elif len(lows) > 4096:
            words = [0] * 1024
            for v in lows:
                words[v >> 6] |= 1 << (v & 63)
            payloads.append(struct.pack("<1024Q", *words))
            runflags.append(False)
        else:
            payloads.append(struct.pack(f"<{len(lows)}H", *lows))
            runflags.append(False)
    n = len(keys)
    out = bytearray()
    if any(runflags):
        out += struct.pack("<I", _SERIAL_COOKIE | ((n - 1) << 16))
        bits = bytearray((n + 7) // 8)
        for i, f in enumerate(runflags):
            if f:
                bits[i // 8] |= 1 << (i % 8)
        out += bits
        has_offsets = n >= 4
    else:
        out += struct.pack("<I", _SERIAL_COOKIE_NO_RUN)
        out += struct.pack("<I", n)
        has_offsets = True
    for k, p in zip(keys, payloads):
        out += struct.pack("<HH", k, len(buckets[k]) - 1)
    if has_offsets:
        off = len(out) + 4 * n
        for p in payloads:
            out += struct.pack("<I", off)
            off += len(p)
    for p in payloads:
        out += p
    return bytes(out)


def decode_roaring_array(buf: bytes) -> "list[int]":
    """RoaringBitmapArray payload -> sorted 64-bit row indexes."""
    if len(buf) < 12:
        raise ValueError("dv: payload shorter than magic + count")
    magic, count = struct.unpack_from("<Iq", buf, 0)
    if magic != _ROARING_ARRAY_MAGIC:
        raise ValueError(f"dv: bad RoaringBitmapArray magic {magic}")
    if count < 0 or count > (1 << 32):
        raise ValueError(f"dv: implausible bucket count {count}")
    pos = 12
    out: list[int] = []
    for _ in range(count):
        if pos + 4 > len(buf):
            raise ValueError("dv: truncated bucket key")
        key = struct.unpack_from("<i", buf, pos)[0]
        if key < 0:
            raise ValueError("dv: negative bucket key")
        pos += 4
        vals, used = _decode_roaring32(buf, pos)
        pos += used
        out.extend((key << 32) | v for v in vals)
    return out


def encode_roaring_array(indexes: "list[int]") -> bytes:
    buckets: dict[int, list[int]] = {}
    for v in sorted(set(int(i) for i in indexes)):
        if v < 0:
            raise ValueError("dv: negative row index")
        buckets.setdefault(v >> 32, []).append(v & 0xFFFFFFFF)
    out = bytearray(struct.pack("<Iq", _ROARING_ARRAY_MAGIC, len(buckets)))
    for key in sorted(buckets):
        out += struct.pack("<i", key)
        out += _encode_roaring32(buckets[key])
    return bytes(out)


# --- descriptor resolution + file framing ---------------------------------------

def read_dv_descriptor(root: str, dv: dict) -> "list[int]":
    """An add action's ``deletionVector`` descriptor -> deleted row
    indexes.  Inline ('i') payloads are Z85; file payloads ('u'
    relative UUID / 'p' absolute) are framed [size BE][payload]
    [crc32 BE] at ``offset`` inside a version-1 DV file."""
    import os

    st = dv.get("storageType")
    if st == "i":
        payload = z85_decode(dv["pathOrInlineDv"])
    elif st in ("u", "p"):
        if st == "u":
            enc = dv["pathOrInlineDv"]
            prefix, uuid_part = enc[:-20], enc[-20:]
            raw = z85_decode(uuid_part)
            import uuid as _uuid

            name = f"deletion_vector_{_uuid.UUID(bytes=raw)}.bin"
            path = os.path.join(root, prefix, name) if prefix \
                else os.path.join(root, name)
        else:
            path = dv["pathOrInlineDv"]
        with open(path, "rb") as f:
            blob = f.read()
        if not blob or blob[0] != 1:
            raise NotImplementedError(
                f"delta: DV file format version "
                f"{blob[0] if blob else '?'} (version 1 is supported)"
            )
        off = int(dv.get("offset") or 1)
        if off + 4 > len(blob):
            raise ValueError("delta: DV offset beyond the file")
        size = struct.unpack_from(">I", blob, off)[0]
        payload = blob[off + 4:off + 4 + size]
        if len(payload) != size:
            raise ValueError("delta: truncated DV payload")
        crc = struct.unpack_from(">I", blob, off + 4 + size)[0]
        if crc != zlib.crc32(payload):
            raise ValueError("delta: DV payload CRC mismatch")
    else:
        raise NotImplementedError(
            f"delta: DV storageType {st!r} (i/u/p are supported)"
        )
    idx = decode_roaring_array(payload)
    card = dv.get("cardinality")
    if card is not None and card != len(idx):
        raise ValueError(
            f"delta: DV cardinality {card} != decoded {len(idx)}"
        )
    return idx


def build_dv_file(root: str, dvs: "list[list[int]]"):
    """Fixture twin: write one version-1 DV file holding each index
    list, named by a fresh UUID.  Returns the list of descriptors
    (storageType 'u') ready to embed in add actions."""
    import os
    import uuid as _uuid

    u = _uuid.uuid4()
    blob = bytearray([1])
    descs = []
    for indexes in dvs:
        payload = encode_roaring_array(indexes)
        off = len(blob)
        blob += struct.pack(">I", len(payload))
        blob += payload
        blob += struct.pack(">I", zlib.crc32(payload))
        descs.append({
            "storageType": "u",
            "pathOrInlineDv": z85_encode(u.bytes),
            "offset": off,
            "sizeInBytes": len(payload),
            "cardinality": len(set(indexes)),
        })
    with open(os.path.join(root, f"deletion_vector_{u}.bin"), "wb") as f:
        f.write(bytes(blob))
    return descs


def encode_inline_dv(indexes: "list[int]") -> dict:
    """Fixture twin for storageType 'i' (inline Z85) descriptors."""
    payload = encode_roaring_array(indexes)
    if len(payload) % 4:
        payload += bytes(4 - len(payload) % 4)  # Z85 needs 4-byte groups
    return {
        "storageType": "i",
        "pathOrInlineDv": z85_encode(payload),
        "sizeInBytes": len(payload),
        "cardinality": len(set(indexes)),
    }
