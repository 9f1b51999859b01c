"""Avro Object Container Files (OCF) read/write without spark-avro.

Avro is a core data-lake interchange format, but Spark's reader lives
in the external ``spark-avro`` jar — absent here, and in plenty of
locked-down clusters.  The OCF layout (Avro 1.11 spec, "Object
Container Files") is small enough to own:

    'Obj\\x01' | file-metadata map | 16-byte sync marker
    repeat: [record count: long][serialized size: long]
            [block payload (codec)] [sync marker]

with every ``long``/``int`` zigzag-varint encoded, strings/bytes
length-prefixed, doubles little-endian IEEE, booleans one byte, and
two-branch null unions a varint branch index that honors the DECLARED
branch order (``["null", T]`` and ``[T, "null"]`` both occur in the
wild).  Supported here (round 10 widened; round 11 added bytes/fixed
and the logical types): record schemas over ``long / int / string /
double / boolean / bytes``, FIXED blocks, NESTED records, ARRAYS
(block-encoded, including negative block counts carrying a byte-size
skip hint), and null unions at any position; codecs ``null``,
``deflate`` (raw zlib, -15), and ``snappy`` — the default codec of
most production Avro writers — via a vendored pure-Python decoder for
the public snappy block format (google/snappy
format_description.txt), with the spec's trailing 4-byte big-endian
CRC32 of the uncompressed block verified.  Maps (string-keyed,
block-encoded) and enums (index into the symbol list) decode too.

LOGICAL TYPES (round 11, r10 verdict #5 — standard in production Avro
from the Kafka/Debezium ecosystems): ``decimal`` over bytes/fixed
(big-endian two's complement unscaled int -> ``decimal.Decimal``),
``date`` over int (epoch days -> ``datetime.date``),
``timestamp-millis``/``timestamp-micros`` over long (->
naive-UTC ``datetime.datetime``), each landing as the matching TYPED
Spark column (DecimalType/DateType/TimestampNTZType) through
``avro_records``; ``uuid`` keeps its string base (Spark has no uuid
type) and any UNKNOWN logicalType keeps its base type with the
annotation surfaced verbatim in the returned header schema.

Multi-branch unions decode to nullable memberK dicts, and NAMED-TYPE
REFERENCES resolve (both round 12) — records/enums/fixed register
under their (namespace-qualified) names as defined, later bare names
follow the definition, and self-referential records (linked lists —
the data terminates via null unions) decode with bounded recursion.
Anything outside this set still raises ``NotImplementedError`` with
the offending construct named: the honest capability boundary, not a
silent misparse.

Integrity: every block's sync marker is compared against the header's
(the spec's corruption/seek guard), and a block whose payload decodes
to a different record count than declared fails loudly.

Spark surface: ``parse_avro_blob`` (bytes -> header + row dicts) runs
inside ``avro_records`` as an Arrow-batched mapInPandas kernel — one
blob per row in, records exploded out, zero shuffle, the same scale
shape as the WARC/tar/mbox/zip kernels.  ``build_avro_ocf`` is the
fixture-side twin used by tests and the catalog oracle's replay
arithmetic.
"""

from __future__ import annotations

import json
import struct
import zlib
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

__all__ = [
    "build_avro_ocf",
    "parse_avro_blob",
    "avro_records",
    "snappy_compress",
    "snappy_decompress",
]

_MAGIC = b"Obj\x01"
_SIMPLE = {"long", "int", "string", "double", "boolean", "bytes"}
_CODECS = ("null", "deflate", "snappy", "bzip2", "xz", "zstandard")


# --- vendored snappy block format -------------------------------------------
# (public spec: google/snappy format_description.txt — same vendoring
# pattern as the JPEG/FLAC codecs)

def snappy_decompress(buf: bytes) -> bytes:
    """Decode one snappy block: LE base-128 varint preamble (the
    uncompressed length), then tagged literal / copy elements.
    Overlapping copies replicate byte-serially per the spec."""
    ulen = 0
    shift = 0
    pos = 0
    while True:
        if pos >= len(buf):
            raise ValueError("snappy: truncated length preamble")
        b = buf[pos]
        pos += 1
        ulen |= (b & 0x7F) << shift
        if not b & 0x80:
            break
        shift += 7
        if shift > 35:
            raise ValueError("snappy: length preamble varint too long")
    out = bytearray()
    while pos < len(buf):
        tag = buf[pos]
        pos += 1
        typ = tag & 3
        if typ == 0:  # literal
            ln = tag >> 2
            if ln >= 60:
                nb = ln - 59
                if pos + nb > len(buf):
                    raise ValueError("snappy: truncated literal length")
                ln = int.from_bytes(buf[pos:pos + nb], "little")
                pos += nb
            ln += 1
            if pos + ln > len(buf):
                raise ValueError("snappy: literal overruns the input")
            out += buf[pos:pos + ln]
            pos += ln
            continue
        if typ == 1:  # copy, 1-byte offset
            if pos >= len(buf):
                raise ValueError("snappy: truncated copy element")
            ln = ((tag >> 2) & 0x7) + 4
            off = ((tag >> 5) << 8) | buf[pos]
            pos += 1
        elif typ == 2:  # copy, 2-byte offset
            if pos + 2 > len(buf):
                raise ValueError("snappy: truncated copy element")
            ln = (tag >> 2) + 1
            off = int.from_bytes(buf[pos:pos + 2], "little")
            pos += 2
        else:  # copy, 4-byte offset
            if pos + 4 > len(buf):
                raise ValueError("snappy: truncated copy element")
            ln = (tag >> 2) + 1
            off = int.from_bytes(buf[pos:pos + 4], "little")
            pos += 4
        if off == 0 or off > len(out):
            raise ValueError("snappy: copy offset outside decoded output")
        if off >= ln:  # disjoint: one slice
            start = len(out) - off
            out += out[start:start + ln]
        else:  # overlapping: byte-serial replication (run-length idiom)
            for _ in range(ln):
                out.append(out[-off])
    if len(out) != ulen:
        raise ValueError(
            f"snappy: preamble declared {ulen} bytes, decoded {len(out)}"
        )
    return bytes(out)


def snappy_compress(data: bytes) -> bytes:
    """Encode as valid snappy using literal elements only — compression
    is optional in the format (every decoder must accept pure
    literals); the DEcoder above handles real writers' copy elements."""
    out = bytearray()
    n = len(data)
    while True:
        b = n & 0x7F
        n >>= 7
        out.append(b | 0x80 if n else b)
        if not n:
            break
    for at in range(0, len(data), 65536):
        chunk = data[at:at + 65536]
        ln = len(chunk) - 1
        if ln < 60:
            out.append(ln << 2)
        else:
            nb = (ln.bit_length() + 7) // 8
            out.append((59 + nb) << 2)
            out += ln.to_bytes(nb, "little")
        out += chunk
    return bytes(out)


# --- primitive binary codec ------------------------------------------------

def _zstd_content_size(buf: bytes) -> int:
    """Frame_Content_Size from a zstd frame header (RFC 8878 §3.1.1):
    pyarrow's bundled zstd can decompress only with the expected size,
    and Avro's zstandard codec is raw frames — writers that know their
    input size (pyarrow, python-zstandard, zstd-jni defaults) always
    record it.  Frames without it raise NotImplementedError by name."""
    if len(buf) < 5 or buf[:4] != b"\x28\xb5\x2f\xfd":
        raise ValueError("avro: zstandard block without a zstd frame magic")
    fhd = buf[4]
    fcs_flag = fhd >> 6
    single_segment = (fhd >> 5) & 1
    did_flag = fhd & 3
    pos = 5
    if not single_segment:
        pos += 1  # Window_Descriptor
    pos += (0, 1, 2, 4)[did_flag]
    if fcs_flag == 0:
        if not single_segment:
            raise NotImplementedError(
                "avro: zstd frame does not record its content size "
                "(streaming-mode writer); size-carrying frames are "
                "supported"
            )
        size_len = 1
    else:
        size_len = (0, 2, 4, 8)[fcs_flag]
    raw = buf[pos:pos + size_len]
    if len(raw) != size_len:
        raise ValueError("avro: zstd frame header truncated")
    n = int.from_bytes(raw, "little")
    if fcs_flag == 1:
        n += 256
    return n


def _zz_encode(n: int) -> bytes:
    u = (n << 1) ^ (n >> 63)
    out = bytearray()
    while True:
        b = u & 0x7F
        u >>= 7
        if u:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _zz_decode(buf: bytes, pos: int) -> tuple[int, int]:
    shift = 0
    u = 0
    while True:
        if pos >= len(buf):
            raise ValueError("avro: varint overruns the buffer")
        b = buf[pos]
        pos += 1
        u |= (b & 0x7F) << shift
        if not b & 0x80:
            break
        shift += 7
        if shift > 70:
            raise ValueError("avro: varint too long")
    return (u >> 1) ^ -(u & 1), pos


def _parse_type(t, env=None, ns=None):
    """Avro schema type -> decode/encode node:

    - ``("prim", name)`` — one of the five primitives
    - ``("record", [(field_name, node), ...])`` — nested records nest
    - ``("array", item_node)`` — block-encoded arrays
    - ``("map", value_node)`` — block-encoded string-keyed maps
    - ``("enum", [symbols])`` — zigzag index into the symbol list
    - ``("union", null_branch, value_node)`` — two-branch null union;
      ``null_branch`` preserves the DECLARED order (a ``[T, "null"]``
      writer puts null at branch 1, and assuming 0 would misparse)
    - ``("fixed", size)`` — fixed-size byte blocks
    - ``("decimal", base_node, scale)`` / ``("date", base_node)`` /
      ``("timestamp", base_node, unit_us)`` — LOGICAL TYPES (round 11,
      Avro 1.11 spec): decimal over bytes/fixed (big-endian two's
      complement unscaled int), date over int (epoch days),
      timestamp-millis/-micros over long.  ``uuid`` stays its string
      base (Spark has no uuid type) and any UNKNOWN logicalType keeps
      its base type — the annotation is still surfaced verbatim in the
      header schema parse_avro_blob returns.

    NAMED-TYPE REFERENCES resolve since round 12: records/enums/fixed
    register under their (namespace-qualified) names in ``env`` as they
    are defined — forward cells, so SELF-referential records (linked
    lists, trees — terminated by null unions in the data) parse too —
    and a later bare name becomes a ``("ref", cell)`` node following
    the registered definition.

    Raises ``NotImplementedError`` naming anything outside this set."""
    if env is None:
        env = {}
    if isinstance(t, str):
        if t in _SIMPLE:
            return ("prim", t)
        if t in env:
            return ("ref", env[t])
        raise NotImplementedError(f"avro: unsupported type {t!r}")
    if isinstance(t, list):
        if any(isinstance(bt, list) for bt in t):
            raise ValueError(
                "avro: unions may not immediately contain unions"
            )
        if len(t) == 2 and "null" in t:
            nb = t.index("null")
            return ("union", nb, _parse_type(t[1 - nb], env, ns))
        # MULTI-BRANCH unions (round 12): ["null", A, B, ...] or
        # [A, B] — decoded to a dict of nullable "memberK" entries
        # (K indexes the NON-NULL branches in declared order, the
        # same member naming Spark's own Avro connector surfaces),
        # with the null branch decoding to None.  The spec forbids
        # immediately-nested unions and duplicate branches.
        if len(t) < 2:
            raise ValueError(f"avro: union with {len(t)} branches")
        branches = []
        for bt in t:
            if bt == "null":
                branches.append(None)
            elif isinstance(bt, list):
                raise ValueError(
                    "avro: unions may not immediately contain unions"
                )
            else:
                branches.append(_parse_type(bt, env, ns))
        if sum(1 for b in branches if b is None) > 1:
            raise ValueError("avro: union with duplicate null branches")
        return ("multiunion", branches)
    if isinstance(t, dict) and "logicalType" in t:
        lt = t["logicalType"]
        base = {k2: v2 for k2, v2 in t.items() if k2 != "logicalType"}
        node = _parse_type(base, env, ns)
        if lt == "decimal":
            prec = t.get("precision")
            scale = t.get("scale", 0)
            if not (isinstance(prec, int) and prec > 0
                    and isinstance(scale, int) and 0 <= scale <= prec):
                raise ValueError(
                    f"avro: decimal needs 0 <= scale <= precision, got "
                    f"precision={prec!r} scale={scale!r}"
                )
            if node[0] not in ("fixed",) and node != ("prim", "bytes"):
                raise ValueError(
                    "avro: decimal logical type requires a bytes or "
                    f"fixed base, got {base.get('type')!r}"
                )
            return ("decimal", node, scale)
        if lt == "date":
            if node != ("prim", "int"):
                raise ValueError("avro: date logical type requires int")
            return ("date", node)
        if lt in ("timestamp-millis", "timestamp-micros"):
            if node != ("prim", "long"):
                raise ValueError(f"avro: {lt} logical type requires long")
            return ("timestamp", node, 1000 if lt.endswith("millis") else 1)
        # uuid and unknown logical types: the base type carries the
        # value; the annotation stays visible in the header schema
        return node
    if isinstance(t, dict):
        k = t.get("type")

        # nested named types INHERIT the enclosing namespace (spec
        # "Names"); a local namespace attribute overrides it
        ns_here = t.get("namespace", ns)

        def _register(node):
            nm = t.get("name")
            if nm:
                cell = [node]
                env[nm] = cell
                if ns_here:
                    env[f"{ns_here}.{nm}"] = cell
            return node

        if k == "fixed":
            size = t.get("size")
            if not isinstance(size, int) or size < 0:
                raise ValueError(f"avro: fixed with bad size {size!r}")
            return _register(("fixed", size))
        if k == "record":
            # forward cell first: self-references inside the fields
            # (linked lists) resolve to this record's own node
            cell = [None]
            nm = t.get("name")
            if nm:
                env[nm] = cell
                if ns_here:
                    env[f"{ns_here}.{nm}"] = cell
            node = (
                "record",
                [(f["name"], _parse_type(f["type"], env, ns_here))
                 for f in t["fields"]],
            )
            cell[0] = node
            return node
        if k == "array":
            return ("array", _parse_type(t["items"], env, ns))
        if k == "map":
            return ("map", _parse_type(t["values"], env, ns))
        if k == "enum":
            symbols = t.get("symbols")
            if not symbols:
                raise ValueError("avro: enum without symbols")
            return _register(("enum", list(symbols)))
        if isinstance(k, str) and k in _SIMPLE:  # {"type": "long"} wrapper
            return ("prim", k)
        raise NotImplementedError(f"avro: unsupported complex type {t!r}")
    raise NotImplementedError(f"avro: unsupported type {t!r}")


def _encode_node(node, v) -> bytes:
    kind = node[0]
    if kind == "ref":  # named-type reference: follow the forward cell
        target = node[1][0]
        if target is None:
            raise ValueError("avro: reference to an undefined named type")
        return _encode_node(target, v)
    if kind == "decimal":
        import decimal as _dec

        base, scale = node[1], node[2]
        unscaled = int(
            (_dec.Decimal(v).scaleb(scale)).to_integral_value(
                rounding=_dec.ROUND_HALF_UP
            )
        )
        if base[0] == "fixed":
            raw = unscaled.to_bytes(base[1], "big", signed=True)
        else:
            n = max(1, (unscaled.bit_length() + 8) // 8)
            raw = unscaled.to_bytes(n, "big", signed=True)
        return _encode_node(base, raw)
    if kind == "date":
        import datetime as _dt

        days = (v - _dt.date(1970, 1, 1)).days if isinstance(
            v, _dt.date
        ) else int(v)
        return _encode_node(node[1], days)
    if kind == "timestamp":
        import datetime as _dt

        unit = node[2]
        if isinstance(v, _dt.datetime):
            # review finding (r11): an epoch carrying the VALUE's own
            # tzinfo cancels the offset — a +05:00 datetime encoded as
            # if it were UTC.  Anchor at UTC for aware values, at the
            # naive epoch for naive ones.
            if v.tzinfo is not None:
                epoch = _dt.datetime(1970, 1, 1, tzinfo=_dt.timezone.utc)
            else:
                epoch = _dt.datetime(1970, 1, 1)
            us = (v - epoch) // _dt.timedelta(microseconds=1)
        else:
            us = int(v) * unit
        return _encode_node(node[1], us // unit)
    if kind == "fixed":
        raw = bytes(v)
        if len(raw) != node[1]:
            raise ValueError(
                f"avro: fixed value is {len(raw)} bytes, schema says {node[1]}"
            )
        return raw
    if kind == "union":
        _, nb, inner = node
        if v is None:
            return _zz_encode(nb)
        return _zz_encode(1 - nb) + _encode_node(inner, v)
    if kind == "multiunion":
        branches = node[1]
        if v is None:
            for i, b in enumerate(branches):
                if b is None:
                    return _zz_encode(i)
            raise ValueError("avro: None for a union without a null branch")
        if not isinstance(v, dict):
            raise ValueError(
                "avro: multi-branch union values are {'memberK': value} "
                "dicts with exactly one non-null member"
            )
        set_members = [(k2, v2) for k2, v2 in v.items() if v2 is not None]
        if len(set_members) != 1:
            raise ValueError(
                f"avro: union dict must set exactly one member, got "
                f"{len(set_members)}"
            )
        mk, mv = set_members[0]
        want = int(mk.removeprefix("member"))
        m = 0
        for i, b in enumerate(branches):
            if b is None:
                continue
            if m == want:
                return _zz_encode(i) + _encode_node(b, mv)
            m += 1
        raise ValueError(f"avro: union has no member {want}")
    if kind == "prim":
        return _encode_value(node[1], v)
    if kind == "record":
        out = bytearray()
        rec = v if isinstance(v, dict) else {}
        for fname, fnode in node[1]:
            fv = rec.get(fname)
            if fv is None and fnode[0] not in ("union", "multiunion"):
                raise ValueError(f"avro: field {fname!r} is not nullable")
            out += _encode_node(fnode, fv)
        return bytes(out)
    if kind == "enum":
        symbols = node[1]
        try:
            return _zz_encode(symbols.index(v))
        except ValueError:
            raise ValueError(
                f"avro: {v!r} is not one of the enum symbols {symbols}"
            ) from None
    if kind == "map":
        items = dict(v)
        out = bytearray()
        if items:
            out += _zz_encode(len(items))
            for mk in sorted(items):  # deterministic fixture bytes
                kb = str(mk).encode("utf-8")
                out += _zz_encode(len(kb)) + kb
                out += _encode_node(node[1], items[mk])
        out += _zz_encode(0)
        return bytes(out)
    # array: non-empty block(s) then the 0 terminator
    items = list(v)
    out = bytearray()
    if items:
        out += _zz_encode(len(items))
        for it in items:
            out += _encode_node(node[1], it)
    out += _zz_encode(0)
    return bytes(out)


def _decode_node(node, buf: bytes, pos: int):
    kind = node[0]
    if kind == "ref":
        target = node[1][0]
        if target is None:
            raise ValueError("avro: reference to an undefined named type")
        return _decode_node(target, buf, pos)
    if kind == "decimal":
        import decimal as _dec

        raw, pos = _decode_node(node[1], buf, pos)
        unscaled = int.from_bytes(raw, "big", signed=True)
        return _dec.Decimal(unscaled).scaleb(-node[2]), pos
    if kind == "date":
        import datetime as _dt

        days, pos = _decode_node(node[1], buf, pos)
        try:
            return _dt.date(1970, 1, 1) + _dt.timedelta(days=days), pos
        except (OverflowError, OSError):
            raise ValueError(f"avro: date {days} days out of range") from None
    if kind == "timestamp":
        import datetime as _dt

        v, pos = _decode_node(node[1], buf, pos)
        try:
            return (
                _dt.datetime(1970, 1, 1)
                + _dt.timedelta(microseconds=v * node[2]),
                pos,
            )
        except (OverflowError, OSError):
            raise ValueError(
                f"avro: timestamp {v} out of datetime range"
            ) from None
    if kind == "fixed":
        size = node[1]
        if pos + size > len(buf):
            raise ValueError("avro: fixed value overruns the block")
        return buf[pos:pos + size], pos + size
    if kind == "union":
        _, nb, inner = node
        branch, pos = _zz_decode(buf, pos)
        if branch == nb:
            return None, pos
        if branch == 1 - nb:
            return _decode_node(inner, buf, pos)
        raise ValueError(f"avro: union branch {branch} out of range")
    if kind == "multiunion":
        branches = node[1]
        branch, pos = _zz_decode(buf, pos)
        if not 0 <= branch < len(branches):
            raise ValueError(
                f"avro: union branch {branch} outside {len(branches)}"
            )
        chosen = branches[branch]
        if chosen is None:
            return None, pos
        v, pos = _decode_node(chosen, buf, pos)
        members = [b for b in branches if b is not None]
        hit = sum(1 for b in branches[:branch] if b is not None)
        return (
            {f"member{i}": (v if i == hit else None)
             for i in range(len(members))},
            pos,
        )
    if kind == "prim":
        return _decode_value(node[1], buf, pos)
    if kind == "record":
        rec = {}
        for fname, fnode in node[1]:
            rec[fname], pos = _decode_node(fnode, buf, pos)
        return rec, pos
    if kind == "enum":
        idx, pos = _zz_decode(buf, pos)
        symbols = node[1]
        if not 0 <= idx < len(symbols):
            raise ValueError(
                f"avro: enum index {idx} outside {len(symbols)} symbols"
            )
        return symbols[idx], pos
    if kind == "map":
        out_m: dict = {}
        while True:
            n, pos = _zz_decode(buf, pos)
            if n == 0:
                return out_m, pos
            if n < 0:
                n = -n
                _, pos = _zz_decode(buf, pos)  # byte-size skip hint
            if n > len(buf):
                raise ValueError("avro: map block count exceeds the block")
            for _ in range(n):
                klen, pos = _zz_decode(buf, pos)
                if klen < 0 or pos + klen > len(buf):
                    raise ValueError("avro: map key overruns the block")
                mk = buf[pos:pos + klen].decode("utf-8")
                pos += klen
                out_m[mk], pos = _decode_node(node[1], buf, pos)
    out = []
    while True:
        n, pos = _zz_decode(buf, pos)
        if n == 0:
            return out, pos
        if n < 0:  # spec: negative count is followed by the block's
            n = -n  # byte size (a skip hint; we decode anyway)
            _, pos = _zz_decode(buf, pos)
        if n > len(buf):
            raise ValueError("avro: array block count exceeds the block")
        for _ in range(n):
            item, pos = _decode_node(node[1], buf, pos)
            out.append(item)


def _encode_value(t: str, v) -> bytes:
    if t in ("long", "int"):
        i = int(v)
        # zigzag assumes 64-bit two's complement: a Python int outside
        # int64 would encode silently and decode to a DIFFERENT value —
        # fail loudly instead (module contract)
        if not -(2**63) <= i < 2**63:
            raise ValueError(f"avro: {t} value {i} outside int64 range")
        return _zz_encode(i)
    if t == "string":
        b = str(v).encode("utf-8")
        return _zz_encode(len(b)) + b
    if t == "bytes":
        b = bytes(v)
        return _zz_encode(len(b)) + b
    if t == "double":
        return struct.pack("<d", float(v))
    if t == "boolean":
        return b"\x01" if v else b"\x00"
    raise NotImplementedError(t)


def _decode_value(t: str, buf: bytes, pos: int):
    if t in ("long", "int"):
        return _zz_decode(buf, pos)
    if t == "string":
        n, pos = _zz_decode(buf, pos)
        if n < 0 or pos + n > len(buf):
            raise ValueError("avro: string overruns the block")
        return buf[pos:pos + n].decode("utf-8"), pos + n
    if t == "bytes":
        n, pos = _zz_decode(buf, pos)
        if n < 0 or pos + n > len(buf):
            raise ValueError("avro: bytes overruns the block")
        return buf[pos:pos + n], pos + n
    if t == "double":
        if pos + 8 > len(buf):
            raise ValueError("avro: double overruns the block")
        return struct.unpack("<d", buf[pos:pos + 8])[0], pos + 8
    if t == "boolean":
        if pos >= len(buf):
            # typed error, not IndexError: the module's fail-loudly
            # taxonomy is ValueError for corruption (round-10 fuzz)
            raise ValueError("avro: boolean overruns the block")
        return buf[pos] == 1, pos + 1
    raise NotImplementedError(t)


# --- container -------------------------------------------------------------

def build_avro_ocf(
    schema: dict,
    records: "list[dict]",
    *,
    codec: str = "null",
    sync: bytes = b"\x00" * 16,
    records_per_block: int = 1000,
) -> bytes:
    """Write an OCF for a supported record schema — deterministic sync
    marker by default so fixtures are byte-stable."""
    if schema.get("type") != "record":
        raise NotImplementedError("avro: only record schemas are supported")
    if codec not in _CODECS:
        raise NotImplementedError(f"avro: unsupported codec {codec!r}")
    if len(sync) != 16:
        raise ValueError("avro: sync marker must be 16 bytes")
    root = _parse_type(schema)

    def enc_rec(rec: dict) -> bytes:
        return _encode_node(root, rec)

    meta = {
        "avro.schema": json.dumps(schema, separators=(",", ":")).encode(),
        "avro.codec": codec.encode(),
    }
    out = bytearray(_MAGIC)
    out += _zz_encode(len(meta))
    for k, v in sorted(meta.items()):
        kb = k.encode()
        out += _zz_encode(len(kb)) + kb + _zz_encode(len(v)) + v
    out += _zz_encode(0)  # end of metadata map
    out += sync
    for at in range(0, len(records), records_per_block):
        chunk = records[at:at + records_per_block]
        payload = b"".join(enc_rec(r) for r in chunk)
        if codec == "deflate":
            payload = zlib.compress(payload, 6)[2:-4]  # raw deflate
        elif codec == "bzip2":
            import bz2

            payload = bz2.compress(payload)
        elif codec == "xz":
            import lzma

            payload = lzma.compress(payload, format=lzma.FORMAT_XZ)
        elif codec == "zstandard":
            import pyarrow as pa

            payload = bytes(pa.Codec("zstd").compress(payload))
        elif codec == "snappy":
            # spec: snappy block + 4-byte BIG-endian CRC32 of the
            # UNCOMPRESSED data
            payload = snappy_compress(payload) + struct.pack(
                ">I", zlib.crc32(payload) & 0xFFFFFFFF
            )
        out += _zz_encode(len(chunk)) + _zz_encode(len(payload)) + payload
        out += sync
    return bytes(out)


def parse_avro_blob(blob: bytes) -> tuple[dict, "list[dict]"]:
    """OCF bytes -> (header info, record dicts). Raises on corruption
    or unsupported constructs (see module docstring)."""
    if blob[:4] != _MAGIC:
        raise ValueError("avro: missing Obj\\x01 magic")
    pos = 4
    meta: dict = {}
    while True:
        n, pos = _zz_decode(blob, pos)
        if n == 0:
            break
        if n < 0:  # spec: negative count carries a byte size to skip
            n = -n
            _, pos = _zz_decode(blob, pos)
        if n > len(blob):
            # corrupted count: bound the walk (each entry needs bytes)
            raise ValueError("avro: metadata map count exceeds the file")
        for _ in range(n):
            klen, pos = _zz_decode(blob, pos)
            if klen < 0 or pos + klen > len(blob):
                # negative lengths would walk pos BACKWARD (fuzz: an
                # unkillable loop); typed corruption error instead
                raise ValueError("avro: metadata key overruns the buffer")
            k = blob[pos:pos + klen].decode("utf-8", "replace")
            pos += klen
            vlen, pos = _zz_decode(blob, pos)
            if vlen < 0 or pos + vlen > len(blob):
                raise ValueError("avro: metadata value overruns the buffer")
            meta[k] = blob[pos:pos + vlen]
            pos += vlen
    if "avro.schema" not in meta:
        raise ValueError("avro: missing avro.schema metadata entry")
    schema = json.loads(meta["avro.schema"])
    codec = meta.get("avro.codec", b"null").decode()
    if codec not in _CODECS:
        raise NotImplementedError(f"avro: unsupported codec {codec!r}")
    if not isinstance(schema, dict) or schema.get("type") != "record":
        raise NotImplementedError("avro: only record schemas are supported")
    try:
        root = _parse_type(schema)
    except (KeyError, TypeError, AttributeError) as e:
        raise ValueError(f"avro: malformed schema: {e!r}") from None
    sync = blob[pos:pos + 16]
    pos += 16
    records: list[dict] = []
    while pos < len(blob):
        count, pos = _zz_decode(blob, pos)
        size, pos = _zz_decode(blob, pos)
        payload = blob[pos:pos + size]
        if len(payload) != size:
            raise ValueError("avro: block payload overruns the file")
        pos += size
        if blob[pos:pos + 16] != sync:
            raise ValueError(
                "avro: block sync marker mismatch (corrupt or misaligned)"
            )
        pos += 16
        if codec == "deflate":
            try:
                payload = zlib.decompress(payload, -15)
            except zlib.error as e:
                # fuzz finding (r11): raw zlib.error leaked past the
                # ValueError taxonomy on corrupted deflate blocks
                raise ValueError(
                    f"avro: deflate block failed to inflate: {e}"
                ) from None
        elif codec == "bzip2":
            import bz2

            try:
                payload = bz2.decompress(payload)
            except (OSError, ValueError) as e:
                raise ValueError(f"avro: bzip2 block failed: {e}") from None
        elif codec == "xz":
            import lzma

            try:
                payload = lzma.decompress(payload)
            except lzma.LZMAError as e:
                raise ValueError(f"avro: xz block failed: {e}") from None
        elif codec == "zstandard":
            import pyarrow as pa

            n = _zstd_content_size(payload)
            if n > 1 << 31:
                raise ValueError(
                    f"avro: zstd block declares {n} bytes (corrupt or "
                    "hostile frame header)"
                )
            try:
                payload = bytes(pa.Codec("zstd").decompress(payload, n))
            except (pa.lib.ArrowException, OSError, ValueError) as e:
                raise ValueError(
                    f"avro: zstandard block failed: {e}"
                ) from None
        elif codec == "snappy":
            if len(payload) < 4:
                raise ValueError("avro: snappy block too short for its CRC")
            data = snappy_decompress(payload[:-4])
            want = struct.unpack(">I", payload[-4:])[0]
            if zlib.crc32(data) & 0xFFFFFFFF != want:
                raise ValueError(
                    "avro: snappy block CRC32 mismatch (corrupt block)"
                )
            payload = data
        p = 0
        for _ in range(count):
            rec, p = _decode_node(root, payload, p)
            records.append(rec)
        if p != len(payload):
            raise ValueError(
                f"avro: block declared {count} records but decoding left "
                f"{len(payload) - p} trailing bytes"
            )
    return {"schema": schema, "codec": codec, "n_records": len(records)}, records


def avro_records(
    df: DataFrame,
    record_schema: T.StructType,
    *,
    content_col: str = "content",
    id_col: str = "blob_id",
) -> DataFrame:
    """Explode (blob_id, content binary) OCF blobs into typed rows.
    ``record_schema`` declares the expected Avro record fields as Spark
    types (the contract a reader pins, exactly like spark-avro's
    user-specified schema); a blob whose schema lacks a declared field
    fails in the kernel rather than silently nulling."""
    out_schema = T.StructType(
        [T.StructField(id_col, T.LongType()), *record_schema.fields]
    )
    names = [f.name for f in record_schema.fields]

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = [f.name for f in out_schema.fields]
        for pdf in batches:
            rows = []
            for bid, content in zip(
                pdf[id_col].to_numpy(), pdf[content_col].to_numpy()
            ):
                _, recs = parse_avro_blob(bytes(content or b""))
                for rec in recs:
                    missing = [n for n in names if n not in rec]
                    if missing:
                        raise ValueError(
                            f"avro: blob {bid} lacks declared fields {missing}"
                        )
                    row = {n: rec[n] for n in names}
                    row[id_col] = bid
                    rows.append(row)
            yield pd.DataFrame(rows, columns=cols)

    return df.select(id_col, content_col).mapInPandas(kernel, out_schema)
