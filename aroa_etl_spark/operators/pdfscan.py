"""PDF structure triage WITHOUT rendering (ISO 32000 container walk).

PDFs dominate document crawls, and the triage questions a curation
pipeline asks — is it well-formed, how many pages, is it encrypted,
which spec version — are answerable from the container skeleton alone:
the ``%PDF-x.y`` header, the cross-reference table the ``startxref``
pointer locates, the trailer dictionary, and the ``/Type /Pages`` node.
The triage scanner never decodes content streams; the companion
``extract_pdf_text`` reads them (plain or FlateDecode) for the text
payload, still without fonts or rendering.

The walk is OFFSET-DRIVEN like every scanner in this family (WARC
Content-Length, MP4 box sizes, Ogg lacing): ``startxref`` gives the
xref position, the xref subsection header gives the object count, and
STRICT mode verifies that every in-use xref entry's 10-digit offset
actually lands on its ``N 0 obj`` header — a single corrupted offset
(bit rot, truncated upload) fails loudly instead of producing a
plausible-looking row.  Classic single-subsection xref tables are in
scope; cross-reference STREAMS (PDF 1.5+ compressed xref) are detected
and reported as ``xref_kind='stream'`` with the page/object fields
NULL in lenient mode (raising in strict) — the honest capability
boundary, same discipline as the JPEG scanner's unsupported-SOF set.

``build_pdf`` is the stdlib fixture writer computing real offsets, so
the catalog oracle replays every field from construction arithmetic.

Scale: mapInPandas over the media table, zero shuffle, O(header+xref)
bytes per blob — content streams are never read.
"""

from __future__ import annotations

import re
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

__all__ = [
    "PDF_SCAN_SCHEMA",
    "PDF_TEXT_SCHEMA",
    "build_pdf",
    "build_pdf_with_text",
    "scan_pdf_structure",
    "extract_pdf_text",
]

PDF_SCAN_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("version", T.StringType()),
        T.StructField("xref_kind", T.StringType()),
        T.StructField("n_objects", T.IntegerType()),
        T.StructField("n_pages", T.IntegerType()),
        T.StructField("encrypted", T.IntegerType()),
        T.StructField("xref_ok", T.IntegerType()),
        T.StructField("n_bytes", T.LongType()),
    ]
)

_OBJ_RE = re.compile(rb"(\d+) 0 obj")


def _assemble_pdf(
    objs: "list[bytes]", version: str, trailer_extra: str = ""
) -> bytes:
    """Serialize numbered objects + classic xref table + trailer with
    real 10-digit offsets — the single assembly both fixture builders
    share, so the strict scanner's offset verification covers the one
    implementation."""
    out = bytearray(f"%PDF-{version}\n".encode())
    offsets = []
    for num, body in enumerate(objs, start=1):
        offsets.append(len(out))
        out += f"{num} 0 obj\n".encode() + body + b"\nendobj\n"
    xref_at = len(out)
    out += f"xref\n0 {len(objs) + 1}\n".encode()
    out += b"0000000000 65535 f \n"
    for off in offsets:
        out += f"{off:010d} 00000 n \n".encode()
    out += (
        f"trailer\n<< /Size {len(objs) + 1} /Root 1 0 R{trailer_extra} >>\n"
        f"startxref\n{xref_at}\n%%EOF\n"
    ).encode()
    return bytes(out)


def build_pdf(
    n_pages: int, *, version: str = "1.4", encrypted: bool = False
) -> bytes:
    """Assemble a minimal well-formed classic-xref PDF: catalog, pages
    node, ``n_pages`` page objects (plus an /Encrypt dict when asked),
    a correct xref table, and a trailer — real 10-digit offsets, so the
    strict scanner's offset verification passes by construction."""
    if n_pages < 1:
        raise ValueError("a PDF needs at least one page")
    objs: list[bytes] = []
    kids = " ".join(f"{3 + i} 0 R" for i in range(n_pages))
    objs.append(b"<< /Type /Catalog /Pages 2 0 R >>")
    objs.append(
        f"<< /Type /Pages /Kids [{kids}] /Count {n_pages} >>".encode()
    )
    for i in range(n_pages):
        objs.append(
            f"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
            f"/Rotate {(i % 4) * 90} >>".encode()
        )
    if encrypted:
        objs.append(b"<< /Filter /Standard /V 1 /R 2 >>")
    extra = f" /Encrypt {len(objs)} 0 R" if encrypted else ""
    return _assemble_pdf(objs, version, extra)


def _scan_blob(content: bytes, strict: bool) -> dict:
    null = {
        "version": None, "xref_kind": None, "n_objects": None,
        "n_pages": None, "encrypted": None, "xref_ok": None,
        "n_bytes": len(content),
    }

    def fail(msg: str) -> dict:
        if strict:
            raise ValueError(msg)
        return null

    m = re.match(rb"%PDF-(\d+\.\d+)", content)
    if not m:
        return fail("not a PDF: missing %PDF- header")
    version = m.group(1).decode()
    tail = content[-256:]
    sx = re.search(rb"startxref\s+(\d+)\s+%%EOF", tail)
    if not sx:
        return fail("no startxref/%%EOF tail")
    xref_at = int(sx.group(1))
    if xref_at >= len(content):
        return fail(f"startxref offset {xref_at} beyond file end")
    if not content[xref_at:xref_at + 4] == b"xref":
        # PDF 1.5+ cross-reference STREAM: an indirect object at the
        # offset instead of a classic table — detected, not parsed
        if _OBJ_RE.match(content[xref_at:xref_at + 32]):
            if strict:
                raise NotImplementedError(
                    "cross-reference streams (PDF 1.5+) are out of "
                    "scope for the classic-xref scanner"
                )
            return dict(null, version=version, xref_kind="stream")
        return fail(f"startxref does not point at an xref table ({xref_at})")
    # \s+ after the count: a CRLF-terminated header line must not
    # leave a stray \n that misaligns the fixed 20-byte entry stride
    sub = re.match(
        rb"xref\s+(\d+) (\d+)\s+", content[xref_at:xref_at + 64]
    )
    if not sub:
        return fail("malformed xref subsection header")
    first, count = int(sub.group(1)), int(sub.group(2))
    if first != 0:
        return fail("multi-subsection xref tables are out of scope")
    entries_at = xref_at + sub.end()
    ok = 1
    for i in range(count):
        raw = content[entries_at + 20 * i: entries_at + 20 * (i + 1)]
        e = re.match(rb"(\d{10}) (\d{5}) ([nf])", raw)
        if not e:
            return fail(f"malformed xref entry {i}")
        if e.group(3) == b"n":
            off = int(e.group(1))
            om = _OBJ_RE.match(content[off:off + 32])
            if not om or int(om.group(1)) != i:
                if strict:
                    raise ValueError(
                        f"xref entry {i} points at byte {off}, which is "
                        "not that object's header (corrupt offset)"
                    )
                ok = 0
    trailer_zone = content[entries_at + 20 * count:]
    enc = 1 if re.search(rb"/Encrypt\b", trailer_zone[:512]) else 0
    pages = re.search(
        rb"/Type\s*/Pages[^>]*?/Count\s+(\d+)", content
    )
    n_pages = int(pages.group(1)) if pages else None
    if n_pages is None:
        return fail("no /Type /Pages node with /Count")
    return {
        "version": version,
        "xref_kind": "table",
        "n_objects": count - 1,  # entry 0 is the free-list head
        "n_pages": n_pages,
        "encrypted": enc,
        "xref_ok": ok,
        "n_bytes": len(content),
    }


def scan_pdf_structure(df: DataFrame, *, strict: bool = True) -> DataFrame:
    """PDF triage rows (see module docstring) from a
    (media_id, content binary) frame."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for _, row in pdf.iterrows():
                rec = _scan_blob(bytes(row["content"] or b""), strict)
                rec["media_id"] = row["media_id"]
                out.append(rec)
            yield pd.DataFrame(
                out, columns=[f.name for f in PDF_SCAN_SCHEMA.fields]
            )

    return df.mapInPandas(kernel, PDF_SCAN_SCHEMA)


PDF_TEXT_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("page_idx", T.IntegerType()),
        T.StructField("text", T.StringType()),
        T.StructField("n_chars", T.IntegerType()),
        T.StructField("compressed", T.IntegerType()),
    ]
)

_ESCAPES = {b"\\(": b"(", b"\\)": b")", b"\\\\": b"\\", b"\\n": b"\n"}


def build_pdf_with_text(
    page_texts: "list[str]",
    *,
    version: str = "1.4",
    compress: bool = False,
) -> bytes:
    """build_pdf's sibling with real per-page content streams: each
    page shows its text via ``BT .. (escaped) Tj ET``, optionally
    FlateDecode-compressed (zlib) — the form real generators emit."""
    import zlib

    n_pages = len(page_texts)
    if n_pages < 1:
        raise ValueError("a PDF needs at least one page")
    objs: list[bytes] = []
    kids = " ".join(f"{3 + 2 * i} 0 R" for i in range(n_pages))
    objs.append(b"<< /Type /Catalog /Pages 2 0 R >>")
    objs.append(
        f"<< /Type /Pages /Kids [{kids}] /Count {n_pages} >>".encode()
    )
    for i, text in enumerate(page_texts):
        esc = (
            text.replace("\\", "\\\\").replace("(", "\\(").replace(")", "\\)")
        )
        stream = f"BT /F1 12 Tf 72 720 Td ({esc}) Tj ET".encode()
        filt = ""
        if compress:
            stream = zlib.compress(stream, 6)
            filt = " /Filter /FlateDecode"
        objs.append(
            f"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
            f"/Contents {4 + 2 * i} 0 R >>".encode()
        )
        objs.append(
            f"<< /Length {len(stream)}{filt} >>\nstream\n".encode()
            + stream
            + b"\nendstream"
        )
    return _assemble_pdf(objs, version)


def _unescape_pdf_string(raw: bytes) -> str:
    out = bytearray()
    i = 0
    while i < len(raw):
        if raw[i:i + 1] == b"\\" and i + 1 < len(raw):
            pair = raw[i:i + 2]
            out += _ESCAPES.get(pair, pair[1:2])
            i += 2
        else:
            out += raw[i:i + 1]
            i += 1
    return out.decode("latin-1")


def _extract_blob_text(content: bytes, strict: bool) -> "list[dict]":
    def fail(msg: str) -> "list[dict]":
        if strict:
            raise ValueError(msg)
        return []

    import zlib

    if not content.startswith(b"%PDF-"):
        return fail("not a PDF: missing %PDF- header")
    kids = re.search(rb"/Type\s*/Pages[^>]*?/Kids\s*\[([^\]]*)\]", content)
    if not kids:
        return fail("no /Type /Pages node with /Kids")
    page_refs = [int(m) for m in re.findall(rb"(\d+) 0 R", kids.group(1))]
    rows = []
    for idx, ref in enumerate(page_refs):
        pm = re.search(
            rb"(?s)(?<!\d)%d 0 obj\s*(.*?)endobj" % ref, content
        )
        if not pm:
            return fail(f"page object {ref} missing")
        cm = re.search(rb"/Contents\s+(\d+) 0 R", pm.group(1))
        if not cm:
            # a page with no content stream is legitimately blank
            rows.append(
                {"page_idx": idx, "text": "", "n_chars": 0, "compressed": 0}
            )
            continue
        sm = re.search(
            rb"(?s)(?<!\d)%d 0 obj\s*<<(.*?)>>\s*stream\r?\n"
            % int(cm.group(1)),
            content,
        )
        if not sm:
            return fail(f"content stream object {int(cm.group(1))} missing")
        lm = re.search(rb"/Length\s+(\d+)", sm.group(1))
        if not lm:
            return fail("content stream without /Length")
        at = sm.end()
        data = content[at:at + int(lm.group(1))]
        compressed = 1 if re.search(rb"/FlateDecode", sm.group(1)) else 0
        if compressed:
            try:
                data = zlib.decompress(data)
            except zlib.error:
                return fail("FlateDecode stream failed to inflate")
        # Tj shows one string; TJ shows an array of strings/kerns
        parts = []
        for s in re.findall(rb"\(((?:[^()\\]|\\.)*)\)\s*Tj", data):
            parts.append(_unescape_pdf_string(s))
        # the array may contain ']' INSIDE a string literal, so the
        # scan consumes complete parenthesis strings as units
        for arr in re.findall(
            rb"\[((?:\((?:[^()\\]|\\.)*\)|[^\]()\\]|\\.)*)\]\s*TJ", data
        ):
            for s in re.findall(rb"\(((?:[^()\\]|\\.)*)\)", arr):
                parts.append(_unescape_pdf_string(s))
        text = "".join(parts)
        rows.append(
            {
                "page_idx": idx,
                "text": text,
                "n_chars": len(text),
                "compressed": compressed,
            }
        )
    return rows


def extract_pdf_text(df: DataFrame, *, strict: bool = True) -> DataFrame:
    """Per-page text extraction from uncompressed or FlateDecode
    content streams (``Tj``/``TJ`` show operators, escape-correct
    string parsing) — the step that turns a crawled PDF into training
    text.  Honest boundary: hex strings, CID/Type0 multi-byte
    encodings, and per-glyph positioning are out of scope; pages
    without /Contents extract as empty, and strict mode raises on any
    structural miss.  Scale: mapInPandas, zero shuffle, O(stream
    bytes) per page."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for _, row in pdf.iterrows():
                for rec in _extract_blob_text(
                    bytes(row["content"] or b""), strict
                ):
                    rec["media_id"] = row["media_id"]
                    out.append(rec)
            yield pd.DataFrame(
                out, columns=[f.name for f in PDF_TEXT_SCHEMA.fields]
            )

    return df.mapInPandas(kernel, PDF_TEXT_SCHEMA)
