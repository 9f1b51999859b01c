"""PDF structure triage tests: builder/scanner round-trip, offset
verification, capability boundaries."""

import re

import pytest

from aroa_etl_spark.operators.pdfscan import (
    _scan_blob,
    build_pdf,
    scan_pdf_structure,
)


def test_roundtrip_fields():
    b = build_pdf(4, version="1.7", encrypted=True)
    r = _scan_blob(b, strict=True)
    assert r["version"] == "1.7" and r["xref_kind"] == "table"
    assert r["n_pages"] == 4 and r["encrypted"] == 1
    assert r["n_objects"] == 7  # catalog + pages + 4 pages + encrypt dict
    assert r["xref_ok"] == 1 and r["n_bytes"] == len(b)


def test_corrupt_offset_strict_vs_lenient():
    bad = bytearray(build_pdf(2))
    at = bad.index(b"xref\n")
    entry0 = at + len(b"xref\n0 4\n") + 20  # skip the free-list head
    bad[entry0:entry0 + 10] = b"0000000042"
    with pytest.raises(ValueError, match="corrupt offset"):
        _scan_blob(bytes(bad), strict=True)
    r = _scan_blob(bytes(bad), strict=False)
    assert r["xref_ok"] == 0 and r["n_pages"] == 2  # still triages


def test_xref_stream_reads_and_garbage():
    """Round 10: PDF 1.5+ xref streams PARSE now (the old boundary test
    became this reads-it test) — every combination of object-stream
    packing and PNG predictor, plus the encrypted variant."""
    for objstm in (True, False):
        for pred in (12, 1):
            b = build_pdf(3, version="1.6", xref_stream=True,
                          objstm=objstm, predictor=pred)
            r = _scan_blob(b, strict=True)
            assert r["xref_kind"] == "stream" and r["xref_ok"] == 1
            assert r["n_pages"] == 3 and r["encrypted"] == 0
            # 5 base objects + xref stream (+ objstm when packing)
            assert r["n_objects"] == (7 if objstm else 6)
    enc = _scan_blob(
        build_pdf(2, version="1.7", encrypted=True, xref_stream=True),
        strict=True,
    )
    assert enc["encrypted"] == 1 and enc["n_pages"] == 2

    # startxref at an object that is NOT a /Type /XRef stream: corrupt
    b = build_pdf(1, version="1.5")
    obj_at = b.index(b"1 0 obj")
    doctored = re.sub(
        rb"startxref\s+\d+", b"startxref\n" + str(obj_at).encode(), b
    )
    # the catalog dict at that offset is not a stream object at all
    with pytest.raises(ValueError, match="XRef|stream header"):
        _scan_blob(doctored, strict=True)
    r = _scan_blob(doctored, strict=False)
    assert r["version"] == "1.5" and r["n_pages"] is None

    with pytest.raises(ValueError, match="missing %PDF"):
        _scan_blob(b"GIF89a not a pdf", strict=True)
    assert _scan_blob(b"junk", strict=False)["version"] is None


def test_xref_stream_corrupt_entry_and_objstm_mismatch():
    # flip a type-1 offset INSIDE the (predictor-free) xref stream
    import zlib

    b = build_pdf(2, version="1.6", xref_stream=True, objstm=True,
                  predictor=1)
    from aroa_etl_spark.operators.pdfscan import _load_xref

    entries, _t, kind = _load_xref(b)
    assert kind == "stream"
    # rebuild the xref stream payload with object 5's offset +1
    rows = bytearray()
    size = max(entries) + 1
    for num in range(size):
        v = entries.get(num, ("f",))
        if v[0] == "f":
            rows += bytes([0]) + (0).to_bytes(4, "big") + (65535 if num == 0 else 0).to_bytes(2, "big")
        elif v[0] == "n":
            off = v[1] + (1 if num == size - 1 else 0)  # corrupt the xref obj itself
            rows += bytes([1]) + off.to_bytes(4, "big") + (0).to_bytes(2, "big")
        else:
            rows += bytes([2]) + v[1].to_bytes(4, "big") + v[2].to_bytes(2, "big")
    new_payload = zlib.compress(bytes(rows), 6)
    # splice: find the old xref stream payload
    import re as _re

    m = _re.search(rb"/Type /XRef[^>]*/Length (\d+) >>\nstream\n", b)
    old_len = int(m.group(1))
    at = m.end()
    doctored = (
        b[:m.start()]
        + _re.sub(rb"/Length \d+", b"/Length %d" % len(new_payload),
                  b[m.start():m.end()])
        + new_payload
        + b[at + old_len:]
    )
    # offsets after the splice shift, so MANY entries are wrong — the
    # point is strict raises and lenient flags, not which entry
    with pytest.raises(ValueError, match="corrupt offset|header"):
        _scan_blob(doctored, strict=True)
    assert _scan_blob(doctored, strict=False)["xref_ok"] in (0, None)


def test_incremental_update_prev_chain():
    """A classic /Prev chain from an incremental update: the newest
    section's entry wins, multi-subsection bodies parse."""
    base = build_pdf(2, version="1.4")
    new_obj_at = len(base)
    upd = (b"3 0 obj\n<< /Type /Page /Parent 2 0 R "
           b"/MediaBox [0 0 612 792] /Rotate 90 >>\nendobj\n")
    prev_at = int(re.search(rb"startxref\s+(\d+)", base).group(1))
    xref_at = new_obj_at + len(upd)
    tail = (b"xref\n0 1\n0000000000 65535 f \n3 1\n"
            + f"{new_obj_at:010d} 00000 n \n".encode()
            + f"trailer\n<< /Size 5 /Root 1 0 R /Prev {prev_at} >>\n".encode()
            + f"startxref\n{xref_at}\n%%EOF\n".encode())
    blob = base + upd + tail
    from aroa_etl_spark.operators.pdfscan import _load_xref

    entries, _t, kind = _load_xref(blob)
    assert kind == "table" and entries[3] == ("n", new_obj_at, 0)
    r = _scan_blob(blob, strict=True)
    assert r["n_pages"] == 2 and r["xref_ok"] == 1


def test_scan_dataframe_kernel(spark):
    rows = [
        (1, bytearray(build_pdf(2))),
        (2, bytearray(build_pdf(1, encrypted=True))),
    ]
    df = spark.createDataFrame(rows, "media_id long, content binary")
    out = {r.media_id: r for r in scan_pdf_structure(df, strict=True).collect()}
    assert out[1].n_pages == 2 and out[1].encrypted == 0
    assert out[2].encrypted == 1 and out[2].n_objects == 4


def test_text_extract_escapes_and_flate():
    from aroa_etl_spark.operators.pdfscan import (
        _extract_blob_text,
        build_pdf_with_text,
    )

    texts = ["Hello (world)", "back\\slash", ""]
    for compress in (False, True):
        rows = _extract_blob_text(
            build_pdf_with_text(texts, compress=compress), strict=True
        )
        assert [r["text"] for r in rows] == texts
        assert all(r["compressed"] == int(compress) for r in rows)
        assert rows[0]["n_chars"] == 13


def test_text_extract_tj_array_and_blank_page():
    import zlib

    from aroa_etl_spark.operators.pdfscan import (
        _extract_blob_text,
        build_pdf_with_text,
    )

    # hand-patch a TJ array stream into a built PDF
    b = build_pdf_with_text(["x"], compress=False)
    old = b"BT /F1 12 Tf 72 720 Td (x) Tj ET"
    new = b"BT [(a) -120 (b)] TJ ET".ljust(len(old))
    assert old in b
    rows = _extract_blob_text(b.replace(old, new), strict=True)
    assert rows[0]["text"] == "ab"

    # truncated Flate stream must fail loudly in strict mode
    bad = build_pdf_with_text(["z" * 50], compress=True)
    comp = zlib.compress(b"BT /F1 12 Tf 72 720 Td (" + b"z" * 50 + b") Tj ET", 6)
    cut = bad.replace(comp, comp[: len(comp) // 2].ljust(len(comp), b"\x00"))
    import pytest as _pytest

    with _pytest.raises(ValueError, match="inflate"):
        _extract_blob_text(cut, strict=True)
    assert _extract_blob_text(cut, strict=False) == []


def test_text_extract_dataframe(spark):
    from aroa_etl_spark.operators.pdfscan import (
        build_pdf_with_text,
        extract_pdf_text,
    )

    rows = [(1, bytearray(build_pdf_with_text(["p0", "p1"], compress=True)))]
    df = spark.createDataFrame(rows, "media_id long, content binary")
    out = extract_pdf_text(df, strict=True).orderBy("page_idx").collect()
    assert [(r.page_idx, r.text, r.compressed) for r in out] == [
        (0, "p0", 1), (1, "p1", 1)
    ]


def test_object_number_boundary_and_crlf_xref():
    from aroa_etl_spark.operators.pdfscan import (
        _extract_blob_text,
        _scan_blob,
        build_pdf_with_text,
    )

    # 13 pages -> object ids into two digits; page refs must not match
    # inside larger ids ('3 0 obj' vs '13 0 obj')
    texts = [f"pg {j}" for j in range(13)]
    rows = _extract_blob_text(build_pdf_with_text(texts), strict=True)
    assert [r["text"] for r in rows] == texts

    # classic xref with CRLF line endings must still parse
    from aroa_etl_spark.operators.pdfscan import build_pdf

    b = build_pdf(2)
    xref_at = b.index(b"xref\n")
    crlf = b[:xref_at] + b.replace(b"xref\n0 4\n", b"xref\r\n0 4\r\n")[xref_at:]
    # entry stride: rewrite ' n \n' endings to ' n\r\n' to stay 20 bytes
    crlf = crlf.replace(b" f \n", b" f\r\n").replace(b" n \n", b" n\r\n")
    # fix startxref (offset unchanged: same length edits)
    r = _scan_blob(crlf, strict=False)
    assert r["n_pages"] == 2 and r["xref_ok"] == 1


def test_tj_array_bracket_inside_string():
    from aroa_etl_spark.operators.pdfscan import (
        _extract_blob_text,
        build_pdf_with_text,
    )

    b = build_pdf_with_text(["x"], compress=False)
    old = b"BT /F1 12 Tf 72 720 Td (x) Tj ET"
    new = rb"BT [(a\]b) -10 (c)] TJ ET".ljust(len(old))
    assert old in b
    rows = _extract_blob_text(b.replace(old, new), strict=True)
    assert rows[0]["text"] == "a]b" + "c"


def test_hex_string_text_and_objstm_extraction():
    from aroa_etl_spark.operators.pdfscan import (
        _extract_blob_text,
        build_pdf_with_text,
    )

    # hex-string Tj (round 10): latin-1 bytes, odd digit pads a 0
    b = build_pdf_with_text(["Héllo <hex>"], xref_stream=True,
                            hex_strings=True)
    rows = _extract_blob_text(b, strict=True)
    assert rows[0]["text"] == "Héllo <hex>"
    # odd-length hex body: '4' pads to 0x40 = '@' (§7.3.4.3)
    from aroa_etl_spark.operators.pdfscan import _hex_pdf_string

    assert _hex_pdf_string(b"48 4") == "H@"

    # page dicts inside an ObjStm still extract, with compression
    b2 = build_pdf_with_text(["p0 (x)", "p1"], compress=True,
                             xref_stream=True, objstm=True)
    got = [(r["page_idx"], r["text"], r["compressed"])
           for r in _extract_blob_text(b2, strict=True)]
    assert got == [(0, "p0 (x)", 1), (1, "p1", 1)]


def test_png_and_tiff_predictors_unit():
    import zlib

    from aroa_etl_spark.operators.pdfscan import _png_unpredict, _stream_payload

    # TIFF predictor 2: horizontal byte differencing
    raw = bytes([10, 5, 3, 200, 56, 0])  # two rows of 3
    assert _png_unpredict(raw, 2, 3) == bytes([10, 15, 18, 200, 0, 0])
    # PNG filters: Sub, Average, Paeth round-trip via forward filtering
    rows = [bytes([7, 9, 250]), bytes([1, 128, 3])]
    # Sub forward: keep first, diff the rest
    f_sub = bytes([1, 7, (9 - 7) & 0xFF, (250 - 9) & 0xFF])
    # Up on row 2 against row 1
    f_up = bytes([2, (1 - 7) & 0xFF, (128 - 9) & 0xFF, (3 - 250) & 0xFF])
    assert _png_unpredict(f_sub + f_up, 12, 3) == rows[0] + rows[1]
    with pytest.raises(ValueError, match="whole number"):
        _png_unpredict(b"\x00\x01", 12, 3)
    with pytest.raises(ValueError, match="unknown PNG"):
        _png_unpredict(bytes([9, 0, 0, 0]), 12, 3)
    with pytest.raises(NotImplementedError, match="TIFF predictor"):
        _png_unpredict(b"\x00" * 6, 3, 3)

    # a FlateDecode+Predictor 2 stream decodes through _stream_payload
    data = bytes([10, 5, 3])
    comp = zlib.compress(data)
    body = (f"<< /Length {len(comp)} /Filter /FlateDecode "
            f"/DecodeParms << /Predictor 2 /Columns 3 >> >>\nstream\n"
            ).encode() + comp + b"\nendstream"
    _d, out = _stream_payload(body)
    assert out == bytes([10, 15, 18])


def test_lenient_mode_survives_fuzzed_pdfs():
    """Same lenient fuzz contract as the ZIP walker: scan and text
    extraction over mutated xref-stream PDFs must degrade, not raise."""
    import random

    from aroa_etl_spark.operators.pdfscan import build_pdf_with_text

    blob = build_pdf_with_text(["pg one", "pg two"], compress=True,
                               xref_stream=True)
    rng = random.Random(99)
    for _ in range(400):
        b = bytearray(blob)
        op = rng.randrange(3)
        if op == 0 and len(b) > 4:
            b = b[:rng.randrange(4, len(b))]
        elif op == 1:
            for _ in range(rng.randrange(1, 6)):
                b[rng.randrange(len(b))] ^= rng.randrange(1, 256)
        else:
            i = rng.randrange(len(b))
            b = b[:i] + bytes(rng.randrange(256) for _ in range(8)) + b[i:]
        r = _scan_blob(bytes(b), strict=False)
        assert isinstance(r, dict)
        from aroa_etl_spark.operators.pdfscan import _extract_blob_text

        rows = _extract_blob_text(bytes(b), strict=False)
        assert isinstance(rows, list)
