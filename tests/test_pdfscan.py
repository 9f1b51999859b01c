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


def test_xref_stream_boundary_and_garbage():
    # fake a 1.5-style xref stream: startxref points at an object
    b = build_pdf(1, version="1.5")
    obj_at = b.index(b"1 0 obj")
    doctored = re.sub(
        rb"startxref\s+\d+", b"startxref\n" + str(obj_at).encode(), b
    )
    with pytest.raises(NotImplementedError, match="cross-reference streams"):
        _scan_blob(doctored, strict=True)
    r = _scan_blob(doctored, strict=False)
    assert r["xref_kind"] == "stream" and r["n_pages"] is None

    with pytest.raises(ValueError, match="missing %PDF"):
        _scan_blob(b"GIF89a not a pdf", strict=True)
    assert _scan_blob(b"junk", strict=False)["version"] is None


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
