"""ZIP central-directory triage tests."""

import io
import zipfile

import pytest

from aroa_etl_spark.sources.zipfmt import (
    detect_zip_kind,
    parse_zip_central,
    parse_zip_records,
)


def _zip(members, comp=zipfile.ZIP_DEFLATED):
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w", comp) as z:
        for name, data in members:
            z.writestr(name, data)
    return buf.getvalue()


def test_members_methods_sizes():
    blob = _zip([("a.txt", "hello"), ("b/c.txt", "x" * 100)])
    ms = parse_zip_central(blob)
    assert [(m["name"], m["usize"], m["crc_ok"]) for m in ms] == [
        ("a.txt", 5, 1), ("b/c.txt", 100, 1)
    ]
    assert all(m["method"] == "deflate" for m in ms)
    stored = parse_zip_central(_zip([("s", "data")], zipfile.ZIP_STORED))
    assert stored[0]["method"] == "stored"


def test_kind_routing():
    assert detect_zip_kind(["mimetype", "x"]) == "epub"
    assert detect_zip_kind(["[Content_Types].xml"]) == "docx"
    assert detect_zip_kind(["META-INF/MANIFEST.MF"]) == "jar"
    assert detect_zip_kind(["a.txt"]) == "zip"


def test_corrupt_payload_and_offsets():
    blob = bytearray(_zip([("k.txt", "payload bytes here")], zipfile.ZIP_STORED))
    at = blob.index(b"payload")
    blob[at] ^= 0xFF
    with pytest.raises(ValueError, match="CRC/size"):
        parse_zip_central(bytes(blob))
    lenient = parse_zip_central(bytes(blob), strict=False)
    assert lenient[0]["crc_ok"] == 0
    # triage-only mode never reads member data, so it stays clean
    assert parse_zip_central(bytes(blob), verify_crc=False)[0]["crc_ok"] == 1

    with pytest.raises(ValueError, match="end-of-central"):
        parse_zip_central(b"not a zip at all")
    assert parse_zip_central(b"junk", strict=False) == []


def _zip64(members, comp=zipfile.ZIP_DEFLATED, monkeypatch=None):
    """Archive with FULL ZIP64 structures from stdlib zipfile: shrink
    the module limits so small fixtures get 0xFFFFFFFF central
    sentinels + 0x0001 extras + the ZIP64 EOCD record/locator — the
    exact layout a >4 GiB archive carries, without the bytes."""
    buf = io.BytesIO()
    monkeypatch.setattr(zipfile, "ZIP64_LIMIT", 10)
    monkeypatch.setattr(zipfile, "ZIP_FILECOUNT_LIMIT", 1)
    try:
        with zipfile.ZipFile(buf, "w", comp) as z:
            for name, data in members:
                z.writestr(name, data)
    finally:
        monkeypatch.undo()
    return buf.getvalue()


def test_zip64_sentinel_without_locator_is_corrupt():
    blob = bytearray(_zip([("a", "b")]))
    eocd = blob.rindex(b"PK\x05\x06")
    blob[eocd + 16:eocd + 20] = b"\xff\xff\xff\xff"  # cd offset sentinel
    with pytest.raises(ValueError, match="ZIP64 sentinel"):
        parse_zip_central(bytes(blob))
    assert parse_zip_central(bytes(blob), strict=False) == []


def test_zip64_read(monkeypatch):
    from aroa_etl_spark.sources.zipfmt import extract_zip_member

    members = [("a.txt", "hello zip64"), ("dir/b.txt", "y" * 300),
               ("c.bin", "z" * 40)]
    blob = _zip64(members, monkeypatch=monkeypatch)
    # the fixture really is ZIP64 (locator + record + sentinels present)
    assert b"PK\x06\x07" in blob and b"PK\x06\x06" in blob
    assert b"\xff\xff\xff\xff" in blob
    ms = parse_zip_central(blob, strict=True, verify_crc=True)
    assert [(m["name"], m["usize"], m["crc_ok"]) for m in ms] == [
        ("a.txt", 11, 1), ("dir/b.txt", 300, 1), ("c.bin", 40, 1)
    ]
    assert extract_zip_member(blob, "dir/b.txt") == b"y" * 300
    # stored variant + stdlib read-back agreement
    blob_s = _zip64(members, comp=zipfile.ZIP_STORED, monkeypatch=monkeypatch)
    ms_s = parse_zip_central(blob_s)
    with zipfile.ZipFile(io.BytesIO(blob_s)) as z:
        assert [m["name"] for m in ms_s] == z.namelist()
        for m in ms_s:
            assert z.read(m["name"]) == extract_zip_member(blob_s, m["name"])


def test_zip64_multidisk_boundary(monkeypatch):
    blob = bytearray(_zip64([("a", "bcd")], monkeypatch=monkeypatch))
    loc = blob.rindex(b"PK\x06\x07")
    blob[loc + 16:loc + 20] = (2).to_bytes(4, "little")  # total disks = 2
    with pytest.raises(NotImplementedError, match="multi-disk"):
        parse_zip_central(bytes(blob))


def test_spanned_archive_boundary():
    blob = bytearray(_zip([("a", "b")]))
    eocd = blob.rindex(b"PK\x05\x06")
    # entries-on-this-disk (offset 8) != total entries (offset 10)
    blob[eocd + 8:eocd + 10] = (0).to_bytes(2, "little")
    with pytest.raises(NotImplementedError, match="spanned"):
        parse_zip_central(bytes(blob))


def test_records_kernel(spark):
    epub = _zip(
        [("mimetype", "application/epub+zip"), ("OEBPS/c.xhtml", "<p>t</p>")],
        zipfile.ZIP_STORED,
    )
    df = spark.createDataFrame(
        [(5, bytearray(epub))], "blob_id long, content binary"
    )
    rows = parse_zip_records(df).orderBy("member_idx").collect()
    assert [(r.kind, r.name) for r in rows] == [
        ("epub", "mimetype"), ("epub", "OEBPS/c.xhtml")
    ]
    assert all(r.blob_id == 5 and r.crc_ok == 1 for r in rows)


def test_extract_zip_member_both_methods():
    from aroa_etl_spark.sources.zipfmt import extract_zip_member

    blob = _zip([("s.txt", "stored!")], zipfile.ZIP_STORED)
    assert extract_zip_member(blob, "s.txt") == b"stored!"
    blob2 = _zip([("d.txt", "deflated " * 20)])
    assert extract_zip_member(blob2, "d.txt") == b"deflated " * 20
    with pytest.raises(KeyError):
        extract_zip_member(blob, "missing")


def test_xml_to_text_rules():
    from aroa_etl_spark.sources.zipfmt import xml_to_text

    assert xml_to_text("<p>a</p><p>b</p>") == "a\nb"
    assert xml_to_text("<div>x<br/>y</div>") == "x\ny"
    # &amp; decodes LAST: '&amp;lt;' is the literal text '&lt;'
    assert xml_to_text("<p>&amp;lt;</p>") == "&lt;"
    assert xml_to_text("  <h1></h1>  ") == ""


def test_extract_office_text_kinds(spark):
    from aroa_etl_spark.sources.zipfmt import extract_office_text

    docx = _zip([
        ("[Content_Types].xml", "<Types/>"),
        ("word/document.xml",
         "<w:document><w:p><w:t>one</w:t></w:p>"
         "<w:p><w:t>two</w:t></w:p></w:document>"),
    ])
    epub = _zip([
        ("mimetype", "application/epub+zip"),
        ("OEBPS/b.xhtml", "<p>beta</p>"),
        ("OEBPS/a.xhtml", "<p>alpha</p>"),
    ])
    plain = _zip([("x.txt", "no rule")])
    df = spark.createDataFrame(
        [(1, bytearray(docx)), (2, bytearray(epub))],
        "blob_id long, content binary",
    )
    rows = extract_office_text(df).orderBy("blob_id", "member").collect()
    assert [(r.blob_id, r.member, r.text) for r in rows] == [
        (1, "word/document.xml", "one\ntwo"),
        (2, "OEBPS/a.xhtml", "alpha"),
        (2, "OEBPS/b.xhtml", "beta"),
    ]
    df_plain = spark.createDataFrame(
        [(3, bytearray(plain))], "blob_id long, content binary"
    )
    with pytest.raises(Exception, match="no text extraction rule"):
        extract_office_text(df_plain, strict=True).collect()
    assert extract_office_text(df_plain, strict=False).count() == 0


def test_lenient_unsupported_method_keeps_other_members():
    import struct

    blob = bytearray(_zip([("good.txt", "fine"), ("bad.bin", "x")],
                          zipfile.ZIP_STORED))
    # rewrite bad.bin's central-header method to bzip2 (12)
    cen = blob.rindex(b"PK\x01\x02")
    # the LAST central header is bad.bin (insertion order)
    blob[cen + 10:cen + 12] = struct.pack("<H", 12)
    import pytest as _pytest

    from aroa_etl_spark.sources.zipfmt import parse_zip_central

    with _pytest.raises(ValueError, match="unsupported compression"):
        parse_zip_central(bytes(blob))
    lenient = parse_zip_central(bytes(blob), strict=False)
    assert [(m["name"], m["crc_ok"]) for m in lenient] == [
        ("good.txt", 1), ("bad.bin", 0)
    ]


def test_office_text_lenient_survives_bad_blobs(spark):
    from aroa_etl_spark.sources.zipfmt import extract_office_text

    # docx-flagged archive MISSING word/document.xml + outright junk
    broken_docx = _zip([("[Content_Types].xml", "<Types/>")])
    good = _zip([
        ("[Content_Types].xml", "<Types/>"),
        ("word/document.xml", "<w:p><w:t>ok</w:t></w:p>"),
    ])
    df = spark.createDataFrame(
        [(1, bytearray(broken_docx)), (2, bytearray(b"junk")),
         (3, bytearray(good))],
        "blob_id long, content binary",
    )
    rows = extract_office_text(df, strict=False).collect()
    assert [(r.blob_id, r.text) for r in rows] == [(3, "ok")]
    import pytest as _pytest

    with _pytest.raises(Exception):
        extract_office_text(df, strict=True).collect()


def test_lenient_mode_survives_fuzzed_archives():
    """The 100 TB lenient contract: a poisoned/truncated/bit-flipped
    archive must DEGRADE (empty result), never raise — struct.error
    and boundary NotImplementedError included (round-10 fuzz finding:
    spanned-archive detection escaped the lenient gate)."""
    import random

    blob = _zip([("a.txt", "hello fuzz"), ("dir/b.bin", "x" * 100)])
    rng = random.Random(1234)
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
        rows = parse_zip_central(bytes(b), strict=False, verify_crc=True)
        assert isinstance(rows, list)  # degraded or parsed — never raised
