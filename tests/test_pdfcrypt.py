"""PDF encryption (operators/pdfcrypt.py) + Type0/ToUnicode text
(round 11): published test vectors for the primitives, empty-user-
password authentication across handler revisions, per-object
decryption round-trips, the named boundaries, and the CMap laws."""

import re

import pytest

from aroa_etl_spark.operators.pdfcrypt import (
    _alg2b_hash,
    _decrypt_block,
    _encrypt_block,
    _expand_key,
    aes_cbc_decrypt,
    aes_cbc_encrypt,
    authenticate_empty_user_password,
    decrypt_data,
    encrypt_data,
    make_encrypt_material,
    object_key,
    rc4,
)
from aroa_etl_spark.operators.pdfscan import (
    _extract_blob_text,
    _parse_tounicode,
    _scan_blob,
    build_pdf,
    build_pdf_with_text,
)


def test_aes_fips197_vectors():
    pt = bytes.fromhex("00112233445566778899aabbccddeeff")
    for klen, want in (
        (16, "69c4e0d86a7b0430d8cdb78070b4c55a"),
        (24, "dda97ca4864cdfe06eaf70a0ec0d7191"),
        (32, "8ea2b7ca516745bfeafc49904b496089"),
    ):
        rk = _expand_key(bytes(range(klen)))
        ct = _encrypt_block(rk, pt)
        assert ct == bytes.fromhex(want)
        assert _decrypt_block(rk, ct) == pt


def test_rc4_published_vectors():
    assert rc4(b"Key", b"Plaintext").hex() == "bbf316e8d940af0ad3"
    assert rc4(b"Wiki", b"pedia").hex() == "1021bf0420"
    assert rc4(b"Secret", b"Attack at dawn").hex() == \
        "45a01f645fc35b383552544b9bf5"


def test_cbc_padding_roundtrip_and_bad_padding():
    k, iv = bytes(16), bytes(range(16))
    for n in (0, 1, 15, 16, 17, 100):
        d = bytes(range(200))[:n]
        assert aes_cbc_decrypt(k, iv, aes_cbc_encrypt(k, iv, d)) == d
    with pytest.raises(ValueError, match="padding|blocks"):
        aes_cbc_decrypt(k, iv, bytes(16))  # decrypts to garbage padding


def _parse_encrypt_body(body: bytes) -> dict:
    enc = {
        "v": int(re.search(rb"/V (\d+)", body).group(1)),
        "r": int(re.search(rb"/R (\d+)", body).group(1)),
        "length": int(re.search(rb"/Length (\d+)", body).group(1)),
        "p": int(re.search(rb"/P (-?\d+)", body).group(1)),
        "o": bytes.fromhex(
            re.search(rb"/O <([0-9A-F]+)>", body).group(1).decode()
        ),
        "u": bytes.fromhex(
            re.search(rb"/U <([0-9A-F]+)>", body).group(1).decode()
        ),
    }
    m = re.search(rb"/UE <([0-9A-F]+)>", body)
    if m:
        enc["ue"] = bytes.fromhex(m.group(1).decode())
    return enc


@pytest.mark.parametrize("mode", ["rc4", "aesv2", "aesv3"])
def test_empty_password_auth_and_object_roundtrip(mode):
    mat = make_encrypt_material(mode, seed=9)
    enc = _parse_encrypt_body(mat["dict_body"])
    key = authenticate_empty_user_password(enc, mat["id0"])
    assert key == mat["file_key"]
    if enc["r"] < 5:
        # R<=4 keys bind the file /ID: a different ID fails auth
        assert authenticate_empty_user_password(enc, b"x" * 16) is None
    else:
        # V5 material is self-contained; corrupting /U fails auth
        bad = dict(enc)
        bad["u"] = bytes(48)
        assert authenticate_empty_user_password(bad, mat["id0"]) is None
    ok = object_key(key, 12, 0, aes=mat["aes"], v=mat["v"])
    data = b"BT (covert) Tj ET" * 5
    blob = encrypt_data(data, ok, bytes(range(16)), aes=mat["aes"])
    if mat["aes"]:
        assert blob[16:] != data  # actually ciphertext
    assert decrypt_data(blob, ok, aes=mat["aes"]) == data


def test_alg2b_is_deterministic_and_distinct():
    a = _alg2b_hash(b"", b"saltsalt")
    assert a == _alg2b_hash(b"", b"saltsalt") and len(a) == 32
    assert a != _alg2b_hash(b"", b"other my")


@pytest.mark.parametrize("crypt", ["rc4", "aesv2", "aesv3"])
@pytest.mark.parametrize("xs", [False, True])
def test_triage_encrypted_readable(crypt, xs):
    blob = build_pdf(3, encrypted=True, crypt=crypt, xref_stream=xs)
    rec = _scan_blob(blob, True)
    assert rec["encrypted"] == 1
    assert rec["readable"] == 1
    assert rec["xref_ok"] == 1
    # the objstm layout's payload is genuinely ciphertext: its zlib
    # magic must NOT appear after the ObjStm header
    if xs:
        stm = re.search(rb"/Type /ObjStm[^>]*>>\s*stream\r?\n(..)", blob)
        assert stm and stm.group(1)[0:1] != b"\x78"


def test_triage_locked_reports_without_raising():
    blob = build_pdf(2, encrypted=True, crypt="rc4")
    m = re.search(rb"/U <([0-9A-F]+)>", blob)
    locked = blob[: m.start(1)] + b"00" * 32 + blob[m.end(1):]
    rec = _scan_blob(locked, True)  # strict: locked is DATA, not corruption
    assert rec["encrypted"] == 1 and rec["readable"] == 0
    with pytest.raises(NotImplementedError, match="password"):
        _extract_blob_text(locked, True)
    assert _extract_blob_text(locked, False) == []


@pytest.mark.parametrize("crypt", [None, "rc4", "aesv2", "aesv3"])
@pytest.mark.parametrize("t0", [False, True])
def test_extract_matrix(crypt, t0):
    texts = (
        ["Grüße — ünïcode 𝄞 mixed ASCII!", "zwei"]
        if t0
        else ["Hello (crypt) page", "two \\ here"]
    )
    for xs in (False, True):
        for comp in (False, True):
            blob = build_pdf_with_text(
                texts, encrypt=crypt, type0=t0, xref_stream=xs, compress=comp
            )
            rows = _extract_blob_text(blob, True)
            assert [r["text"] for r in rows] == texts, (crypt, t0, xs, comp)
            assert [r["compressed"] for r in rows] == [int(comp)] * len(texts)


def test_parse_tounicode_laws():
    cmap = _parse_tounicode(
        b"/CIDInit begin begincmap\n"
        b"2 beginbfchar\n<E000> <D834DD1E>\n<E001> <0041 0042>\nendbfchar\n"
        b"1 beginbfrange\n<0020> <0024> <0041>\nendbfrange\n"
        b"1 beginbfrange\n<0100> <0102> [<00580059> <005A> <>]\nendbfrange\n"
        b"endcmap"
    )
    assert cmap[0xE000] == "\U0001D11E"       # surrogate pair dst
    assert cmap[0x20] == "A" and cmap[0x24] == "E"  # incrementing range
    assert cmap[0x100] == "XY" and cmap[0x101] == "Z" and cmap[0x102] == ""
    with pytest.raises(ValueError, match="bfrange"):
        _parse_tounicode(b"1 beginbfrange\n<0000> <FFFFFF> <0000>\nendbfrange")


def test_type0_without_tounicode_raises_via_real_blob():
    # build a real Type0 blob, then remove the /ToUnicode key from the
    # font object IN PLACE (same length) so offsets stay valid
    blob = build_pdf_with_text(["abc"], type0=True)
    m = re.search(rb"/ToUnicode \d+ 0 R", blob)
    assert m
    repl = b"/ToUnicodX" + blob[m.start() + 10:m.end()]  # break the key
    blob2 = blob[: m.start()] + repl + blob[m.end():]
    with pytest.raises(NotImplementedError, match="ToUnicode"):
        _extract_blob_text(blob2, True)


def test_decryptor_uses_xref_generation():
    """RC4/AES-128 object keys are salted with (num, gen): the
    decryptor must derive gen>0 keys from the xref entries instead of
    hardcoding 0 (advice finding, r12) — and V5 must stay unaffected."""
    from aroa_etl_spark.operators.pdfscan import (
        _generation_map,
        _make_decryptor,
    )

    mat = make_encrypt_material("aesv2", seed=4)
    ctx = {"key": mat["file_key"], "aes": mat["aes"], "v": mat["v"]}
    entries = {7: ("n", 0, 5), 8: ("n", 64), 9: ("s", 7, 0), 10: ("f",)}
    assert _generation_map(entries) == {7: 5}
    data = b"BT (gen five) Tj ET"
    ct = encrypt_data(
        data, object_key(mat["file_key"], 7, 5, aes=True, v=mat["v"]),
        bytes(range(16)), aes=True,
    )
    assert _make_decryptor(ctx, entries)(7, ct) == data
    # the old hardcoded-gen-0 derivation yields a wrong key: garbage
    # bytes or a CBC padding error, never the plaintext
    try:
        assert _make_decryptor(ctx, None)(7, ct) != data
    except ValueError:
        pass
    # V5: file key is object-independent, gen cannot matter
    m5 = make_encrypt_material("aesv3", seed=4)
    c5 = {"key": m5["file_key"], "aes": m5["aes"], "v": m5["v"]}
    ct5 = encrypt_data(
        data, object_key(m5["file_key"], 7, 5, aes=True, v=m5["v"]),
        bytes(range(16)), aes=True,
    )
    assert _make_decryptor(c5, entries)(7, ct5) == data
    assert _make_decryptor(c5, None)(7, ct5) == data


def test_predefined_cmap_type0_text():
    """Round 12: Type0 fonts with a predefined Uni*-UCS2/UTF16 CMap
    and NO /ToUnicode extract text — their codes are UTF-16BE by the
    CMap family's public definition (ISO 32000 §9.7.5.2).  Identity-H
    without /ToUnicode stays the named boundary."""
    from aroa_etl_spark.operators.pdfscan import (
        _extract_blob_text,
        build_pdf_with_text,
    )

    texts = ["中文测试 Hello", "日本語テキスト 🎉"]
    for name, kwargs in (
        ("UniGB-UCS2-H", {}),
        ("UniJIS-UTF16-H", {"xref_stream": True, "compress": True}),
        ("UniKS-UCS2-V", {"encrypt": "aesv2"}),
    ):
        blob = build_pdf_with_text(texts, predefined_cmap=name, **kwargs)
        got = [r["text"] for r in _extract_blob_text(blob, True)]
        assert got == texts, (name, got)
    bad = build_pdf_with_text(["abc"], type0=True).replace(
        b"/ToUnicode", b"/XXUnicode"
    )
    with pytest.raises(NotImplementedError, match="Identity-H"):
        _extract_blob_text(bad, True)
    # a NON-decodable predefined CMap names itself in the refusal
    gbk = build_pdf_with_text(["abc"], predefined_cmap="UniGB-UCS2-H")
    gbk = gbk.replace(b"/UniGB-UCS2-H", b"/GBK-EUC-H \x20\x20")
    with pytest.raises(NotImplementedError, match="GBK-EUC-H"):
        _extract_blob_text(gbk, True)
