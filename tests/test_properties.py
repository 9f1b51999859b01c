"""Property-based tests (hypothesis) for the pure-Python kernels that
define matching semantics — no Spark session needed, so these run fast
and explore far more of the input space than example tests."""

from __future__ import annotations

import re

from hypothesis import given, settings
from hypothesis import strategies as st

from aroa_etl_spark.functions import simkernels as K
from aroa_etl_spark.functions.ocr import (
    fix_visual_decoding_py,
    re_sub_exclude_parenthesis_py,
)

text = st.text(max_size=40)
name = st.text(
    alphabet=st.characters(whitelist_categories=("Ll", "Lu"), max_codepoint=0x2FF),
    max_size=24,
)


@given(name, name)
@settings(max_examples=200, deadline=None)
def test_ratio_bounds_and_symmetry(a, b):
    r = K.ratio(a, b)
    assert 0.0 <= r <= 100.0
    assert r == K.ratio(b, a)


@given(name)
@settings(max_examples=100, deadline=None)
def test_ratio_identity(a):
    assert K.ratio(a, a) == 100.0


@given(name, name)
@settings(max_examples=200, deadline=None)
def test_token_set_ratio_bounds_and_symmetry(a, b):
    r = K.token_set_ratio(a, b)
    assert 0.0 <= r <= 100.0
    assert r == K.token_set_ratio(b, a)


@given(st.lists(name, min_size=1, max_size=4))
@settings(max_examples=100, deadline=None)
def test_token_set_ratio_order_invariance(words):
    joined = " ".join(words)
    reordered = " ".join(reversed(words))
    assert K.token_set_ratio(joined, reordered) == 100.0


@given(name, name)
@settings(max_examples=200, deadline=None)
def test_jaro_bounds_and_symmetry(a, b):
    j = K.jaro_similarity(a, b)
    assert 0.0 <= j <= 1.0
    assert j == K.jaro_similarity(b, a)


@given(st.integers(0, 3000), st.integers(0, 3000))
def test_number_diff_bounds(a, b):
    d = K.number_diff(a, b)
    assert 0.0 <= d <= 100.0
    assert d == K.number_diff(b, a)
    if a == b:
        assert d == 100.0


@given(text, text)
@settings(max_examples=200, deadline=None)
def test_date_similarity_range(a, b):
    s = K.date_similarity(a, b)
    assert s == -1.0 or 0.0 <= s <= 100.0


@given(st.integers(1800, 2100), st.integers(0, 12), st.integers(0, 28))
def test_date_similarity_identity_on_parseable(y, m, d):
    packed = f"{y:04d}{m:02d}{d:02d}"
    assert K.date_similarity(packed, packed) == 100.0


@given(name, name, name, name)
@settings(max_examples=200, deadline=None)
def test_person_similarity_bounds(la, lb, ga, gb):
    s = K.person_similarity(la, lb, ga, gb)
    assert 0.0 <= s <= 100.0 + 1e-9


@given(text)
@settings(max_examples=200, deadline=None)
def test_fix_visual_decoding_output_is_clean(s):
    out = fix_visual_decoding_py(s)
    # output only ever contains repaired/kept characters — ascii letters,
    # German extras, '-', ' ', '.', plus multi-char folds of the same
    assert re.fullmatch(r"[A-Za-zßäÄöÖüÜ\-. ]*", out), out
    # idempotent: repairing repaired text changes nothing
    assert fix_visual_decoding_py(out) == out


@given(text)
@settings(max_examples=200, deadline=None)
def test_paren_sub_preserves_bracketed_content(s):
    out = re_sub_exclude_parenthesis_py(f"x y ({s}) z w", r"\s", "_")
    # balanced-bracket payload comes through verbatim
    assert f"({s})" in out or "(" in s or ")" in s or "[" in s or "]" in s
    # outside segments got the substitution
    assert out.startswith("x_y_")


_name_st = st.text(
    alphabet="abcdefghijklmnopqrstuvwxyzäöüß -", min_size=0, max_size=12
)
_field_st = st.one_of(st.none(), st.just(""), st.just("-1"), _name_st)


@given(
    st.lists(
        st.tuples(_name_st, _name_st, _name_st, _name_st,
                  _field_st, _field_st, _field_st, _field_st, _field_st, _field_st),
        min_size=1, max_size=20,
    ),
    st.booleans(),
)
@settings(max_examples=60, deadline=None)
def test_person_similarity_batch_equals_scalar(rows, name_only):
    """Property: the memoized batch kernel is bit-identical to the
    scalar blend on arbitrary (incl. empty/None/sentinel) inputs."""
    from aroa_etl_spark.functions.simkernels import (
        person_similarity,
        person_similarity_batch,
    )

    cols = list(zip(*rows))
    got = list(person_similarity_batch(*cols, name_only=name_only))
    want = [
        person_similarity(
            r[0] or "", r[1] or "", r[2] or "", r[3] or "",
            r[4], r[5], r[6], r[7], r[8], r[9], name_only=name_only,
        )
        for r in rows
    ]
    assert got == want


_datey_st = st.one_of(
    st.text(alphabet="0123456789.ab-", min_size=0, max_size=14),
    st.builds(
        lambda d, m, y: f"{d}.{m}.{y}",
        st.integers(0, 99), st.integers(0, 99), st.integers(0, 99999),
    ),
)


@given(_datey_st)
@settings(max_examples=30, deadline=None)  # each example is a Spark job
def test_llm_repair_shapes(s):
    """Property: repaired output is always dd-capped/mm-capped/year-
    windowed or one of the two sentinel shapes; packed output is always
    8+ digits starting with a valid year token."""
    import re

    from aroa_etl_spark.functions.dates import llm_convert_date_field, llm_repair_date
    from tests.conftest import SF_SMOKE  # noqa: F401  (fixture module import side effect)
    from aroa_etl_spark.session import get_spark
    from pyspark.sql import functions as F

    spark = get_spark(app_name="aroa_etl_spark_tests", shuffle_partitions=8)
    row = spark.createDataFrame([(s,)], ["d"]).select(
        llm_repair_date("d").alias("r"), llm_convert_date_field("d").alias("p")
    ).collect()[0]
    r, p = row["r"], row["p"]
    assert r in ("00000000", "0000000") or re.match(
        r"^(\d{1,2})\.(\d{1,2})\.(\d{4})$", r
    ), (s, r)
    if re.match(r"^\d{1,2}\.\d{1,2}\.\d{4}$", r):
        dd, mm, yy = r.split(".")
        assert int(dd) <= 31 and int(mm) <= 12
        assert yy == "0000" or 1855 < int(yy) < 1954
    assert re.match(r"^\d+$", p) and (p == "00000000" or p[:4] == "0000" or 1845 <= int(p[:4]) <= 1945), (s, p)


# ---- JPEG codec properties (pure NumPy, no Spark session) ----------------

import numpy as np  # noqa: E402

_rgb_shapes = st.tuples(
    st.integers(min_value=1, max_value=40),
    st.integers(min_value=1, max_value=40),
    st.sampled_from([1, 3]),
)


@given(
    shape=_rgb_shapes,
    quality=st.integers(min_value=50, max_value=98),
    sub=st.sampled_from(["444", "420"]),
    seed=st.integers(min_value=0, max_value=2**31 - 1),
)
@settings(max_examples=25, deadline=None)
def test_progressive_decode_equals_baseline_decode(shape, quality, sub, seed):
    """For ANY image/quality/subsampling, the progressive (SOF2) stream
    must decode bit-identically to the baseline stream of the same
    quantized coefficients — the strongest cross-check of the Annex G
    scan machinery (spectral bands, successive approximation, EOB
    runs) against the attested sequential path."""
    from aroa_etl_spark.operators.jpegcodec import (
        decode_baseline_jpeg,
        encode_baseline_jpeg,
        encode_progressive_jpeg,
    )

    h, w, c = shape
    img = np.random.default_rng(seed).integers(0, 256, size=(h, w, c), dtype=np.uint8)
    if c == 1:
        img = img[:, :, 0]
    prog = decode_baseline_jpeg(
        encode_progressive_jpeg(img, quality=quality, subsampling=sub)
    )
    base = decode_baseline_jpeg(
        encode_baseline_jpeg(img, quality=quality, subsampling=sub)
    )
    assert prog.shape == base.shape
    assert (prog == base).all()


@given(
    hw=st.tuples(st.integers(min_value=1, max_value=32),
                 st.integers(min_value=1, max_value=32)),
    quality=st.integers(min_value=70, max_value=98),
    seed=st.integers(min_value=0, max_value=2**31 - 1),
)
@settings(max_examples=15, deadline=None)
def test_baseline_roundtrip_error_bounded(hw, quality, seed):
    """Gray 4:4:4 round-trip error stays within the quantization bound
    at any size (including single-pixel and non-multiple-of-8 edges)."""
    from aroa_etl_spark.operators.jpegcodec import (
        decode_baseline_jpeg,
        encode_baseline_jpeg,
    )

    h, w = hw
    img = np.random.default_rng(seed).integers(0, 256, size=(h, w), dtype=np.uint8)
    out = decode_baseline_jpeg(encode_baseline_jpeg(img, quality=quality))
    assert out.shape == (h, w, 1)
    # worst-case DCT quantization error at q>=70 stays far under 64
    assert np.abs(out[:, :, 0].astype(int) - img.astype(int)).max() < 64


# ---------------------------------------------------------------------------
# round-9 container codecs: builder/parser round-trip properties
# ---------------------------------------------------------------------------

_body_line = st.text(
    alphabet=st.characters(
        blacklist_categories=("Cs", "Cc"), max_codepoint=0x2FF
    ),
    max_size=30,
)


@given(st.lists(_body_line, max_size=6))
@settings(max_examples=100, deadline=None)
def test_mbox_body_roundtrips_any_lines(lines):
    from aroa_etl_spark.sources.mbox import build_mbox, parse_mbox_blob

    body = "\n".join(lines)
    blob = build_mbox(
        [{"from_": "a@b", "headers": [("From", "a@b")], "body": body}]
    )
    m = parse_mbox_blob(blob)[0]
    # logical body round-trips: the writer newline-terminates, so the
    # parsed byte count is the line bytes + one newline per line
    expect_lines = [ln for ln in body.split("\n")]
    if expect_lines and expect_lines[-1] == "":
        expect_lines.pop()
    assert m["body_lines"] == len(expect_lines)
    assert m["body_bytes"] == sum(
        len(ln.encode()) + 1 for ln in expect_lines
    )


_avro_rec = st.fixed_dictionaries(
    {
        "id": st.integers(min_value=-(2**62), max_value=2**62),
        "name": st.text(max_size=20),
        "score": st.floats(allow_nan=False, allow_infinity=False, width=64),
        "flag": st.booleans(),
        "note": st.one_of(st.none(), st.text(max_size=10)),
    }
)


@given(st.lists(_avro_rec, max_size=8),
       st.sampled_from(["null", "deflate", "snappy"]))
@settings(max_examples=60, deadline=None)
def test_avro_ocf_roundtrips_any_records(recs, codec):
    from aroa_etl_spark.sources.avro_ocf import build_avro_ocf, parse_avro_blob

    schema = {
        "type": "record", "name": "r",
        "fields": [
            {"name": "id", "type": "long"},
            {"name": "name", "type": "string"},
            {"name": "score", "type": "double"},
            {"name": "flag", "type": "boolean"},
            {"name": "note", "type": ["null", "string"]},
        ],
    }
    hdr, back = parse_avro_blob(
        build_avro_ocf(schema, recs, codec=codec, records_per_block=3)
    )
    assert back == recs and hdr["n_records"] == len(recs)


_member_name = st.text(
    alphabet=st.characters(whitelist_categories=("Ll", "Lu", "Nd")),
    min_size=1, max_size=12,
)


@given(st.dictionaries(_member_name, st.binary(max_size=200), max_size=5))
@settings(max_examples=60, deadline=None)
def test_zip_walk_and_member_extraction_roundtrip(members):
    import io
    import zipfile

    from aroa_etl_spark.sources.zipfmt import (
        extract_zip_member,
        parse_zip_central,
    )

    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w", zipfile.ZIP_DEFLATED) as z:
        for n, data in members.items():
            z.writestr(n, data)
    blob = buf.getvalue()
    walked = parse_zip_central(blob)
    assert {m["name"] for m in walked} == set(members)
    assert all(m["crc_ok"] == 1 for m in walked)
    for n, data in members.items():
        assert extract_zip_member(blob, n) == data


@given(st.lists(st.text(max_size=25), min_size=1, max_size=5),
       st.booleans())
@settings(max_examples=60, deadline=None)
def test_pdf_text_roundtrips_any_strings(texts, compress):
    from aroa_etl_spark.operators.pdfscan import (
        _extract_blob_text,
        build_pdf_with_text,
    )

    rows = _extract_blob_text(
        build_pdf_with_text(texts, compress=compress), strict=True
    )
    got = [r["text"] for r in rows]
    assert len(got) == len(texts)
    for want, have in zip(texts, got):
        # the parser is deliberately BYTE-preserving (PDF strings carry
        # unknown encodings; latin-1 decodes losslessly), so the exact
        # round-trip property is at the byte level: the parsed text's
        # latin-1 bytes equal the UTF-8 bytes the builder wrote.
        # ASCII therefore round-trips at the char level too.
        assert have.encode("latin-1") == want.encode("utf-8")
        if want.isascii():
            assert have == want


@given(st.binary(max_size=3000))
@settings(max_examples=80, deadline=None)
def test_snappy_roundtrips_any_bytes(data):
    from aroa_etl_spark.sources.avro_ocf import (
        snappy_compress,
        snappy_decompress,
    )

    assert snappy_decompress(snappy_compress(data)) == data


_nested_rec = st.fixed_dictionaries(
    {
        "id": st.integers(min_value=-(2**62), max_value=2**62),
        "meta": st.fixed_dictionaries(
            {"src": st.text(max_size=8),
             "ver": st.integers(min_value=0, max_value=2**31)}
        ),
        "tags": st.lists(st.text(max_size=6), max_size=5),
        "scores": st.lists(
            st.one_of(st.none(), st.floats(allow_nan=False,
                                           allow_infinity=False, width=64)),
            max_size=4,
        ),
    }
)


@given(st.lists(_nested_rec, max_size=6),
       st.sampled_from(["null", "deflate", "snappy"]))
@settings(max_examples=60, deadline=None)
def test_avro_nested_and_arrays_roundtrip_any_records(recs, codec):
    from aroa_etl_spark.sources.avro_ocf import build_avro_ocf, parse_avro_blob

    schema = {
        "type": "record", "name": "doc",
        "fields": [
            {"name": "id", "type": "long"},
            {"name": "meta", "type": {
                "type": "record", "name": "m",
                "fields": [{"name": "src", "type": "string"},
                           {"name": "ver", "type": "long"}],
            }},
            {"name": "tags", "type": {"type": "array", "items": "string"}},
            {"name": "scores",
             "type": {"type": "array", "items": ["null", "double"]}},
        ],
    }
    hdr, back = parse_avro_blob(
        build_avro_ocf(schema, recs, codec=codec, records_per_block=2)
    )
    assert back == recs and hdr["n_records"] == len(recs)


_union_val = st.one_of(
    st.none(),
    st.builds(lambda v: {"member0": v},
              st.integers(min_value=-(2**62), max_value=2**62)),
    st.builds(lambda v: {"member1": v}, st.text(max_size=8)),
    st.builds(lambda v: {"member2": v}, st.booleans()),
)


@given(st.lists(_union_val, max_size=8),
       st.sampled_from(["null", "deflate", "snappy"]))
@settings(max_examples=60, deadline=None)
def test_avro_multibranch_union_roundtrip_law(vals, codec):
    """Round 12: ["null", A, B, C] unions round-trip for any branch
    choice, honoring declared branch order; the decoder returns full
    memberK dicts (all members present, exactly one non-null)."""
    from aroa_etl_spark.sources.avro_ocf import build_avro_ocf, parse_avro_blob

    schema = {
        "type": "record", "name": "e",
        "fields": [
            {"name": "u", "type": ["null", "long", "string", "boolean"]},
        ],
    }
    recs = [{"u": v} for v in vals]
    _hdr, back = parse_avro_blob(
        build_avro_ocf(schema, recs, codec=codec, records_per_block=3)
    )
    assert len(back) == len(recs)
    for got, want in zip(back, recs):
        u = got["u"]
        if want["u"] is None:
            assert u is None
            continue
        assert set(u) == {"member0", "member1", "member2"}
        (mk, mv), = [(k, v) for k, v in want["u"].items()]
        assert u[mk] == mv
        assert all(v is None for k, v in u.items() if k != mk)


@given(
    st.integers(1, 12), st.integers(1, 12), st.integers(0, 2**32 - 1),
    # round 11: the law covers the FULL predictor family (4x4 tiles
    # cycle modes 0-13 incl. Select/ClampAddSubtract), cross-color,
    # their combinations, and the VP8X extended container
    st.sampled_from([
        {}, {"subtract_green": True}, {"cache_bits": 3},
        {"palette": True}, {"predictor": True},
        {"predictor": True, "predictor_size_bits": 2},
        {"cross_color": True},
        {"predictor": True, "predictor_size_bits": 2,
         "cross_color": True, "subtract_green": True, "cache_bits": 4},
        {"extended": True, "predictor": True, "predictor_size_bits": 2},
    ]),
)
@settings(max_examples=60, deadline=None)
def test_vp8l_roundtrips_any_image(h, w, seed, kw):
    import numpy as np

    from aroa_etl_spark.operators.vp8lcodec import (
        decode_webp_vp8l,
        encode_webp_vp8l,
    )

    rng = np.random.RandomState(seed % 2**31)
    if kw.get("palette"):
        ncol = int(rng.randint(1, 17))  # bundled palettes incl. 1-color
        pal = rng.randint(0, 256, (ncol, 3)).astype(np.uint8)
        img = pal[rng.randint(0, ncol, (h, w))]
    else:
        img = rng.randint(0, 256, (h, w, 3)).astype(np.uint8)
    assert np.array_equal(decode_webp_vp8l(encode_webp_vp8l(img, **kw)), img)
