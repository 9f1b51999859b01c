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
