"""Transliteration / phonetic folding (SURVEY §2.8 F13-F21).

Two flavors exist in the reference and BOTH are preserved because they
feed different algorithms:

- *matching* flavor (attribute_processing/string_utils.py:34-48):
  umlauts collapse to single letters (ä→a) — used by the consensus
  matcher and cross-dataset person matching;
- *clustering* flavor (utils.py:138-153): umlauts expand to digraphs
  (ä→ae) — used by entity clustering's blocking keys.

Implementation: the accent-fold table is built programmatically from
Unicode NFD decomposition over the Latin ranges plus explicit special
cases — a superset of the reference's hand-written table — and compiled
to a single JVM-side ``translate`` + a short regexp_replace chain.
"""

from __future__ import annotations

import unicodedata

from pyspark.sql import Column
from pyspark.sql import functions as F


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


# ---------------------------------------------------------------------------
# Accent folding table (F13)
# ---------------------------------------------------------------------------

# Multi-char expansions that NFD cannot produce.
MULTI_CHAR_FOLDS: dict[str, str] = {
    "ß": "ss",
    "ẞ": "SS",
    "æ": "ae",
    "Æ": "AE",
    "œ": "oe",
    "Œ": "OE",
    "ǳ": "dz",
    "ǆ": "dz",
    "ǉ": "lj",
    "ǌ": "nj",
}

# 1:1 folds with no NFD decomposition.
_EXPLICIT_1TO1: dict[str, str] = {
    "ø": "o",
    "Ø": "O",
    "ł": "l",
    "Ł": "L",
    "đ": "d",
    "Đ": "D",
    "ð": "d",
    "Ð": "D",
    "ŧ": "t",
    "Ŧ": "T",
    "ħ": "h",
    "Ħ": "H",
    "ı": "i",
    "ŋ": "n",
    "Ŋ": "N",
}


def _build_fold_table() -> dict[str, str]:
    """1:1 accent-fold map via NFD over the Latin supplement/extended and
    additional ranges. ä/ö/ü are *excluded* — umlaut handling is a separate,
    flavor-dependent step (see fold_umlauts_*)."""
    out = dict(_EXPLICIT_1TO1)
    keep_umlauts = set("äöüÄÖÜ")
    ranges = [(0x00C0, 0x024F), (0x1E00, 0x1EFF)]
    for lo, hi in ranges:
        for cp in range(lo, hi + 1):
            ch = chr(cp)
            if ch in keep_umlauts or ch in MULTI_CHAR_FOLDS or ch in out:
                continue
            decomp = unicodedata.normalize("NFD", ch)
            base = "".join(c for c in decomp if not unicodedata.combining(c))
            if len(base) == 1 and base.isascii() and base.isalpha():
                out[ch] = base
    return out


FOLD_1TO1 = _build_fold_table()
_FROM = "".join(FOLD_1TO1.keys())
_TO = "".join(FOLD_1TO1.values())


def fold_ascii(col: Column | str) -> Column:
    """Accent-fold everything except umlauts: one native ``translate``
    (JVM, codegen) + one regexp for the multi-char expansions."""
    c = F.translate(_c(col), _FROM, _TO)
    for src, dst in MULTI_CHAR_FOLDS.items():
        c = F.regexp_replace(c, src, dst)
    return c


# ---------------------------------------------------------------------------
# Umlaut flavors (F14)
# ---------------------------------------------------------------------------

def fold_umlauts_matching(col: Column | str) -> Column:
    """Matching flavor: ä→a, ae→a, ö→o, oe→a, ü→u, (?<!a)ue→a — ordered
    exactly like the reference's dict iteration
    (string_utils.py:34-38). The 'oe'→'a' and 'ue'→'a' targets look odd
    but are the reference's production behavior; preserved verbatim so
    match scores agree."""
    c = _c(col)
    for pat, repl in [
        ("ä", "a"),
        ("ae", "a"),
        ("ö", "o"),
        ("oe", "a"),
        ("ü", "u"),
        ("(?<!a)ue", "a"),
    ]:
        c = F.regexp_replace(c, pat, repl)
    return c


def fold_umlauts_expanded(col: Column | str) -> Column:
    """Clustering flavor: ä→ae, ö→oe, ü→ue, ß→ss (utils.py:138-143)."""
    c = _c(col)
    for pat, repl in [("ä", "ae"), ("ö", "oe"), ("ü", "ue"), ("ß", "ss")]:
        c = F.regexp_replace(c, pat, repl)
    return c


# ---------------------------------------------------------------------------
# Phonetic folding (F15) + simplifications (F16-F18)
# ---------------------------------------------------------------------------

PHONETIC_PAIRS = [
    ("th", "t"),
    ("ck", "k"),
    ("ph", "f"),
    ("w", "v"),
    ("y", "i"),
    ("j", "i"),
    ("tz", "z"),
]


def fold_phonetic(col: Column | str) -> Column:
    """Ordered phonetic bigram folding (string_utils.py:40-48)."""
    c = _c(col)
    for pat, repl in PHONETIC_PAIRS:
        c = F.regexp_replace(c, pat, repl)
    return c


def remove_double_characters(col: Column | str) -> Column:
    """'mm'→'m' etc. via backreference (string_utils.py:176-178)."""
    return F.regexp_replace(_c(col), r"([a-zA-Z])\1", "$1")


def remove_lang_specific_endings(col: Column | str) -> Column:
    """-owa/-ova strip, -sohn(s)→-son(s), -ska/-cka→-ski/-cki
    (string_utils.py:180-185)."""
    c = _c(col)
    c = F.regexp_replace(c, r"owa$|ova$", "")
    c = F.regexp_replace(c, r"sohns$", "sons")
    c = F.regexp_replace(c, r"sohn$", "son")
    c = F.regexp_replace(c, r"(?<=sk|ck)a$", "i")
    return c


def remove_maiden_suffix(col: Column | str) -> Column:
    """Strip ' geb. X' / ' gesch. X' suffixes (string_utils.py:187-190)."""
    c = F.regexp_replace(_c(col), r"\sgeb\.?\s.*", "")
    return F.regexp_replace(c, r"\sgesch\.?\s.*", "")


# ---------------------------------------------------------------------------
# Canonical normalizers (F19) — THE preprocessing used by matching/clustering
# ---------------------------------------------------------------------------

def preprocess_name(col: Column | str) -> Column:
    """lower → accent fold → umlaut(matching) → phonetic → dedouble
    (string_utils.py:192-198). Pure expression chain — codegen'd."""
    c = F.lower(_c(col))
    c = fold_ascii(c)
    c = fold_umlauts_matching(c)
    c = fold_phonetic(c)
    return remove_double_characters(c)


def preprocess_last_name(col: Column | str) -> Column:
    """lower → language-ending strip → maiden strip → preprocess_name
    (string_utils.py:200-205)."""
    c = F.lower(_c(col))
    c = remove_lang_specific_endings(c)
    c = remove_maiden_suffix(c)
    return preprocess_name(c)


def preprocess_name_clustering(col: Column | str) -> Column:
    """Clustering-flavor normalizer (utils.py): umlauts expand to digraphs
    before phonetic folding — produces the blocking-key form."""
    c = F.lower(_c(col))
    c = fold_ascii(c)
    c = fold_umlauts_expanded(c)
    c = fold_phonetic(c)
    return remove_double_characters(c)


# ---------------------------------------------------------------------------
# OCR confusable repair (F20) and word recasing (F21) — Pandas-UDF kernels
# ---------------------------------------------------------------------------

# Curated OCR-confusable map (Cyrillic/Greek → visually-identical Latin).
# The reference ships a larger hand-grown table
# (string_utils.py:56-151); this is a maintained subset covering the
# dominant confusions, extensible per deployment.
CONFUSABLE_MAP: dict[str, str] = {
    # Cyrillic
    "а": "a", "е": "e", "о": "o", "р": "p", "с": "c", "у": "y", "х": "x",
    "к": "k", "м": "M", "т": "t", "в": "B", "н": "H", "и": "n", "п": "n",
    "г": "r", "б": "b", "д": "A", "л": "n", "з": "z", "ч": "y", "ж": "x",
    "ъ": "b", "ь": "b", "ы": "bl", "А": "A", "В": "B", "Е": "E", "К": "K",
    "М": "M", "Н": "H", "О": "O", "Р": "P", "С": "C", "Т": "T", "У": "y",
    "Х": "X", "И": "N", "П": "N", "Л": "N", "Б": "B", "З": "B",
    # Greek
    "α": "a", "β": "ß", "γ": "y", "δ": "d", "ε": "e", "η": "n", "ι": "i",
    "κ": "k", "λ": "l", "μ": "u", "ν": "v", "ο": "o", "π": "n", "ρ": "p",
    "σ": "o", "ς": "s", "τ": "t", "υ": "u", "φ": "p", "χ": "x", "ω": "w",
    "Α": "A", "Β": "B", "Γ": "T", "Δ": "D", "Ε": "E", "Ζ": "Z", "Η": "H",
    "Θ": "O", "Ι": "I", "Κ": "K", "Λ": "A", "Μ": "M", "Ν": "N", "Ο": "O",
    "Π": "N", "Ρ": "P", "Σ": "S", "Τ": "T", "Χ": "X", "Ω": "O",
}

# characters that pass through unchanged in the decode-repair
_KEEP = set(
    "ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyzßäÄöÖüÜ- ."
)
_NUM_TO_CHAR = {"0": "O", "1": "l", "3": "B", "4": "A", "7": "T", "8": "B"}


def fix_visual_character_decoding_py(s: str | None) -> str:
    """Scalar kernel: map OCR-confusable glyphs to Latin; drop unknown
    glyphs; reject strings that are >30% confusables (garbage reads).
    Mirrors string_utils.py:56-151 semantics."""
    if s is None:
        return ""
    s = str(s)
    if len(s) == 0:
        return ""
    n_conf = sum(1 for ch in s if ch in CONFUSABLE_MAP)
    if n_conf / len(s) > 0.3:
        return ""
    out = []
    for ch in s:
        if ch in _KEEP:
            out.append(ch)
        elif ch in CONFUSABLE_MAP:
            out.append(CONFUSABLE_MAP[ch])
        elif ch in _NUM_TO_CHAR:
            out.append(_NUM_TO_CHAR[ch])
        # anything else: dropped
    return "".join(out)


def fix_name_uppercasing_py(s: str | None) -> str:
    """Scalar kernel: every [a-zA-Zäüöß]+ word → Xxxx
    (string_utils.py:153-159)."""
    import re as _re

    if s is None:
        return ""
    out = str(s)
    for m in _re.finditer(r"[a-zA-Zäüöß]+", out):
        w = m.group()
        out = out[: m.start()] + w[0].upper() + w[1:].lower() + out[m.end():]
    return out


def fix_visual_character_decoding(col: Column | str) -> Column:
    """Arrow-batched Pandas UDF wrapper for the decode-repair kernel (the
    conditional whitelist map is beyond translate/regexp)."""
    import pandas as pd  # noqa: F401
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("string")
    def _k(s):  # type: ignore[no-untyped-def]
        return s.map(fix_visual_character_decoding_py)

    return _k(_c(col))


def fix_name_uppercasing(col: Column | str) -> Column:
    import pandas as pd  # noqa: F401
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("string")
    def _k(s):  # type: ignore[no-untyped-def]
        return s.map(fix_name_uppercasing_py)

    return _k(_c(col))
