"""OCR/visual-decoding repair functions (SURVEY §2.8 F20, F22).

These are the two functions the survey marks as genuinely
non-expressible in native column expressions (conditional char-map with
a rejection ratio; stateful paren scanning) — they run as Arrow-batched
pandas UDFs.

F20 (reference string_utils.py:56-151) repairs LLM/OCR output where
visually-similar glyphs from other scripts replaced Latin characters.
This implementation derives the fold programmatically instead of
shipping a 200-pair lookup: NFKD accent stripping + a curated homoglyph
table for the scripts the reference handles (Cyrillic, Greek, fullwidth)
+ the digit→letter OCR rules. Same contract: characters outside the
allowed set are dropped, and a string with > 30% foreign characters is
rejected entirely (returns '').
"""

from __future__ import annotations

import re
import unicodedata

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

# digits read as letters by the OCR repair (string_utils.py:58-61):
# only confusable digits map; the rest vanish like unknown symbols
DIGIT_TO_CHAR = {"0": "O", "1": "l", "3": "B", "4": "A", "7": "T", "8": "B"}

# kept verbatim: ascii letters, German extras, and a few neutral symbols
_KEEP = set(
    "ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyzßäÄöÖüÜ- ."
)

# homoglyphs that NFKD cannot fold (different codepoints, similar glyph):
# the common Cyrillic / Greek confusions in transcribed archive text
HOMOGLYPHS = {
    # Cyrillic → Latin
    "а": "a", "е": "e", "о": "o", "с": "c", "р": "p", "х": "x", "у": "y",
    "к": "k", "т": "t", "м": "M", "н": "H", "в": "B", "б": "b", "з": "z",
    "и": "n", "п": "n", "г": "r", "д": "A", "л": "n", "ч": "y", "ж": "x",
    "А": "A", "В": "B", "Е": "E", "К": "K", "М": "M", "Н": "H", "О": "O",
    "Р": "P", "С": "C", "Т": "T", "У": "y", "Х": "X", "И": "N", "П": "N",
    "Л": "N", "Г": "T", "З": "B", "Б": "B", "Э": "E", "Ј": "J", "І": "I",
    "ъ": "b", "ь": "b", "ы": "bl", "Ы": "bl", "Ь": "b", "й": "N", "ц": "u",
    "ш": "w", "я": "", "ѕ": "s",
    # Greek → Latin
    "α": "a", "β": "ß", "γ": "y", "δ": "d", "ε": "e", "ζ": "z", "η": "n",
    "θ": "O", "ι": "i", "κ": "k", "λ": "l", "μ": "u", "ν": "v", "ξ": "E",
    "ο": "o", "π": "n", "ρ": "p", "σ": "o", "ς": "s", "τ": "t", "υ": "u",
    "φ": "p", "χ": "x", "ψ": "y", "ω": "w",
    "Α": "A", "Β": "B", "Γ": "T", "Δ": "D", "Ε": "E", "Ζ": "Z", "Η": "H",
    "Θ": "O", "Ι": "I", "Κ": "K", "Λ": "A", "Μ": "M", "Ν": "N", "Ο": "O",
    "Π": "N", "Ρ": "P", "Σ": "S", "Τ": "T", "Χ": "X", "Ψ": "Ps", "Ω": "O",
    # misc
    "○": "o", "•": "", "。": ".", "æ": "ae", "ø": "o", "Ø": "O", "ł": "l",
    "Ł": "L", "ə": "", "ı": "i", "'": "",
}

_UMLAUT_SAFE = set("ßäÄöÖüÜ")


def _fold_char(ch: str) -> str | None:
    """One repaired character, or None when the char has no mapping."""
    if ch in _KEEP:
        return ch
    if ch in DIGIT_TO_CHAR:
        return DIGIT_TO_CHAR[ch]
    if ch in HOMOGLYPHS:
        return HOMOGLYPHS[ch]
    # accent folding: é→e, č→c, ñ→n ... (keeps German umlauts untouched
    # because they're in _KEEP and never reach here)
    folded = unicodedata.normalize("NFKD", ch)
    stripped = "".join(c for c in folded if not unicodedata.combining(c))
    if stripped != ch and stripped and all(c in _KEEP for c in stripped):
        return stripped
    return None


def fix_visual_decoding_py(s: str) -> str:
    """Scalar F20: repair or reject one string. >30% unmappable-foreign
    characters → '' (the transcription is noise, not text)."""
    s = str(s)
    if not s:
        return ""
    foreign = sum(1 for c in s if ord(c) > 127 and c not in _UMLAUT_SAFE)
    if foreign / len(s) > 0.3:
        return ""
    out = []
    for ch in s:
        m = _fold_char(ch)
        if m is not None:
            out.append(m)
    return "".join(out)


def fix_visual_decoding(col: Column | str) -> Column:
    """F20 as an Arrow-batched column function."""

    @F.pandas_udf(T.StringType())
    def _fix(s: pd.Series) -> pd.Series:
        return s.fillna("").map(fix_visual_decoding_py)

    return _fix(F.col(col) if isinstance(col, str) else col)


def re_sub_exclude_parenthesis_py(string: str, pattern: str, repl: str) -> str:
    """Scalar F22 (reference utils.py:42-57): regex replace applied only
    OUTSIDE (possibly nested) round/square brackets. A depth counter
    over bracket-delimited segments; segments at depth 0 get the sub."""
    compiled = re.compile(pattern)
    parts = re.split(r"([\(\)\[\]])", str(string))
    depth = 0
    out = []
    for part in parts:
        if part in ("(", "["):
            depth += 1
        elif part in (")", "]"):
            depth -= 1
        elif depth == 0:
            part = compiled.sub(repl, part)
        out.append(part)
    return "".join(out)


def re_sub_exclude_parenthesis(col: Column | str, pattern: str, repl: str) -> Column:
    """F22 as an Arrow-batched column function (pattern/repl are plan-time
    constants, compiled once per batch)."""

    @F.pandas_udf(T.StringType())
    def _sub(s: pd.Series) -> pd.Series:
        return s.fillna("").map(lambda v: re_sub_exclude_parenthesis_py(v, pattern, repl))

    return _sub(F.col(col) if isinstance(col, str) else col)
