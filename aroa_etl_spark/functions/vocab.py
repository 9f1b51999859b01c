"""The engine's missing-value / QA vocabulary as native Spark expressions.

The reference treats a vocabulary of strings as "empty" — distinct from
SQL NULL — and a second vocabulary as "unclear" QA markers
(reference: src/aroa_etl/utils.py:5-6, regex vocab at
src/aroa_etl/attribute_processing/regex_conditions.py:10-13).
Re-expressed here as Column predicates so Catalyst can fold/push them.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Strings that mean "no value" (beyond SQL NULL).
NA_VALUES = [
    "-1",
    "-1.0",
    "None",
    "",
    "NULL",
    "unbekannt",
    "unbekant",
    "-",
    "0",
    "0.0",
    "NA",
    "00",
    "0000",
]

# Strings that mean "value present but unclear" (QA flag, not emptiness).
QA_VALUES = ["?", "unklar", "Unklar"]

# Regex word-vocabularies used by the canonical cleaning chain
# (reference: regex_conditions.py:10-15). Java-regex compatible:
# leading (?i) inline flags are legal in Java.
DASH_WORDS_RE = r"(?i)\b(k\.a\.?|ka|unbekannt|unbekant|unknown|nicht bekannt|nicht angegeben|no entry|none|null|nichts)\b"
DELETED_WORDS_RE = r"(?i)\b(gestrichen|deleted|durchgestrichen|crossed out)\b"
QUESTION_MARK_WORDS_RE = r"(?i)\b(unklar|unclear|unleserlich|illegible|fraglich)\b"
KEY_WORDS_RE = (
    r"(?i)\b(herr|frau|mr|mrs|ms|miss|witwe|wwe|geb\.?orene?n?|verh\.?|"
    r"alias|genannt|gen\.|vel|recte|falsch|richtig)\b\.?"
)

# Sentinels for partial dates: "0000" year / "00" month/day mean unknown.
YEAR_UNKNOWN = "0000"
PART_UNKNOWN = "00"


def is_empty(col: Column | str) -> Column:
    """True where the cell is NULL or its trimmed value is in NA_VALUES.

    Pure Catalyst expression (null check + IN list) — foldable,
    pushable into parquet scans as `IsNull | In(...)` filters.
    """
    c = F.col(col) if isinstance(col, str) else col
    return c.isNull() | F.trim(c).isin(NA_VALUES)


def has_value(col: Column | str) -> Column:
    """Negation of is_empty."""
    return ~is_empty(col)


def is_unclear(col: Column | str) -> Column:
    """True where the trimmed cell is one of the QA (unclear) markers."""
    c = F.col(col) if isinstance(col, str) else col
    return F.trim(c).isin(QA_VALUES)


def all_empty(*cols: Column | str) -> Column:
    """True where every given column is empty (row-wise AND)."""
    out = None
    for c in cols:
        e = is_empty(c)
        out = e if out is None else (out & e)
    if out is None:
        raise ValueError("all_empty needs at least one column")
    return out


def any_value(*cols: Column | str) -> Column:
    """True where at least one given column has a value."""
    out = None
    for c in cols:
        v = has_value(c)
        out = v if out is None else (out | v)
    if out is None:
        raise ValueError("any_value needs at least one column")
    return out


def na_values_sql_list() -> str:
    """NA_VALUES rendered as a SQL IN-list literal (for oracle SQL strings)."""
    return ", ".join("'" + v.replace("'", "''") + "'" for v in NA_VALUES)
