"""Dictionary standardization (SURVEY §2.8 F26: nationality
standardizer, reference column_processing.py:1217-1331 +
aux_functions.py:525-604).

Semantics preserved from the reference:

- every dictionary key found in the raw value as a WORD-BOUNDARY
  substring is a match;
- a matched key that is a substring of another matched key is dropped
  (longest-match wins — result_checker);
- every surviving match is replaced by its standard value;
- separators are canonicalized to ';' afterwards;
- values matching the 'unclear' table become '?' with a QA flag;
- values with no match at all keep the raw value and raise QA.

Spark architecture: the dictionary is a driver-side dict closed over an
Arrow-batched pandas UDF (dictionaries are dimension-sized — hundreds
of entries); the alternation regex is compiled ONCE sorted by key
length descending, which makes the regex engine prefer the longest
alternative at any position — equivalent to match-then-filter-substrings
but single-pass. The reference instead probes every key per row
(O(rows × keys) regex searches).
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

_SEP_CANON = re.compile(r"(\s;|;\s|\s|,|-|;+|\\|/)+")


def _compile(mapping: dict[str, str]) -> re.Pattern | None:
    if not mapping:
        return None
    keys = sorted((k for k in mapping if str(k).strip()), key=len, reverse=True)
    return re.compile(r"\b(" + "|".join(re.escape(str(k)) for k in keys) + r")\b")


def standardize_value_py(
    raw: str, pattern: re.Pattern | None, mapping: dict[str, str]
) -> tuple[str, bool]:
    """(standardized, qa) for one raw value."""
    raw = "" if raw is None else str(raw).replace(".", "")
    if not raw.strip():
        return "", False
    if pattern is None:
        return raw, True
    matched = False

    def repl(m: re.Match) -> str:
        nonlocal matched
        matched = True
        return mapping[m.group(0)]

    out = pattern.sub(repl, raw).strip()
    out = _SEP_CANON.sub(";", out).strip(";")
    return (out, False) if matched else (raw, True)


def standardize_column(
    df: DataFrame,
    col: str,
    mapping: dict[str, str],
    unclear: dict[str, str] | None = None,
    out_col: str | None = None,
) -> DataFrame:
    """Standardize ``col`` against a raw→standard dictionary.

    Adds ``{col}_std`` (or ``out_col``) and ``{col}_qa``. Unclear-table
    hits become '?' with QA true. The dicts ride inside the UDF closure
    (broadcast with the task binary — dimension-sized by contract)."""
    out_col = out_col or f"{col}_std"
    pattern = _compile(mapping)
    unclear_set = {str(k).strip().lower() for k in (unclear or {})}

    schema = T.StructType(
        [T.StructField("std", T.StringType()), T.StructField("qa", T.BooleanType())]
    )

    @F.pandas_udf(schema)
    def _std(s: pd.Series) -> pd.DataFrame:
        rows = []
        for v in s.fillna(""):
            if str(v).strip().lower() in unclear_set:
                rows.append(("?", True))
            else:
                rows.append(standardize_value_py(v, pattern, mapping))
        return pd.DataFrame(rows, columns=["std", "qa"])

    tmp = df.withColumn("__std_struct", _std(F.col(col)))
    return (
        tmp.withColumn(out_col, F.col("__std_struct.std"))
        .withColumn(f"{col}_qa", F.col("__std_struct.qa"))
        .drop("__std_struct")
    )
