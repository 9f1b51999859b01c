"""JSON-column unpacking: nested transcription payloads → flat tables.

Spark-native re-expression of the reference's row-wise unpacker
(enc/unpacking.py:8-112). The payload shape is one JSON string cell per
row whose top-level keys are *repeat groups* — arrays of objects:

    {"first_name_repeat": [{"first_name": "Alice"}, {"first_name": "Wonderland"}],
     "imprisonment_repeat": [{"imprisonment_year": "1943", ...}], ...}

Plan shape: ``from_json`` with an inferred/declared schema → per repeat
group, per inner field, a higher-order ``transform`` collects the values
→ optional re-split → NA filtering → either scalar unpack (all groups
singleton) or positional split into ``{field}_{i}`` columns.

Scale notes: schema inference and the max-multiplicity probe are two
metadata-scale aggregation passes; pass ``schema=`` and ``max_splits=``
to skip both and stay fully lazy (required for the streaming variant).
The whole unpack is one ``select`` — no shuffle at all.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

DEFAULT_SPLIT_RE = r"[\|;,\s]"


def infer_payload_schema(df: DataFrame, json_column: str) -> T.StructType:
    """Infer the JSON payload schema across all rows (union of shapes),
    forcing every leaf to string (the pipeline is stringly-typed —
    SURVEY §1.2)."""
    spark = df.sparkSession
    sample = spark.read.json(
        df.select(json_column).rdd.map(lambda r: r[0] or "{}"),
        primitivesAsString=True,
    )
    return sample.schema


def _values_expr(parsed: Column, field: str) -> Column:
    """Array of stringified entries for one inner field of a repeat group.

    JSON null inside an entry renders as the literal 'None' string — the
    reference flattens via str(value).strip() (enc/unpacking.py:35-44) and
    downstream NA vocabulary treats 'None' as empty.
    """
    return F.transform(
        parsed, lambda e: F.trim(F.coalesce(e.getField(field).cast("string"), F.lit("None")))
    )


def _additional_splits(values: Column, split_re: str) -> Column:
    """Re-split improperly separated entries:
    ['Alice, Blice', 'Clice'] → ['Alice','Blice','Clice']
    (enc/unpacking.py:58-68). Pure expression; the reference's
    parenthesis-protected variant is available via split_paren_aware."""
    return F.flatten(F.transform(values, lambda v: F.split(F.trim(v), split_re)))


def split_paren_aware(values: Column, split_re: str = DEFAULT_SPLIT_RE) -> Column:
    """Parenthesis-protected re-split (reference uses
    re_sub_exclude_parenthesis, utils.py:42-57): separators inside (...)
    or [...] do not split. Stateful scan → Arrow pandas_udf."""
    import re as _re

    pat = _re.compile(split_re)

    def _split_one(entry: str) -> list[str]:
        parts, depth, buf = [], 0, []
        i = 0
        while i < len(entry):
            ch = entry[i]
            if ch in "([":
                depth += 1
                buf.append(ch)
            elif ch in ")]":
                depth = max(0, depth - 1)
                buf.append(ch)
            elif depth == 0 and pat.match(ch):
                parts.append("".join(buf))
                buf = []
            else:
                buf.append(ch)
            i += 1
        parts.append("".join(buf))
        return parts

    @F.pandas_udf(T.ArrayType(T.StringType()))
    def _k(s: pd.Series) -> pd.Series:
        return s.map(
            lambda lst: [
                p
                for e in (lst if lst is not None else [])
                for p in _split_one(str(e).strip())
            ]
        )

    return _k(values)


def _filter_na(values: Column) -> Column:
    """Single-field repeat-group cleanup (enc/unpacking.py:46-56):
    order-preserving dedupe; drop '' when more than one value remains;
    never return an empty list (fall back to [''])."""
    deduped = F.array_distinct(values)
    filtered = F.when(
        F.size(deduped) > 1, F.filter(deduped, lambda x: x.isNotNull() & (x != ""))
    ).otherwise(deduped)
    return F.when(F.size(filtered) == 0, F.array(F.lit(""))).otherwise(filtered)


def unpack(
    df: DataFrame,
    json_column: str,
    schema: T.StructType | None = None,
    additional_splits_on=None,
    split_re: str = DEFAULT_SPLIT_RE,
    max_splits: dict[str, int] | None = None,
    split_limit: int = 1000,
) -> DataFrame:
    """Unpack a JSON repeat-group payload column into flat columns.

    - ``additional_splits_on``: list of inner-field names, or a predicate
      ``field_name -> bool``, selecting fields to re-split on ``split_re``.
    - ``max_splits``: per-inner-field max multiplicity; computed with one
      aggregation pass when absent.
    - Fields whose group never exceeds one value become scalar columns
      named after the field; otherwise positional ``{field}_{i}`` columns.

    Mirrors enc/unpacking.py:70-112 semantics, including the collision
    assert against pre-existing columns.
    """
    schema = schema or infer_payload_schema(df, json_column)
    parsed_col = F.from_json(F.col(json_column), schema)

    repeat_groups: list[tuple[str, list[str]]] = []
    for f in schema.fields:
        if not f.name.endswith("_repeat"):
            continue  # non-repeat keys are not unpacked (reference skips them)
        if not (
            isinstance(f.dataType, T.ArrayType)
            and isinstance(f.dataType.elementType, T.StructType)
        ):
            continue
        inner = [g.name for g in f.dataType.elementType.fields]
        repeat_groups.append((f.name, inner))

    def wants_split(field: str) -> bool:
        if additional_splits_on is None:
            return False
        if callable(additional_splits_on):
            return bool(additional_splits_on(field))
        return field in additional_splits_on

    # Build per-field value arrays (shared parsed struct is one expression;
    # Catalyst CSEs the from_json).
    field_exprs: dict[str, Column] = {}
    group_of: dict[str, str] = {}
    single_field_groups = {g for g, inner in repeat_groups if len(inner) == 1}
    for group, inner in repeat_groups:
        for field in inner:
            vals = _values_expr(parsed_col.getField(group), field)
            if wants_split(field):
                vals = _additional_splits(vals, split_re)
            if group in single_field_groups:
                vals = _filter_na(vals)
            field_exprs[field] = vals
            group_of[field] = group

    # multiplicity probe (per GROUP, like the reference's
    # duplicate_value_count = max over the group's fields)
    if max_splits is None:
        probe = df.select(
            *[
                F.max(F.size(e)).alias(name)
                for name, e in field_exprs.items()
            ]
        ).collect()[0]
        max_splits = {name: (probe[name] or 0) for name in field_exprs}

    group_max: dict[str, int] = {}
    for field, group in group_of.items():
        group_max[group] = max(group_max.get(group, 0), max_splits.get(field, 0))

    out_cols: list[Column] = [F.col(c) for c in df.columns if c != json_column]
    existing = {c for c in df.columns if c != json_column}
    new_names: list[str] = []

    for group, inner in repeat_groups:
        n = group_max.get(group, 0)
        for field in inner:
            vals = field_exprs[field]
            if n > 1:
                for i in range(min(n, split_limit)):
                    name = f"{field}_{i}"
                    out_cols.append(F.get(vals, i).alias(name))
                    new_names.append(name)
            else:
                out_cols.append(F.get(vals, 0).alias(field))
                new_names.append(field)

    collisions = existing.intersection(new_names)
    if collisions:
        raise ValueError(
            f"Unpacking of {json_column} would override columns: {collisions}"
        )
    return df.select(*out_cols)
