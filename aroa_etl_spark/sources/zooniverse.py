"""Zooniverse crowd-annotation parsing (SURVEY §2.8 JS2/JS3; reference
zooniverse/unpacking.py:6-101).

Zooniverse exports one JSON string per row for annotations, metadata,
and subject data. Annotation payloads are heterogeneous — three task
shapes that the reference validates with jsonschema:

- simple task:      {"task": "T0", "task_label": "...", "value": "text"}
- dropdown pair:    a type object whose value[0].label names the field,
                    followed by the value object carrying the answer
- nested task:      {"task": "T1", "value": [inner tasks...]} — labels
                    prefixed with the parent task id

The walker is inherently recursive over irregular JSON, so it runs as
an Arrow-batched pandas UDF producing ``MapType(string, string)`` —
one flat {label → value} map per row (shape checks are structural;
jsonschema is not required). Downstream, ``explode``/pivot turns maps
into columns; ``map_to_columns`` does that for a known label set.

Scale: one projection, no shuffle; the JSON never leaves the executor.
"""

from __future__ import annotations

import json
from typing import Any

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MAP_SS = T.MapType(T.StringType(), T.StringType())


def _is_simple(task: Any) -> bool:
    return isinstance(task, dict) and isinstance(task.get("value"), str)


def _is_empty_select(task: Any) -> bool:
    if not (isinstance(task, dict) and isinstance(task.get("value"), list)):
        return False
    v = task["value"]
    return len(v) == 1 and isinstance(v[0], dict) and set(v[0]) <= {"select_label"}


def _is_dropdown_type(task: Any) -> bool:
    if not (isinstance(task, dict) and isinstance(task.get("value"), list)):
        return False
    v = task["value"]
    return len(v) == 1 and isinstance(v[0], dict) and "select_label" in v[0]


def _is_nested(task: Any) -> bool:
    return (
        isinstance(task, dict)
        and isinstance(task.get("value"), list)
        and all(isinstance(x, dict) and "task" in x for x in task["value"])
        and task.get("task_label") is None
    )


def _process_simple(task: dict) -> dict[str, str]:
    label = task.get("task_label") or task.get("task") or ""
    return {str(label): str(task.get("value", ""))}


def _process_nested(task: dict) -> dict[str, str]:
    parent = str(task.get("task", ""))
    queue = list(task["value"])
    out: dict[str, str] = {}
    while queue:
        nxt = queue.pop(0)
        if _is_simple(nxt):
            out.update(_process_simple(nxt))
        elif _is_empty_select(nxt):
            if queue:
                queue.pop(0)  # skip the paired (empty) value object
        elif _is_dropdown_type(nxt):
            if queue:
                value_task = queue.pop(0)
                label = nxt["value"][0].get("label", nxt["value"][0].get("select_label", ""))
                out[str(label)] = str(value_task.get("value", ""))
        # unknown inner shapes are skipped (the reference asserts; an
        # engine processing millions of rows flags instead of dying)
    return {f"{parent}: {k}": v for k, v in out.items()}


def _process_task(task: Any) -> dict[str, str]:
    if _is_nested(task):
        return _process_nested(task)
    if _is_simple(task):
        return _process_simple(task)
    return {}


def parse_annotations(col: Column | str) -> Column:
    """JSON annotation list → flat {label → value} map (JS2)."""

    @F.pandas_udf(MAP_SS)
    def _parse(s: pd.Series) -> pd.Series:
        out = []
        for raw in s:
            try:
                tasks = json.loads(raw) if raw else []
            except (TypeError, json.JSONDecodeError):
                tasks = []
            row: dict[str, str] = {}
            for task in tasks if isinstance(tasks, list) else []:
                row.update(_process_task(task))
            out.append(row)
        return pd.Series(out)

    return _parse(F.col(col) if isinstance(col, str) else col)


def parse_metadata(col: Column | str) -> Column:
    """JSON metadata object → {key → stringified value} map (JS3)."""

    @F.pandas_udf(MAP_SS)
    def _parse(s: pd.Series) -> pd.Series:
        out = []
        for raw in s:
            try:
                obj = json.loads(raw) if raw else {}
            except (TypeError, json.JSONDecodeError):
                obj = {}
            out.append(
                {str(k): json.dumps(v) if isinstance(v, (dict, list)) else str(v)
                 for k, v in (obj or {}).items()}
            )
        return pd.Series(out)

    return _parse(F.col(col) if isinstance(col, str) else col)


SUBJECT_SCHEMA = T.StructType(
    [
        T.StructField("subject_id", T.StringType()),
        T.StructField("subject_data", MAP_SS),
    ]
)


def parse_subject_data(col: Column | str) -> Column:
    """Single-key outer object {id: payload} → (subject_id, payload map)
    struct (JS3, reference __parse_subject)."""

    @F.pandas_udf(SUBJECT_SCHEMA)
    def _parse(s: pd.Series) -> pd.DataFrame:
        ids, payloads = [], []
        for raw in s:
            try:
                obj = json.loads(raw) if raw else {}
            except (TypeError, json.JSONDecodeError):
                obj = {}
            if isinstance(obj, dict) and len(obj) == 1:
                ((k, v),) = obj.items()
                ids.append(str(k))
                payloads.append(
                    {str(pk): str(pv) for pk, pv in (v or {}).items()}
                    if isinstance(v, dict)
                    else {}
                )
            else:
                ids.append("")
                payloads.append({})
        return pd.DataFrame({"subject_id": ids, "subject_data": payloads})

    return _parse(F.col(col) if isinstance(col, str) else col)


def map_to_columns(df: DataFrame, map_col: str, labels: list[str], prefix: str = "") -> DataFrame:
    """Materialize known map keys as top-level string columns."""
    return df.select(
        "*",
        *[
            F.col(map_col).getItem(label).alias(f"{prefix}{label}")
            for label in labels
        ],
    )
