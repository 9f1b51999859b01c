"""Driver-style Spark-vs-DuckDB comparison used by the parity tests.

Mimics the correctness driver: run the Spark builder and the oracle SQL
on the same parquet tables, sort columns by name, sort rows, compare
values exactly (stricter than a hash — pinpoints the first diverging
cell instead of just failing).
"""

from __future__ import annotations

import datetime
import decimal
import math
import os

import duckdb

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def duck_run(sf_dir: str, sql: str):
    con = duckdb.connect()
    for t in TABLES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(path):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{path}'")
    rel = con.sql(sql)
    cols = list(rel.columns)
    rows = rel.fetchall()
    con.close()
    return cols, rows


def _canon(v):
    """Canonicalize one cell for cross-engine comparison."""
    if v is None:
        return ("null",)
    if isinstance(v, bool):
        return ("b", v)
    if isinstance(v, int):
        return ("n", decimal.Decimal(v))
    if isinstance(v, decimal.Decimal):
        return ("n", v)
    if isinstance(v, float):
        if math.isnan(v):
            return ("nan",)
        return ("f", v)
    if isinstance(v, datetime.datetime):
        return ("ts", v.replace(tzinfo=None).isoformat(sep=" "))
    if isinstance(v, datetime.date):
        return ("d", v.isoformat())
    if isinstance(v, (list, tuple)):
        return ("l", tuple(_canon(x) for x in v))
    return ("s", str(v))


def _normalize(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(_canon(r[i]) for i in order) for r in rows]
    out.sort()
    return [cols[i] for i in order], out


def compare(spark_df, sf_dir: str, oracle: str, name: str = "?"):
    """Assert the Spark result and the DuckDB oracle result match."""
    s_cols = list(spark_df.columns)
    s_rows = [tuple(r) for r in spark_df.collect()]
    d_cols, d_rows = duck_run(sf_dir, oracle)

    assert sorted(s_cols) == sorted(d_cols), (
        f"[{name}] column names differ: spark={sorted(s_cols)} duck={sorted(d_cols)}"
    )
    ns_cols, ns_rows = _normalize(s_cols, s_rows)
    _, nd_rows = _normalize(d_cols, d_rows)
    assert len(ns_rows) == len(nd_rows), (
        f"[{name}] row count differs: spark={len(ns_rows)} duck={len(nd_rows)}"
    )
    for i, (a, b) in enumerate(zip(ns_rows, nd_rows)):
        if a != b:
            raise AssertionError(
                f"[{name}] first row divergence at sorted-row {i}:\n"
                f"  cols : {ns_cols}\n  spark: {a}\n  duck : {b}"
            )
