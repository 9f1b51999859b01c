"""Unit tests for operators/incremental.py."""

from __future__ import annotations

import pytest

from aroa_etl_spark.operators.incremental import snapshot_diff, upsert


def test_upsert_semantics(spark):
    cur = spark.createDataFrame([(1, "a"), (2, "b"), (3, "c")], "k int, v string")
    upd = spark.createDataFrame([(2, "B"), (4, "d")], "k int, v string")
    got = {(r["k"], r["v"]) for r in upsert(cur, upd, "k").collect()}
    assert got == {(1, "a"), (2, "B"), (3, "c"), (4, "d")}


def test_upsert_rejects_schema_mismatch(spark):
    cur = spark.createDataFrame([(1, "a")], "k int, v string")
    upd = spark.createDataFrame([(1, "a", 2)], "k int, v string, extra int")
    with pytest.raises(ValueError):
        upsert(cur, upd, "k")


def test_snapshot_diff_all_change_types(spark):
    old = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c"), (4, None)], "k int, v string"
    )
    new = spark.createDataFrame(
        [(1, "a"), (2, "B"), (5, "e"), (4, "")], "k int, v string"
    )
    got = {(r["k"], r["change_type"]) for r in snapshot_diff(old, new, "k").collect()}
    # k=4: NULL vs '' must count as changed (null-tagged hashing)
    assert got == {(2, "changed"), (3, "removed"), (5, "added"), (4, "changed")}


def test_snapshot_diff_explicit_compare_cols(spark):
    old = spark.createDataFrame([(1, "a", 10)], "k int, v string, w int")
    new = spark.createDataFrame([(1, "a", 99)], "k int, v string, w int")
    # w excluded from comparison → no diff rows at all
    assert snapshot_diff(old, new, "k", compare_cols=["v"]).count() == 0
