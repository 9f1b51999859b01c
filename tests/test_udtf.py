"""Python UDTF surface: recursive JSON flatten (functions/udtf.py)."""

from __future__ import annotations

from aroa_etl_spark.functions.udtf import register_engine_udtfs


def _flatten(spark, doc: str):
    register_engine_udtfs(spark)
    df = spark.createDataFrame([(doc,)], "j string")
    df.createOrReplaceTempView("t_udtf_in")
    return sorted(
        (r["path"], r["value"], r["json_type"])
        for r in spark.sql(
            "SELECT f.* FROM t_udtf_in, LATERAL json_flatten(j) f"
        ).collect()
    )


def test_flatten_nested_all_types(spark):
    got = _flatten(
        spark,
        '{"a": {"b": 1, "c": [2.5, "x", true]}, "d": null, "e": "s"}',
    )
    assert got == sorted(
        [
            ("a.b", "1", "integer"),
            ("a.c[0]", "2.5", "double"),
            ("a.c[1]", "x", "string"),
            ("a.c[2]", "true", "boolean"),
            ("d", "null", "null"),
            ("e", "s", "string"),
        ]
    )


def test_flatten_list_of_objects(spark):
    got = _flatten(spark, '[{"k": 1}, {"k": 2}]')
    assert got == [("[0].k", "1", "integer"), ("[1].k", "2", "integer")]


def test_flatten_malformed_yields_error_row(spark):
    assert _flatten(spark, "{nope") == [("", None, "error")]


def test_flatten_plan_is_arrow_not_row_python(spark):
    register_engine_udtfs(spark)
    spark.createDataFrame([('{"k":1}',)], "j string").createOrReplaceTempView("t_udtf_in")
    plan = (
        spark.sql("SELECT f.* FROM t_udtf_in, LATERAL json_flatten(j) f")
        ._jdf.queryExecution().sparkPlan().toString()
    )
    assert "ArrowEvalPythonUDTF" in plan
