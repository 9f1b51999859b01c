"""Chat-transcript operators: parse/stats/flatten edge semantics."""

import pytest
from pyspark.sql import functions as F

from aroa_etl_spark.functions.chat import (
    chat_stats,
    flatten_turns,
    parse_turns,
)


def _run(spark, payloads):
    df = spark.createDataFrame([(i, p) for i, p in enumerate(payloads)],
                               "i long, js string")
    st = chat_stats(parse_turns("js"))
    out = df.select(
        "i",
        st.alias("s"),
        flatten_turns(parse_turns("js")).alias("text"),
    ).orderBy("i")
    return out.collect()


def test_stats_and_flatten_semantics(spark):
    rows = _run(spark, [
        # clean 2-exchange conversation
        '[{"role": "user", "content": "hi"},'
        ' {"role": "assistant", "content": "hello!"},'
        ' {"role": "user", "content": "bye"},'
        ' {"role": "assistant", "content": "ciao"}]',
        # dangling user turn
        '[{"role": "user", "content": "q"},'
        ' {"role": "assistant", "content": "a"},'
        ' {"role": "user", "content": "dangling"}]',
        # alternation violation (double user)
        '[{"role": "user", "content": "x"},'
        ' {"role": "user", "content": "y"},'
        ' {"role": "assistant", "content": "z"}]',
        # single turn: trivially alternating, not training-complete
        '[{"role": "user", "content": "solo"}]',
        # empty conversation
        "[]",
        # malformed JSON -> NULL stats and text
        "{definitely not json",
    ])
    clean = rows[0]
    assert (clean.s.n_turns, clean.s.n_user, clean.s.n_assistant) == (4, 2, 2)
    assert clean.s.alternates and clean.s.ends_assistant
    assert clean.s.content_chars == 2 + 6 + 3 + 4
    assert clean.text == (
        "<|user|>hi\n<|assistant|>hello!\n<|user|>bye\n<|assistant|>ciao"
    )
    dang = rows[1]
    assert dang.s.alternates and not dang.s.ends_assistant
    assert dang.s.n_user == 2 and dang.s.n_turns == 3
    dup = rows[2]
    assert not dup.s.alternates and dup.s.ends_assistant
    solo = rows[3]
    assert solo.s.alternates and not solo.s.ends_assistant
    empty = rows[4]
    assert empty.s.n_turns == 0 and empty.s.content_chars == 0
    assert empty.text == ""
    bad = rows[5]
    assert bad.s is None and bad.text is None


def test_flatten_template_options(spark):
    df = spark.createDataFrame(
        [('[{"role": "user", "content": "q"},'
          ' {"role": "assistant", "content": "a"}]',)], "js string")
    got = df.select(
        flatten_turns(parse_turns("js"), prefix="### ", suffix=":\n",
                      sep="\n\n").alias("t")
    ).first().t
    assert got == "### user:\nq\n\n### assistant:\na"


def test_no_python_in_plan(spark):
    df = spark.createDataFrame([("[]",)], "js string")
    out = df.select(chat_stats(parse_turns("js")).alias("s"),
                    flatten_turns(parse_turns("js")).alias("t"))
    plan = out._jdf.queryExecution().sparkPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEval" not in plan
