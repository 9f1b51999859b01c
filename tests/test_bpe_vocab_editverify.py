"""Round-6 text/dedup additions: merge-table BPE apply, corpus
vocabulary stats, edit-distance verify stage."""

import pytest
from pyspark.sql import functions as F

from aroa_etl_spark.functions.text import bpe_apply
from aroa_etl_spark.operators.dedup import edit_distance_verify

MERGES = [
    ("t", "a"), ("ta", "b"), ("tab", "l"), ("tabl", "e"),
    ("o", "w"), ("r", "ow"), ("l", "ow"), ("s", "low"),
]


def _apply(spark, text):
    df = spark.createDataFrame([(text,)], "text string")
    return df.select(bpe_apply("text", MERGES).alias("t")).head().t


def test_bpe_cascade_merges_full_word(spark):
    # t a -> ta -> tab -> tabl -> table: four cascading ranks
    assert _apply(spark, "table") == ["table"]


def test_bpe_partial_merge(spark):
    # "data": only "t a" fires (d a t a -> d a ta); no "ta b" follows
    assert _apply(spark, "data") == ["d", "a", "ta"]


def test_bpe_rank_order_matters(spark):
    # "slow" needs o w -> ow, then l ow -> low, then s low -> slow.
    assert _apply(spark, "slow") == ["slow"]
    # Reversed table: "s low" can never fire before "l ow"/"o w" exist.
    rev = list(reversed(MERGES))
    df = spark.createDataFrame([("slow",)], "text string")
    toks = df.select(bpe_apply("text", rev).alias("t")).head().t
    assert toks == ["s", "l", "ow"]


def test_bpe_multiword_and_whitespace(spark):
    # words merge independently; runs of whitespace split cleanly
    assert _apply(spark, "  row  table ") == ["row", "table"]


def test_bpe_unknown_chars_stay_single(spark):
    assert _apply(spark, "xyz") == ["x", "y", "z"]


def test_bpe_no_suffix_boundary_merge(spark):
    # 'tablow': (t,a)->(ta,b)->(tab,l) build the symbol 'tabl', then
    # (o,w) builds 'ow'.  The later rule ('l','ow') must NOT match the
    # trailing l INSIDE the symbol 'tabl' — a space-delimited
    # implementation did ('tabl ow' contains 'l ow'), gluing the
    # out-of-vocabulary symbol 'tablow'.  Correct apply: [tabl, ow].
    assert _apply(spark, "tablow") == ["tabl", "ow"]


def test_bpe_adjacent_repeat_occurrences_all_merge(spark):
    # 'rowrow' -> r o w r o w -> (o,w) twice ADJACENT: a space-
    # delimited scan shares the middle boundary and merges only the
    # first occurrence; self-delimited symbols merge both in one pass.
    assert _apply(spark, "rowrow") == ["row", "row"]


def test_edit_distance_verify_finds_planted_neardup(spark):
    base = "alpha beta gamma delta epsilon zeta eta theta"
    rows = [
        (1, base),
        (2, base.split(" ", 1)[1]),          # drop first token: near-dup
        (3, "totally different words but same tail delta epsilon zeta eta theta"),
        (4, "short"),                         # < 3 tokens: excluded
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    out = edit_distance_verify(df, block_tokens=3, prefix_len=120, max_dist=10)
    got = {(r.id_a, r.id_b): r.edit_distance for r in out.collect()}
    assert (1, 2) in got and got[(1, 2)] == 6  # "alpha " deleted
    # doc 3 shares the last-3-token block with 1 and 2 but is far in
    # edit distance -> candidate generated, verify rejects it
    assert (1, 3) not in got and (2, 3) not in got


def test_edit_distance_verify_blocking_excludes_different_suffix(spark):
    rows = [
        (1, "one two three four five"),
        (2, "one two three four six"),  # different last token -> other block
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    assert edit_distance_verify(df, max_dist=100).count() == 0


def test_bigram_logprob_orders_by_transition_quality(spark):
    from aroa_etl_spark.functions.text import bigram_logprob_scores

    rows = [
        (1, "x y x y x y x y x y"),   # only ever x->y / y->x transitions
        (2, "x x y y x y y x x y"),   # mixes in rare x->x / y->y
        (3, "x"),                      # single token: no bigram, excluded
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    got = {r.doc_id: r for r in bigram_logprob_scores(df).collect()}
    assert set(got) == {1, 2}
    assert got[1].n_bigrams == 9 and got[2].n_bigrams == 9
    # doc 1 rides the corpus's dominant transitions; doc 2 pays for the
    # rare same-letter bigrams
    assert got[1].logprob_mean > got[2].logprob_mean


def test_compression_ratio_orders_redundancy(spark):
    from aroa_etl_spark.functions.text import compression_ratio

    import os
    rows = [
        (1, "all work and no play " * 200),            # heavy redundancy
        (2, "the quick brown fox jumps over the lazy dog and then "
            "wanders toward a distant meadow full of strange flowers " * 4),
        (3, os.urandom(2048).hex()),                    # hex noise
        (4, ""),                                        # empty -> NULL
        (5, None),                                      # NULL -> NULL
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    got = {r.doc_id: r.ratio for r in
           df.select("doc_id", compression_ratio("text").alias("ratio")).collect()}
    assert got[1] < 0.1                 # boilerplate collapses
    assert got[1] < got[2] < got[3]     # monotone in true redundancy
    assert got[3] > 0.4                 # hex noise stays incompressible
    assert got[4] is None and got[5] is None
    # deterministic across reruns (fixed level, fixed zlib)
    again = {r.doc_id: r.ratio for r in
             df.select("doc_id", compression_ratio("text").alias("ratio")).collect()}
    assert got == again


def test_bpe_train_learns_known_merges_and_roundtrips(spark):
    """Hand-computed Sennrich fixture: corpus 'low low low lower
    newest newest' — pair counts make the first merges predictable —
    and the learned table drives bpe_apply back over the corpus."""
    from aroa_etl_spark.functions.text import bpe_apply, bpe_train

    df = spark.createDataFrame(
        [("low low low lower",), ("newest newest",)], "text string"
    )
    merges = bpe_train(df, "text", n_merges=3).orderBy("rank").collect()
    # round 0: pairs l-o x4, o-w x4, w-e x3, e-r x1, n-e x2, e-w x2,
    # e-s x2, s-t x2 -> tie l-o / o-w at 4, lexicographic -> (l, o)
    assert (merges[0].a, merges[0].b, merges[0].freq) == ("l", "o", 4)
    # round 1: lo-w now x4 -> (lo, w)
    assert (merges[1].a, merges[1].b, merges[1].freq) == ("lo", "w", 4)
    # round 2: remaining pairs all tie at 2 (e-r is 1); lexicographic
    # smallest is (e, s)
    assert (merges[2].a, merges[2].b, merges[2].freq) == ("e", "s", 2)

    # the learned table applied back: 'low' is one token after 2 merges
    toks = spark.createDataFrame([("low lower",)], "text string").select(
        bpe_apply("text", [(m.a, m.b) for m in merges]).alias("t")
    ).first().t
    assert toks == ["low", "low", "e", "r"]


def test_bpe_train_batched_equals_sequential(spark):
    """r7 verdict ask #7: merge_batch=k on a corpus whose top pairs
    don't share symbols must reproduce the sequential table exactly,
    and merge_batch=1 IS the sequential path (same code)."""
    from aroa_etl_spark.functions.text import bpe_train

    # disjoint-symbol top pairs: 'ab' (x9), 'cd' (x7), 'ef' (x5) —
    # no overlap, so any batch size gives the sequential answer
    rows = [("ab",)] * 9 + [("cd",)] * 7 + [("ef",)] * 5
    df = spark.createDataFrame(rows, "text string")
    seq = [tuple(r) for r in bpe_train(df, "text", n_merges=3).orderBy("rank").collect()]
    bat = [tuple(r) for r in bpe_train(df, "text", n_merges=3, merge_batch=3)
           .orderBy("rank").collect()]
    assert seq == bat == [(0, "a", "b", 9), (1, "c", "d", 7), (2, "e", "f", 5)]


def test_bpe_train_batched_exactness_caveat_is_the_documented_one(spark):
    """The documented merge_batch>1 deviation, pinned: a merge can
    CREATE a new best pair ('aa'+'a' after merging (a,a)) that
    sequential training picks next, while the batch — probing on
    pre-merge counts — takes the next pre-existing candidate instead.
    Both tables are valid BPE orders; only merge_batch=1 is bit-exact
    Sennrich."""
    from aroa_etl_spark.functions.text import bpe_train

    rows = [("aaa",)] * 6 + [("bc",)] * 4
    df = spark.createDataFrame(rows, "text string")
    seq = [tuple(r) for r in bpe_train(df, "text", n_merges=2).orderBy("rank").collect()]
    bat = [tuple(r) for r in bpe_train(df, "text", n_merges=2, merge_batch=2)
           .orderBy("rank").collect()]
    # sequential: (a,a) x12, then the freshly-created (aa,a) x6
    assert seq == [(0, "a", "a", 12), (1, "aa", "a", 6)]
    # batched: (a,a) x12, then (b,c) x4 from the same pre-merge probe
    # ((aa,a) did not exist yet; the overlap filter defers any stale
    # 'a'-touching batch-mate)
    assert bat == [(0, "a", "a", 12), (1, "b", "c", 4)]
