"""line_dedup (C4-style corpus line dedup) and overlapping chunking tests."""

import pytest
from pyspark.sql import functions as F

from aroa_etl_spark.functions.text import token_chunks_overlap, tokens
from aroa_etl_spark.operators.dedup import line_dedup


@pytest.fixture(scope="module")
def docs(spark):
    boiler = "all rights reserved"
    rows = [
        (1, f"unique alpha\n{boiler}\nunique beta"),
        (2, f"{boiler}\nunique gamma"),
        (3, f"unique delta\n{boiler}"),
        (4, "only unique content"),
        (5, ""),
    ]
    return spark.createDataFrame(rows, "doc_id bigint, text string")


def test_line_dedup_removes_frequent_keeps_first(docs):
    out = {r.doc_id: r for r in line_dedup(docs, min_repeat=3).collect()}
    # boilerplate occurs 3x -> kept only at its first occurrence (doc 1, idx 1)
    assert out[1].text == "unique alpha\nall rights reserved\nunique beta"
    assert out[2].text == "unique gamma"
    assert out[3].text == "unique delta"
    assert out[4].text == "only unique content"
    assert out[2].n_lines_kept == 1 and out[1].n_lines_kept == 3


def test_line_dedup_below_threshold_untouched(docs):
    out = {r.doc_id: r.text for r in line_dedup(docs, min_repeat=4).collect()}
    # 3 occurrences < min_repeat=4 -> everything survives
    assert out[2] == "all rights reserved\nunique gamma"


def test_line_dedup_preserves_other_columns_and_empty_doc(spark):
    df = spark.createDataFrame(
        [(1, "x", "en"), (2, "x", "de"), (3, "x", "fr")],
        "doc_id bigint, text string, lang string",
    )
    out = {r.doc_id: r for r in line_dedup(df, min_repeat=3).collect()}
    assert out[2].lang == "de"
    assert out[2].text == "" and out[2].n_lines_kept == 0  # lost its only line
    assert out[1].text == "x"  # keeper


def test_chunk_overlap_coverage_and_stride(spark):
    df = spark.createDataFrame(
        [(1, " ".join(f"t{i}" for i in range(57)))], "doc_id bigint, text string"
    )
    chunks = (
        df.select(F.posexplode(token_chunks_overlap(tokens("text"), 32, 24)))
        .orderBy("pos")
        .collect()
    )
    assert len(chunks) == 3
    c0, c1, c2 = [r.col.split(" ") for r in chunks]
    assert c0 == [f"t{i}" for i in range(32)]
    assert c1 == [f"t{i}" for i in range(24, 56)]
    assert c2 == [f"t{i}" for i in range(48, 57)]  # ragged tail, 8-token overlap


def test_chunk_overlap_short_doc_single_chunk(spark):
    df = spark.createDataFrame([(1, "a b c")], "doc_id bigint, text string")
    chunks = df.select(
        token_chunks_overlap(tokens("text"), 32, 24).alias("c")
    ).collect()[0].c
    assert chunks == ["a b c"]


def test_chunk_overlap_empty_doc(spark):
    df = spark.createDataFrame([(1, "")], "doc_id bigint, text string")
    assert (
        df.select(token_chunks_overlap(tokens("text"), 32, 24).alias("c"))
        .collect()[0]
        .c
        == []
    )


def test_line_dedup_idempotent(spark):
    rows = [
        (i, "\n".join(["common header"] + [f"unique {i} line {j}" for j in range(3)]))
        for i in range(12)
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    once = line_dedup(df, min_repeat=3)
    twice = line_dedup(once.drop("n_lines_kept"), min_repeat=3)
    a = sorted((r.doc_id, r.text) for r in once.collect())
    b = sorted((r.doc_id, r.text) for r in twice.collect())
    assert a == b  # survivors occur < min_repeat times -> fixpoint


def test_minhash_incremental_equals_restricted_full(spark):
    """Incremental LSH == full-corpus LSH restricted to pairs touching a
    new doc (signatures are per-document, so the equality is exact)."""
    import pandas as pd

    from aroa_etl_spark.operators.dedup import (
        minhash_lsh_dedup,
        minhash_lsh_incremental,
        release_caches,
    )

    rows = []
    for i in range(40):
        rows.append((i, f"alpha beta gamma delta epsilon zeta eta theta doc {i}"))
    # new batch: near-copies of docs 0..9 plus two brand-new docs
    new_rows = [(100 + i, f"beta gamma delta epsilon zeta eta theta doc {i}")
                for i in range(10)]
    new_rows += [(300, "totally fresh content nothing shared here at all x y"),
                 (301, "totally fresh content nothing shared here at all x z")]
    idx = spark.createDataFrame(pd.DataFrame(rows, columns=["doc_id", "text"]))
    new = spark.createDataFrame(pd.DataFrame(new_rows, columns=["doc_id", "text"]))

    kw = dict(num_perm=8, bands=4, shingle_n=3, threshold=0.5)
    inc = {(r.id_a, r.id_b, r.n_intersect, r.n_union)
           for r in minhash_lsh_incremental(new, idx, **kw).collect()}
    full = {(r.id_a, r.id_b, r.n_intersect, r.n_union)
            for r in minhash_lsh_dedup(idx.unionByName(new), **kw,
                                       max_bucket_size=None).collect()}
    release_caches()
    new_ids = {r[0] for r in new_rows}
    want = {t for t in full if t[0] in new_ids or t[1] in new_ids}
    assert inc == want
    assert any(t[0] in new_ids and t[1] in new_ids for t in inc)  # new x new found
    assert inc  # non-empty


def test_pack_sequences_assignment(spark):
    from aroa_etl_spark.functions.text import pack_sequences

    df = spark.createDataFrame(
        [(i, 100) for i in range(12)], "doc_id bigint, n_tokens bigint"
    )
    out = pack_sequences(df, "doc_id", "n_tokens", budget=250, n_shards=1).collect()
    got = {r.doc_id: (r.bin, r.bin_offset) for r in out}
    # one shard, uniform 100-token docs, 250 budget: doc k starts at 100k
    for k in range(12):
        assert got[k] == (100 * k // 250, 100 * k % 250)
    import pytest as _pytest

    with _pytest.raises(ValueError, match="budget"):
        pack_sequences(df, "doc_id", "n_tokens", budget=0)


def test_decontaminate_flags_ngram_collisions(spark):
    import pandas as pd

    from aroa_etl_spark.operators.dedup import decontaminate

    train = spark.createDataFrame(pd.DataFrame(
        [(0, "one two three four five six seven eight nine ten"),
         (1, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
         (2, "totally unrelated words with no overlap at all here now")],
        columns=["doc_id", "text"]))
    bench = spark.createDataFrame(pd.DataFrame(
        [("three four five six seven eight nine ten extra tail",),
         ("beta gamma delta epsilon zeta eta theta iota wholly new",)],
        columns=["text"]))
    got = {r.doc_id: r.is_contaminated
           for r in decontaminate(train, bench, n=8).collect()}
    assert got == {0: True, 1: True, 2: False}
    # n larger than any shared span: nothing flagged
    got13 = {r.doc_id: r.is_contaminated
             for r in decontaminate(train, bench, n=13).collect()}
    assert got13 == {0: False, 1: False, 2: False}


def test_bpe_token_count_cross_engine(spark):
    """The BPE-ish regex must count identically in Spark (Java regex)
    and DuckDB (RE2) — the invariant the text_token_budget oracle
    rests on."""
    import duckdb
    import pandas as pd

    from aroa_etl_spark.functions.text import BPE_TOKEN_RE, bpe_token_count

    texts = ["Don't count me out, 2nd time's the charm!",
             "hello   world 123abc", "", "a-b_c d4e", "it'll we've I'm"]
    df = spark.createDataFrame(pd.DataFrame({"t": texts}))
    sp = [r[0] for r in df.select(bpe_token_count("t")).collect()]
    con = duckdb.connect()
    du = [con.execute("SELECT len(regexp_extract_all(?, ?))",
                      [t, BPE_TOKEN_RE]).fetchone()[0] for t in texts]
    assert sp == du
    assert sp[0] == 13  # pinned: contractions + punct clusters split out


def test_containment_catches_doc_inside_doc(spark):
    from aroa_etl_spark.operators.dedup import ngram_containment_pairs

    big = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    small = "gamma delta epsilon zeta"  # fully embedded
    other = "one two three four five six seven"
    df = spark.createDataFrame(
        [(1, big, "s"), (2, small, "s"), (3, other, "s")],
        "doc_id long, text string, source string",
    )
    rows = ngram_containment_pairs(df, threshold_pct=80).collect()
    assert [(r.id_a, r.id_b) for r in rows] == [(1, 2)]
    r = rows[0]
    # small has 2 3-gram shingles, both present in big
    assert r.n_intersect == 2 and r.sz_b == 2 and r.containment == 1.0


def test_containment_low_jaccard_high_containment(spark):
    from aroa_etl_spark.operators.dedup import (
        ngram_containment_pairs,
        ngram_jaccard_pairs,
    )

    words = " ".join(f"w{i}" for i in range(60))
    excerpt = " ".join(f"w{i}" for i in range(10, 16))
    df = spark.createDataFrame(
        [(1, words, "s"), (2, excerpt, "s")],
        "doc_id long, text string, source string",
    )
    # Jaccard at 0.5 misses the pair...
    jac = ngram_jaccard_pairs(df, threshold=0.5, block_col="source").collect()
    assert jac == []
    # ...containment flags it at 1.0
    cont = ngram_containment_pairs(df, threshold_pct=100).collect()
    assert len(cont) == 1 and cont[0].containment == 1.0


def test_containment_respects_blocks_and_threshold(spark):
    from aroa_etl_spark.operators.dedup import ngram_containment_pairs

    a = "p q r s t"
    df = spark.createDataFrame(
        [(1, a, "x"), (2, a, "y")],  # identical but different blocks
        "doc_id long, text string, source string",
    )
    assert ngram_containment_pairs(df).collect() == []
    import pytest as _pytest

    with _pytest.raises(ValueError, match="threshold_pct"):
        ngram_containment_pairs(df, threshold_pct=0)
