"""Parity-gap modules: OCR repair (F20), paren-aware sub (F22),
geo-id cleaners (F24/F25), dictionary standardizer (F26), Zooniverse
annotation parsing (JS2/JS3)."""

from __future__ import annotations

import json

from pyspark.sql import functions as F


# --- F20 / F22 scalar kernels (pure Python, no session needed) -------------

def test_fix_visual_decoding_scalar():
    from aroa_etl_spark.functions.ocr import fix_visual_decoding_py

    assert fix_visual_decoding_py("Müller") == "Müller"
    # Cyrillic М homoglyph repaired (≤30% foreign)
    assert fix_visual_decoding_py("Мeier") == "Meier"
    # accent folding é→e
    assert fix_visual_decoding_py("Méier") == "Meier"
    # >30% confusable density → rejected, same as the reference's ratio
    assert fix_visual_decoding_py("Мüllеr") == ""
    # digit confusables: 0→O, 1→l
    assert fix_visual_decoding_py("B10ck") == "BlOck"
    # > 30% foreign → rejected entirely
    assert fix_visual_decoding_py("日本語のテキスト") == ""
    # dropped symbols vanish, keep '-', ' ', '.'
    assert fix_visual_decoding_py("a;b,c-d. e") == "abc-d. e"


def test_re_sub_exclude_parenthesis_scalar():
    from aroa_etl_spark.functions.ocr import re_sub_exclude_parenthesis_py

    f = re_sub_exclude_parenthesis_py
    assert f("a b (a b) c", r"\s", ";") == "a;b;(a b);c"
    # nesting: everything inside stays verbatim
    assert f("x (a (b c) d) y", r"\s", "_") == "x_(a (b c) d)_y"
    assert f("[keep me] drop me", r"\s", "") == "[keep me]dropme"


def test_geo_id_cleaners(spark):
    from aroa_etl_spark.functions.cleaning import clean_geoname_id, clean_wikidata_id

    df = spark.createDataFrame(
        [("Q42",), ("q7",), ("1234",), ("junk",), ("unklar",), (None,)], ["wid"]
    )
    wc, wqa = clean_wikidata_id("wid")
    rows = df.select(F.col("wid"), wc.alias("c"), wqa.alias("qa")).collect()
    got = {r["wid"]: (r["c"], r["qa"]) for r in rows}
    assert got["Q42"] == ("Q42", False)
    assert got["q7"] == ("q7", False)
    assert got["1234"] == ("Q1234", True)  # changed value → QA
    assert got["junk"] == ("", True)
    assert got["unklar"] == ("", True)

    gc, gqa = clean_geoname_id("wid")
    rows = df.select(F.col("wid"), gc.alias("c"), gqa.alias("qa")).collect()
    got = {r["wid"]: (r["c"], r["qa"]) for r in rows}
    assert got["1234"] == ("1234", False)
    assert got["Q42"] == ("", True)


def test_standardize_column(spark):
    from aroa_etl_spark.operators.standardize import standardize_column

    mapping = {
        "polen": "Polish",
        "poln": "Polish",          # substring of nothing, shorter variant
        "deutsch": "German",
        "deutschland": "German",   # longer key must win over 'deutsch'
    }
    unclear = {"staatenlos?": "?"}
    df = spark.createDataFrame(
        [("polen",), ("aus deutschland",), ("deutsch polen",),
         ("staatenlos?",), ("mars",), ("",)],
        ["nat"],
    )
    out = standardize_column(df, "nat", mapping, unclear)
    got = {r["nat"]: (r["nat_std"], r["nat_qa"]) for r in out.collect()}
    assert got["polen"] == ("Polish", False)
    # longest key wins: 'deutschland' not 'deutsch'+'land'
    assert got["aus deutschland"] == ("aus;German", False)
    assert got["deutsch polen"] == ("German;Polish", False)
    assert got["staatenlos?"] == ("?", True)
    assert got["mars"] == ("mars", True)   # no match → raw + QA
    assert got[""] == ("", False)


def test_zooniverse_annotation_walker(spark):
    from aroa_etl_spark.sources.zooniverse import (
        map_to_columns,
        parse_annotations,
        parse_subject_data,
    )

    simple = {"task": "T0", "task_label": "Last name", "value": "Meier"}
    nested = {
        "task": "T1",
        "task_label": None,
        "value": [
            {"task": "T1.1", "task_label": "First name", "value": "Anna"},
            {"task": "T1.2", "value": [{"select_label": "Year", "label": "Year"}]},
            {"task": "T1.2", "value": "1930"},
        ],
    }
    payload = json.dumps([simple, nested])
    df = spark.createDataFrame([(payload,)], ["annotations"])
    out = df.select(parse_annotations("annotations").alias("m")).collect()[0]["m"]
    assert out["Last name"] == "Meier"
    assert out["T1: First name"] == "Anna"
    assert out["T1: Year"] == "1930"

    subj = json.dumps({"12345": {"filename": "card_001.jpg", "page": "2"}})
    sd = spark.createDataFrame([(subj,)], ["subject"])
    row = sd.select(parse_subject_data("subject").alias("s")).collect()[0]["s"]
    assert row["subject_id"] == "12345"
    assert row["subject_data"]["filename"] == "card_001.jpg"

    # map → columns materialization
    wide = map_to_columns(
        df.select(parse_annotations("annotations").alias("m")), "m",
        ["Last name", "T1: First name"],
    ).collect()[0]
    assert wide["Last name"] == "Meier"
    assert wide["T1: First name"] == "Anna"


def test_dedup_release_caches(spark):
    """Operator-internal persisted frames are registered and released by
    release_caches(); storage does not accumulate across invocations."""
    from aroa_etl_spark.operators import dedup

    df = spark.createDataFrame(
        [(i, f"the quick brown fox {i % 3} jumps over") for i in range(30)],
        ["doc_id", "text"],
    )
    dedup.release_caches()  # clean slate
    dedup.minhash_lsh_dedup(df).count()
    dedup.simhash_dedup(df).count()
    # registry-based (deterministic): storage-level block counts race
    # against the async ContextCleaner reaping OTHER tests' checkpoint
    # blocks in the shared session, so assert on what the operator
    # actually registered and released, not on global storage totals.
    released = dedup.release_caches()
    # minhash sh + keys, simhash banded (banded persisted since round 6:
    # it feeds both join sides plus the hot-bucket size agg; the simhash
    # sh barrier was dropped in r13 — single consumer, banded holds it)
    assert released == 3
    assert dedup.release_caches() == 0


def test_stats_release_caches(spark):
    """persist=True rank/AUC frames are registered in the stats cache
    registry and released by stats.release_caches() — the r13 'caller
    clears it' contract left them cached for the application lifetime
    (and CacheManager plan-matching let later identical invocations
    silently reuse a stale cache)."""
    from aroa_etl_spark.operators import stats
    from aroa_etl_spark.operators.evaluation import exact_auc

    df = spark.createDataFrame(
        [(i, float(i % 7), i % 2) for i in range(50)],
        ["doc_id", "score", "y"],
    )
    stats.release_caches()  # clean slate
    stats.exact_global_rank(df, "score", "doc_id", persist=True).count()
    exact_auc(df, "score", "y", "doc_id", persist=True).collect()
    # one barrier per persist=True call (exact_auc delegates to
    # exact_global_rank, so its persist lands in the same registry)
    assert stats.release_caches() == 2
    assert stats.release_caches() == 0
    # persist=False paths register nothing
    stats.exact_global_rank(df, "score", "doc_id").count()
    assert stats.release_caches() == 0


def test_winnowing_guarantee_and_shapes(spark):
    """Winnowing property: two docs sharing a run of ≥ window+k-1 tokens
    share at least one fingerprint; disjoint docs share none."""
    from pyspark.sql import functions as F

    from aroa_etl_spark.functions.text import (
        shingles,
        with_winnowing_fingerprints,
    )

    shared = "alpha beta gamma delta epsilon zeta eta theta"  # 8 tokens ≥ w+k-1=6
    rows = [
        (1, f"one two {shared} three"),
        (2, f"{shared} nine ten eleven twelve"),
        (3, "completely different words entirely unrelated content here now"),
        (4, "tiny doc"),  # fewer than k tokens → empty shingles → empty fps
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    fp_df = with_winnowing_fingerprints(
        df.select("doc_id", shingles("text", 3).alias("__sh")), "__sh", "fp", window=4
    ).select("doc_id", "fp")
    out = {r["doc_id"]: set(r["fp"]) for r in fp_df.collect()}
    assert out[1] & out[2], "shared run must share a fingerprint"
    assert not (out[1] & out[3]) and not (out[2] & out[3])
    assert out[4] == set()
    # deterministic across runs
    again = fp_df.select("fp").collect()
    assert {tuple(r["fp"]) for r in again} == {tuple(sorted(v)) for v in out.values()}


def test_ngram_unblocked_winnowing_catches_mid_document_overlap(spark):
    """The unblocked fallback blocks on winnowing fingerprints: a pair
    whose shared run sits mid-document (different opening n-grams) is
    found — the old first-shingle key would have missed it."""
    from aroa_etl_spark.operators.dedup import ngram_jaccard_pairs, release_caches

    shared = "lorem ipsum dolor sit amet consectetur adipiscing elit sed do"
    df = spark.createDataFrame(
        [
            (1, f"unique opening alpha {shared}"),
            (2, f"different start beta gamma {shared}"),
            (3, "total mismatch content nothing in common with the others at all"),
        ],
        ["doc_id", "text"],
    )
    pairs = {
        (r["id_a"], r["id_b"])
        for r in ngram_jaccard_pairs(df, n=3, threshold=0.4).collect()
    }
    release_caches()
    assert (1, 2) in pairs
    assert all(3 not in p for p in pairs)


def test_ngram_blocked_inverted_index_vs_brute_force(spark):
    """The blocked path (inverted-index join) must equal a brute-force
    per-block all-pairs Jaccard, including n_intersect/n_union values."""
    from aroa_etl_spark.operators.dedup import ngram_jaccard_pairs, release_caches

    rows = [
        (1, "a", "the quick brown fox jumps over the lazy dog"),
        (2, "a", "the quick brown fox jumps over a sleepy dog"),
        (3, "a", "completely different words appear here only once ever"),
        (4, "b", "the quick brown fox jumps over the lazy dog"),  # other block
        (5, "b", "the quick brown fox jumps over the lazy dog today"),
        (6, "b", ""),  # empty doc: no shingles, must never pair
    ]
    df = spark.createDataFrame(rows, ["doc_id", "source", "text"])
    got = {
        (r["id_a"], r["id_b"]): (r["n_intersect"], r["n_union"])
        for r in ngram_jaccard_pairs(
            df, n=3, threshold=0.3, block_col="source"
        ).collect()
    }
    release_caches()

    def sh3(t):
        toks = t.split()
        return {" ".join(toks[i : i + 3]) for i in range(len(toks) - 2)}

    want = {}
    for i, bi, ti in rows:
        for j, bj, tj in rows:
            if i < j and bi == bj:
                a, b = sh3(ti), sh3(tj)
                u = len(a | b)
                if u > 0 and len(a & b) / u >= 0.3:
                    want[(i, j)] = (len(a & b), u)
    assert got == want


def test_detect_charset_boms_and_heuristics(spark):
    """BOM detection, strict-UTF-8 self-certification, ASCII class,
    Latin-1 fallback, and the empty-bytes edge (round 7)."""
    from aroa_etl_spark.functions.text import detect_charset

    cases = [
        (0, "ascii-only".encode("ascii"), "ascii", 10),
        (1, "café".encode("utf-8"), "utf-8", 4),
        (2, b"\xff\xfe" + "café".encode("utf-16-le"), "utf-16le", 4),
        (3, b"\xfe\xff" + "café".encode("utf-16-be"), "utf-16be", 4),
        (4, b"\xef\xbb\xbf" + "café".encode("utf-8"), "utf-8-sig", 4),
        (5, "café".encode("latin-1"), "latin-1", 4),
        (6, b"", "ascii", 0),
    ]
    df = spark.createDataFrame(
        [(i, bytearray(b)) for i, b, _, _ in cases],
        "doc_id bigint, raw binary",
    )
    got = {r.doc_id: (r.charset, r.n_chars) for r in detect_charset(df).collect()}
    for i, _, charset, n in cases:
        assert got[i] == (charset, n), (i, got[i])


def test_detect_charset_dirty_boms_and_utf32(spark):
    """Review fixes: UTF-32 BOMs beat the UTF-16 prefix; a BOM over
    invalid payload classifies as latin-1 instead of killing the task;
    GNU-style junk never raises."""
    from aroa_etl_spark.functions.text import detect_charset

    cases = [
        (0, b"\xff\xfe\x00\x00" + "hi".encode("utf-32-le"), "utf-32le", 2),
        (1, b"\x00\x00\xfe\xff" + "hi".encode("utf-32-be"), "utf-32be", 2),
        # UTF-16LE BOM + odd byte count: invalid UTF-16 -> latin-1
        (2, b"\xff\xfe\x41", "latin-1", 3),
        # mojibake'd UTF-8 BOM over a latin-1 high byte -> latin-1
        (3, b"\xef\xbb\xbf\xe9", "latin-1", 4),
    ]
    df = spark.createDataFrame(
        [(i, bytearray(b)) for i, b, _, _ in cases],
        "doc_id bigint, raw binary",
    )
    got = {r.doc_id: (r.charset, r.n_chars) for r in detect_charset(df).collect()}
    for i, _, charset, n in cases:
        assert got[i] == (charset, n), (i, got[i])


def test_canonicalize_url_rules(spark):
    """Each canonicalization rule in isolation, plus the pass-through
    contract for non-URL junk."""
    from aroa_etl_spark.functions.urls import canonicalize_url

    cases = [
        ("HTTP://Example.COM/x", "http://example.com/x"),        # case
        ("http://h:80/x", "http://h/x"),                         # default port
        ("https://h:443/x", "https://h/x"),
        ("http://h:8080/x", "http://h:8080/x"),                  # real port kept
        ("ftp://H:21/f", "ftp://h:21/f"),                        # non-http port kept
        ("http://h", "http://h/"),                               # empty path
        ("http://h/p/", "http://h/p"),                           # trailing slash
        ("http://h/", "http://h/"),                              # root slash kept
        ("http://h/x?b=2&a=1", "http://h/x?a=1&b=2"),            # param sort
        ("http://h/x?utm_source=a&q=1", "http://h/x?q=1"),       # tracking
        ("http://h/x?fbclid=zz", "http://h/x"),                  # all-tracking
        ("http://h/x?gclid", "http://h/x"),                      # bare tracking key
        ("http://h/x#frag", "http://h/x"),                       # fragment
        ("http://h/x?utm_campaign=c&utm_medium=m", "http://h/x"),
        ("not a url", "not a url"),                              # pass-through
        ("", ""),
    ]
    df = spark.createDataFrame([(u,) for u, _ in cases], "u string")
    got = [r.c for r in df.select(canonicalize_url("u").alias("c")).collect()]
    for (u, want), g in zip(cases, got):
        assert g == want, (u, g, want)


def test_parse_srt_edges(spark):
    """SRT parser edge cases: CRLF line endings, dot millisecond
    separators (the WebVTT-style variant some tools emit), missing
    counter lines, malformed blocks surfacing as NULL timing, and
    multi-line folding."""
    from aroa_etl_spark.functions.subtitles import parse_srt

    srt = (
        "1\r\n00:00:01,000 --> 00:00:02,000\r\nwindows line\r\n\r\n"
        "00:00:03.500 --> 00:00:04.000\nno counter, dot millis\n\n"
        "2\n00:01:02,003 --> 00:01:05,999\nfirst\nsecond\nthird\n\n"
        "just text, no timing\n"
    )
    df = spark.createDataFrame([(7, srt)], "doc_id long, text string")
    rows = sorted(
        parse_srt(df, "text").collect(),
        key=lambda r: (r.start_ms is None, r.start_ms or 0),
    )
    assert [r.start_ms for r in rows] == [1000, 3500, 62003, None]
    assert rows[0].cue_index == 1 and rows[0].cue_text == "windows line"
    assert rows[1].cue_index is None
    assert rows[1].cue_text == "no counter, dot millis"
    assert rows[2].end_ms == 65999 and rows[2].duration_ms == 3996
    assert rows[2].cue_text == "first second third"
    assert rows[3].start_ms is None and rows[3].cue_text.startswith("just text")


def test_parse_webvtt_edges(spark):
    """WebVTT edges: BOM on the WEBVTT header, STYLE/REGION blocks
    skipped, hourless timestamps, identifiers that look like text, and
    a timing-less block surfacing with NULL timing."""
    from aroa_etl_spark.functions.subtitles import parse_webvtt

    vtt = (
        "﻿WEBVTT\n\n"
        "STYLE\n::cue { color: red }\n\n"
        "REGION\nid:r1\n\n"
        "12 monkeys\n00:03.000 --> 00:04.000\ntext one\n\n"
        "00:05.500 --> 01:02:06.000 line:0\nsecond <i>cue</i>\n\n"
        "orphan block with no arrow\n"
    )
    df = spark.createDataFrame([(3, vtt)], "doc_id long, text string")
    rows = sorted(
        parse_webvtt(df, "text").collect(),
        key=lambda r: (r.start_ms is None, r.start_ms or 0),
    )
    assert [r.start_ms for r in rows] == [3000, 5500, None]
    assert rows[0].cue_id == "12 monkeys" and rows[0].cue_text == "text one"
    assert rows[1].cue_id is None and rows[1].end_ms == 3726000
    assert rows[1].settings == "line:0"
    assert rows[2].cue_text.startswith("orphan block")
