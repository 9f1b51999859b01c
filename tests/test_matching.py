"""Person matching: similarity kernels + blocked fuzzy join
(SURVEY §2 M1-M6, J6, W2, O4; reference person_matching/).

Kernel tests pin the exact scoring semantics of
similarity_measures.py; the end-to-end test cross-checks the Spark
blocked join against a brute-force pandas re-computation of the same
blocking + scoring on a small engineered dataset.
"""

from __future__ import annotations

import re

import pytest

from aroa_etl_spark.functions import simkernels as K


# ---------------------------------------------------------------------------
# scoring kernels
# ---------------------------------------------------------------------------

def test_ratio_identity_and_symmetry():
    assert K.ratio("meier", "meier") == 100.0
    assert K.ratio("meier", "maier") == K.ratio("maier", "meier")
    assert 0.0 < K.ratio("meier", "maier") < 100.0
    # default_process: case/punctuation-insensitive
    assert K.ratio("Meier!", "meier") == 100.0


def test_token_set_ratio_order_insensitive():
    assert K.token_set_ratio("anna maria", "maria anna") == 100.0
    # subset tokens score 100 in the set variant (s1 == inter)
    assert K.token_set_ratio("anna", "anna maria") == 100.0


def test_jaro_similarity_known_values():
    assert K.jaro_similarity("abc", "abc") == 1.0
    assert K.jaro_similarity("abc", "xyz") == 0.0
    # classic textbook pair
    assert K.jaro_similarity("MARTHA", "MARHTA") == pytest.approx(0.944444, abs=1e-4)


def test_number_diff():
    # similarity_measures.py:12-15: max(0, 100 - (5^|a-b| - 1))
    assert K.number_diff(1930, 1930) == 100.0
    assert K.number_diff(1930, 1931) == 96.0
    assert K.number_diff(1930, 1932) == 76.0
    assert K.number_diff(1930, 1933) == 0.0  # 5^3-1 = 124 > 100
    assert K.number_diff(1930, 1990) == 0.0


def test_parse_date_formats():
    assert K.parse_date("19300201") == (1930, 2, 1)
    assert K.parse_date("19300201.0") == (1930, 2, 1)
    assert K.parse_date("01.02.1930") == (1930, 2, 1)
    assert K.parse_date("1930") is None
    assert K.parse_date("") is None


def test_date_similarity_semantics():
    assert K.date_similarity("19300201", "19300201") == 100.0
    # unparseable → -1 sentinel
    assert K.date_similarity("", "19300201") == -1.0
    # zero parts are "unknown, skip": only year compared here
    assert K.date_similarity("19300000", "19300201") == 100.0
    # day/month swap retry: 03.04 vs 04.03 scores as swapped (100)
    assert K.date_similarity("19300403", "19300304") == 100.0
    # one year off with full date match otherwise
    assert K.date_similarity("19300201", "19310201") == 96.0


def test_simple_date_matcher():
    # shared non-zero parts / 3 * 100
    assert K.simple_date_matcher("01.02.1930", "01.02.1930") == 100.0
    assert K.simple_date_matcher("01.02.1930", "05.02.1930") == pytest.approx(200.0 / 3.0)
    assert K.simple_date_matcher("00000000", "01.02.1930") == -1.0


def test_person_similarity_blend():
    # names only, perfect match, no secondary/other data:
    # primary=100, secondary=0 (present but empty → not appended... empty
    # fields give -1 from matchers → filtered; date matcher unparseable → -1
    # → max(0,-1)=0 appended when use_date) — mirror reference exactly:
    s = K.person_similarity("meier", "meier", "anna", "anna",
                            None, None, None, None, None, None)
    # secondary = mean([max(0, -1 date)]) = 0 → 2/3*100 + 1/3*0
    assert s == pytest.approx(200.0 / 3.0)
    # name_only skips the blend entirely
    s = K.person_similarity("meier", "meier", "anna", "anna", name_only=True)
    assert s == 100.0
    # full agreement on all fields → 100
    s = K.person_similarity(
        "meier", "meier", "anna", "anna",
        "123", "123", "19300201", "19300201", "berlin", "berlin",
    )
    assert s == pytest.approx(100.0)


# ---------------------------------------------------------------------------
# blocked matching end-to-end vs brute force
# ---------------------------------------------------------------------------

PEOPLE_SRC = [
    # (id, gname, lname, dob, prisoner, pob)
    (1, "anna", "meier", "19300201", "123", "berlin"),
    (2, "hans peter", "schmidt", "19251130", "", "hamburg"),
    (3, "maria", "kovacs", "00000000", "77", ""),
    (4, "josef", "novak", "19100505", "", "prag"),
    (5, "zzz", "qqq", "", "", ""),  # blocks match nothing
]
PEOPLE_TRG = [
    (101, "anna", "maier", "19300201", "123", "berlin"),     # near-dup of 1
    (102, "anne", "meier", "19300101", "", "berlin"),        # fuzzy of 1
    (103, "hans", "schmidt", "19251130", "", "hamburg"),     # of 2
    (104, "marja", "kovacs", "19200101", "77", "budapest"),  # of 3
    (105, "pepa", "novak", "19100505", "", "prag"),          # lname-only of 4
    (106, "anna", "schmidt", "19990101", "", ""),            # mixed
]


def _brute_force(top_n=2, min_score=50.0):
    """Reference-faithful brute force: same block keys, fname∩lname, score."""
    def keys(name, n=2, band=4):
        out = set()
        for tok in re.sub(r"[^a-z\s]", "", name).split(" "):
            out.add((tok[:n], len(tok) // band))
        return out

    expected = {}
    for sid, sg, sl, sd, sp, sb in PEOPLE_SRC:
        cands = []
        for tid, tg, tl, td, tp, tb in PEOPLE_TRG:
            if keys(sg) & keys(tg) and keys(sl) & keys(tl):
                score = K.person_similarity(sl, tl, sg, tg, sp, tp, sd, td, sb, tb)
                if score >= min_score:
                    cands.append((score, tid))
        cands.sort(key=lambda x: (-x[0], x[1]))
        expected[sid] = cands[:top_n]
    return expected


def test_person_matching_vs_brute_force(spark):
    from aroa_etl_spark.operators.matching import person_matching

    cols = ["id", "strGName_processed", "strLName_processed",
            "strDoB_processed", "prisoner_number", "strPoB_processed"]
    src = spark.createDataFrame(PEOPLE_SRC, cols).withColumnRenamed("id", "srcID")
    trg = spark.createDataFrame(PEOPLE_TRG, cols).withColumnRenamed("id", "trgID")

    got = person_matching(
        src, trg, src_id="srcID", target_id="trgID",
        top_n_matches=2, min_match_score=50.0,
    ).collect()

    by_src: dict[int, list[tuple[float, int]]] = {}
    for r in got:
        by_src.setdefault(r["srcID"], []).append((r["score"], r["trgID"]))

    expected = _brute_force()
    for sid, exp in expected.items():
        rows = sorted(by_src[sid], key=lambda x: (-x[0], x[1] if x[1] is not None else -1))
        if not exp:
            assert rows == [(-1.0, None)], f"src {sid}: expected sentinel, got {rows}"
        else:
            assert [t for _, t in rows] == [t for _, t in exp], f"src {sid}"
            for (gs, _), (es, _) in zip(rows, exp):
                assert gs == pytest.approx(es)


def test_person_matching_unique_targets(spark):
    from aroa_etl_spark.operators.matching import person_matching

    cols = ["id", "strGName_processed", "strLName_processed",
            "strDoB_processed", "prisoner_number", "strPoB_processed"]
    # two sources both best-matching target 101
    src = spark.createDataFrame(
        [(1, "anna", "meier", "19300201", "123", "berlin"),
         (2, "anna", "meier", "19300201", "", "berlin")],
        cols,
    ).withColumnRenamed("id", "srcID")
    trg = spark.createDataFrame(
        [(101, "anna", "meier", "19300201", "123", "berlin")], cols
    ).withColumnRenamed("id", "trgID")

    got = person_matching(
        src, trg, src_id="srcID", target_id="trgID",
        top_n_matches=1, min_match_score=50.0, allow_duplicates=False,
    ).collect()
    winners = [r for r in got if r["trgID"] is not None]
    losers = [r for r in got if r["trgID"] is None]
    assert len(winners) == 1 and winners[0]["srcID"] == 1  # higher score wins
    assert len(losers) == 1 and losers[0]["score"] == -1.0


def test_person_similarity_batch_matches_scalar():
    """The memoized batch kernel must be bit-identical to the scalar
    blend on every row, including empty/None/sentinel fields."""
    from aroa_etl_spark.functions.simkernels import (
        person_similarity,
        person_similarity_batch,
    )

    rows = [
        ("schmidt", "schmitt", "anna", "anna", "123", "123", "19200101", "19200101", "wien", "wien"),
        ("schmidt", "schmidt", "anna", "anne", None, None, None, None, None, None),
        ("", "", "", "", "", "", "", "", "", ""),
        ("meier", "maier", "hans peter", "peter hans", "-1", "00000000", "00001920", "19200000", "linz", ""),
        ("schmidt", "schmitt", "anna", "anna", "123", "123", "19200101", "19200101", "wien", "wien"),  # dup row
        ("yz", "yz", "ab", "ab", None, "9", "19440229", "29.02.1944", "x", "x"),
    ]
    cols = list(zip(*rows))
    for name_only in (False, True):
        for use in (True, False):
            got = person_similarity_batch(
                *cols, name_only=name_only,
                use_prisoner=use, use_date=use, use_pob=use,
            )
            want = [
                person_similarity(
                    r[0] or "", r[1] or "", r[2] or "", r[3] or "",
                    r[4], r[5], r[6], r[7], r[8], r[9],
                    name_only=name_only,
                    use_prisoner=use, use_date=use, use_pob=use,
                )
                for r in rows
            ]
            assert list(got) == want
