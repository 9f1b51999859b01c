"""Similarity scoring kernels (SURVEY §2.8 M-family).

Pure-Python/numpy implementations that run inside Arrow pandas_udf /
applyInPandas kernels on executors. When ``rapidfuzz`` / ``jellyfish``
are installed they are used instead (same semantics, C speed); the
container ships neither, so these fallbacks define the engine's
behavior:

- ``ratio``            — InDel similarity ×100 (= rapidfuzz fuzz.ratio:
                          2·LCS/(|a|+|b|)·100)
- ``token_set_ratio``  — order-insensitive set variant (fuzz.token_set_ratio)
- ``jaro_similarity``  — classic Jaro (jellyfish.jaro_similarity)

Re-expressed from similarity_measures.py / enc/matching.py usage.
"""

from __future__ import annotations

import re

try:  # pragma: no cover - exercised only when rapidfuzz is installed
    from rapidfuzz import fuzz as _rf_fuzz
    from rapidfuzz import utils as _rf_utils

    _HAVE_RAPIDFUZZ = True
except ImportError:
    _HAVE_RAPIDFUZZ = False

try:  # pragma: no cover
    from jellyfish import jaro_similarity as _jf_jaro

    _HAVE_JELLYFISH = True
except ImportError:
    _HAVE_JELLYFISH = False

_NON_ALNUM = re.compile(r"[\W_]+", re.UNICODE)


def default_process(s: str) -> str:
    """Normalize before scoring: non-alphanumerics → space, lower, trim
    (the rapidfuzz default_process contract)."""
    return _NON_ALNUM.sub(" ", str(s)).strip().lower()


def _lcs_len(a: str, b: str) -> int:
    """Longest common subsequence length, O(|a|·|b|) with two rows."""
    if not a or not b:
        return 0
    if len(b) > len(a):
        a, b = b, a
    prev = [0] * (len(b) + 1)
    for ca in a:
        cur = [0]
        append = cur.append
        for j, cb in enumerate(b, 1):
            if ca == cb:
                append(prev[j - 1] + 1)
            else:
                pj, cj = prev[j], cur[j - 1]
                append(pj if pj >= cj else cj)
        prev = cur
    return prev[-1]


def ratio(a: str, b: str, processor: bool = True) -> float:
    """InDel similarity ×100. With processor=True both sides go through
    default_process first (matching fuzz.ratio(..., processor=default_process))."""
    if _HAVE_RAPIDFUZZ:
        proc = _rf_utils.default_process if processor else None
        return float(_rf_fuzz.ratio(a, b, processor=proc))
    if processor:
        a, b = default_process(a), default_process(b)
    la, lb = len(a), len(b)
    if la + lb == 0:
        return 100.0
    return 200.0 * _lcs_len(a, b) / (la + lb)


def token_set_ratio(a: str, b: str) -> float:
    """Order-insensitive token-set similarity ×100 (fuzz.token_set_ratio)."""
    if _HAVE_RAPIDFUZZ:
        return float(_rf_fuzz.token_set_ratio(a, b, processor=_rf_utils.default_process))
    ta = set(default_process(a).split())
    tb = set(default_process(b).split())
    if not ta and not tb:
        return 100.0
    inter = " ".join(sorted(ta & tb))
    s1 = (inter + " " + " ".join(sorted(ta - tb))).strip()
    s2 = (inter + " " + " ".join(sorted(tb - ta))).strip()
    best = 0.0
    for x, y in ((inter, s1), (inter, s2), (s1, s2)):
        best = max(best, ratio(x, y, processor=False))
    return best


def jaro_similarity(a: str, b: str) -> float:
    """Classic Jaro similarity in [0, 1]."""
    if _HAVE_JELLYFISH:
        return float(_jf_jaro(a, b))
    la, lb = len(a), len(b)
    if la == 0 and lb == 0:
        return 1.0
    if la == 0 or lb == 0:
        return 0.0
    window = max(la, lb) // 2 - 1
    if window < 0:
        window = 0
    a_flags = [False] * la
    b_flags = [False] * lb
    matches = 0
    for i, ca in enumerate(a):
        lo = max(0, i - window)
        hi = min(lb, i + window + 1)
        for j in range(lo, hi):
            if not b_flags[j] and b[j] == ca:
                a_flags[i] = b_flags[j] = True
                matches += 1
                break
    if matches == 0:
        return 0.0
    transpositions = 0
    j = 0
    for i in range(la):
        if a_flags[i]:
            while not b_flags[j]:
                j += 1
            if a[i] != b[j]:
                transpositions += 1
            j += 1
    transpositions //= 2
    m = matches
    return (m / la + m / lb + (m - transpositions) / m) / 3.0


# ---------------------------------------------------------------------------
# Date-part similarity (similarity_measures.py:12-89)
# ---------------------------------------------------------------------------

def number_diff(a: int, b: int) -> float:
    """Closeness of two date parts: 100 - (5^|a-b| - 1), floored at 0
    (similarity_measures.py:12-15)."""
    d = abs(a - b)
    if d > 3:  # 5^4-1 already > 100
        return 0.0
    return max(0.0, 100.0 - (5.0**d - 1.0))


def date_similarity(y1: int, m1: int, d1: int, y2: int, m2: int, d2: int) -> float:
    """Weighted date similarity with unknown (0) parts skipped and a
    day/month-swap retry (similarity_measures.py:45-74)."""

    def parts_score(py1, pm1, pd1, py2, pm2, pd2):
        scores = []
        for a, b in ((py1, py2), (pm1, pm2), (pd1, pd2)):
            if a == 0 or b == 0:
                scores.append(-1.0)  # unknown part: ignored
            else:
                scores.append(number_diff(a, b))
        known = [s for s in scores if s >= 0]
        if not known:
            return -1.0
        return sum(known) / len(known)

    direct = parts_score(y1, m1, d1, y2, m2, d2)
    swapped = parts_score(y1, d1, m1, y2, m2, d2)
    return max(direct, swapped)


def simple_date_matcher(y1: int, m1: int, d1: int, y2: int, m2: int, d2: int) -> float:
    """Share of equal non-zero date parts ×100 (similarity_measures.py:79-89)."""
    hits = 0
    for a, b in ((y1, y2), (m1, m2), (d1, d2)):
        if a != 0 and a == b:
            hits += 1
    return hits / 3.0 * 100.0


def person_similarity(
    lname_a: str,
    lname_b: str,
    gname_a: str,
    gname_b: str,
    prisoner_a: str = "",
    prisoner_b: str = "",
    date_a: tuple[int, int, int] | None = None,
    date_b: tuple[int, int, int] | None = None,
    pob_a: str = "",
    pob_b: str = "",
    name_only: bool = False,
    non_names_optional: bool = True,
) -> float:
    """The engine's core person-ranking blend (similarity_measures.py:113-164):

    primary  = mean(token_set(lname), token_set(gname))
    secondary= mean(prisoner ratio, date similarity)   [missing → skipped]
    other    = birthplace ratio                        [missing → skipped]
    score    = primary, then 2/3·primary + 1/3·secondary,
               then 3/4·that + 1/4·other.
    """
    primary = (token_set_ratio(lname_a, lname_b) + token_set_ratio(gname_a, gname_b)) / 2.0
    if name_only:
        return primary

    secondary_parts: list[float] = []
    if prisoner_a and prisoner_b:
        secondary_parts.append(ratio(prisoner_a, prisoner_b))
    if date_a is not None and date_b is not None and any(date_a) and any(date_b):
        secondary_parts.append(date_similarity(*date_a, *date_b))

    score = primary
    if secondary_parts:
        secondary = sum(secondary_parts) / len(secondary_parts)
        score = 2.0 / 3.0 * primary + 1.0 / 3.0 * secondary
    elif not non_names_optional:
        return -1.0

    if pob_a and pob_b:
        other = ratio(pob_a, pob_b)
        score = 3.0 / 4.0 * score + 1.0 / 4.0 * other
    return score
