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
# Date-part similarity — exact port of similarity_measures.py:12-89
# ---------------------------------------------------------------------------

def number_diff(a: int, b: int) -> float:
    """Closeness of two date parts: max(0, 100 - (5^|a-b| - 1))."""
    d = abs(a - b)
    if d > 3:  # 5^4-1 already > 100
        return 0.0
    return max(0.0, 100.0 - (5.0**d - 1.0))


_PACKED_RE = re.compile(r"^(\d\d\d\d)(\d\d)(\d\d)\.?0?$")
_DOTTED_RE = re.compile(r"^(\d\d)\.(\d\d)\.(\d\d\d\d)$")


def parse_date(date: str) -> tuple[int, int, int] | None:
    """'yyyymmdd(.0)' or 'dd.mm.yyyy' → (year, month, day); else None
    (similarity_measures.py:31-42)."""
    m = _PACKED_RE.match(str(date))
    if m:
        y, mo, d = map(int, m.groups())
        return y, mo, d
    m = _DOTTED_RE.match(str(date))
    if m:
        d, mo, y = map(int, m.groups())
        return y, mo, d
    return None


def date_similarity(date_1: str, date_2: str) -> float:
    """Packed-date similarity with 0-parts ignored and a day/month-swap
    retry; -1 when either side unparseable (similarity_measures.py:45-74).
    NOTE faithful quirk: two all-zero dates ('00000000') parse fine and
    score 100 — every part is 'unknown, skip'."""
    p1, p2 = parse_date(str(date_1)), parse_date(str(date_2))
    if p1 is None or p2 is None:
        return -1.0
    y1, m1, d1 = p1
    y2, m2, d2 = p2

    def dm(day_a, day_b, mon_a, mon_b):
        ms = -1.0 if mon_a == 0 or mon_b == 0 else number_diff(mon_a, mon_b)
        ds = -1.0 if day_a == 0 or day_b == 0 else number_diff(day_a, day_b)
        return ms, ds

    year_score = -1.0 if y1 == 0 or y2 == 0 else number_diff(y1, y2)
    month_score, day_score = dm(d1, d2, m1, m2)
    month_rev, day_rev = dm(d1, m2, m1, d2)  # side-2 day/month swapped
    if month_score + day_score <= month_rev + day_rev:
        month_score, day_score = month_rev, day_rev

    score = 100.0
    for s in (year_score, month_score, day_score):
        if s >= 0:
            score -= 100.0 - s
    return max(0.0, score)


def _not_empty(field) -> bool:
    if field is None:
        return False
    if isinstance(field, float):
        import math

        if math.isnan(field):
            return False
    s = str(field)
    return len(s) > 0 and s not in ("", "00000000", "-1.0", "-1")


def simple_date_matcher(src_date: str, target_date: str) -> float:
    """Count of shared non-zero date parts / 3 × 100
    (similarity_measures.py:79-89)."""
    if not (_not_empty(src_date) and _not_empty(target_date)):
        return -1.0
    src_parts = re.findall(r"[1-9]\d*", str(src_date))
    trg_parts = re.findall(r"[1-9]\d*", str(target_date))
    hits = min(3, sum(1 for p in src_parts if p in trg_parts))
    return hits / 3.0 * 100.0


def name_matcher(a: str, b: str) -> float:
    """fuzz.ratio with default_process; -1 when either side empty."""
    if not (_not_empty(a) and _not_empty(b)):
        return -1.0
    return ratio(str(a), str(b))


def name_set_matcher(a: str, b: str) -> float:
    """token_set_ratio; -1 when either side empty."""
    if not (_not_empty(a) and _not_empty(b)):
        return -1.0
    return token_set_ratio(str(a), str(b))


def person_similarity(
    lname_a: str,
    lname_b: str,
    gname_a: str,
    gname_b: str,
    prisoner_a: str | None = None,
    prisoner_b: str | None = None,
    date_a: str | None = None,
    date_b: str | None = None,
    pob_a: str | None = None,
    pob_b: str | None = None,
    name_only: bool = False,
    non_names_optional: bool = False,
    date_matcher=date_similarity,
    use_prisoner: bool = True,
    use_date: bool = True,
    use_pob: bool = True,
    _set_matcher=None,
    _ratio_matcher=None,
) -> float:
    """The engine's core person-ranking blend — exact port of
    similarity_measures.py:113-164:

    primary  = (max(0,set(lname)) + max(0,set(gname))) / 2
    secondary= mean(prisoner ratio, max(0, date score)) over present parts
               (none present → 0 unless non_names_optional)
    other    = birthplace ratio (absent → skipped)
    score    = primary → 2/3·score + 1/3·secondary → 3/4·score + 1/4·other.

    use_* flags mirror the reference's 'column present in src row' checks.
    ``_set_matcher`` / ``_ratio_matcher`` let batch callers inject
    memoized component kernels without touching the blend semantics.
    """
    name_set = _set_matcher or name_set_matcher
    name_rat = _ratio_matcher or name_matcher
    primary = (
        max(0.0, name_set(lname_a, lname_b))
        + max(0.0, name_set(gname_a, gname_b))
    ) / 2.0
    if name_only:
        return primary

    secondary_parts: list[float] = []
    if use_prisoner:
        s = name_rat("" if prisoner_a is None else prisoner_a,
                     "" if prisoner_b is None else prisoner_b)
        if s >= 0:
            secondary_parts.append(s)
    if use_date:
        s = max(0.0, date_matcher("" if date_a is None else date_a,
                                  "" if date_b is None else date_b))
        secondary_parts.append(s)

    if secondary_parts:
        secondary = sum(secondary_parts) / len(secondary_parts)
    elif non_names_optional:
        secondary = -1.0
    else:
        secondary = 0.0

    other = -1.0
    if use_pob:
        s = name_rat("" if pob_a is None else pob_a, "" if pob_b is None else pob_b)
        if s >= 0:
            other = s

    score = primary
    if secondary >= 0:
        score = 2.0 / 3.0 * score + 1.0 / 3.0 * secondary
    if other >= 0:
        score = 3.0 / 4.0 * score + 1.0 / 4.0 * other
    return score


def _memo_pair(fn):
    """Memoize a 2-ary string kernel on its (a, b) pair — blocked
    candidate sets repeat the same name pairs constantly (one source
    joins many targets sharing a prefix block), so the quadratic LCS
    fallback runs once per DISTINCT pair instead of once per row."""
    cache: dict = {}

    def g(a, b):
        key = (a, b)
        v = cache.get(key)
        if v is None:
            v = cache[key] = fn(a, b)
        return v

    return g


def person_similarity_batch(
    lname_a, lname_b, gname_a, gname_b,
    prisoner_a, prisoner_b, date_a, date_b, pob_a, pob_b,
    *,
    name_only: bool = False,
    non_names_optional: bool = False,
    date_matcher=date_similarity,
    use_prisoner: bool = True,
    use_date: bool = True,
    use_pob: bool = True,
):
    """Arrow-chunk-batched ``person_similarity`` over parallel sequences
    → float64 numpy array. Semantics are person_similarity's by
    construction (the same blend runs per row); the speedup comes from
    two levels of dedup within the batch: whole-row tuples hit a row
    cache, and each component kernel (token-set name ratio, prisoner /
    birthplace ratio, date score) is memoized on its value pair. When
    rapidfuzz is installed the component kernels are its C versions
    (see ``ratio``/``token_set_ratio``), so both paths benefit.

    This is the hot kernel of the blocked matching/clustering operators
    (reference similarity_measures.py:113-164 at J6/EP2/EP3 volume)."""
    import numpy as np

    set_m = _memo_pair(name_set_matcher)
    rat_m = _memo_pair(name_matcher)
    date_m = _memo_pair(date_matcher)

    n = len(lname_a)
    out = np.empty(n, dtype=np.float64)
    row_cache: dict = {}
    for i in range(n):
        key = (
            lname_a[i], lname_b[i], gname_a[i], gname_b[i],
            prisoner_a[i], prisoner_b[i], date_a[i], date_b[i],
            pob_a[i], pob_b[i],
        )
        v = row_cache.get(key)
        if v is None:
            v = row_cache[key] = person_similarity(
                key[0] or "", key[1] or "", key[2] or "", key[3] or "",
                key[4], key[5], key[6], key[7], key[8], key[9],
                name_only=name_only,
                non_names_optional=non_names_optional,
                date_matcher=date_m,
                use_prisoner=use_prisoner,
                use_date=use_date,
                use_pob=use_pob,
                _set_matcher=set_m,
                _ratio_matcher=rat_m,
            )
        out[i] = v
    return out
