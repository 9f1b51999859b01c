"""Web-corpus hygiene: URL extraction, host normalization, registered
domains.

Per-domain statistics drive crawl curation (domain quotas, blocklists,
licensing audits) — at 100 TB these are pure narrow column expressions
plus one map-side-combinable groupBy on domain, so the only scale
concern is domain skew (a handful of giant domains), which the
aggregation's partial combine already absorbs.

Everything is plain regex/string ops (no Python UDF) with patterns kept
RE2/Java-compatible so the DuckDB oracle evaluates the identical
expressions. The registered-domain heuristic uses a compact second-level
TLD list rather than the full Public Suffix List; the PSL is a data
file, not an algorithm change — swap `_SECOND_LEVEL_TLDS` for the full
list in production.

Extension inventory (SURVEY.md §2.11); the reference has no web surface.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = [
    "extract_urls",
    "url_host",
    "normalize_host",
    "registered_domain",
    "SECOND_LEVEL_TLDS",
]

# the same URL shape tdp_scrub_pii uses — everything after the scheme up
# to whitespace
URL_RE = r"https?://[^\s]+"
# authority: scheme -> host stops at port / path / query / fragment
_HOST_RE = r"https?://([^/\s?#:]+)"

SECOND_LEVEL_TLDS = (
    "co.uk",
    "ac.uk",
    "gov.uk",
    "com.au",
    "co.jp",
    "co.in",
    "com.br",
    "co.nz",
    "com.cn",
    "co.za",
)


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def extract_urls(col: Column | str) -> Column:
    """All URLs in the text, in order (array<string>; empty if none)."""
    return F.regexp_extract_all(_c(col), F.lit(URL_RE), 0)


def url_host(url: Column | str) -> Column:
    """Hostname of a single URL ('' if the URL does not parse)."""
    return F.regexp_extract(_c(url), _HOST_RE, 1)


def normalize_host(host: Column | str) -> Column:
    """Lowercase and strip one leading ``www.`` label."""
    return F.regexp_replace(F.lower(_c(host)), r"^www\.", "")


def registered_domain(host: Column | str) -> Column:
    """eTLD+1 heuristic: the last two labels, or the last three when the
    final two form a known second-level TLD (``co.uk`` etc.). Hosts with
    fewer than three labels pass through unchanged."""
    host = _c(host)
    labels = F.split(host, r"\.")
    n = F.size(labels)
    last2 = F.concat_ws(
        ".", F.element_at(labels, -2), F.element_at(labels, -1)
    )
    last3 = F.concat_ws(
        ".",
        F.element_at(labels, -3),
        F.element_at(labels, -2),
        F.element_at(labels, -1),
    )
    return F.when(n <= 2, host).otherwise(
        F.when(last2.isin(*SECOND_LEVEL_TLDS), last3).otherwise(last2)
    )
