"""URL canonicalization for crawl dedup — the normalization every
web-corpus pipeline runs before exact/near dedup: two fetches of the
same page routinely differ only in host case, default ports, tracking
parameters, parameter order, fragments, or a trailing slash, and
hashing raw URLs silently doubles such pages.

Spark disposition: PURE column expressions (regexp extracts + array
higher-order functions) — no UDF, whole-stage codegen, replayable on
any engine with the same regex semantics (the DuckDB oracle replays it
with its own regexp/list functions).

Canonical form (conservative, lossless-for-routing):
- scheme and host lowercased; userinfo preserved as-is
- default ports dropped (:80 for http, :443 for https)
- empty path -> '/'; a trailing slash on a non-root path dropped
- query split on '&', empty params and TRACKING params removed
  (utm_*, fbclid, gclid, msclkid, mc_cid, mc_eid, igshid, ref_src),
  the survivors BYTE-SORTED and rejoined — parameter order never
  distinguishes resources in practice, tracking params never do
- fragment dropped (client-side only)

Reference analogue: none — the reference pipeline has no web-crawl
surface; this is LLM-data-pipeline extension territory (SURVEY §2.11),
the sibling of tdp_scrub_pii.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = ["canonicalize_url", "TRACKING_PARAM_REGEX"]

# anchored prefix alternation over the param's key part
TRACKING_PARAM_REGEX = (
    "^(utm_[a-z]+|fbclid|gclid|msclkid|mc_cid|mc_eid|igshid|ref_src)="
)


def canonicalize_url(col: "Column | str") -> Column:
    """Canonical URL column (see module docstring for the form).
    Inputs that do not look like scheme://... pass through unchanged
    (the honest choice for mixed junk columns — report, don't guess)."""
    url = F.col(col) if isinstance(col, str) else col
    # fragment dropped FIRST so a '?' inside the fragment can never be
    # resurrected as a query string (review finding)
    pre = F.regexp_replace(url, r"#.*$", "")
    scheme = F.lower(F.regexp_extract(pre, r"^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    raw_auth = F.regexp_extract(pre, r"^[^:]+://([^/?#]*)", 1)
    # userinfo is CASE-SENSITIVE (credentials/tokens) — preserve it
    # verbatim and lowercase only the host[:port] part (review finding)
    userinfo = F.regexp_extract(raw_auth, r"^(.*@)", 1)
    hostport = F.lower(F.regexp_replace(raw_auth, r"^.*@", ""))
    # strip the default port token per scheme
    hostport = F.when(
        scheme == "http", F.regexp_replace(hostport, r":80$", "")
    ).when(
        scheme == "https", F.regexp_replace(hostport, r":443$", "")
    ).otherwise(hostport)
    host = F.concat(userinfo, hostport)
    path = F.regexp_extract(pre, r"^[^:]+://[^/?#]*([^?#]*)", 1)
    path = F.when(path == "", F.lit("/")).otherwise(
        F.regexp_replace(path, r"(.)/$", r"$1")
    )
    query = F.regexp_extract(pre, r"\?(.*)$", 1)
    params = F.filter(
        F.split(query, "&"),
        lambda p: (p != "")
        & ~p.rlike(TRACKING_PARAM_REGEX)
        & ~p.rlike(TRACKING_PARAM_REGEX.replace("=", "$")),
    )
    qs = F.array_join(F.array_sort(params), "&")
    canon = F.concat(
        scheme, F.lit("://"), host, path,
        F.when(qs != "", F.concat(F.lit("?"), qs)).otherwise(F.lit("")),
    )
    return F.when(
        url.rlike(r"^[A-Za-z][A-Za-z0-9+.-]*://"), canon
    ).otherwise(url)
