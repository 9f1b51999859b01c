"""Web-corpus hygiene: URL extraction, host normalization, registered
domains.

Per-domain statistics drive crawl curation (domain quotas, blocklists,
licensing audits) — at 100 TB these are pure narrow column expressions
plus one map-side-combinable groupBy on domain, so the only scale
concern is domain skew (a handful of giant domains), which the
aggregation's partial combine already absorbs.

Everything is plain regex/string ops (no Python UDF) with patterns kept
RE2/Java-compatible so the DuckDB oracle evaluates the identical
expressions.  Registered domains come in two tiers: the compact
second-level-TLD heuristic (``registered_domain`` — a pure column
expression, zero joins) and, since round 10, the REAL Public Suffix
List path (``registered_domain_psl``): a PSL snapshot is accepted as a
broadcast dimension and matched with the published algorithm —
candidate suffixes of 1..k labels, exception rules prevail, then the
longest rule, wildcard rules (``*.ck``) match any single extra label,
unmatched hosts fall back to the implicit ``*`` rule.  The join is
explode(≤k candidate rows per host) → broadcast hash join → one
max-struct aggregation per host — no shuffle of the corpus beyond the
final domain rollup the caller was doing anyway.

Extension inventory (SURVEY.md §2.11); the reference has no web surface.
"""

from __future__ import annotations

import os

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "extract_urls",
    "url_host",
    "normalize_host",
    "registered_domain",
    "registered_domain_psl",
    "sitemap_urls",
    "sitemap_is_index",
    "SECOND_LEVEL_TLDS",
    "PSL_SNAPSHOT_MINI",
    "PSL_SNAPSHOT_PATH",
    "load_psl_snapshot",
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


# The COMPLETE publicsuffix.org snapshot ships with the engine (round
# 11, r10 verdict #8): ~9.5k rules including every wildcard/exception
# and the unicode (IDN) rows, vendored from the Debian `publicsuffix`
# package's copy of the canonical MPL-2.0 list (the file carries its
# own license header).  ``load_psl_snapshot`` reads it; catalog oracles
# replay against the very same file through DuckDB.
PSL_SNAPSHOT_PATH = os.path.join(
    os.path.dirname(os.path.abspath(__file__)), "public_suffix_list.dat"
)


def load_psl_snapshot(path: "str | None" = None, *, punycode: bool = True):
    """The Public Suffix List as a list of rule lines (comments/blanks
    kept — :func:`registered_domain_psl` drops them, so the raw file
    round-trips).  ``punycode=True`` ADDS an ASCII (IDNA) form of every
    non-ASCII rule alongside the unicode original: the canonical list
    stores IDN suffixes as unicode labels while crawled hosts arrive
    punycoded (``xn--``), and matching must work for both.  Labels the
    codec refuses keep only their unicode form."""
    with open(path or PSL_SNAPSHOT_PATH, encoding="utf-8") as f:
        lines = [ln.rstrip("\n") for ln in f]
    if not punycode:
        return lines
    out = list(lines)
    for ln in lines:
        rule = ln.strip()
        if not rule or rule.startswith("//") or rule.isascii():
            continue
        prefix = ""
        if rule[0] == "!":
            prefix, rule = "!", rule[1:]
        try:
            ascii_labels = [
                lab if lab in ("*", "") or lab.isascii()
                else lab.encode("idna").decode("ascii")
                for lab in rule.split(".")
            ]
        except UnicodeError:
            continue  # keep only the unicode form
        out.append(prefix + ".".join(ascii_labels))
    return out


# A publicsuffix.org-format snapshot slice carrying every RULE SHAPE the
# algorithm defines (plain multi-label, wildcard, exception, comments) —
# kept for self-contained fixtures/doctests; production callers use
# ``load_psl_snapshot()`` (the full vendored list).
PSL_SNAPSHOT_MINI = (
    "// ===BEGIN ICANN DOMAINS===",
    "com", "net", "org", "io", "de", "fr", "jp", "uk", "au", "nz",
    "co.uk", "ac.uk", "gov.uk",
    "com.au", "net.au",
    "co.jp",
    "co.nz",
    "ck", "*.ck", "!www.ck",
    "// ===END ICANN DOMAINS===",
)


def registered_domain_psl(
    df: DataFrame,
    host_col: str,
    psl,
    out_col: str = "registered_domain",
    *,
    max_rule_labels: int = 5,
) -> DataFrame:
    """``df`` + ``out_col`` holding the eTLD+1 under a real Public
    Suffix List snapshot — the published algorithm, not the two-label
    heuristic (which mis-rolls ``*.ck``-class wildcard suffixes and
    ``!www.ck``-class exceptions):

    1. every host generates candidate suffixes of its last 1..k labels
       (k = ``max_rule_labels``, the longest rule in the snapshot —
       the full PSL's deepest rule is 5 labels);
    2. candidates join the broadcast rule table twice-shaped: the
       literal form against plain/exception rules, the first label
       replaced by ``*`` against wildcard rules;
    3. the prevailing rule per host is the exception if any, else the
       longest match (one max-struct aggregation);
    4. public-suffix length = matched labels (exception: matched - 1;
       no match: the implicit ``*`` rule, 1), and the registered
       domain is one label more — hosts that ARE a public suffix pass
       through unchanged (the heuristic's contract).

    ``psl`` is an iterable of snapshot lines or a one-column DataFrame;
    ``//`` comments and blanks are dropped here so the raw file
    broadcasts as-is.  Cost: explode ≤k rows per DISTINCT host,
    broadcast hash join, one aggregation — the corpus itself is only
    touched by the final mapping join on the host column."""
    spark = df.sparkSession
    if not isinstance(psl, DataFrame):
        psl = spark.createDataFrame([(r,) for r in psl], "rule string")
    rules = (
        psl.select(F.lower(F.trim(F.col(psl.columns[0]))).alias("rule"))
        .filter((F.length("rule") > 0) & ~F.col("rule").startswith("//"))
        .select(
            F.when(
                F.col("rule").startswith("!"), F.expr("substring(rule, 2)")
            ).otherwise(F.col("rule")).alias("__key"),
            F.when(F.col("rule").startswith("!"), F.lit("exception"))
            .when(F.col("rule").startswith("*."), F.lit("wildcard"))
            .otherwise(F.lit("normal")).alias("__kind"),
        )
        .distinct()
    )
    hosts = df.select(F.col(host_col).alias("__h")).filter(
        F.col("__h").isNotNull()
    ).distinct()
    labels = F.split(F.col("__h"), r"\.")
    n = F.size(labels)
    cand = hosts.select(
        "__h",
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.least(n, F.lit(max_rule_labels))),
                lambda k: F.array_join(
                    F.slice(labels, F.size(labels) - k + 1, k), "."
                ),
            )
        ).alias("__sfx"),
    ).select(
        "__h",
        F.size(F.split(F.col("__sfx"), r"\.")).alias("__k"),
        "__sfx",
    )
    forms = cand.select(
        "__h", "__k", F.col("__sfx").alias("__key"), F.lit("lit").alias("__f")
    ).unionByName(
        cand.filter(F.col("__k") >= 2).select(
            "__h",
            "__k",
            F.regexp_replace("__sfx", r"^[^.]+", "*").alias("__key"),
            F.lit("wc").alias("__f"),
        )
    )
    matches = forms.join(F.broadcast(rules), "__key").filter(
        ((F.col("__f") == "lit") & (F.col("__kind") != "wildcard"))
        | ((F.col("__f") == "wc") & (F.col("__kind") == "wildcard"))
    )
    best = matches.groupBy("__h").agg(
        F.max(
            F.struct(
                (F.col("__kind") == "exception").cast("int").alias("exc"),
                F.col("__k").alias("k"),
            )
        ).alias("__b")
    )
    lab = F.split(F.col("__h"), r"\.")
    nn = F.size(lab)
    plen = F.coalesce(
        F.when(F.col("__b.exc") == 1, F.col("__b.k") - 1).otherwise(
            F.col("__b.k")
        ),
        F.lit(1),  # implicit '*' rule: the last label is public
    )
    mapping = (
        hosts.join(best, "__h", "left")
        .select(
            "__h",
            F.when(nn <= plen, F.col("__h"))
            .otherwise(F.array_join(F.slice(lab, nn - plen, plen + 1), "."))
            .alias(out_col),
        )
    )
    return df.join(
        mapping.withColumnRenamed("__h", host_col), host_col, "left"
    )


# query parameters that never change page content — the standard crawl
# tracking vocabulary; anchored, so 'utm_source=x' drops but 'myref=x'
# survives.  Identical RE2/Java-regex semantics (no lookaround).
TRACKING_PARAM_RE = r"^(utm_[^=]*|gclid|fbclid|ref|msclkid|mc_cid|mc_eid)="


def canonicalize_url(url: Column | str) -> Column:
    """Canonical form of a URL for crawl-level dedup — pure column
    expressions (no UDF), deterministic, DuckDB-replayable:

    - userinfo (``user[:pass]@``) stripped before the host parse — a
      URL's identity is its resource, and credentials must never leak
      into (or collapse) dedup keys
    - scheme and host lowercased, one leading ``www.`` stripped
    - fragment dropped
    - default ports dropped (``:80`` for http, ``:443`` for https);
      non-default ports kept
    - tracking query parameters removed (``TRACKING_PARAM_RE``),
      remaining parameters kept in original order; empty query dropped
    - one trailing slash stripped from the path (so ``/a/`` == ``/a``
      and a bare host ends without ``/``)

    Two URLs that differ only in case/www/fragment/tracking-noise map
    to the same string — the exact-dedup key for crawl frontiers and
    the join key for URL-level corpus dedup at 100 TB (hash-groupBy on
    the canonical form, one shuffle)."""
    u = _c(url)
    scheme = F.lower(F.regexp_extract(u, r"^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    rest = F.regexp_replace(u, r"^[A-Za-z][A-Za-z0-9+.-]*://", "")
    # strip userinfo: without this, everything before ':'/'@' parses as
    # the host, so distinct 'alice@site-a.com' / 'alice@site-b.com'
    # URLs would collapse to one key and passwords would land in the
    # port slot (r5 review finding).  The class excludes /?# so an '@'
    # later in the path or query never matches.
    rest = F.regexp_replace(rest, r"^[^/?#@]*@", "")
    host = F.regexp_replace(
        F.lower(F.regexp_extract(rest, r"^([^/?#:]+)", 1)), r"^www\.", ""
    )
    port = F.regexp_extract(rest, r"^[^/?#:]+:([0-9]+)", 1)
    default_port = ((scheme == "http") & (port == "80")) | (
        (scheme == "https") & (port == "443")
    )
    pathq = F.regexp_replace(rest, r"^[^/?#]*", "")
    path = F.regexp_replace(F.regexp_extract(pathq, r"^([^?#]*)", 1), r"/$", "")
    # anchored: the '?' must precede any '#' — an unanchored \? would
    # match a question mark INSIDE the fragment ('/p#frag?x=1',
    # SPA hash-routes '/#/search?q=..') and leak fragment bytes into
    # the dedup key (r5 review finding)
    query = F.regexp_extract(pathq, r"^[^?#]*\?([^#]*)", 1)
    kept = F.array_join(
        F.filter(
            F.split(query, "&", -1),
            lambda x: (x != "") & (~x.rlike(TRACKING_PARAM_RE)),
        ),
        "&",
    )
    return F.concat(
        scheme,
        F.lit("://"),
        host,
        F.when(
            (port != "") & ~default_port, F.concat(F.lit(":"), port)
        ).otherwise(F.lit("")),
        path,
        F.when(kept != "", F.concat(F.lit("?"), kept)).otherwise(F.lit("")),
    )


def main_content(
    col: Column | str,
    *,
    min_block_chars: int = 30,
    max_link_density_milli: int = 300,
) -> Column:
    """Main-content extraction (boilerplate removal) — the
    readability/jusText-style gate a crawl pipeline runs between HTML
    strip and quality scoring: navigation, footers, and link farms are
    short and link-dense, article text is long and link-sparse.

    Spec (deliberately small so both engines replay it exactly):
    blocks are ``</p>``-delimited; per block the visible text is the
    tag-stripped trim, the anchor text is the concatenation of
    ``<a …>…</a>`` bodies, and a block survives when trimmed text
    length ≥ ``min_block_chars`` AND anchor/visible ratio ≤
    ``max_link_density_milli`` per mille.  Survivors join with a
    single space.  Everything is column expressions (split /
    regexp_replace / regexp_extract_all / filter / array_join) —
    whole-stage codegen, zero Python, trivially pushed past the scan.
    A production extractor adds more block tags and scoring signals;
    the link-density core is exactly this."""
    c = _c(col)
    keep = main_content_keep(
        min_block_chars=min_block_chars,
        max_link_density_milli=max_link_density_milli,
    )
    return F.array_join(
        F.transform(
            F.filter(F.split(c, "</p>"), keep),
            lambda b: F.trim(F.regexp_replace(b, "<[^>]*>", "")),
        ),
        " ",
    )


def main_content_keep(
    *, min_block_chars: int = 30, max_link_density_milli: int = 300
):
    """The block-survival predicate :func:`main_content` filters with,
    exposed so audits can count kept blocks with the SAME gate (a
    hand copy would silently drift if the defaults change)."""

    def keep(b: Column) -> Column:
        txt = F.trim(F.regexp_replace(b, "<[^>]*>", ""))
        atxt = F.array_join(
            F.regexp_extract_all(b, F.lit("<a[^>]*>([^<]*)</a>"), F.lit(1)), ""
        )
        return (F.length(txt) >= min_block_chars) & (
            F.length(atxt) * 1000
            <= F.length(txt) * max_link_density_milli
        )

    return keep


def sitemap_urls(xml: Column | str) -> Column:
    """Extract the per-URL entries of a sitemap.xml (sitemaps.org
    protocol) as an array of (loc, lastmod, priority_milli) structs —
    pure column expressions (regexp over the <url> blocks), no XML
    library, no UDF.

    ``priority`` parses to EXACT milli units (``'0.8'`` -> 800) so
    downstream crawl-scheduling arithmetic stays integer;
    absent <lastmod>/<priority> yield NULL / the protocol default 500.
    Namespaced or attribute-bearing tags are tolerated by matching the
    local names.  A <sitemapindex> document simply has no <url> blocks
    and returns an empty array — route index docs by
    ``sitemap_is_index`` first."""
    c = _c(xml)
    blocks = F.regexp_extract_all(c, F.lit(r"(?s)<url\b[^>]*>(.*?)</url>"), 1)
    loc = lambda b: F.regexp_extract(b, r"(?s)<loc[^>]*>\s*(.*?)\s*</loc>", 1)  # noqa: E731
    lastmod = lambda b: F.regexp_extract(b, r"(?s)<lastmod[^>]*>\s*(.*?)\s*</lastmod>", 1)  # noqa: E731
    prio = lambda b: F.regexp_extract(b, r"(?s)<priority[^>]*>\s*(.*?)\s*</priority>", 1)  # noqa: E731
    return F.transform(
        blocks,
        lambda b: F.struct(
            loc(b).alias("loc"),
            F.when(lastmod(b) == "", F.lit(None)).otherwise(lastmod(b))
            .alias("lastmod"),
            F.coalesce(
                # try_cast: an absent <priority> extracts as '' and must
                # default, not throw under ANSI
                F.round(prio(b).try_cast("double") * 1000).try_cast("int"),
                F.lit(500),
            ).alias("priority_milli"),
        ),
    )


def sitemap_is_index(xml: Column | str) -> Column:
    """True when the document is a <sitemapindex> (pointers to child
    sitemaps) rather than a <urlset> of pages."""
    return _c(xml).rlike(r"<sitemapindex\b")
