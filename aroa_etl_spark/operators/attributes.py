"""Attribute processing: role detection + per-role normalizers, compiled to
ONE lazy select (SURVEY §2 M3, reference enc/processing.py +
attribute_processing/column_processing.py).

The reference builds a separate pandas frame per attribute and
horizontally concats them (J9); here every derived column is an
expression in a single ``select`` — Catalyst sees one projection, there
is no join and no shuffle in the whole attribute-processing stage, and
whole-stage codegen fuses the regex chains.

Column-family convention (per input attribute X):
``X_cleaned_0..4`` (positional split), ``X_qa`` (boolean),
``X_data_source`` (constant), plus per-role extras
(``X_birth_name_extracted``, ``X_trim_i_additional_information``).
Unlike the reference (whose split width is data-dependent), the split
family is FIXED at ``split_limit`` columns so the schema is static and
streaming-safe; trailing all-empty columns can be pruned eagerly with
``prune_empty_split_cols``.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from aroa_etl_spark.functions import cleaning as cl
from aroa_etl_spark.functions import dates as dt

DEFAULT_TIMESPAN = (1850, 1950)


# ---------------------------------------------------------------------------
# Column-role conventions (enc/processing.py:181-235, utils.py:78-96)
# ---------------------------------------------------------------------------

def _tokens(col: str) -> set[str]:
    return set(re.findall("[a-zA-Z]+", col))


@dataclass
class Roles:
    last_name: list[str] = field(default_factory=list)
    first_name: list[str] = field(default_factory=list)
    prisoner_number: list[str] = field(default_factory=list)
    date: list[str] = field(default_factory=list)
    raw_date: list[str] = field(default_factory=list)
    location: list[str] = field(default_factory=list)
    nationality: list[str] = field(default_factory=list)
    other: list[str] = field(default_factory=list)


def detect_roles(
    columns: list[str],
    *,
    last_name_columns: list[str] | None = None,
    first_name_columns: list[str] | None = None,
    prisoner_number_columns: list[str] | None = None,
    date_columns: list[str] | None = None,
    raw_date_columns: list[str] | None = None,
    location_columns: list[str] | None = None,
    nationality_columns: list[str] | None = None,
    skip_columns: list[str] | None = None,
) -> Roles:
    """Classify columns by name-token conventions, in the reference's
    precedence order (enc/processing.py:181-235). Any role list can be
    overridden explicitly. NOTE (faithful quirk): ``skip_columns`` only
    exempts columns from the *other* bucket, exactly like the reference —
    an explicitly-named role still wins over skip."""
    remaining = list(columns)

    def take(explicit, pred):
        nonlocal remaining
        if explicit is None:
            got = [c for c in remaining if pred(_tokens(c))]
        else:
            got = [c for c in explicit if c in remaining]
        remaining = [c for c in remaining if c not in got]
        return sorted(got)

    roles = Roles()
    roles.last_name = take(last_name_columns, lambda t: {"last", "name"} <= t)
    roles.first_name = take(first_name_columns, lambda t: {"first", "name"} <= t)
    roles.prisoner_number = take(
        prisoner_number_columns, lambda t: {"prisoner", "number"} <= t
    )
    roles.date = take(date_columns, lambda t: t & {"day", "month", "year"})
    roles.raw_date = take(raw_date_columns, lambda t: "date" in t)
    roles.location = take(location_columns, lambda t: "place" in t)
    roles.nationality = take(nationality_columns, lambda t: "nation" in t)
    skip = set(skip_columns or [])
    roles.other = sorted(c for c in remaining if c not in skip)
    return roles


def strip_split_suffix(col: str) -> str:
    return re.sub(r"_\d+$", "", col)


def split_families(cols: list[str]) -> list[list[str]]:
    """{name_1, name_2, other_name_1} → [[name_1, name_2], [other_name_1]]
    (utils.py:88-96)."""
    bases: dict[str, list[str]] = {}
    for c in sorted(cols):
        bases.setdefault(strip_split_suffix(c), []).append(c)
    return [bases[b] for b in sorted(bases)]


def dmy_families(cols: list[str]) -> list[tuple[str, str, str, str]]:
    """Cluster *_day/_month/_year[_N] columns into (day, month, year, base)
    tuples (utils.py:78-86); raises when a family is incomplete."""
    strip = lambda c: re.sub(r"(_day|_month|_year)(_\d+)?$", _keep_num, c)
    bases: dict[str, list[str]] = {}
    for c in cols:
        bases.setdefault(strip(c), []).append(c)
    out = []
    for base in sorted(bases):
        group = bases[base]
        if len(group) != 3:
            raise ValueError(
                f"Date family '{base}' must have exactly day/month/year columns, got {group}"
            )
        day = next(c for c in group if "_day" in c)
        month = next(c for c in group if "_month" in c)
        year = next(c for c in group if "_year" in c)
        out.append((day, month, year, base))
    return out


def _keep_num(m: re.Match) -> str:
    return m.group(2) or ""


def recombine(cols: list[str]) -> Column:
    """Join a positional split family back into one cell (space-joined,
    nulls skipped — utils.py:98-105)."""
    return F.concat_ws(" ", *[F.coalesce(F.col(c).cast("string"), F.lit("")) for c in cols])


# ---------------------------------------------------------------------------
# Per-role normalizers → dict[output_name, Column]
# ---------------------------------------------------------------------------

def _split_parts(c: Column, n: int) -> list[Column]:
    parts = F.split(c, ";", n)
    return [F.trim(F.get(parts, i)) for i in range(n)]


def normalize_last_name(
    src: Column,
    base: str = "last_name",
    data_source: str = "crowd_sourcing",
    birth_name_input: bool = False,
    flag_noble_prefix: bool = True,
    split_limit: int = 5,
) -> dict[str, Column]:
    """Last-name family (column_processing.py:48-227): clean → lower →
    letterspacing fix → academic/keyword strip → noble-prefix QA →
    maiden-name extraction → separator canonicalization (noble-guarded) →
    QA → title-case → positional split → digit strip → female-suffix
    completion."""
    c = cl.clean_copy(src)
    c = F.lower(c)
    c = cl.remove_name_spacing(c)
    c = cl.strip_academic_titles(c)
    c = cl.keyword_removal(c)

    noble = cl.extract_noble_prefix(c)
    noble_qa = (noble != "") if flag_noble_prefix else F.lit(False)

    if not birth_name_input:
        birth = F.trim(cl.extract_birth_name(c))
        c = cl.remove_birth_name(c)
    else:
        birth = None

    c = cl.strip_semicolons(c)
    c = F.regexp_replace(F.trim(c), ";", " ")
    c = cl.to_semicolon_separators(c, protect_noble=True)

    qa = cl.create_qa_col(c) | noble_qa
    if birth is not None:
        qa = qa | F.coalesce(birth.rlike(cl.QA_REGEX), F.lit(False))

    c = cl.title_case(c)
    parts = [cl.strip_digits(p) for p in _split_parts(c, split_limit)]
    for p in parts[:-1]:
        qa = qa | cl.too_long_qa(p)

    # female-suffix completion chains left→right on the completed values
    completed = [parts[0]]
    for i in range(1, split_limit):
        completed.append(cl.extend_female_suffix(completed[i - 1], parts[i]))

    out: dict[str, Column] = {
        f"{base}_cleaned_{i}": completed[i] for i in range(split_limit)
    }
    if birth is not None:
        out[f"{base}_birth_name_extracted"] = birth
    out[f"{base}_qa"] = qa
    out[f"{base}_data_source"] = F.lit(data_source)
    return out


def normalize_first_name(
    src: Column,
    base: str = "first_name",
    data_source: str = "crowd_sourcing",
    split_limit: int = 5,
) -> dict[str, Column]:
    """First-name family (column_processing.py:232-341): like last names
    but the noble prefix is REMOVED, digits are kept, and single-char
    names get a trailing '.'."""
    c = cl.clean_copy(src)
    c = cl.title_case(c)
    c = cl.strip_academic_titles(c)
    c = cl.keyword_removal(c)

    noble = cl.extract_noble_prefix(c)
    noble_qa = noble != ""
    c = F.regexp_replace(F.lower(c), cl.NOBLE_NAME, "")

    c = cl.to_semicolon_separators(F.trim(c), protect_noble=False)
    qa = cl.create_qa_col(c) | noble_qa
    c = cl.title_case(c)

    parts = _split_parts(c, split_limit)
    for p in parts[:-1]:
        qa = qa | cl.too_long_qa(p)
    parts = [
        F.when(F.length(p) == 1, F.concat(p, F.lit("."))).otherwise(p) for p in parts
    ]

    out = {f"{base}_cleaned_{i}": parts[i] for i in range(split_limit)}
    out[f"{base}_qa"] = qa
    out[f"{base}_data_source"] = F.lit(data_source)
    return out


PRISONER_CHAR = r"(\b[aAbBrRzZ](?=[^a-zA-Z])+)"


def normalize_prisoner_number(
    src: Column,
    base: str = "prisoner_number",
    data_source: str = "crowd_sourcing",
    split_limit: int = 5,
) -> dict[str, Column]:
    """Prisoner-number family (column_processing.py:345-487): clean →
    strip alpha words → whitespace repair → numeric sort → positional
    split (named _trim_1.._trim_5) → block-letter (A/B/R/Z) extraction
    into ``_additional_information`` side columns → per-part numeric QA."""
    c = cl.clean_copy(src)
    qa = cl.create_qa_col(c, cl.QA_PRISONER_NO_REGEX, cl.QA_PRISONER_NO_NO_ENTRY_REGEX)

    c = F.regexp_replace(F.trim(c), r"\b[a-zA-z]{2,}\b", "")
    c = F.regexp_replace(c, "  ", " ")
    c = F.regexp_replace(
        c, r"(?<=[^0-9a-zA-Z])\s(?=[0-9])|(?<=[a-zA-Z])\s(?=[^0-9a-zA-Z])", ""
    )
    c = F.regexp_replace(c, r"(?<=[0-9]{2})\s(?=[0-9]{3})", "")
    c = F.regexp_replace(F.trim(c), cl.PRISONER_NUMBER_CHAR_SEP, "")
    c = cl.to_semicolon_separators(F.trim(c), protect_noble=False)
    c = cl.sort_list_numeric(c)

    parts = _split_parts(c, split_limit)
    # strip thousands dots inside numbers: '17.342' → '17342'
    dot_re = (
        r"((?<=\b\d{1})|(?<=[^\d]\d{1})|(?<=\b\d{2})|(?<=[^\d]\d{2})"
        r"|(?<=\b\d{3})|(?<=[^\d]\d{3}))[.](?=\d{3})"
    )
    parts = [F.regexp_replace(p, dot_re, "") for p in parts]

    out: dict[str, Column] = {}
    for i, p in enumerate(parts, start=1):
        ch = F.regexp_extract(p, PRISONER_CHAR, 1)
        ch = F.when(F.length(ch) == 1, ch).otherwise(F.lit(""))
        num = F.when(F.length(ch) == 1, F.regexp_replace(p, PRISONER_CHAR, "")).otherwise(p)
        out[f"{base}_trim_{i}"] = F.coalesce(num, F.lit(""))
        out[f"{base}_trim_{i}_additional_information"] = F.coalesce(ch, F.lit(""))
        qa = qa | cl.create_qa_col(num, r"[^0-9]", r"^-$|nan|None")

    out[f"{base}_qa"] = qa
    out[f"{base}_data_source"] = F.lit(data_source)
    return out


def default_processor(
    src: Column, name: str, data_source: str = "crowd_sourcing"
) -> dict[str, Column]:
    """Default family (column_processing.py:19-46): stringified original +
    'unclear' QA + data source. Location/nationality columns use this too
    (the reference's dedicated processors are unimplemented there)."""
    s = F.coalesce(src.cast("string"), F.lit(""))
    return {
        f"{name}_cleaned": s,
        f"{name}_qa": cl.create_qa_col(s, cl.UNCLEAR_REGEX, cl.QA_NO_ENTRY_REGEX),
        f"{name}_data_source": F.lit(data_source),
    }


# ---------------------------------------------------------------------------
# Orchestration: the whole stage as one select
# ---------------------------------------------------------------------------

def apply_split_limit(columns: list[str], split_limit: int = 5) -> list[str]:
    """Drop positional columns beyond the limit, e.g. first_name_17
    (enc/processing.py:239-242)."""
    keep = []
    for c in columns:
        m = re.search(r"\d+$", c)
        if not m or int(m.group()) <= split_limit:
            keep.append(c)
    return keep


def process_unpacked_data(
    df: DataFrame,
    *,
    data_source: str = "crowd_sourcing",
    timespan: tuple[int, int] = DEFAULT_TIMESPAN,
    include_original: bool = True,
    include_data_source: bool = True,
    split_limit: int = 5,
    **role_overrides,
) -> DataFrame:
    """Normalize every attribute of an unpacked table in one projection
    (enc/processing.py:244-312)."""
    cols = apply_split_limit(df.columns, split_limit)
    roles = detect_roles(cols, **role_overrides)

    # stringify everything first (the stage contract is stringly-typed)
    def s(c: str) -> Column:
        return F.coalesce(F.col(c).cast("string"), F.lit(""))

    out: dict[str, Column] = {}
    if include_original:
        for c in cols:
            out[c] = s(c)

    for fam in split_families(roles.last_name):
        base = strip_split_suffix(fam[0])
        out.update(
            normalize_last_name(recombine(fam), base=base, data_source=data_source)
        )
    for fam in split_families(roles.first_name):
        base = strip_split_suffix(fam[0])
        out.update(
            normalize_first_name(recombine(fam), base=base, data_source=data_source)
        )
    for fam in split_families(roles.prisoner_number):
        base = strip_split_suffix(fam[0])
        out.update(
            normalize_prisoner_number(recombine(fam), base=base, data_source=data_source)
        )
    for day, month, year, base in dmy_families(roles.date):
        out.update(
            dt.clean_date(
                s(day), s(month), s(year), base,
                timespan=timespan, dropdown=False, data_source=data_source,
            )
        )
    # raw (free-text) dates run through the STAGED normalise_date_frame
    # after the main projection — the nested-expression form costs
    # minutes of Catalyst analysis per column (see functions/dates.py).
    # A temp passthrough carries the source; `order` records where the
    # family's columns belong in the final layout.
    order = list(out.keys())
    for c in roles.raw_date:
        out[f"__ndsrc_{c}"] = s(c)
        order += [
            f"{c}_year_cleaned",
            f"{c}_month_cleaned",
            f"{c}_day_cleaned",
            f"{c}_qa",
            f"{c}_data_source",
        ]
    for c in roles.location + roles.nationality + roles.other:
        fam = default_processor(s(c), c, data_source=data_source)
        out.update(fam)
        order += list(fam.keys())

    res = df.select(*[v.alias(k) for k, v in out.items()])
    for c in roles.raw_date:
        res = dt.normalise_date_frame(
            res, f"__ndsrc_{c}", c, timespan=timespan, data_source=data_source
        )
    if not include_data_source:
        order = [k for k in order if "data_source" not in k]
    return res.select(*order)


def prune_empty_split_cols(df: DataFrame, split_limit: int = 5) -> DataFrame:
    """Optional eager cleanup: drop positional ``*_N`` columns that are
    entirely empty (one aggregation pass) — recovers the reference's
    data-dependent split width for presentation."""
    candidates = [
        c
        for c in df.columns
        if re.search(r"_(cleaned_)?\d+$", c)
    ]
    if not candidates:
        return df
    agg = df.agg(
        *[
            F.max(
                F.when(
                    F.coalesce(F.col(c).cast("string"), F.lit("")) != "", 1
                ).otherwise(0)
            ).alias(c)
            for c in candidates
        ]
    ).collect()[0]
    drop = [c for c in candidates if (agg[c] or 0) == 0]
    return df.drop(*drop)


# ---------------------------------------------------------------------------
# J3: explicit row identity + positional join
# ---------------------------------------------------------------------------

def with_row_key(
    df: DataFrame, name: str = "row_key", consecutive: bool = False
) -> DataFrame:
    """Attach an explicit stable row key — the engine-wide answer to the
    reference's pandas index-alignment (SURVEY §7 risk 1; its joins at
    column_processing.py:1160 and enc/deduplication.py:266-280 align on
    the implicit index, which Spark does not have).

    Default: ``monotonically_increasing_id`` — one projection, no
    shuffle, unique and stable for a deterministic plan (partition id in
    the high bits, so ids are NOT consecutive). ``consecutive=True``
    yields 0..n-1 ids via zipWithIndex — a two-pass RDD trip, only for
    dimension-sized frames or export ordering.
    """
    if not consecutive:
        return df.withColumn(name, F.monotonically_increasing_id())
    schema = T.StructType(list(df.schema.fields) + [T.StructField(name, T.LongType())])
    rdd = df.rdd.zipWithIndex().map(lambda t: (*t[0], t[1]))
    return df.sparkSession.createDataFrame(rdd, schema)


def positional_join(left: DataFrame, right: DataFrame) -> DataFrame:
    """Horizontal concat of two equal-length frames by ROW POSITION —
    the general fallback for the reference's index-aligned joins when
    the two sides cannot be derived from one frame (prefer the J9
    single-wide-select shape whenever they can: it is one projection,
    this is two zipWithIndex passes plus an equi-join shuffle).

    Row order is each frame's current partition order, matching
    pandas' positional semantics for frames built from the same source
    order. Raises on length mismatch — misaligned concat is silent data
    corruption, exactly the pandas bug class the explicit key prevents.
    """
    lc, rc = left.count(), right.count()
    if lc != rc:
        raise ValueError(f"positional_join length mismatch: {lc} vs {rc}")
    lk = with_row_key(left, "__pos", consecutive=True)
    rk = with_row_key(right, "__pos", consecutive=True)
    return lk.join(rk, "__pos").drop("__pos")
