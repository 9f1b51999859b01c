"""String-cleaning expression library (SURVEY §2.8 F-family).

Every function here takes/returns a pyspark Column and compiles to pure
Catalyst expressions (regexp_replace / regexp_extract / rlike chains) —
whole-stage-codegen'd JVM execution, no Python in the row loop.

Semantics re-expressed from the reference's pandas implementation
(src/aroa_etl/attribute_processing/aux_functions.py,
src/aroa_etl/attribute_processing/regex_conditions.py); regexes are
Java-dialect ports of the same vocabularies.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# ---------------------------------------------------------------------------
# Regex vocabularies (Java dialect). Ported from the reference's
# regex_conditions.py (see file docstring); each constant keeps the
# reference's matching behavior, not its literal source text.
# ---------------------------------------------------------------------------

# words meaning "no entry" → canonical '-'
DASH_WORDS = (
    r"(?i)\bblank\b|\b\[blank\]\b|\b\(blank\)\b|\bblanc\b|\bnone\b|\bleer\b"
    r"|nicht bekannt|\bk\.+\s*a\b\.*|\bk\.*\s*a\b\.+|\bnn\b|\bfehlt\b|\bempty\b"
    r"|\bmissing\b|\bna\b|\bNA\b|\bNa\b|\bnot\b|unklear|keine angabe|entfällt"
    r"|unavailable|not listet|not statet|no information|\bno\b|nr\. unbekannt"
    r"|nicht angegeben|keine nummer|unknown|unbekant|\bnil\b|no data|xxx"
    r"|unbekannt\b|\bkeine\b|\bohne\b|_|^0+$"
)

# words meaning "crossed out" → removed
DELETED_WORDS = (
    r"(?i)lined out|crossed out|durchgestrichen|gestrichen|scored out"
    r"|\[strikethrough\]|\"+"
)

# words meaning "illegible/unclear" → canonical '?'
QUESTION_MARK_WORDS = (
    r"(?i)illegible|unclear|unsure|not clear|unreadable|unklar|nicht erkennbar"
    r"|nicht lesbar|\?+|unlesbar|unleserlich|ungenau|andere angabe"
)

# separators → canonical ';'
SEMICOLON_WORDS = r"(?i),|\bor\b|\boder\b|\band\b|\bund\b|/|\(|\)|:|\[|\]"

# titles / kinship / filler keywords stripped from name columns
KEY_WORDS = (
    r"(\b|\()(mr\.|mrs\.|frau|fr\.\s|herr|herrn|frl\.|ing\.|tote|toter|died"
    r"|neugeborenes|unbekannter\stoter|unbekannte\stote|auch|vel|freifrau"
    r"|prinz|prinzessin|erbprinz|freiherr|freifr|reichsgraf|reichsgräfin"
    r"|graf|gräfin|freiin|säugling|kind|wwe\.|gefr\.|soldat|baron|baronin"
    r"|hr\.|ehefrau|vel|alias|baby|wwe|schwester|wife|gattin|gatte|or|oder"
    r"|od\.\s|jude|jüdin|bruder|heil|hitler)(\s|\b|\)|$)"
)

ACADEMIC_TITLE = r"\b([dD]r\.|[pP]rof\.|[mM]udr\.)"

# noble name prefixes ("van der", "von", "de la", ...)
NOBLE_NAME = (
    r"\b(?![a-z]\')(van(([^a-zA-Z]+(der|den|de|d\.))|\.)?"
    r"|von(([^a-zA-Z]+(der|den|de|d\.))|\.)?|de la|del|di|der|den|vom|dal"
    r"|della|dell|dalla|da|d|(v\.\s?d\.)|v\.|von\.|d\.|du|de|le|la|v|d|mc"
    r"|ter|ten|te|san)(\b|\s)(?=[a-zA-Z]){2,}"
)
NOBLE_PREFIX_CLEAN = r"[^a-zA-Z]"

# maiden-name markers ("geb.", "née", "zd.")
BIRTH_NAME = r"((\b)(geborene|geb\.|geb|geboren|nee|née|nèe|zd\.|zd)(\b).*)"
BIRTH_NAME_CLEAN = r"((\b)(geborene|geb\.|geb|geboren|nee|née|nèe|zd\.|zd)(\b).)"

STRIP_SEMICOLON = r"^;*|;*$"

# separator → ';' but guarded by bounded lookbehinds so noble prefixes
# ("van der X") don't get split (Java requires bounded lookbehind: ok).
NAME_SEMICOLON_TRANSFORMATION = (
    r"(?<!\b(d))(?<!\b(da|de|di|du|d\.|la|le|mc|te|v\.))"
    r"(?<!\b(dal|del|der|den|ter|ten|van|vom|von|san))(?<!\b(von\.))"
    r"(?<!\b(della|dalla))(\s;|;\s|\s+|\,|\,\s|\-|;+|\\)"
)
SEMICOLON_TRANSFORMATION = r"(\s;|;\s|\s|\,|\-|;+|\\)+"

# default QA trigger/no-entry regexes
QA_REGEX = r"[\(\)\[\]0-9\?,:_\/\*\"#]|\.\.|^-|-$|[^a-zA-Z]-[^a-zA-Z]"
QA_NO_ENTRY_REGEX = r"^-$"
QA_PRISONER_NO_REGEX = r"(.*[^0-9;\s\.\/aAbBrRzZ]+.*)"
QA_PRISONER_NO_NO_ENTRY_REGEX = r"^-$|[aAbBrRzZ]"
UNCLEAR_REGEX = r"[uU]nclear|[uU]nklar"

PRISONER_NUMBER_CHAR_SEP = r"(?<=[aAbBrRzZ])(\s|-)(?=[0-9]{2,})"

# "B l o c k e d" letterspacing: single letters separated by blanks
LETTERSPACING = r"\b([A-Za-z])\s+(?=[A-Za-z]\b)"


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def _chain_replace(col: Column, pairs: list[tuple[str, str]]) -> Column:
    """Ordered regexp_replace chain (order matters, like the reference's
    sequential pandas replaces)."""
    for pat, repl in pairs:
        col = F.regexp_replace(col, pat, repl)
    return col


# ---------------------------------------------------------------------------
# F1: canonical cleaning chain
# ---------------------------------------------------------------------------

def clean_copy(col: Column | str, empty_to_dash: bool = False) -> Column:
    """Canonicalize a raw text cell: no-entry words → '-', deleted words →
    '', unclear words → '?', separators → ';'; collapse repeats; strip.

    Mirrors the reference's clean_copy / clean_copy_2
    (aux_functions.py:11-65); `empty_to_dash=True` is the clean_copy_2
    variant that also maps the fully-empty string to '-'.
    """
    c = F.trim(_c(col))
    c = _chain_replace(
        c,
        [
            (DASH_WORDS, "-"),
            (DELETED_WORDS, ""),
            (QUESTION_MARK_WORDS, "?"),
            (SEMICOLON_WORDS, ";"),
            (r";+", ";"),
            (r"^\s*;\s*|\s*;\s*$|^\s+|\s+$|[\n\t]*", ""),
        ],
    )
    c = F.regexp_replace(c, r"-+|^$" if empty_to_dash else r"-+", "-")
    return c


# ---------------------------------------------------------------------------
# F2: QA flag
# ---------------------------------------------------------------------------

def create_qa_col(
    col: Column | str,
    qa_regex: str = QA_REGEX,
    no_entry_regex: str = QA_NO_ENTRY_REGEX,
) -> Column:
    """Boolean QA flag: matches the qa regex and is NOT a pure no-entry
    marker (aux_functions.py:70-91). NULL input → NULL flag is coerced to
    False to keep BooleanType total."""
    c = _c(col).cast("string")
    flag = c.rlike(qa_regex) & ~F.coalesce(c.rlike(no_entry_regex), F.lit(False))
    return F.coalesce(flag, F.lit(False))


# ---------------------------------------------------------------------------
# F3/F4: keyword + academic-title removal
# ---------------------------------------------------------------------------

def keyword_removal(col: Column | str, regex: str = KEY_WORDS) -> Column:
    """Strip title/kinship keywords after lower-casing
    (aux_functions.py:139-142)."""
    return F.regexp_replace(F.lower(_c(col)), regex, "")


def strip_academic_titles(col: Column | str) -> Column:
    """Remove 'Dr.', 'Prof.', 'MUDr.' (column_processing.py:66-69)."""
    return F.regexp_replace(_c(col), ACADEMIC_TITLE, "")


# ---------------------------------------------------------------------------
# F5/F6: noble prefix & birth (maiden) name
# ---------------------------------------------------------------------------

def extract_noble_prefix(col: Column | str) -> Column:
    """Extract a noble prefix ('van der', 'von', ...) normalized to
    letters+spaces; empty string when absent (column_processing.py:77-96)."""
    raw = F.regexp_extract(F.lower(_c(col)), NOBLE_NAME, 0)
    return F.trim(F.regexp_replace(raw, NOBLE_PREFIX_CLEAN, " "))


def extract_birth_name(col: Column | str) -> Column:
    """Extract the maiden name introduced by 'geb./née/zd.' markers,
    title-cased; empty when absent (column_processing.py:99-127)."""
    captured = F.regexp_extract(F.lower(_c(col)), BIRTH_NAME, 0)
    cleaned = F.regexp_replace(captured, BIRTH_NAME_CLEAN, "")
    # a bare marker with no following name must yield ''
    cleaned = F.regexp_replace(cleaned, BIRTH_NAME, "")
    return title_case(cleaned)


def remove_birth_name(col: Column | str) -> Column:
    """Drop the maiden-name phrase from the name column."""
    return F.regexp_replace(_c(col), BIRTH_NAME, "")


# ---------------------------------------------------------------------------
# F7/F8: separator canonicalization + positional split
# ---------------------------------------------------------------------------

def to_semicolon_separators(col: Column | str, protect_noble: bool = True) -> Column:
    """Turn blanks/commas/dashes into ';' separators; the noble-prefix
    guarded variant keeps 'van der berg' unsplit
    (column_processing.py:136-155)."""
    pat = NAME_SEMICOLON_TRANSFORMATION if protect_noble else SEMICOLON_TRANSFORMATION
    c = F.regexp_replace(F.trim(_c(col)), pat, ";")
    return F.regexp_replace(F.trim(c), r";{2,}", ";")


def strip_semicolons(col: Column | str) -> Column:
    return F.regexp_replace(_c(col), STRIP_SEMICOLON, "")


def split_limited(col: Column | str, max_parts: int = 5) -> Column:
    """Split a ';'-separated cell into at most `max_parts` parts (the
    reference caps positional families at 5: str.split(pat=';', n=4))."""
    return F.split(_c(col), ";", max_parts)


# ---------------------------------------------------------------------------
# F9-F11: length QA, digit strip, letterspacing fix
# ---------------------------------------------------------------------------

def too_long_qa(col: Column | str, limit: int = 49) -> Column:
    """Name longer than `limit` chars → QA (column_processing.py:198-200)."""
    return F.coalesce(F.length(_c(col)) > limit, F.lit(False))


def strip_digits(col: Column | str) -> Column:
    return F.regexp_replace(_c(col), r"[0-9]", "")


def remove_name_spacing(col: Column | str) -> Column:
    """Collapse 'B l o c k e d' letterspaced writing back into one word
    (aux_functions.py:195-203) via backreference replace."""
    return F.regexp_replace(_c(col), LETTERSPACING, "$1")


# ---------------------------------------------------------------------------
# F12: female-surname suffix completion (cross-column)
# ---------------------------------------------------------------------------

FEMALE_SUFFIXES = ["Ova", "Ene", "Aite", "Ite", "Yte"]


def extend_female_suffix(prev_col: Column | str, col: Column | str) -> Column:
    """If this split-column holds a bare female suffix ('Ova', 'Ene', ...),
    complete it from the previous name column (aux_functions.py:314-332)."""
    c, p = _c(col), _c(prev_col)
    return F.when(c.isin(FEMALE_SUFFIXES), F.concat(p, F.lower(c))).otherwise(c)


# ---------------------------------------------------------------------------
# Title casing
# ---------------------------------------------------------------------------

def title_case(col: Column | str) -> Column:
    """Per-word Xxxx casing across space/semicolon/hyphen boundaries.

    Python str.title() capitalizes after ANY non-letter; Spark initcap only
    after whitespace. Handle ';' and '-' boundaries explicitly so
    'anna-maria;de vries' → 'Anna-Maria;De Vries'.
    """
    c = _c(col)
    bysemi = F.transform(
        F.split(c, ";", -1),
        lambda seg: F.array_join(
            F.transform(F.split(F.initcap(seg), "-", -1), lambda h: F.initcap(h)), "-"
        ),
    )
    return F.array_join(bysemi, ";")


# ---------------------------------------------------------------------------
# Intra-cell numeric sort (O1) + prisoner numbers
# ---------------------------------------------------------------------------

def sort_list_numeric(col: Column | str) -> Column:
    """Sort the ';'-separated items of a cell by their numeric content
    (aux_functions.py:147-190) — native higher-order functions, stable via
    (numeric-key, original-position) pairing.

    Deliberate divergence: the reference sorts by the digit substring's
    *string* form (lexicographic: '10' < '2'); we sort by numeric value
    via fixed-width zero-padding, which is the documented intent
    ("sorts them by numerical value").
    """
    c = _c(col).cast("string")
    items = F.split(c, ";", -1)
    keyed = F.transform(
        items,
        lambda x, i: F.struct(
            F.lpad(F.regexp_replace(x, r"[^0-9]+", ""), 30, " ").alias("k"),
            i.alias("i"),
            x.alias("v"),
        ),
    )
    # array_sort on struct sorts by fields in order: digit-key then position
    return F.array_join(F.transform(F.array_sort(keyed), lambda s: s["v"]), ";")


def separate_prisoner_number_chars(col: Column | str) -> Column:
    """Insert ';' between a block letter (A/B/R/Z) and the following digits
    (regex_conditions.py find_prisoner_number_character_separator_regex)."""
    return F.regexp_replace(_c(col), PRISONER_NUMBER_CHAR_SEP, ";")


# ---------------------------------------------------------------------------
# F24/F25: geo-identifier parsing (column_processing.py:1338-1422)
# ---------------------------------------------------------------------------

def clean_wikidata_id(col: Column | str) -> tuple[Column, Column]:
    """(cleaned, qa) for a wikidata-id column: 'Q123'/'q123' pass as-is,
    bare digits gain the Q prefix, everything else empties. QA fires on
    unclear markers or when cleaning changed the value."""
    c = F.trim(_c(col).cast("string"))
    cleaned = (
        F.when(c.rlike(r"^[qQ]\d+$"), c)
        .when(c.rlike(r"^\d+$"), F.concat(F.lit("Q"), c))
        .otherwise(F.lit(""))
    )
    qa = create_qa_col(c, UNCLEAR_REGEX) | (cleaned != F.coalesce(c, F.lit("")))
    return cleaned, F.coalesce(qa, F.lit(True))


def clean_geoname_id(col: Column | str) -> tuple[Column, Column]:
    """(cleaned, qa) for a geonames-id column: digit runs pass, all else
    empties; QA mirrors clean_wikidata_id (column_processing.py:1382-1422)."""
    c = F.trim(_c(col).cast("string"))
    cleaned = F.when(c.rlike(r"^\d+$"), c).otherwise(F.lit(""))
    qa = create_qa_col(c, UNCLEAR_REGEX) | (cleaned != F.coalesce(c, F.lit("")))
    return cleaned, F.coalesce(qa, F.lit(True))
