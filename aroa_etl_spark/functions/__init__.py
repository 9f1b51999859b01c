"""Expression library: NA vocabulary, cleaning, transliteration, dates, scoring."""

from aroa_etl_spark.functions.vocab import (  # noqa: F401
    NA_VALUES,
    QA_VALUES,
    has_value,
    is_empty,
)
