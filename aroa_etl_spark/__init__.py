"""aroa_etl_spark — a PySpark-native analytics/ETL engine.

A from-scratch, Spark-first re-expression of the query and
data-processing capabilities of the reference ETL/record-linkage
package (AroArch/AroA-ETL, studied read-only at /root/reference):

- ``sources``   — readers/writers + nested-JSON unpacking (from_json/explode)
- ``functions`` — the expression library: NA vocabulary, string cleaning,
  transliteration, partial-date normalization, similarity scoring, text analysis
- ``operators`` — consensus deduplication, blocked fuzzy matching,
  entity clustering, dedup family (exact/minhash/simhash/jaccard/embedding),
  similarity search
- ``plans``     — the query catalog exposed to the correctness driver
- ``streaming`` — Structured Streaming variants of the stateless pipeline

Design: DataFrame/SQL declarative plans that Catalyst optimizes;
Pandas UDFs (Arrow) only where built-ins can't express the semantics.
"""

__version__ = "0.1.0"

from aroa_etl_spark.session import get_spark  # noqa: F401
