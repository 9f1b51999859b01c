"""Query catalog exposed to the correctness driver (queries / oracle_sql)."""

from aroa_etl_spark.plans.catalog import oracle_sql, queries  # noqa: F401
