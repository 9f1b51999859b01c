"""Parity gate: every catalog query with an oracle must hash-match DuckDB.

This is a local mirror of the driver's CORRECTNESS check.
"""

from __future__ import annotations

import pytest

from aroa_etl_spark.plans import catalog
from tests.oracle_harness import compare

_NAMES = sorted(catalog.queries().keys())


@pytest.mark.parametrize("name", _NAMES)
def test_catalog_query_matches_oracle(spark, sf_dir, name):
    spec = catalog.spec(name)
    df = spec.builder(spark, sf_dir)
    if spec.oracle is None:
        # weaker rows-only check (mirrors the driver) — plan must execute
        assert df.count() >= 0
        return
    compare(df, sf_dir, spec.oracle, name=name)
