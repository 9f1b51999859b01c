from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from aroa_etl_spark.session import get_spark  # noqa: E402
from aroa_etl_spark.streaming.protoshim import ensure_protobuf  # noqa: E402

# Activate the vendored mini-protobuf runtime (when the real one is
# absent) BEFORE any SparkSession exists: the transformWithState
# state-server Python workers inherit PYTHONPATH from the JVM, which
# inherits it from this process at launch.
ensure_protobuf()

SF_SMOKE = "/root/testdata/sf0.001"
SF_CORRECT = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    s = get_spark(
        app_name="aroa_etl_spark_tests",
        shuffle_partitions=8,
        extra_conf={"spark.driver.memory": "6g"},
    )
    yield s


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return SF_CORRECT
