"""Faithful local mirror of the correctness driver.

Builds a PLAIN SparkSession (no get_spark — the driver does not use our
session factory; round 1 proved that any conf we only set in get_spark
is invisible to the gate) and runs every catalog query at sf0.01
against its DuckDB oracle with the strict repr-level comparator.

Usage: python scripts/driver_mirror.py [sf_dir] [name_filter...]
"""

from __future__ import annotations

import json
import os
import sys
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession  # noqa: E402

from aroa_etl_spark.plans import catalog  # noqa: E402
from tests.oracle_harness import compare  # noqa: E402


def main() -> int:
    args = sys.argv[1:]
    sf_dir = args[0] if args and os.path.isdir(args[0]) else "/root/testdata/sf0.01"
    names = args[1:] if args and os.path.isdir(args[0]) else args
    spark = (
        SparkSession.builder.appName("driver_mirror")
        .master(f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]")
        .config("spark.driver.memory", "8g")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    results: dict[str, dict] = {}
    todo = sorted(catalog.queries().keys())
    if names:
        todo = [n for n in todo if any(f in n for f in names)]
    for name in todo:
        spec = catalog.spec(name)
        t0 = time.time()
        try:
            df = spec.builder(spark, sf_dir)
            if spec.oracle is None:
                n = df.count()
                results[name] = {"status": "rows_only", "rows": n}
            else:
                compare(df, sf_dir, spec.oracle, name=name)
                results[name] = {"status": "ok"}
        except AssertionError as e:
            results[name] = {"status": "MISMATCH", "detail": str(e)[:500]}
        except Exception:
            results[name] = {"status": "ERROR", "detail": traceback.format_exc()[-500:]}
        results[name]["sec"] = round(time.time() - t0, 2)
        print(f"{name:40s} {results[name]['status']:10s} {results[name]['sec']}s", flush=True)

    bad = {k: v for k, v in results.items() if v["status"] not in ("ok", "rows_only")}
    print(json.dumps({"total": len(results), "bad": len(bad)}))
    if bad:
        print(json.dumps(bad, indent=2)[:4000])
    spark.stop()
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
