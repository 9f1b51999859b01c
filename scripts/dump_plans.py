"""Dump .explain("formatted") for catalog queries to plans/r14/.

Usage: python scripts/dump_plans.py <suffix> [name ...]
Writes plans/r14/<name>_<suffix>.txt for each query (default: the
bench headliner set).  suffix is typically "before" or "after".
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession  # noqa: E402

from aroa_etl_spark.plans import catalog  # noqa: E402

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> int:
    suffix = sys.argv[1] if len(sys.argv) > 1 else "before"
    names = sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    import bench

    if not names:
        qmap = catalog.queries()
        names = [n for n in bench.HEADLINE if n in qmap]
        names += [
            n
            for n in getattr(catalog, "BENCH_EXTRA", [])
            if n in qmap and n not in names
        ]
    out_dir = os.path.join(REPO, "plans", "r14")
    os.makedirs(out_dir, exist_ok=True)
    spark = (
        SparkSession.builder.appName("dump_plans")
        .master(f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]")
        .config("spark.driver.memory", "8g")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    qmap = catalog.queries()
    rc = 0
    for name in names:
        try:
            df = qmap[name](spark, sf_dir)
            plan = df._sc._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
                df._jdf.queryExecution(), "formatted"
            )
        except Exception as e:  # noqa: BLE001
            print(f"{name}: FAILED {e}", flush=True)
            rc = 1
            continue
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w", encoding="utf-8") as fh:
            fh.write(plan)
        print(f"{name}: {len(plan)} chars -> {os.path.relpath(path, REPO)}", flush=True)
    spark.stop()
    return rc


if __name__ == "__main__":
    raise SystemExit(main())
