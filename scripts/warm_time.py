"""Warm per-entry timing: plain driver-style session, q1 warmup, then
REPS timed runs per entry (collect capped like the gate).

Usage: python scripts/warm_time.py [sf_dir] name [name ...]
Env: SPARK_GRAFT_CPUS (default 32), WARM_REPS (default 3)
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession  # noqa: E402

from aroa_etl_spark.plans import catalog  # noqa: E402


def main() -> None:
    args = sys.argv[1:]
    sf_dir = args[0] if args and os.path.isdir(args[0]) else "/root/testdata/sf0.01"
    names = args[1:] if args and os.path.isdir(args[0]) else args
    reps = int(os.environ.get("WARM_REPS", "3"))
    spark = (
        SparkSession.builder.appName("warm_time")
        .master(f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]")
        .config("spark.driver.memory", "8g")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    q = catalog.queries()
    q["q1_pricing_summary"](spark, sf_dir).collect()  # session warmup
    from aroa_etl_spark.operators import dedup as _dedup

    for name in names:
        runs = []
        for _ in range(reps):
            t0 = time.perf_counter()
            df = q[name](spark, sf_dir)
            rows = df.limit(100_001).collect()
            if len(rows) > 100_000:
                df.count()
            runs.append(round(time.perf_counter() - t0, 2))
            _dedup.release_caches()
        print(
            f"{name:40s} med={statistics.median(runs):6.2f}  reps={runs}",
            flush=True,
        )
    spark.stop()


if __name__ == "__main__":
    main()
