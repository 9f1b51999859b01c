"""Time the driver's 50-slot gate window exactly as the driver runs it:
first 50 of queries() in order, strict comparator, plain session.

Usage: python scripts/time_gate_window.py [sf_dir]
Prints per-entry seconds for anything over the threshold and the window
total — run this after re-curating GATE_PRIORITY so no round ships a
window the gate can't afford (~10 s/entry budget, see VERDICT r2 #3).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession  # noqa: E402

from aroa_etl_spark.plans import catalog  # noqa: E402
from tests.oracle_harness import compare  # noqa: E402

THRESHOLD_S = 8.0


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = (
        SparkSession.builder.master(f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]")
        .config("spark.driver.memory", "8g")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    names = list(catalog.queries())[:50]
    t0 = time.time()
    slow = []
    for n in names:
        t = time.time()
        spec = catalog.spec(n)
        compare(spec.builder(spark, sf_dir), sf_dir, spec.oracle, name=n)
        dt = time.time() - t
        if dt > THRESHOLD_S:
            slow.append((n, round(dt, 1)))
    print(f"window total: {time.time() - t0:.1f}s over {len(names)} entries")
    print(f"entries over {THRESHOLD_S}s: {slow or 'none'}")


if __name__ == "__main__":
    main()
