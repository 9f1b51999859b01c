"""sf1 stress run (round-3 judge ask #2): the heavy operator families
at 10x the bench scale, with wall times and peak-partition stats.

Runs each named catalog entry at the given sf dir (default the
make_sf1.py output), times a full materialization, and — for frames
big enough to matter — reports the max/mean rows per output partition
(the skew signal).  Prints one JSON line per query plus a summary.

Usage: python scripts/stress_sf1.py [sf_dir] [name ...]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from aroa_etl_spark.plans import catalog  # noqa: E402
from aroa_etl_spark.session import get_spark  # noqa: E402

DEFAULT_NAMES = [
    "dedup_exact_groups",
    "dedup_fingerprint_groups",
    "dedup_minhash_lsh",
    "dedup_lsh_salted",
    "dedup_simhash",
    "dedup_ngram_jaccard",
    "dedup_embedding_cosine",
    "tdp_line_dedup",
    "er_neardup_clusters",
    "cc_connected_components",
    "cc_star_components",
    "graph_pagerank",
    "graph_triangles",
    "search_inverted_index",
    "search_bm25_topk",
    # round-5 additions: the heaviest new fact-side shapes
    "q4_late_order_priority",
    "q21_waiting_suppliers",
    "dedup_embedding_auto",
    "web_url_canonical_dedup",
]


def main() -> None:
    args = sys.argv[1:]
    sf_dir = (
        args[0]
        if args and os.path.isdir(args[0])
        else os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            ".scratch",
            "sf1",
        )
    )
    names = args[1:] if args and os.path.isdir(args[0]) else args
    names = names or DEFAULT_NAMES
    spark = get_spark(app_name="stress_sf1")
    from aroa_etl_spark.operators import dedup as _dedup

    results = {}
    for name in names:
        spec = catalog.spec(name)
        t0 = time.perf_counter()
        df = spec.builder(spark, sf_dir)
        n = df.count()
        wall = round(time.perf_counter() - t0, 2)
        rec = {"rows": n, "sec": wall}
        if n >= 10_000:
            parts = (
                df.groupBy(F.spark_partition_id().alias("pid"))
                .count()
                .agg(
                    F.max("count").alias("mx"),
                    F.avg("count").alias("mean"),
                    F.count(F.lit(1)).alias("np"),
                )
                .collect()[0]
            )
            rec["max_part_rows"] = int(parts["mx"])
            rec["mean_part_rows"] = int(parts["mean"])
            rec["n_parts"] = int(parts["np"])
        results[name] = rec
        print(json.dumps({name: rec}), flush=True)
        _dedup.release_caches()
    print(
        json.dumps(
            {
                "metric": "stress_total_wall",
                "value": round(sum(r["sec"] for r in results.values()), 2),
                "sf_dir": sf_dir,
                "queries": results,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
