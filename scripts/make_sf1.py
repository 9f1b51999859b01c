"""Generate an sf1 stress dataset by tiling the read-only sf0.1 tables
10x with referentially-consistent key offsets (testdata is read-only;
output goes to the gitignored .scratch/sf1).

Deterministic: tile t offsets every key column by t * (max_key + 1) of
its table, so joins stay consistent across tiles and key cardinality
grows 10x.  Dims (region, nation) are shared, matching how TPC-H scales
them sub-linearly.  Document text gets a per-tile suffix token and
embeddings a tiny per-tile perturbation so the dedup / near-dup
workloads see 10x GENUINE corpus growth instead of 10 exact copies of
every item (which would quadratically inflate every candidate bucket
and measure a different problem).

Usage: python scripts/make_sf1.py  (writes .scratch/sf1/*.parquet)
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, SparkSession  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

SRC = "/root/testdata/sf0.1"
DST = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".scratch", "sf1"
)
TILES = 10

# table -> columns that carry entity keys (offset per tile by that
# ENTITY's step so cross-table references stay aligned)
KEYED = {
    "lineitem": {"l_orderkey": "orders", "l_partkey": "part", "l_suppkey": "supplier"},
    "orders": {"o_orderkey": "orders", "o_custkey": "customer"},
    "customer": {"c_custkey": "customer"},
    "part": {"p_partkey": "part"},
    "supplier": {"s_suppkey": "supplier"},
    # user_id references c_custkey (j_eav_pivot), so it must tile by the
    # CUSTOMER step: tile-t users must map to tile-t customers
    "events": {"event_id": "events", "user_id": "customer"},
    "documents": {"doc_id": "documents"},
    "embeddings": {"vec_id": "embeddings"},
}
SHARED_DIMS = ("region", "nation")


def main() -> None:
    spark = (
        SparkSession.builder.appName("make_sf1")
        .master(f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]")
        .config("spark.driver.memory", "16g")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    os.makedirs(DST, exist_ok=True)

    src = {
        name: spark.read.parquet(os.path.join(SRC, f"{name}.parquet"))
        for name in list(KEYED) + list(SHARED_DIMS)
    }
    # entity key steps: max primary key + 1 (user ids live in events)
    steps = {
        "orders": src["orders"].agg(F.max("o_orderkey")).collect()[0][0] + 1,
        "customer": src["customer"].agg(F.max("c_custkey")).collect()[0][0] + 1,
        "part": src["part"].agg(F.max("p_partkey")).collect()[0][0] + 1,
        "supplier": src["supplier"].agg(F.max("s_suppkey")).collect()[0][0] + 1,
        "events": src["events"].agg(F.max("event_id")).collect()[0][0] + 1,
        "documents": src["documents"].agg(F.max("doc_id")).collect()[0][0] + 1,
        "embeddings": src["embeddings"].agg(F.max("vec_id")).collect()[0][0] + 1,
    }

    for name in SHARED_DIMS:
        src[name].write.mode("overwrite").parquet(os.path.join(DST, f"{name}.parquet"))

    for name, keycols in KEYED.items():
        df = src[name]
        tiles: list[DataFrame] = []
        for t in range(TILES):
            tile = df
            for col, entity in keycols.items():
                tile = tile.withColumn(col, F.col(col) + F.lit(t * steps[entity]))
            if name == "documents" and "text" in df.columns:
                # distinct corpora per tile (see module docstring)
                tile = tile.withColumn(
                    "text",
                    F.concat(F.col("text"), F.lit(f" tile{t}")) if t else F.col("text"),
                )
            if name == "embeddings" and "embedding" in df.columns:
                tile = tile.withColumn(
                    "embedding",
                    F.transform(
                        F.col("embedding"),
                        lambda x: (x + F.lit(float(t) * 1e-3)).cast("float"),
                    ),
                )
            tiles.append(tile)
        out = tiles[0]
        for tile in tiles[1:]:
            out = out.unionByName(tile)
        out.repartition(32).write.mode("overwrite").parquet(
            os.path.join(DST, f"{name}.parquet")
        )
        n = spark.read.parquet(os.path.join(DST, f"{name}.parquet")).count()
        print(f"{name}: {n} rows", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
