"""Link-analysis operators: fixed-point PageRank.

Connected components live in operators/clustering.py; this module adds
PageRank (Page et al. 1999) in EXACT integer arithmetic: ranks are
fixed-point BIGINTs at scale 1e12, per-edge contributions use integer
division, and the damping factor is a rational (17/20 = 0.85). Integer
sums are order-independent, so the result is deterministic across
partitionings and engines — the same fixed-point trick the embedding
centroid operator uses, applied to an iterative algorithm. (Float
PageRank would be nondeterministic in the last ulps under Spark's
unordered aggregation.)

Plan shape per iteration: one hash join (edges ⋈ ranks on src — outdeg
is pre-folded into the edge frame once) and one map-side-combinable
groupBy on dst, then a left join back to the node set for dangling
nodes. Lineage grows linearly with iterations; for long runs pass
``checkpoint_every`` to cut it with an eager localCheckpoint (the same
pattern as connected_components_star, clustering.py).

Dangling-node mass (nodes with no out-edges) is dropped, not
redistributed — ranks then need no global renormalization pass and stay
deterministic; document this when comparing against textbook PageRank.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["pagerank"]

SCALE = 1_000_000_000_000  # 1e12 fixed-point rank units


def pagerank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    iters: int = 3,
    damping_num: int = 17,
    damping_den: int = 20,
    checkpoint_every: int = 0,
) -> DataFrame:
    """(node, rank) after ``iters`` synchronous iterations; rank is a
    BIGINT in 1e-12 units summing (minus dangling/rounding loss) to
    ~1e12. Duplicate edges should be deduped by the caller if unwanted —
    they are counted as parallel edges here."""
    if iters < 1:
        raise ValueError("iters must be >= 1")
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
    nodes = (
        e.select(F.col("src").alias("node"))
        .unionByName(e.select(F.col("dst").alias("node")))
        .distinct()
    )
    outdeg = e.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    edges_w = e.join(outdeg, "src")  # deg folded in ONCE, reused every iter
    n_frame = nodes.agg(F.count(F.lit(1)).alias("n"))

    teleport_num = damping_den - damping_num
    ranks = nodes.crossJoin(n_frame).select(
        "node", F.expr(f"{SCALE} div n").alias("rank")
    )
    for i in range(1, iters + 1):
        contribs = (
            edges_w.join(ranks.withColumnRenamed("node", "src"), "src")
            .select("dst", F.expr("rank div deg").alias("c"))
            .groupBy("dst")
            .agg(F.sum("c").alias("s"))
            .withColumnRenamed("dst", "node")
        )
        ranks = (
            nodes.join(contribs, "node", "left")
            .crossJoin(n_frame)
            .select(
                "node",
                F.expr(
                    f"(({SCALE} * {teleport_num} div {damping_den}) div n)"
                    f" + (coalesce(s, 0) * {damping_num} div {damping_den})"
                ).alias("rank"),
            )
        )
        if checkpoint_every and i % checkpoint_every == 0 and i < iters:
            ranks = ranks.localCheckpoint(eager=True)
    return ranks
