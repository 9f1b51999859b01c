"""PageRank, z-order layout, and column-profiler tests."""

import pytest
from pyspark.sql import functions as F

from aroa_etl_spark.operators.graph import SCALE, pagerank
from aroa_etl_spark.operators.layout import repartition_by_zorder, zorder_key
from aroa_etl_spark.operators.profile import profile


def test_pagerank_star_graph(spark):
    # everyone points at 'hub': hub must rank highest; spokes get only teleport
    edges = spark.createDataFrame(
        [("a", "hub"), ("b", "hub"), ("c", "hub")], "src string, dst string"
    )
    ranks = {r.node: r.rank for r in pagerank(edges, iters=3).collect()}
    assert ranks["hub"] > ranks["a"]
    assert ranks["a"] == ranks["b"] == ranks["c"]
    # teleport-only spokes: ((1e12*3//20)//4) exactly
    assert ranks["a"] == (SCALE * 3 // 20) // 4


def test_pagerank_deterministic_across_partitioning(spark):
    import random

    rng = random.Random(7)
    rows = [(f"n{rng.randrange(40)}", f"n{rng.randrange(40)}") for _ in range(300)]
    edges = spark.createDataFrame(rows, "src string, dst string").distinct()
    r1 = sorted(map(tuple, pagerank(edges, iters=3).collect()))
    r2 = sorted(map(tuple, pagerank(edges.repartition(17), iters=3).collect()))
    assert r1 == r2


def test_pagerank_checkpoint_same_result(spark):
    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "a"), ("a", "c")], "src string, dst string"
    )
    plain = sorted(map(tuple, pagerank(edges, iters=4).collect()))
    ckpt = sorted(map(tuple, pagerank(edges, iters=4, checkpoint_every=2).collect()))
    assert plain == ckpt


def test_zorder_key_bit_math(spark):
    df = spark.createDataFrame([(1, 0), (0, 1), (3, 3), (0, 0)], "x int, y int")
    out = [
        r.z
        for r in df.select(zorder_key(["x", "y"], bits=2).alias("z"))
        .orderBy("z")
        .collect()
    ]
    # interleave: x bits at even positions, y at odd
    # (1,0)->1, (0,1)->2, (3,3)->15, (0,0)->0
    assert out == [0, 1, 2, 15]


def test_zorder_key_out_of_range_raises(spark):
    df = spark.createDataFrame([(5, 0)], "x int, y int")
    with pytest.raises(Exception, match="zorder_key"):
        df.select(zorder_key(["x", "y"], bits=2).alias("z")).collect()


def test_zorder_locality_beats_single_column_sort(spark):
    # 16x16 grid: after z-ordering into 4 partitions, each partition's
    # bounding box in (x, y) is tight on BOTH dims; a single-column sort
    # leaves y unconstrained (full 0..15 span in every partition).
    df = spark.range(256).select(
        (F.col("id") % 16).cast("int").alias("x"),
        (F.col("id") / 16).cast("int").alias("y"),
    )
    z = repartition_by_zorder(df, ["x", "y"], bits=4, num_partitions=4)
    spans = (
        z.select(F.spark_partition_id().alias("p"), "x", "y")
        .groupBy("p")
        .agg(
            (F.max("x") - F.min("x")).alias("sx"),
            (F.max("y") - F.min("y")).alias("sy"),
        )
        .collect()
    )
    assert len(spans) == 4
    for r in spans:
        assert r.sy <= 8, r  # z-order keeps y clustered too; plain sort gives 15


def _hilbert_ref(bits, x, y):
    # independent pure-Python xy2d (Wikipedia form) for cross-checking
    n = 1 << bits
    d, s = 0, n >> 1
    while s > 0:
        rx = 1 if (x & s) else 0
        ry = 1 if (y & s) else 0
        d += s * s * ((3 * rx) ^ ry)
        if ry == 0:
            if rx == 1:
                x, y = n - 1 - x, n - 1 - y
            x, y = y, x
        s >>= 1
    return d


def test_hilbert_key_matches_reference_walk(spark):
    from aroa_etl_spark.operators.layout import hilbert_key_df

    df = spark.range(256).select(
        (F.col("id") % 16).cast("int").alias("x"),
        (F.col("id") / 16).cast("int").alias("y"),
    )
    rows = hilbert_key_df(df, "x", "y", bits=4).collect()
    for r in rows:
        assert r.hkey == _hilbert_ref(4, r.x, r.y), (r.x, r.y)


def test_hilbert_key_is_adjacent_bijection(spark):
    """The defining Hilbert property: keys are a bijection onto
    [0, 4^bits) and CONSECUTIVE keys are Manhattan-distance-1 cells —
    the locality guarantee Morton interleaving does not give."""
    from aroa_etl_spark.operators.layout import hilbert_key_df

    df = spark.range(256).select(
        (F.col("id") % 16).cast("int").alias("x"),
        (F.col("id") / 16).cast("int").alias("y"),
    )
    rows = hilbert_key_df(df, "x", "y", bits=4).collect()
    pos = {r.hkey: (r.x, r.y) for r in rows}
    assert sorted(pos) == list(range(256))
    for d in range(255):
        (x1, y1), (x2, y2) = pos[d], pos[d + 1]
        assert abs(x1 - x2) + abs(y1 - y2) == 1, d


def test_hilbert_key_out_of_range_raises(spark):
    from aroa_etl_spark.operators.layout import hilbert_key_df

    df = spark.createDataFrame([(5, 0)], "x int, y int")
    with pytest.raises(Exception, match="hilbert_key"):
        hilbert_key_df(df, "x", "y", bits=2).collect()


def test_repartition_by_hilbert_partition_boxes_tight(spark):
    from aroa_etl_spark.operators.layout import repartition_by_hilbert

    df = spark.range(256).select(
        (F.col("id") % 16).cast("int").alias("x"),
        (F.col("id") / 16).cast("int").alias("y"),
    )
    h = repartition_by_hilbert(df, "x", "y", bits=4, num_partitions=4)
    spans = (
        h.select(F.spark_partition_id().alias("p"), "x", "y")
        .groupBy("p")
        .agg(
            (F.max("x") - F.min("x")).alias("sx"),
            (F.max("y") - F.min("y")).alias("sy"),
        )
        .collect()
    )
    assert len(spans) == 4
    for r in spans:
        # a contiguous quarter of the curve is one 8x16-or-tighter box
        assert r.sx <= 8 or r.sy <= 8, r


def test_profile_one_row_per_column(spark):
    df = spark.createDataFrame(
        [(1, "a", None), (2, "b", 5.0), (2, None, 7.5)],
        "k bigint, s string, v double",
    )
    rows = {r.column: r for r in profile(df).collect()}
    assert set(rows) == {"k", "s", "v"}
    assert rows["k"].n_rows == 3 and rows["k"].n_nulls == 0 and rows["k"].n_distinct == 2
    assert rows["s"].n_nulls == 1 and rows["s"].min_str == "a" and rows["s"].max_str == "b"
    assert rows["v"].n_nulls == 1 and rows["v"].min_str == "5.0"


def test_profile_empty_cols_raises(spark):
    df = spark.range(1)
    with pytest.raises(ValueError):
        profile(df, [])


def _tri_brute(edges):
    import itertools

    es = set()
    for u, v in edges:
        if u != v:
            es.add((min(u, v), max(u, v)))
    nodes = sorted({n for e in es for n in e})
    count = sum(
        1
        for a, b, c in itertools.combinations(nodes, 3)
        if (a, b) in es and (b, c) in es and (a, c) in es
    )
    return len(es), count


def test_triangle_count_matches_brute_force(spark):
    import random

    from aroa_etl_spark.operators.graph import triangle_count

    rng = random.Random(13)
    edges = [(rng.randrange(30), rng.randrange(30)) for _ in range(150)]
    df = spark.createDataFrame(edges, "src bigint, dst bigint")
    row = triangle_count(df).collect()[0]
    ne, nt = _tri_brute(edges)
    assert (row.n_edges, row.n_triangles) == (ne, nt)


def test_triangle_count_known_shapes(spark):
    from aroa_etl_spark.operators.graph import triangle_count

    # K4 has 4 triangles; duplicates/reversed/self edges must not matter
    k4 = [(a, b) for a in range(4) for b in range(4) if a != b] + [(0, 0), (1, 1)]
    df = spark.createDataFrame(k4, "src bigint, dst bigint")
    row = triangle_count(df).collect()[0]
    assert (row.n_edges, row.n_triangles) == (6, 4)
    # a path graph has none
    path = spark.createDataFrame([(0, 1), (1, 2), (2, 3)], "src bigint, dst bigint")
    assert triangle_count(path).collect()[0].n_triangles == 0


def test_bfs_hops_path_graph(spark):
    from aroa_etl_spark.operators.graph import bfs_hops

    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "d"), ("x", "y")],
        "src string, dst string",
    )
    seeds = spark.createDataFrame([("a",)], "node string")
    out = {r.node: r.dist for r in bfs_hops(edges, seeds, max_hops=2).collect()}
    assert out == {"a": 0, "b": 1, "c": 2}  # d is 3 hops, x/y unreachable


def test_bfs_hops_directed_vs_undirected(spark):
    from aroa_etl_spark.operators.graph import bfs_hops

    edges = spark.createDataFrame([("b", "a")], "src string, dst string")
    seeds = spark.createDataFrame([("a",)], "node string")
    directed = bfs_hops(edges, seeds, max_hops=2, undirected=False).collect()
    assert {r.node for r in directed} == {"a"}
    und = bfs_hops(edges, seeds, max_hops=2, undirected=True).collect()
    assert {(r.node, r.dist) for r in und} == {("a", 0), ("b", 1)}


def test_bfs_hops_min_distance_wins(spark):
    from aroa_etl_spark.operators.graph import bfs_hops

    # diamond: a->b->d and a->c->d plus direct a->d: d must be dist 1
    edges = spark.createDataFrame(
        [("a", "b"), ("a", "c"), ("b", "d"), ("c", "d"), ("a", "d")],
        "src string, dst string",
    )
    seeds = spark.createDataFrame([("a",)], "node string")
    out = {r.node: r.dist for r in bfs_hops(edges, seeds, max_hops=3).collect()}
    assert out["d"] == 1
    # partitioning invariance
    out2 = {
        r.node: r.dist
        for r in bfs_hops(edges.repartition(7), seeds, max_hops=3).collect()
    }
    assert out == out2


def test_hilbert_buckets_bound_both_dims(spark, sf_dir):
    """Catalog-level property behind layout_hilbert_pruning: contiguous
    hilbert-curve segments are tight boxes on BOTH dimensions, while a
    single-column layout leaves the other dimension at full span."""
    from aroa_etl_spark.plans import catalog

    rows = catalog.spec("layout_hilbert_pruning").builder(spark, sf_dir).collect()
    h = [r for r in rows if r.strategy == "hilbert"]
    s = [r for r in rows if r.strategy == "single"]
    # the single-column layout cannot constrain p_size at all
    full_size_span = max(r.size_span for r in s)
    assert all(r.size_span == full_size_span for r in s)
    # hilbert constrains both: every bucket's pk span is partial, and
    # at least some buckets also bound p_size strictly below full range
    assert all(r.pk_span < 1024 for r in h)
    assert sum(r.size_span < full_size_span for r in h) >= len(h) // 2
