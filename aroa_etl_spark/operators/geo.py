"""Spatial radius join on planar integer coordinates.

The spatial sibling of the interval-overlap and LSH joins: points
within ``radius`` of each other are found via GRID CELL bucketing — the
probe side explodes to its own cell plus the 8 neighbors, the join runs
as a pure EQUI-join on the cell id, and the exact distance predicate
filters inside the (bounded) candidate set. Each pair is found exactly
once: the build side carries its single home cell, so a pair matches
only in that one cell. No cross join, no inequality join; shuffle is
linear in points × 9.

Coordinates must be NON-NEGATIVE INTEGERS in the caller's projected
units (e.g. micro-degrees after an equirectangular projection, or
meters in a local grid). All distance math is exact BIGINT
(``(dx² + dy²) <= r²``) — deterministic on any engine, no floating
point, no trig. Geodesic accuracy is the caller's projection choice;
this operator contributes the scale-safe join shape. Extension
inventory (SURVEY §2.11).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["grid_radius_join"]


def grid_radius_join(
    a: DataFrame,
    b: DataFrame,
    ax: str,
    ay: str,
    bx: str,
    by_: str,
    radius: int,
    by: Sequence[str] | str | None = None,
) -> DataFrame:
    """All (a, b) pairs with euclidean distance <= ``radius`` (closed),
    optionally per equality key. Cell width == radius, so candidates
    are exactly the 9-cell neighborhood."""
    if radius <= 0:
        raise ValueError("radius must be positive")
    by = [by] if isinstance(by, str) else list(by or [])
    dup = set(a.columns) & set(b.columns) - set(by)
    if dup:
        raise ValueError(f"overlapping non-key columns: {sorted(dup)}")
    taken = {"__cell"} & (set(a.columns) | set(b.columns))
    if taken:
        # withColumn would silently overwrite it and corrupt the filter
        raise ValueError(f"reserved internal column name in input: {sorted(taken)}")
    r = int(radius)
    home = a.withColumn(
        "__cell",
        F.concat_ws(
            ":", F.expr(f"`{ax}` div {r}"), F.expr(f"`{ay}` div {r}")
        ),
    )
    neighbor_cells = F.array(
        *[
            F.concat_ws(
                ":",
                F.expr(f"`{bx}` div {r}") + F.lit(dx),
                F.expr(f"`{by_}` div {r}") + F.lit(dy),
            )
            for dx in (-1, 0, 1)
            for dy in (-1, 0, 1)
        ]
    )
    probe = b.withColumn("__cell", F.explode(neighbor_cells))
    joined = home.join(probe, [*by, "__cell"])
    dx = F.col(ax) - F.col(bx)
    dy = F.col(ay) - F.col(by_)
    return joined.filter(dx * dx + dy * dy <= F.lit(r * r)).drop("__cell")
