"""Tile-pyramid builder with per-level feature thinning.

The production tiling concern behind the reference's bench corpus
(z14 tiles of ~1200 features, src/Bench/Program.cs:23-63): lower-zoom
tiles cannot carry every child feature — a z0 world tile would hold
the whole planet — so each parent level keeps only its top-K features
by importance. This is the relational formulation:

- parent tile of (z, x, y) is (z-1, x//2, y//2) (XYZ pyramid);
- a child pixel maps to the parent frame as
  px' = (px + (x & 1) * extent) // 2 (integer-exact halving, same for
  y) — the child quadrant occupies half the parent extent;
- thinning is a per-parent-tile top-K by (weight DESC, feature_id ASC)
  — Spark plans the rank-filter as WindowGroupLimit, i.e. per-partition
  top-K pushed below the shuffle, never a global sort.

Scale shape: ONE shuffle per level (the window on the parent tile
key), log2(zoom-span) levels total, and because thinning happens
BEFORE descending, every level's input is bounded by K × n_tiles(z) —
the invariant that keeps a planet-scale build feasible: level sizes
SHRINK geometrically (4× fewer tiles, ≤K rows each) instead of
carrying 10^12 rows to the root.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def thin_pyramid(
    feats: DataFrame,
    from_zoom: int,
    to_zoom: int,
    k: int,
    extent: int = 4096,
) -> DataFrame:
    """feats: (zoom, x, y, feature_id, weight, px, py) at ``from_zoom``
    (0 <= px, py < extent). Returns the union of all levels
    ``from_zoom`` down to ``to_zoom``, where each level z-1 holds, per
    parent tile, the top-``k`` of its children's features by
    (weight DESC, feature_id ASC), with coordinates halved into the
    parent frame. The input level passes through un-thinned (it is the
    source of truth); every derived level is bounded by k per tile."""
    if not to_zoom <= from_zoom:
        raise ValueError("need to_zoom <= from_zoom")
    out = cur = feats
    w = Window.partitionBy("zoom", "x", "y").orderBy(
        F.col("weight").desc(), F.col("feature_id")
    )
    for z in range(from_zoom, to_zoom, -1):
        parent = cur.select(
            F.lit(z - 1).cast("int").alias("zoom"),
            F.expr("x div 2").cast("int").alias("x"),
            F.expr("y div 2").cast("int").alias("y"),
            "feature_id",
            "weight",
            F.expr(f"(px + (x % 2) * {extent}) div 2").cast("long").alias("px"),
            F.expr(f"(py + (y % 2) * {extent}) div 2").cast("long").alias("py"),
        )
        cur = (
            parent.withColumn("rn", F.row_number().over(w))
            .where(F.col("rn") <= k)
            .drop("rn")
        )
        out = out.unionByName(cur)
    return out
