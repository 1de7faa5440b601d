"""Adaptive quadtree cell cover — density-balanced tiling for skewed
geodata (the dense-city problem the north rule names, solved at the
LAYOUT level: cities get deep small cells, oceans stay coarse, every
leaf holds <= max_count points, so downstream per-cell work is bounded
regardless of skew).

Scale shape: ONE shuffle for all zoom levels — per-point ancestor cell
keys are functionally dependent (k_{z-1} = parent(k_z)), so a single
``rollup(k_base, …, k_max)`` computes every level's occupied-cell
counts in one aggregation with map-side partials (the
tile_pyramid_rollup trick), and each level's rows carry their parent
key for free. Leaf selection then runs on the COUNTS relation (rows =
occupied cells, orders of magnitude smaller than points) as
``max_zoom - base_zoom`` broadcast semi-joins: a cell is a tree node
iff it is at base zoom or its parent node overflowed; a node is a LEAF
iff it fits (count <= max_count) or the tree bottomed out.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def all_level_counts(
    points: DataFrame, base_zoom: int, max_zoom: int
) -> DataFrame:
    """Occupied-cell counts for EVERY zoom in [base, max] in ONE
    aggregation: rollup over the per-level keys (functionally dependent
    prefixes), map-side partials included. Columns k{z} (null above the
    row's level), n_points, _gid (grouping id identifying the level).
    """
    levels = list(range(base_zoom, max_zoom + 1))
    kcols = [f"k{z}" for z in levels]
    # single long key per level: k_z = x_z * 2^z + y_z with
    # x_z = x >> (max-z), y_z = y >> (max-z); y_z < 2^z so it packs.
    pts = points.select(
        *[
            (
                F.shiftright("x", max_zoom - z).cast("long")
                * F.lit(1 << z)
                + F.shiftright("y", max_zoom - z).cast("long")
            ).alias(f"k{z}")
            for z in levels
        ]
    )
    return pts.rollup(*kcols).agg(
        F.count(F.lit(1)).alias("n_points"),
        F.grouping_id().alias("_gid"),
    )


def adaptive_cell_cover(
    points: DataFrame,
    base_zoom: int,
    max_zoom: int,
    max_count: int,
) -> DataFrame:
    """Leaf cells (zoom, x, y, n_points) of the adaptive quadtree over
    ``points`` (must carry max-zoom tile coords as ``x``/``y``).

    Invariants (pinned in tests/test_adaptive.py): leaves are disjoint,
    they cover every point exactly once (sum of leaf counts == total),
    every leaf either fits or sits at max_zoom, and every leaf's
    ancestors strictly above base_zoom overflowed (no needless splits).
    """
    if not base_zoom <= max_zoom:
        raise ValueError("base_zoom must be <= max_zoom")
    levels = list(range(base_zoom, max_zoom + 1))
    m = len(levels)
    # materialize the counts relation ONCE: every level and the tree
    # walk below re-reference it, and Spark replans (re-expand +
    # re-shuffle the POINT table) for all but one reference even under
    # persist() — localCheckpoint truncates the lineage so every branch
    # reads the same computed blocks (the connected-components
    # precedent, operators/dedup.py). The single point-table shuffle
    # lives inside this one job; tests pin its plan.
    rolled = all_level_counts(points, base_zoom, max_zoom).localCheckpoint(
        eager=True
    )
    per_level = {}
    for i, z in enumerate(levels):
        # level z == the grouping where k_base..k_z are grouped and the
        # deeper keys rolled up: grouping_id has zeros for the first
        # i+1 key bits (MSB-first) and ones after
        gid = (1 << (m - i - 1)) - 1
        sel = [
            F.col(f"k{z}").alias("k"),
            F.col("n_points").cast("long").alias("n_points"),
        ]
        if i > 0:  # parent key rides along from the rollup prefix
            sel.append(F.col(f"k{levels[i - 1]}").alias("pk"))
        per_level[z] = rolled.where(F.col("_gid") == gid).select(*sel)

    def finish(df: DataFrame, z: int) -> DataFrame:
        # integer `div`, not F.floor(k / 2^z): the double quotient can
        # round across the boundary once k = x*2^z + y exceeds 2^53
        # (zoom >= 27), corrupting (x, y) — same packed-key rule as
        # spans.py's _first_loc unpack. `%` is already exact.
        return df.select(
            F.lit(z).cast("int").alias("zoom"),
            F.expr(f"k div {1 << z}").cast("int").alias("x"),
            (F.col("k") % F.lit(1 << z)).cast("int").alias("y"),
            "n_points",
        )

    # walk the tree over the counts relation
    nodes = per_level[base_zoom]
    leaves = []
    for z in levels:
        if z == max_zoom:
            leaves.append(finish(nodes, z))
            break
        fits = F.col("n_points") <= max_count
        leaves.append(finish(nodes.where(fits), z))
        parents = nodes.where(~fits).select(F.col("k").alias("pk"))
        nodes = per_level[z + 1].join(F.broadcast(parents), "pk", "left_semi")
    out = leaves[0]
    for extra in leaves[1:]:
        out = out.unionAll(extra)
    return out
