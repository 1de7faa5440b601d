"""Grid-density clustering (DBSCAN on cells) — counts, adjacency, CC.

The classic DBSCAN is an all-pairs ε-neighborhood scan — quadratic and
un-plannable at scale.  The grid formulation used by every distributed
implementation replaces it with three shuffle-bounded stages:

1. snap points to a grid of side ``cell_size`` and count per cell —
   one hash agg with map-side partials;
2. keep cells with ``>= min_pts`` points (core/dense cells; sparse
   cells are noise) and build the 8-neighbor adjacency by exploding
   each dense cell to its 3×3 neighborhood and equi-joining back on
   the shifted coordinate — a plain hash join, never an inequality
   self-join;
3. collapse adjacent dense cells into clusters with the same
   distributed min-label connected-components loop the dedup pipeline
   uses (`operators/dedup.py::connected_components`) — cluster id is
   the component's minimum packed cell key, so labels are exact
   integers and deterministic.

At 100 TB the dense-cell table is orders of magnitude smaller than the
point table (one row per occupied cell), so the CC loop's per-round
joins run on the reduced graph; ``cell_size`` is the skew knob exactly
as in the PBSM overlap join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from mvtspark.operators.dedup import connected_components

# packed key k = (cx + 2^20) * 2^21 + (cy + 2^20): injective for
# |cx|,|cy| < 2^20, monotone in (cx, cy), max < 2^42 (BIGINT-safe in
# both engines)
_OFF = 1 << 20
_MUL = 1 << 21


def grid_dbscan(
    points: DataFrame,
    x_col: str = "lng",
    y_col: str = "lat",
    cell_size: float = 2.0,
    min_pts: int = 3,
    max_iter: int = 15,
) -> DataFrame:
    """Cluster dense grid cells; returns one row per dense cell:
    ``(cx, cy, n_points, cluster_id, cluster_cells)``.

    ``cluster_id`` is the minimum packed key of the cell's component;
    ``cluster_cells`` the component size.  Sparse cells (< min_pts)
    are noise and not returned.  Grid coordinates must satisfy
    ``|c| < 2**20`` (the packed-key domain).
    """
    cells = (
        points.select(
            F.floor(F.col(x_col) / F.lit(float(cell_size))).alias("cx"),
            F.floor(F.col(y_col) / F.lit(float(cell_size))).alias("cy"),
        )
        .groupBy("cx", "cy")
        .agg(F.count(F.lit(1)).alias("n_points"))
    )
    dense = cells.where(F.col("n_points") >= min_pts).withColumn(
        "k", (F.col("cx") + _OFF) * _MUL + (F.col("cy") + _OFF)
    )
    # 3x3 neighborhood INCLUDING (0,0): the self-loop guarantees every
    # dense cell reaches the CC label table, so isolated dense cells
    # come out as singleton clusters without a separate left join
    offs = F.array(
        *[
            F.struct(F.lit(dx).alias("dx"), F.lit(dy).alias("dy"))
            for dx in (-1, 0, 1)
            for dy in (-1, 0, 1)
        ]
    )
    nbr = (
        dense.select("cx", "cy", "k", F.explode(offs).alias("o"))
        .select(
            (F.col("cx") + F.col("o.dx")).alias("cx"),
            (F.col("cy") + F.col("o.dy")).alias("cy"),
            F.col("k").alias("doc_a"),
        )
    )
    edges = nbr.join(
        dense.select("cx", "cy", F.col("k").alias("doc_b")), ["cx", "cy"]
    ).select("doc_a", "doc_b")
    cc = connected_components(edges, max_iter=max_iter).select(
        F.col("doc_id").alias("k"),
        F.col("group_id").alias("cluster_id"),
        F.col("group_size").alias("cluster_cells"),
    )
    return dense.join(cc, "k").select(
        "cx",
        "cy",
        "n_points",
        "cluster_id",
        F.col("cluster_cells").cast("long").alias("cluster_cells"),
    )
