"""Nearest-segment snap (map matching core): assign each point the
closest polyline segment within a gating radius — the line-geometry
spatial join the J-family lacked (PIP joins polygons, kNN joins points).

EXACT by construction, never a cross join: each segment's bbox is
inflated by the radius (plus the distance-rounding slack — see
snap_to_segments) and exploded to grid cells (cell == radius), so ANY
point the rounded gate can admit shares a cell with that segment's
cover — a point probes only its OWN cell. The cover is a
dim-side table (O(|segments| × length/cell)), broadcast; the fact table
sees one equi-join plus a min() aggregation with map-side partials.
The argmin packs (scaled distance², seg_id) into one BIGINT so both
engines pick the same winner bit-for-bit (the haversine_nearest
round-before-argmin discipline).

100-TB shape: points shuffle ONCE (their own argmin agg); the segment
cover is bounded by the road network, not the points.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# distance² is rounded at x10^4 scale BEFORE the argmin (cross-engine
# double discipline) and packed with seg_id; seg_id must fit the slot.
_D2_SCALE = 10_000
_SEG_SLOT = 100_000


def _seg_cover(segments: DataFrame, radius: float, cell: float) -> DataFrame:
    """(cell_x, cell_y, seg_id, ax, ay, bx, by): every grid cell whose
    square could contain a point within ``radius`` of the segment
    (bbox inflated by radius — a superset, exact filtering happens at
    the distance step)."""
    lo = lambda a, b: F.least(F.col(a), F.col(b))  # noqa: E731
    hi = lambda a, b: F.greatest(F.col(a), F.col(b))  # noqa: E731
    cx0 = F.floor((lo("ax", "bx") - radius) / cell).cast("int")
    cx1 = F.floor((hi("ax", "bx") + radius) / cell).cast("int")
    cy0 = F.floor((lo("ay", "by") - radius) / cell).cast("int")
    cy1 = F.floor((hi("ay", "by") + radius) / cell).cast("int")
    with_rng = segments.select(
        "seg_id", "ax", "ay", "bx", "by",
        F.sequence(cx0, cx1).alias("_xs"),
        F.sequence(cy0, cy1).alias("_ys"),
    )
    return (
        with_rng.select(
            "seg_id", "ax", "ay", "bx", "by",
            F.explode("_xs").alias("cell_x"), "_ys",
        )
        .select(
            "seg_id", "ax", "ay", "bx", "by", "cell_x",
            F.explode("_ys").alias("cell_y"),
        )
    )


def _point_segment_d2(px, py, ax, ay, bx, by) -> Column:
    """Squared point→segment distance with the parameter clamped to
    [0, 1]; pure + - * / doubles (plus least/greatest), so a SQL oracle
    replays it bit-for-bit. A degenerate (zero-length) segment measures
    to its endpoint (t pins to 0 via the guard)."""
    dx, dy = bx - ax, by - ay
    len2 = dx * dx + dy * dy
    t_raw = ((px - ax) * dx + (py - ay) * dy) / F.when(
        len2 == 0.0, F.lit(1.0)
    ).otherwise(len2)
    t = F.least(F.lit(1.0), F.greatest(F.lit(0.0), t_raw))
    ex = px - (ax + t * dx)
    ey = py - (ay + t * dy)
    return ex * ex + ey * ey


def _gated_candidates(
    points: DataFrame,
    segments: DataFrame,
    radius: float,
    point_id: str,
    x_col: str,
    y_col: str,
) -> DataFrame:
    """(point_id, _d2s, _sid): every (point, segment) pair the rounded
    radius gate admits, via the broadcast cell-cover equi-join — the
    shared candidate generator of the argmin snap and the top-k snap.
    """
    cell = float(radius)
    # The gate compares the ROUNDED distance² (x10^4) to radius², so a
    # point at true distance in (radius, sqrt(radius² + 0.5/SCALE)]
    # still rounds under the threshold and must be reachable through
    # the cell join — inflate the cover by that rounding slack, or the
    # brute-force oracle (cross join, same rounded filter) could return
    # a pair the engine's cover never sees.
    pad = math.sqrt(radius * radius + 0.5 / _D2_SCALE)
    cover = _seg_cover(segments, pad, cell)
    px, py = F.col(x_col), F.col(y_col)
    pts = points.select(
        F.col(point_id),
        px.alias("_px"),
        py.alias("_py"),
        F.floor(px / cell).cast("int").alias("cell_x"),
        F.floor(py / cell).cast("int").alias("cell_y"),
    )
    j = pts.join(F.broadcast(cover), ["cell_x", "cell_y"])
    d2 = _point_segment_d2(
        F.col("_px"), F.col("_py"),
        F.col("ax"), F.col("ay"), F.col("bx"), F.col("by"),
    )
    guard = F.assert_true(
        (F.col("seg_id") >= 0) & (F.col("seg_id") < _SEG_SLOT),
        "seg_id outside [0, 100000): would corrupt the argmin pack",
    ).isNull()
    return j.select(
        point_id,
        F.round(d2 * _D2_SCALE, 0).cast("long").alias("_d2s"),
        F.col("seg_id").cast("long").alias("_sid"),
    ).where(
        (F.col("_d2s") <= int(radius * radius * _D2_SCALE)) & guard
    )


def snap_to_segments(
    points: DataFrame,
    segments: DataFrame,
    radius: float,
    point_id: str = "point_id",
    x_col: str = "px",
    y_col: str = "py",
) -> DataFrame:
    """(point_id, seg_id, dist2_x10k) — the nearest segment within
    ``radius`` per point (points farther than radius from every segment
    are dropped). ``segments`` must carry (seg_id, ax, ay, bx, by);
    seg_id must be < 100000 (argmin pack slot — asserted in the plan).
    """
    cand = _gated_candidates(
        points, segments, radius, point_id, x_col, y_col
    )
    best = cand.groupBy(point_id).agg(
        F.min(F.col("_d2s") * _SEG_SLOT + F.col("_sid")).alias("_pack")
    )
    return best.select(
        point_id,
        (F.col("_pack") % _SEG_SLOT).cast("long").alias("seg_id"),
        F.expr(f"_pack div {_SEG_SLOT}").cast("long").alias("dist2_x10k"),
    )


def snap_topk_segments(
    points: DataFrame,
    segments: DataFrame,
    radius: float,
    k: int,
    point_id: str = "point_id",
    x_col: str = "px",
    y_col: str = "py",
) -> DataFrame:
    """(point_id, rank, seg_id, dist2_x10k) — the k nearest segments
    within ``radius`` per point, rank 1 = closest; ties broken by
    seg_id (the same (distance, id) total order the argmin packs, so
    rank 1 here IS snap_to_segments' winner). This is the map-matching
    candidate generator: an HMM emission step needs the k plausible
    road segments per GPS ping, not just the argmin.

    Scale shape: identical candidate join to the argmin snap (broadcast
    cell cover, one equi-join), then ONE shuffle on point_id for the
    per-point bottom-k — Spark plans it as a rank window with
    WindowGroupLimit pushdown (partial top-k per map partition before
    the exchange, like O4/O5's top_orders_per_customer), so the shuffle
    carries at most k rows per (partition, point), not every candidate.
    """
    cand = _gated_candidates(
        points, segments, radius, point_id, x_col, y_col
    )
    w = Window.partitionBy(point_id).orderBy("_d2s", "_sid")
    return (
        cand.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(
            point_id,
            F.col("rank").cast("int").alias("rank"),
            F.col("_sid").cast("long").alias("seg_id"),
            F.col("_d2s").cast("long").alias("dist2_x10k"),
        )
    )
