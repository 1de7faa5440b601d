"""Hex cell index as native Column expressions (JVM-side, codegen).

Mirrors kernels/hexgrid.py op-for-op — every arithmetic step appears in
the same order with the same literals, so the numpy twin, this Column
form, and the DuckDB oracle SQL all produce bit-identical cell ids.
No UDF anywhere: lat/lng → cell, parent, ring-neighbor expansion are
pure whole-stage-codegen arithmetic, which is what lets a 100-TB scan
compute its join key for free inside the same stage as the scan.
"""

from __future__ import annotations

import math

from pyspark.sql import Column
from pyspark.sql import functions as F

from ..kernels.hexgrid import MAX_RES, ring_offsets  # noqa: F401 (re-export)
from .native import _clipped

_BIAS = 1 << 27
_A = math.sqrt(3.0) / 3.0
_B = 1.0 / 3.0
_C = 2.0 / 3.0
_D = math.sqrt(3.0)
_E = math.sqrt(3.0) / 2.0


def world_xy(lng: Column, lat: Column) -> tuple[Column, Column]:
    """Zoom-0 4096-extent mercator world coords (native.py _global_xy
    at zoom 0, kept inline so the op order is explicit)."""
    lng, lat = _clipped(lng, lat)
    wx = (lng + F.lit(180.0)) / F.lit(360.0) * F.lit(4096.0)
    s = F.sin(F.radians(lat))
    wy = (
        F.lit(0.5) - F.log((F.lit(1.0) + s) / (F.lit(1.0) - s)) / F.lit(4.0 * math.pi)
    ) * F.lit(4096.0)
    return wx, wy


def _cube_round(qf: Column, rf: Column) -> tuple[Column, Column]:
    rx = F.floor(qf + F.lit(0.5)).cast("double")
    rz = F.floor(rf + F.lit(0.5)).cast("double")
    yf = -qf - rf
    ry = F.floor(yf + F.lit(0.5)).cast("double")
    dx = F.abs(rx - qf)
    dy = F.abs(ry - yf)
    dz = F.abs(rz - rf)
    use_x = (dx > dy) & (dx > dz)
    use_z = (~use_x) & ~(dy > dz)
    q = F.when(use_x, -ry - rz).otherwise(rx)
    r = F.when(use_z, -rx - ry).otherwise(rz)
    return q.cast("long"), r.cast("long")


def hex_pack(res, q: Column, r: Column) -> Column:
    res_c = res if isinstance(res, Column) else F.lit(int(res)).cast("long")
    return (
        F.shiftleft(res_c.cast("long"), 58)
        + F.shiftleft(q.cast("long") + F.lit(_BIAS).cast("long"), 29)
        + (r.cast("long") + F.lit(_BIAS).cast("long"))
    )


def hex_res(cell: Column) -> Column:
    return F.shiftright(cell, 58)


def hex_q(cell: Column) -> Column:
    return F.shiftright(cell, 29).bitwiseAND(F.lit((1 << 29) - 1).cast("long")) - F.lit(_BIAS).cast("long")


def hex_r(cell: Column) -> Column:
    return cell.bitwiseAND(F.lit((1 << 29) - 1).cast("long")) - F.lit(_BIAS).cast("long")


def hex_cell_world(wx: Column, wy: Column, res: int) -> Column:
    if not 0 <= res <= MAX_RES:
        raise ValueError("res must be 0..24")
    inv = F.lit(2.0 ** (res - 10))
    qf = (wx * F.lit(_A) - wy * F.lit(_B)) * inv
    rf = (wy * F.lit(_C)) * inv
    q, r = _cube_round(qf, rf)
    return hex_pack(res, q, r)


def hex_cell(lng: Column, lat: Column, res: int) -> Column:
    """lat/lng → packed hex cell id at ``res`` — pure codegen columns."""
    wx, wy = world_xy(lng, lat)
    return hex_cell_world(wx, wy, res)


def hex_center_world(cell: Column) -> tuple[Column, Column]:
    size = F.pow(F.lit(2.0), F.lit(10.0) - hex_res(cell).cast("double"))
    qd = hex_q(cell).cast("double")
    rd = hex_r(cell).cast("double")
    wx = (qd * F.lit(_D) + rd * F.lit(_E)) * size
    wy = (rd * F.lit(1.5)) * size
    return wx, wy


def hex_parent(cell: Column, parent_res: int) -> Column:
    """Coarser cell containing this cell's CENTER (centroid hierarchy)."""
    wx, wy = hex_center_world(cell)
    return hex_cell_world(wx, wy, parent_res)


def hex_ring_cells(cell: Column, k: int) -> Column:
    """Array of the 3k^2+3k+1 cell ids within hex distance k — the
    cover-join expansion: explode this on the SMALL side of a join and
    equi-join the big side on its bare cell id (J5's ring pattern)."""
    res, q, r = hex_res(cell), hex_q(cell), hex_r(cell)
    return F.array(
        *[
            hex_pack(res, q + F.lit(dq).cast("long"), r + F.lit(dr).cast("long"))
            for dq, dr in ring_offsets(k)
        ]
    )


def hex_distance(cell_a: Column, cell_b: Column) -> Column:
    """Hex distance between same-res cells (refinement predicate)."""
    dq = hex_q(cell_a) - hex_q(cell_b)
    dr = hex_r(cell_a) - hex_r(cell_b)
    # the sum is always even; integer-divide to stay a long
    return F.shiftright(F.abs(dq) + F.abs(dr) + F.abs(dq + dr), 1)


def hex_polyfill_convex(polys: "DataFrame", res: int) -> "DataFrame":
    """POLYFILL: all res-``res`` cells whose CENTER lies inside a convex
    world-space polygon (H3's polyfill containment mode), fully native.

    ``polys``: (poly_id, verts array<struct<x:double,y:double>>) —
    CCW-in-world-coords convex rings (project lng/lat vertices with the
    same mercator formula ONCE, driver-side, and embed the doubles —
    then every runtime step here is +,-,* on literals/dyadics, so a SQL
    oracle replays the classification bit-for-bit, no trig ulps).

    Plan shape: the axial (q, r) candidate range comes from the
    polygon's own vertices (convexity puts the extremes at vertices —
    two array_min/max folds), a bounded ``sequence`` × ``sequence``
    double explode generates O(area/cell²) candidates per polygon, and
    the sign-fold center-in-polygon filter runs pre-shuffle.  At scale
    the polygon catalog is the small side; the emitted (poly_id, cell)
    table is the cover-join key set (join the fact table on its bare
    cell id, exactly like the k-ring pattern)."""
    if not 0 <= res <= MAX_RES:
        raise ValueError("res must be 0..24")
    inv = F.lit(2.0 ** (res - 10))
    size = F.lit(2.0 ** (10 - res))
    vx = lambda v: v["x"]  # noqa: E731
    vy = lambda v: v["y"]  # noqa: E731
    qf = lambda v: (vx(v) * F.lit(_A) - vy(v) * F.lit(_B)) * inv  # noqa: E731
    rf = lambda v: (vy(v) * F.lit(_C)) * inv  # noqa: E731
    verts = F.col("verts")
    bounds = polys.select(
        "poly_id",
        "verts",
        (F.floor(F.array_min(F.transform(verts, qf))) - 1).alias("q_lo"),
        (F.floor(F.array_max(F.transform(verts, qf))) + 1).alias("q_hi"),
        (F.floor(F.array_min(F.transform(verts, rf))) - 1).alias("r_lo"),
        (F.floor(F.array_max(F.transform(verts, rf))) + 1).alias("r_hi"),
    )
    cand = bounds.select(
        "poly_id",
        "verts",
        F.explode(F.sequence(F.col("q_lo"), F.col("q_hi"))).alias("q"),
        F.col("r_lo"),
        F.col("r_hi"),
    ).select(
        "poly_id",
        "verts",
        "q",
        F.explode(F.sequence(F.col("r_lo"), F.col("r_hi"))).alias("r"),
    )
    cx = (F.col("q").cast("double") * F.lit(_D) + F.col("r").cast("double") * F.lit(_E)) * size
    cy = F.col("r").cast("double") * F.lit(1.5) * size
    n = F.size(verts)
    # min over edges (v_i -> v_{i+1 mod n}) of the CCW cross product
    mc = F.aggregate(
        F.sequence(F.lit(0), n - 1),
        F.lit(float("inf")),
        lambda acc, i: F.least(
            acc,
            (
                (vx(F.element_at(verts, (i + 1) % n + 1)) - vx(F.element_at(verts, i + 1)))
                * (cy - vy(F.element_at(verts, i + 1)))
                - (vy(F.element_at(verts, (i + 1) % n + 1)) - vy(F.element_at(verts, i + 1)))
                * (cx - vx(F.element_at(verts, i + 1)))
            ),
        ),
    )
    return cand.where(mc >= 0).select(
        "poly_id",
        hex_pack(res, F.col("q"), F.col("r")).alias("cell"),
        "q",
        "r",
    )
