"""Convex geofence membership — exact sign-fold point-in-polygon.

Geofencing (which of a catalog of zones contains each point) is the
broadcast-dim sibling of the tile PIP join (`operators/spatial.py`):
the fence catalog is small by definition (thousands of zones vs 10^12
points), so it broadcasts, and membership is evaluated per (point,
fence) with zero shuffle before the final per-fence aggregate.

For CONVEX fences the containment test needs no ray casting: a point
is inside a CCW convex ring iff every edge's cross product
``(x2-x1)(py-y1) - (y2-y1)(px-x1)`` is >= 0 (boundary counts as
inside — the reference's on-edge convention, clipper.cs PIP).  That
is a pure +,-,* double fold — IEEE-exact, so unlike the trig paths no
rounding discipline is needed and a SQL engine reproduces the
classification bit-for-bit.  The fold runs over a per-fence edge
array with ``F.aggregate`` (codegen, no UDF).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_EDGE_SCHEMA = (
    "fence_id long, edges array<struct<x1:double,y1:double,"
    "x2:double,y2:double>>"
)


def hex_fences(n: int = 12) -> list[tuple[int, list[tuple[float, ...]]]]:
    """Deterministic catalog of ``n`` convex (regular-hexagon) fences.

    Centers/radii derive from the fence id; vertices at ascending
    angles → CCW.  Returns (fence_id, [(x1,y1,x2,y2), ...]) rows whose
    float values are plain Python doubles — embedding the same repr()s
    in SQL reproduces them exactly."""
    out = []
    for i in range(n):
        cx = (i * 53 % 320) - 160 + 0.25
        cy = (i * 29 % 140) - 70 + 0.25
        r = 2.0 + (i % 5)
        verts = [
            (cx + r * math.cos(math.radians(60 * k + 15)),
             cy + r * math.sin(math.radians(60 * k + 15)))
            for k in range(6)
        ]
        edges = [
            (verts[k][0], verts[k][1],
             verts[(k + 1) % 6][0], verts[(k + 1) % 6][1])
            for k in range(6)
        ]
        out.append((i, edges))
    return out


def _min_cross(px, py):
    """Fold: minimum edge cross product; >= 0 ⇔ inside (CCW convex)."""
    return F.aggregate(
        F.col("edges"),
        F.lit(float("inf")),
        lambda acc, e: F.least(
            acc,
            (e["x2"] - e["x1"]) * (py - e["y1"])
            - (e["y2"] - e["y1"]) * (px - e["x1"]),
        ),
    )


def geofence_join(
    points: DataFrame,
    fences: DataFrame,
    x_col: str = "lng",
    y_col: str = "lat",
) -> DataFrame:
    """Tag each point with every convex fence containing it.

    ``fences``: (fence_id, edges array<struct x1,y1,x2,y2>) — CCW
    convex rings; broadcast.  Returns the points' columns + fence_id,
    one row per (point, containing fence)."""
    return (
        points.crossJoin(F.broadcast(fences))
        .where(_min_cross(F.col(x_col), F.col(y_col)) >= 0)
        .drop("edges")
    )


def fence_catalog(spark: SparkSession, n: int = 12) -> DataFrame:
    return spark.createDataFrame(
        [(fid, [tuple(e) for e in edges]) for fid, edges in hex_fences(n)],
        _EDGE_SCHEMA,
    )


def world_fence_verts(n: int = 12) -> list[tuple[int, list[tuple[float, float]]]]:
    """The fence catalog's vertices projected to zoom-0 4096-extent
    mercator world coords, re-oriented CCW IN WORLD SPACE (mercator
    flips Y, so the lng/lat-CCW ring arrives CW).  Projection runs once
    driver-side; downstream consumers (hex polyfill) embed these doubles
    as literals, so no trig runs at query time in either engine."""
    out = []
    for fid, edges in hex_fences(n):
        w = []
        for lng, lat, _, _ in edges:
            wx = (lng + 180.0) / 360.0 * 4096.0
            s = math.sin(math.radians(lat))
            wy = (
                0.5 - math.log((1.0 + s) / (1.0 - s)) / (4.0 * math.pi)
            ) * 4096.0
            w.append((wx, wy))
        m = len(w)
        area2 = sum(
            w[i][0] * w[(i + 1) % m][1] - w[(i + 1) % m][0] * w[i][1]
            for i in range(m)
        )
        if area2 < 0:
            w = w[::-1]
        out.append((fid, w))
    return out
