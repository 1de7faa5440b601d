"""Convex geofence PIP: independent ray-cast parity, edge convention."""

import math

from mvtspark.operators.geofence import fence_catalog, geofence_join, hex_fences


def _ray_cast_inside(px, py, edges):
    """Independent classic even-odd ray casting (no cross-product reuse)."""
    n = 0
    for x1, y1, x2, y2 in edges:
        if (y1 > py) != (y2 > py):
            xint = x1 + (py - y1) * (x2 - x1) / (y2 - y1)
            if xint > px:
                n += 1
    return n % 2 == 1


def test_matches_independent_ray_cast(spark):
    fences = hex_fences()
    # probe grid around each fence center (strictly off edges)
    pts = []
    for fid, edges in fences:
        cx = sum(e[0] for e in edges) / 6
        cy = sum(e[1] for e in edges) / 6
        for dx in (-7.01, -1.01, 0.013, 1.01, 7.01):
            for dy in (-7.01, -0.99, 0.017, 0.99, 7.01):
                pts.append((len(pts), cx + dx, cy + dy))
    df = spark.createDataFrame(pts, "pid long, lng double, lat double")
    got = {
        (r.pid, r.fence_id)
        for r in geofence_join(df, fence_catalog(spark)).collect()
    }
    want = {
        (pid, fid)
        for pid, px, py in pts
        for fid, edges in fences
        if _ray_cast_inside(px, py, edges)
    }
    assert got == want and len(want) > 50


def test_center_inside_all_vertices_on_boundary(spark):
    fences = hex_fences(3)
    rows = []
    for fid, edges in fences:
        cx = sum(e[0] for e in edges) / 6
        cy = sum(e[1] for e in edges) / 6
        rows.append((fid * 10, cx, cy))          # center: inside
        rows.append((fid * 10 + 1, edges[0][0], edges[0][1]))  # vertex
    df = spark.createDataFrame(rows, "pid long, lng double, lat double")
    got = {
        (r.pid, r.fence_id)
        for r in geofence_join(df, fence_catalog(spark, 3)).collect()
    }
    for fid, edges in fences:
        assert (fid * 10, fid) in got
        # closed-boundary convention: a vertex counts as inside
        assert (fid * 10 + 1, fid) in got


def test_ccw_orientation_of_catalog():
    for _, edges in hex_fences():
        area2 = sum(x1 * y2 - x2 * y1 for x1, y1, x2, y2 in edges)
        assert area2 > 0  # CCW shoelace
