"""Nearest-segment snap (operators/snap.py): brute-force parity,
radius gating, degenerate segments, and the no-cross-join plan."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from mvtspark.operators.snap import snap_to_segments

R = 50.0


def _brute(points, segments, radius):
    want = {}
    for pid, px, py in points:
        best = None
        for sid, ax, ay, bx, by in segments:
            dx, dy = bx - ax, by - ay
            len2 = dx * dx + dy * dy
            t_raw = ((px - ax) * dx + (py - ay) * dy) / (len2 or 1.0)
            t = min(1.0, max(0.0, t_raw))
            ex, ey = px - (ax + t * dx), py - (ay + t * dy)
            d2s = round((ex * ex + ey * ey) * 10_000)
            if d2s <= radius * radius * 10_000:
                key = (d2s, sid)
                if best is None or key < best:
                    best = key
        if best is not None:
            want[pid] = (best[1], best[0])
    return want


@pytest.fixture()
def world(spark):
    rng = np.random.default_rng(7)
    segs = []
    for i in range(60):
        ax, ay = rng.uniform(0, 2000, 2)
        if i == 0:
            bx, by = ax, ay  # degenerate: a point-segment
        else:
            bx = ax + rng.uniform(-300, 300)
            by = ay + rng.uniform(-300, 300)
        segs.append((i, float(ax), float(ay), float(bx), float(by)))
    pts = [
        (p, float(x), float(y))
        for p, (x, y) in enumerate(rng.uniform(0, 2000, (500, 2)))
    ]
    sdf = spark.createDataFrame(
        segs, "seg_id int, ax double, ay double, bx double, by double"
    )
    pdf = spark.createDataFrame(pts, "point_id long, px double, py double")
    return pts, segs, pdf, sdf


def test_matches_brute_force(world, spark):
    pts, segs, pdf, sdf = world
    got = {
        r.point_id: (r.seg_id, r.dist2_x10k)
        for r in snap_to_segments(pdf, sdf, R).collect()
    }
    assert got == _brute(pts, segs, R)
    assert 0 < len(got) < len(pts)  # radius really gates


def test_degenerate_segment_snaps_points(world, spark):
    pts, segs, pdf, sdf = world
    # a point ON the degenerate segment must snap to it at distance 0
    _, ax, ay, _, _ = segs[0]
    extra = spark.createDataFrame(
        [(9999, ax, ay)], "point_id long, px double, py double"
    )
    out = {r.point_id: r for r in snap_to_segments(extra, sdf, R).collect()}
    assert out[9999].seg_id == 0 and out[9999].dist2_x10k == 0


def test_no_cross_join_in_plan(world):
    _, _, pdf, sdf = world
    plan = (
        snap_to_segments(pdf, sdf, R)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "BroadcastHashJoin" in plan  # cell equi-join on the dim
    assert "HashAggregate" in plan  # packed argmin with partials

def test_rounding_slack_boundary_pair_not_missed(spark):
    """A point at true distance just OVER the radius still passes the
    ROUNDED gate (round(d2*1e4) <= r2*1e4); the cell cover must be
    inflated by that rounding slack or the brute-force oracle returns a
    pair the engine's cell join never sees. Constructed so the point's
    cell sits one row beyond the radius-only cover: segment at
    y = 0.499975, point at y = 1.0, radius 0.5 → dist = 0.500025,
    d2s = round(2500.25) = 2500 <= 2500, point cell_y = 2 while
    floor((ay + r)/cell) = 1."""
    sdf = spark.createDataFrame(
        [(0, 0.0, 0.499975, 1.0, 0.499975)],
        "seg_id int, ax double, ay double, bx double, by double",
    )
    pdf = spark.createDataFrame(
        [(1, 0.5, 1.0)], "point_id long, px double, py double"
    )
    r = 0.5
    got = {
        p.point_id: (p.seg_id, p.dist2_x10k)
        for p in snap_to_segments(pdf, sdf, r).collect()
    }
    want = _brute([(1, 0.5, 1.0)], [(0, 0.0, 0.499975, 1.0, 0.499975)], r)
    assert want == {1: (0, 2500)}  # the oracle admits the pair...
    assert got == want  # ...so the engine must too


def _brute_topk(points, segments, radius, k):
    want = {}
    for pid, px, py in points:
        cands = []
        for sid, ax, ay, bx, by in segments:
            dx, dy = bx - ax, by - ay
            len2 = dx * dx + dy * dy
            t_raw = ((px - ax) * dx + (py - ay) * dy) / (len2 or 1.0)
            t = min(1.0, max(0.0, t_raw))
            ex, ey = px - (ax + t * dx), py - (ay + t * dy)
            d2s = round((ex * ex + ey * ey) * 10_000)
            if d2s <= radius * radius * 10_000:
                cands.append((d2s, sid))
        for rank, (d2s, sid) in enumerate(sorted(cands)[:k], 1):
            want[(pid, rank)] = (sid, d2s)
    return want


def test_topk_matches_brute_force_and_agrees_with_argmin(world, spark):
    from mvtspark.operators.snap import snap_topk_segments

    pts, segs, pdf, sdf = world
    K = 3
    got = {
        (r.point_id, r.rank): (r.seg_id, r.dist2_x10k)
        for r in snap_topk_segments(pdf, sdf, R, K).collect()
    }
    assert got == _brute_topk(pts, segs, R, K)
    # rank 1 == the argmin snap's winner, point for point
    rank1 = {p: v for (p, rk), v in got.items() if rk == 1}
    argmin = {
        r.point_id: (r.seg_id, r.dist2_x10k)
        for r in snap_to_segments(pdf, sdf, R).collect()
    }
    assert rank1 == argmin
    # some point really has K candidates (corpus isn't degenerate)
    assert any(rk == K for (_, rk) in got)


def test_topk_plan_no_cross_join_with_group_limit(world):
    from mvtspark.operators.snap import snap_topk_segments

    _, _, pdf, sdf = world
    plan = (
        snap_topk_segments(pdf, sdf, R, 3)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "BroadcastHashJoin" in plan
    assert "WindowGroupLimit" in plan  # partial top-k before the shuffle
