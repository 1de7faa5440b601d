"""Seeded-random parity for the PBSM overlap join and grid-DBSCAN
against naive Python references (the Spark-level analog of the
Hypothesis kernel suites — a few seeded corpora, full-result equality,
cell-size invariance)."""

import random

import pytest

from mvtspark.operators.cluster import grid_dbscan
from mvtspark.operators.overlap import bbox_overlap_join


def _rand_rects(rng, n, span=5000, maxw=600):
    out = []
    for i in range(n):
        x0 = rng.randrange(-span, span)
        y0 = rng.randrange(-span, span)
        out.append((i, x0, y0, x0 + rng.randrange(1, maxw), y0 + rng.randrange(1, maxw)))
    return out


def _naive_overlaps(a_rects, b_rects):
    out = set()
    for aid, ax0, ay0, ax1, ay1 in a_rects:
        for bid, bx0, by0, bx1, by1 in b_rects:
            if ax0 <= bx1 and bx0 <= ax1 and ay0 <= by1 and by0 <= ay1:
                out.add((aid, bid, max(ax0, bx0), max(ay0, by0),
                         min(ax1, bx1), min(ay1, by1)))
    return out


@pytest.mark.parametrize("seed,cell", [(1, 256), (2, 1024), (3, 77)])
def test_overlap_join_matches_naive_any_cell_size(spark, seed, cell):
    rng = random.Random(seed)
    a = _rand_rects(rng, 150)
    b = _rand_rects(rng, 150)
    df_a = spark.createDataFrame(
        a, "a_id long, a_xmin long, a_ymin long, a_xmax long, a_ymax long"
    )
    df_b = spark.createDataFrame(
        b, "b_id long, b_xmin long, b_ymin long, b_xmax long, b_ymax long"
    )
    got = bbox_overlap_join(df_a, df_b, cell=cell).collect()
    got_set = {tuple(r) for r in got}
    assert len(got) == len(got_set)  # corner rule: exactly-once emission
    assert got_set == _naive_overlaps(a, b)


def _naive_dbscan(points, cell_size, min_pts):
    from collections import Counter, deque

    import math

    cells = Counter(
        (math.floor(x / cell_size), math.floor(y / cell_size))
        for x, y in points
    )
    dense = {c for c, n in cells.items() if n >= min_pts}
    seen, clusters = set(), []
    for c in dense:
        if c in seen:
            continue
        comp, dq = set(), deque([c])
        seen.add(c)
        while dq:
            cx, cy = dq.popleft()
            comp.add((cx, cy))
            for dx in (-1, 0, 1):
                for dy in (-1, 0, 1):
                    nb = (cx + dx, cy + dy)
                    if nb in dense and nb not in seen:
                        seen.add(nb)
                        dq.append(nb)
        clusters.append(comp)
    return cells, dense, clusters


@pytest.mark.parametrize("seed", [11, 12])
def test_grid_dbscan_matches_naive_bfs(spark, seed):
    rng = random.Random(seed)
    # clustered blobs + uniform noise
    pts = []
    for _ in range(30):
        cx, cy = rng.uniform(-50, 50), rng.uniform(-50, 50)
        pts += [
            (cx + rng.uniform(-1.5, 1.5), cy + rng.uniform(-1.5, 1.5))
            for _ in range(rng.randrange(2, 10))
        ]
    pts += [(rng.uniform(-60, 60), rng.uniform(-60, 60)) for _ in range(80)]
    df = spark.createDataFrame(pts, "lng double, lat double")
    rows = grid_dbscan(df, cell_size=2.0, min_pts=3).collect()
    cells, dense, clusters = _naive_dbscan(pts, 2.0, 3)
    assert {(r.cx, r.cy) for r in rows} == dense
    got_partition = {
        frozenset((rr.cx, rr.cy) for rr in rows if rr.cluster_id == cid)
        for cid in {r.cluster_id for r in rows}
    }
    assert got_partition == {frozenset(c) for c in clusters}
    for r in rows:
        assert r.n_points == cells[(r.cx, r.cy)]
        assert r.cluster_cells == len(
            next(c for c in clusters if (r.cx, r.cy) in c)
        )
