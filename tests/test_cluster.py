"""Grid-DBSCAN: hand-built blobs, diagonal adjacency, singleton cells."""

from mvtspark.operators.cluster import _MUL, _OFF, grid_dbscan


def _pts(spark, coords):
    return spark.createDataFrame(
        [(float(x), float(y)) for x, y in coords], "lng double, lat double"
    )


def _key(cx, cy):
    return (cx + _OFF) * _MUL + (cy + _OFF)


def test_two_blobs_and_noise(spark):
    # blob A: cells (0,0),(1,0) dense; blob B: cell (5,5) dense;
    # noise: 2 points in cell (3,3) (< min_pts)
    coords = (
        [(0.1 + i * 0.01, 0.1) for i in range(3)]
        + [(1.1 + i * 0.01, 0.1) for i in range(3)]
        + [(5.5, 5.5), (5.6, 5.6), (5.4, 5.4)]
        + [(3.5, 3.5), (3.6, 3.6)]
    )
    out = {
        (r.cx, r.cy): r
        for r in grid_dbscan(
            _pts(spark, coords), cell_size=1.0, min_pts=3
        ).collect()
    }
    assert set(out) == {(0, 0), (1, 0), (5, 5)}  # noise cell dropped
    a0, a1, b = out[(0, 0)], out[(1, 0)], out[(5, 5)]
    assert a0.cluster_id == a1.cluster_id == _key(0, 0)
    assert a0.cluster_cells == 2
    assert b.cluster_id == _key(5, 5) and b.cluster_cells == 1
    assert a0.n_points == 3


def test_diagonal_cells_connect(spark):
    coords = [(0.5, 0.5)] * 3 + [(1.5, 1.5)] * 3 + [(2.5, 2.5)] * 3
    rows = grid_dbscan(_pts(spark, coords), cell_size=1.0, min_pts=3).collect()
    assert len({r.cluster_id for r in rows}) == 1
    assert all(r.cluster_cells == 3 for r in rows)


def test_negative_coordinates_pack_correctly(spark):
    coords = [(-0.5, -0.5)] * 3 + [(-1.5, -0.5)] * 3
    rows = grid_dbscan(_pts(spark, coords), cell_size=1.0, min_pts=3).collect()
    assert {(r.cx, r.cy) for r in rows} == {(-1, -1), (-2, -1)}
    assert len({r.cluster_id for r in rows}) == 1
    assert rows[0].cluster_id == _key(-2, -1)
