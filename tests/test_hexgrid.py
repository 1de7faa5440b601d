"""Hex cell index: numpy kernel ↔ native-Column parity + invariants."""

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from mvtspark.kernels import hexgrid as hk


def _grid_points(n=400):
    k = np.arange(n, dtype=np.int64)
    lng = ((k * 137) % 3600) / 10.0 - 179.947
    lat = ((k * 73) % 1600) / 10.0 - 79.947
    return lng, lat


def test_cell_center_reencodes_to_same_cell():
    lng, lat = _grid_points()
    for res in (3, 8, 15, 24):
        cell = hk.hex_cell(lng, lat, res)
        wx, wy = hk.hex_center_world(cell)
        again = hk.hex_cell_world(wx, wy, res)
        np.testing.assert_array_equal(cell, again)


def test_unpack_roundtrip_and_res():
    lng, lat = _grid_points()
    cell = hk.hex_cell(lng, lat, 12)
    res, q, r = hk.hex_unpack(cell)
    assert (res == 12).all()
    np.testing.assert_array_equal(hk.hex_pack(12, q, r), cell)


def test_ring_sizes_and_distances():
    lng, lat = _grid_points(50)
    cell = hk.hex_cell(lng, lat, 9)
    for k in (0, 1, 2, 3):
        ring = hk.hex_ring(cell, k)
        assert ring.shape == (50, 3 * k * k + 3 * k + 1)
        # all distinct per row and all within hex distance k of the center
        for row in range(0, 50, 17):
            cells = ring[row]
            assert len(set(cells.tolist())) == len(cells)
            d = hk.hex_distance(np.full_like(cells, cell[row]), cells)
            assert d.max() == (k if k else 0)
            assert (d >= 0).all()


def test_neighbors_are_distance_one():
    lng, lat = _grid_points(20)
    cell = hk.hex_cell(lng, lat, 9)
    ring1 = hk.hex_ring(cell, 1)
    for row in range(20):
        d = hk.hex_distance(np.full(7, cell[row]), ring1[row])
        assert sorted(d.tolist()) == [0, 1, 1, 1, 1, 1, 1]


def test_cell_size_scales_with_res():
    """Finer res ⇒ more distinct cells over the same points."""
    lng, lat = _grid_points(400)
    n_prev = 0
    for res in (2, 5, 8, 11):
        n = len(np.unique(hk.hex_cell(lng, lat, res)))
        assert n >= n_prev
        n_prev = n
    assert n_prev > 300  # res 11 hexes are far smaller than point spacing


def test_parent_is_coarser_and_near():
    lng, lat = _grid_points()
    child = hk.hex_cell(lng, lat, 10)
    parent = hk.hex_parent(child, 8)
    res, _, _ = hk.hex_unpack(parent)
    assert (res == 8).all()
    # the child's center must lie inside the parent (containment by
    # construction: parent = encode(center(child), 8))
    wx, wy = hk.hex_center_world(child)
    np.testing.assert_array_equal(hk.hex_cell_world(wx, wy, 8), parent)
    # and the parent's center is within ~2 child circumradii
    pwx, pwy = hk.hex_center_world(parent)
    dist = np.hypot(wx - pwx, wy - pwy)
    assert (dist <= 2.0 ** (10 - 8) * 1.2).all()


def test_hex_distance_triangle_inequality():
    lng, lat = _grid_points(60)
    a = hk.hex_cell(lng, lat, 7)
    b = np.roll(a, 1)
    c = np.roll(a, 2)
    dab = hk.hex_distance(a, b)
    dbc = hk.hex_distance(b, c)
    dac = hk.hex_distance(a, c)
    assert (dac <= dab + dbc).all()


def test_spark_native_matches_numpy(spark):
    from mvtspark.functions import hexgrid as hx

    lng, lat = _grid_points(300)
    pdf = [(int(i), float(lng[i]), float(lat[i])) for i in range(300)]
    df = spark.createDataFrame(pdf, "id long, lng double, lat double")
    out = (
        df.select(
            "id",
            hx.hex_cell(F.col("lng"), F.col("lat"), 8).alias("h8"),
            hx.hex_parent(
                hx.hex_cell(F.col("lng"), F.col("lat"), 8), 6
            ).alias("h6p"),
            hx.hex_ring_cells(
                hx.hex_cell(F.col("lng"), F.col("lat"), 8), 1
            ).alias("ring"),
        )
        .orderBy("id")
        .collect()
    )
    h8 = hk.hex_cell(lng, lat, 8)
    h6p = hk.hex_parent(h8, 6)
    ring = hk.hex_ring(h8, 1)
    for row in out:
        i = row["id"]
        assert row["h8"] == int(h8[i])
        assert row["h6p"] == int(h6p[i])
        assert row["ring"] == ring[i].tolist()


def test_spark_hex_distance_matches_numpy(spark):
    from mvtspark.functions import hexgrid as hx

    lng, lat = _grid_points(100)
    a = hk.hex_cell(lng, lat, 6)
    b = np.roll(a, 7)
    df = spark.createDataFrame(
        [(int(x), int(y)) for x, y in zip(a, b)], "a long, b long"
    )
    got = df.select(hx.hex_distance(F.col("a"), F.col("b")).alias("d")).collect()
    want = hk.hex_distance(a, b)
    assert [r["d"] for r in got] == want.tolist()


def test_res_bounds_raise():
    from mvtspark.functions import hexgrid as hx

    with pytest.raises(ValueError):
        hk.hex_cell(np.array([0.0]), np.array([0.0]), 25)
    with pytest.raises(ValueError):
        hx.hex_cell_world(F.lit(0.0), F.lit(0.0), -1)


def test_world_extent_fits_packing():
    """Corners of the world at max res stay inside the 29-bit fields."""
    lng = np.array([-180.0, 180.0, -180.0, 180.0, 0.0])
    lat = np.array([hk.MAX_LAT, hk.MAX_LAT, -hk.MAX_LAT, -hk.MAX_LAT, 0.0])
    cell = hk.hex_cell(lng, lat, hk.MAX_RES)
    res, q, r = hk.hex_unpack(cell)
    assert (res == hk.MAX_RES).all()
    assert (np.abs(q) < (1 << 27)).all() and (np.abs(r) < (1 << 27)).all()
    # and ids decode back
    np.testing.assert_array_equal(hk.hex_pack(hk.MAX_RES, q, r), cell)


def test_polyfill_matches_independent_replica(spark):
    """hex_polyfill_convex vs a pure-Python half-plane replay over the
    same candidate ranges — set equality per fence."""
    import math

    from mvtspark.functions.hexgrid import _A, _B, _C, _D, _E, hex_polyfill_convex
    from mvtspark.operators.geofence import world_fence_verts

    fences = world_fence_verts()
    polys = spark.createDataFrame(
        fences, "poly_id long, verts array<struct<x:double,y:double>>"
    )
    got = {}
    for r in hex_polyfill_convex(polys, res=7).collect():
        got.setdefault(r.poly_id, set()).add((r.q, r.r))
        # packed cell id must round-trip (res 7, bias 2^27)
        assert r.cell == (7 << 58) + ((r.q + (1 << 27)) << 29) + (r.r + (1 << 27))

    inv, size = 0.125, 8.0
    want = {}
    for fid, verts in fences:
        qs = [(x * _A - y * _B) * inv for x, y in verts]
        rs = [(y * _C) * inv for x, y in verts]
        m = len(verts)
        for q in range(math.floor(min(qs)) - 1, math.floor(max(qs)) + 2):
            for r in range(math.floor(min(rs)) - 1, math.floor(max(rs)) + 2):
                cx = (q * _D + r * _E) * size
                cy = (r * 1.5) * size
                mc = min(
                    (verts[(i + 1) % m][0] - verts[i][0]) * (cy - verts[i][1])
                    - (verts[(i + 1) % m][1] - verts[i][1]) * (cx - verts[i][0])
                    for i in range(m)
                )
                if mc >= 0:
                    want.setdefault(fid, set()).add((q, r))
    assert got == want
    assert sum(len(v) for v in got.values()) > 100
