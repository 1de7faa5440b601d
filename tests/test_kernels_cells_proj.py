"""Projection + cell-index kernel tests (D10/D18/D19)."""

import numpy as np

from mvtspark.kernels import cells, proj


def test_mercator_roundtrip():
    """forward(inverse(x)) == x within float tolerance, and vice versa."""
    rng = np.random.default_rng(42)
    lng = rng.uniform(-179.9, 179.9, 500)
    lat = rng.uniform(-84.9, 84.9, 500)
    for zoom in (2, 8, 14):
        tx, ty, px, py = proj.lnglat_to_tile(lng, lat, zoom)
        lng2, lat2 = proj.tile_to_lnglat(px, py, zoom, tx, ty)
        assert np.allclose(lng2, lng, atol=1e-9)
        assert np.allclose(lat2, lat, atol=1e-9)


def test_mercator_reference_golden():
    """Reference formula check (Geometry.cs:71-103): in-tile px (0,0) of
    tile (z=1, x=0, y=0) is lng=-180; px=(extent,extent) of that tile is
    (lng=0, lat=0)."""
    lng, lat = proj.tile_to_lnglat(
        np.array([0.0]), np.array([0.0]), 1, np.array([0]), np.array([0])
    )
    assert np.isclose(lng[0], -180.0)
    lng, lat = proj.tile_to_lnglat(
        np.array([4096.0]), np.array([4096.0]), 1, np.array([0]), np.array([0])
    )
    assert np.isclose(lng[0], 0.0) and np.isclose(lat[0], 0.0, atol=1e-12)


def test_tile_assignment_known_city():
    """NYC (40.7128, -74.0060) at z14 → OSM tile (4823, 6160), computed
    independently via the standard slippy-map asinh formula."""
    import math

    tx, ty, _, _ = proj.lnglat_to_tile(np.array([-74.0060]), np.array([40.7128]), 14)
    ex = int((-74.0060 + 180) / 360 * 2**14)
    ey = int((1 - math.asinh(math.tan(math.radians(40.7128))) / math.pi) / 2 * 2**14)
    assert (tx[0], ty[0]) == (ex, ey) == (4823, 6160)


def test_xyz_cell_roundtrip():
    rng = np.random.default_rng(1)
    lng = rng.uniform(-180, 180, 1000)
    lat = rng.uniform(-85, 85, 1000)
    for zoom in (3, 9, 14):
        c = cells.xyz_cell(lng, lat, zoom)
        z, x, y = cells.xyz_cell_decode(c)
        tx, ty, _, _ = proj.lnglat_to_tile(lng, lat, zoom)
        assert np.array_equal(z, np.full_like(z, zoom))
        assert np.array_equal(x, tx) and np.array_equal(y, ty)


def test_xyz_ring():
    c = cells.xyz_cell(np.array([-74.0]), np.array([40.7]), 14)
    ring0 = cells.xyz_ring(c, 0)
    assert ring0.shape == (1, 1) and ring0[0, 0] == c[0]
    ring1 = cells.xyz_ring(c, 1)
    assert ring1.shape == (1, 9)
    zs, xs, ys = cells.xyz_cell_decode(ring1[0])
    z0, x0, y0 = cells.xyz_cell_decode(c)
    assert np.abs(xs - x0[0]).max() <= 1 and np.abs(ys - y0[0]).max() <= 1
    assert len(set(ring1[0].tolist())) == 9


def test_xyz_ring_wraps_antimeridian():
    c = cells.xyz_cell_from_tile(np.array([0]), np.array([100]), 10)
    ring = cells.xyz_ring(c, 1)
    _, xs, _ = cells.xyz_cell_decode(ring[0])
    assert (xs == 1023).any()  # wrapped to the other side


def test_s2_determinism_and_distinctness():
    rng = np.random.default_rng(3)
    lng = rng.uniform(-180, 180, 2000)
    lat = rng.uniform(-85, 85, 2000)
    c1 = cells.s2_cell_id(lng, lat)
    c2 = cells.s2_cell_id(lng, lat)
    assert np.array_equal(c1, c2)
    assert len(np.unique(c1)) == 2000  # leaf cells distinct for distinct pts
    assert np.all(cells.s2_level(c1) == 30)


def test_s2_parent_hierarchy():
    lng = np.array([-74.0, 2.35, 139.65])
    lat = np.array([40.7, 48.85, 35.67])
    leaf = cells.s2_cell_id(lng, lat, 30)
    for lvl in (0, 5, 10, 20, 29):
        p = cells.s2_parent(leaf, lvl)
        assert np.all(cells.s2_level(p) == lvl)
        # parent at lvl == direct cell computation at lvl
        direct = cells.s2_cell_id(lng, lat, lvl)
        assert np.array_equal(p, direct)
        # hierarchy: deeper parents share the shallower prefix
        p2 = cells.s2_parent(leaf, min(lvl + 1, 30))
        assert np.array_equal(cells.s2_parent(p2, lvl), p)


def test_s2_locality():
    """Nearby points share a coarse ancestor; far points don't."""
    base = cells.s2_cell_id(np.array([-74.0]), np.array([40.7]), 10)
    near = cells.s2_cell_id(np.array([-74.0001]), np.array([40.7001]), 10)
    far = cells.s2_cell_id(np.array([139.65]), np.array([35.67]), 10)
    assert base[0] == near[0]
    assert base[0] != far[0]


def test_s2_faces_cover_globe():
    # six cube faces all reachable
    lng = np.array([0.0, 90.0, 0.0, 180.0, -90.0, 0.0])
    lat = np.array([0.0, 0.0, 90.0, 0.0, 0.0, -90.0])
    ids = np.asarray(cells.s2_cell_id(lng, lat, 0), dtype=np.int64).view(np.uint64)
    faces = (ids >> np.uint64(61)).tolist()
    assert sorted(faces) == [0, 1, 2, 3, 4, 5]
