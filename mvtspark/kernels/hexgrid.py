"""Hexagonal hierarchical cell index, vectorized numpy (north-rule "H3"
side of the H3/S2 pair; complements kernels/cells.py).

From-scratch design over public hex-grid math (axial coordinates +
cube rounding, Red Blob Games "Hexagonal Grids"; hierarchy/k-ring/cover
-join semantics modelled on Uber H3's public API). NOT bit-compatible
with Uber H3 ids — H3's 122-entry icosahedral base-cell table is not
reproduced here; instead the grid lives on the Web-Mercator plane so
every step is exact arithmetic that a SQL oracle can recompute
bit-for-bit (the same reproducibility discipline as xyz_cell).

Layout
------
World frame: zoom-0 Web-Mercator "pixel" coords (wx, wy) in [0, 4096]
(kernels/proj.py formulas). Pointy-top axial grid at resolution
``res`` in 0..24 with circumradius ``size = 2^(10-res)`` world px —
exact powers of two, so the only roundings are the shared mercator
transcendentals and the final cube-round floors.

    qf = (wx*(sqrt(3)/3) - wy*(1/3)) / size        # axial fractional
    rf = (wy*(2/3)) / size
    (q, r) = cube_round(qf, rf)                    # floor(v + 0.5) based
    id = (res << 58) | ((q + 2^27) << 29) | (r + 2^27)

Hierarchy: hexagon grids never nest exactly (true of H3 too); the
parent of a cell at ``parent_res < res`` is the coarser cell containing
this cell's CENTER — deterministic and recomputable:
``parent = encode(center(cell), parent_res)``.

k-ring: all cells within hex distance k — the axial offsets
{(dq,dr): |dq|<=k, |dr|<=k, |dq+dr|<=k}, 3k^2+3k+1 cells. Hex distance
is (|dq| + |dr| + |dq+dr|) / 2.

All functions are pure per-row arithmetic — any executor recomputes
them without shuffle; the Spark layer (functions/hexgrid.py) expresses
the same ops as native Columns so Catalyst codegens them. This numpy
copy is the single-process oracle used by pytest.
"""

from __future__ import annotations

import math

import numpy as np

MAX_RES = 24
_BIAS = 1 << 27
_A = math.sqrt(3.0) / 3.0
_B = 1.0 / 3.0
_C = 2.0 / 3.0
_D = math.sqrt(3.0)
_E = math.sqrt(3.0) / 2.0
MAX_LAT = 85.051128779806589


def world_xy(lng, lat) -> tuple[np.ndarray, np.ndarray]:
    """lat/lng → zoom-0 4096-extent mercator world coords (proj.py math)."""
    lng = np.clip(np.asarray(lng, dtype=np.float64), -180.0, 180.0)
    lat = np.clip(np.asarray(lat, dtype=np.float64), -MAX_LAT, MAX_LAT)
    wx = (lng + 180.0) / 360.0 * 4096.0
    s = np.sin(np.radians(lat))
    wy = (0.5 - np.log((1.0 + s) / (1.0 - s)) / (4.0 * np.pi)) * 4096.0
    return wx, wy


def _axial_frac(wx, wy, res: int) -> tuple[np.ndarray, np.ndarray]:
    inv = 2.0 ** (res - 10)  # 1/size, exact power of two
    qf = (wx * _A - wy * _B) * inv
    rf = (wy * _C) * inv
    return qf, rf


def _cube_round(qf, rf) -> tuple[np.ndarray, np.ndarray]:
    """Round fractional axial to the containing hex (round-half-up via
    floor(v+0.5) — identical in numpy, Spark and DuckDB)."""
    rx = np.floor(qf + 0.5)
    rz = np.floor(rf + 0.5)
    yf = -qf - rf
    ry = np.floor(yf + 0.5)
    dx = np.abs(rx - qf)
    dy = np.abs(ry - yf)
    dz = np.abs(rz - rf)
    use_x = (dx > dy) & (dx > dz)
    use_z = ~use_x & ~(dy > dz)
    q = np.where(use_x, -ry - rz, rx)
    r = np.where(use_z, -rx - ry, rz)
    return q.astype(np.int64), r.astype(np.int64)


def hex_pack(res: int, q: np.ndarray, r: np.ndarray) -> np.ndarray:
    return (
        (np.int64(res) << np.int64(58))
        + ((np.asarray(q, dtype=np.int64) + _BIAS) << np.int64(29))
        + (np.asarray(r, dtype=np.int64) + _BIAS)
    )


def hex_unpack(cell) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    c = np.asarray(cell, dtype=np.int64)
    res = c >> np.int64(58)
    q = ((c >> np.int64(29)) & np.int64((1 << 29) - 1)) - _BIAS
    r = (c & np.int64((1 << 29) - 1)) - _BIAS
    return res, q, r


def hex_cell(lng, lat, res: int) -> np.ndarray:
    """lat/lng → packed hex cell id at ``res``."""
    if not 0 <= res <= MAX_RES:
        raise ValueError("res must be 0..24")
    wx, wy = world_xy(lng, lat)
    return hex_cell_world(wx, wy, res)


def hex_cell_world(wx, wy, res: int) -> np.ndarray:
    qf, rf = _axial_frac(wx, wy, res)
    q, r = _cube_round(qf, rf)
    return hex_pack(res, q, r)


def hex_center_world(cell) -> tuple[np.ndarray, np.ndarray]:
    """Cell → its center in world coords (exact axial-to-pixel)."""
    res, q, r = hex_unpack(cell)
    size = np.exp2(10.0 - res.astype(np.float64))
    qd = q.astype(np.float64)
    rd = r.astype(np.float64)
    wx = (qd * _D + rd * _E) * size
    wy = (rd * 1.5) * size
    return wx, wy


def hex_parent(cell, parent_res: int) -> np.ndarray:
    """Coarser cell containing this cell's center (centroid hierarchy —
    hex grids never nest exactly, matching H3's containment model)."""
    wx, wy = hex_center_world(cell)
    return hex_cell_world(wx, wy, parent_res)


def hex_distance(cell_a, cell_b) -> np.ndarray:
    """Hex (cube) distance between same-resolution cells."""
    _, qa, ra = hex_unpack(cell_a)
    _, qb, rb = hex_unpack(cell_b)
    dq = qa - qb
    dr = ra - rb
    return (np.abs(dq) + np.abs(dr) + np.abs(dq + dr)) // 2


def ring_offsets(k: int) -> list[tuple[int, int]]:
    """Axial offsets of the k-ring disk: 3k^2+3k+1 cells."""
    return [
        (dq, dr)
        for dq in range(-k, k + 1)
        for dr in range(-k, k + 1)
        if abs(dq + dr) <= k
    ]


def hex_ring(cell, k: int) -> np.ndarray:
    """All cells within hex distance k of each input: shape (n, 3k^2+3k+1)."""
    res, q, r = hex_unpack(cell)
    offs = np.array(ring_offsets(k), dtype=np.int64)
    nq = q[:, None] + offs[None, :, 0]
    nr = r[:, None] + offs[None, :, 1]
    return (
        (res[:, None] << np.int64(58))
        + ((nq + _BIAS) << np.int64(29))
        + (nr + _BIAS)
    )
