"""Hierarchical spatial cell indexes, vectorized numpy (D18 in SURVEY §2.8).

Two from-scratch indexes (no h3/s2sphere wheels in this environment;
both built from published public math):

1. **S2 cell ids** — the standard S2 geometry scheme
   (s2geometry.io/devguide/s2cell_hierarchy): lat/lng → unit XYZ →
   cube face + (u,v) → quadratic (s,t) → leaf (i,j) → Hilbert-curve
   position → 64-bit cell id ``face(3b) | curve_pos(2*30b) | 1``.
   ``s2_parent`` truncates to any level 0..30. Vectorized: the Hilbert
   walk is a fixed 30-iteration loop of numpy ops (no per-point Python).

2. **XYZ / quadkey cells** — Web-Mercator tile grid at a zoom packed as
   ``zoom(5b) | morton(x,y)``; hierarchy = drop 2 morton bits per level.
   Cheaper and exactly aligned with the tiling grid — the engine's
   default join key (same semantics as H3's cover-join usage: equi-join
   on cell, ring expansion for kNN).

Both are deterministic pure functions of (lat, lng, level) — any
executor can recompute them without shuffle.
"""

from __future__ import annotations

import numpy as np

from .proj import lnglat_to_tile

S2_MAX_LEVEL = 30

# Hilbert lookup tables (public S2 constants)
_SWAP = 1
_INVERT = 2
# kIJtoPos[orientation][ij] — ij = (i_bit << 1) | j_bit
_IJ_TO_POS = np.array(
    [[0, 1, 3, 2], [0, 3, 1, 2], [2, 3, 1, 0], [2, 1, 3, 0]], dtype=np.uint64
)
# kPosToOrientation[pos]
_POS_TO_ORIENT = np.array([_SWAP, 0, 0, _INVERT | _SWAP], dtype=np.uint64)


def _lnglat_to_xyz(lng: np.ndarray, lat: np.ndarray):
    phi = np.radians(np.asarray(lat, dtype=np.float64))
    theta = np.radians(np.asarray(lng, dtype=np.float64))
    cosphi = np.cos(phi)
    return cosphi * np.cos(theta), cosphi * np.sin(theta), np.sin(phi)


def _xyz_to_face_uv(x, y, z):
    ax, ay, az = np.abs(x), np.abs(y), np.abs(z)
    face = np.where(ax >= ay, np.where(ax >= az, 0, 2), np.where(ay >= az, 1, 2))
    face = face + np.where(
        np.choose(face, [x, y, z]) < 0, 3, 0
    )  # negative axes → faces 3,4,5
    # u,v per face (standard S2 face layout)
    u = np.empty_like(x)
    v = np.empty_like(x)
    for f, (ue, ve, de) in enumerate(
        [
            (lambda: y / x, lambda: z / x, None),     # face 0: +x
            (lambda: -x / y, lambda: z / y, None),    # face 1: +y
            (lambda: -x / z, lambda: -y / z, None),   # face 2: +z
            (lambda: z / x, lambda: y / x, None),     # face 3: -x
            (lambda: z / y, lambda: -x / y, None),    # face 4: -y
            (lambda: -y / z, lambda: -x / z, None),   # face 5: -z
        ]
    ):
        m = face == f
        if m.any():
            with np.errstate(divide="ignore", invalid="ignore"):
                u[m] = ue()[m]
                v[m] = ve()[m]
    return face.astype(np.uint64), u, v


def _st_from_uv(u):
    """Quadratic projection (S2's default)."""
    pos = np.sqrt(np.maximum(1.0 + 3.0 * u, 0.0))
    neg = np.sqrt(np.maximum(1.0 - 3.0 * u, 0.0))
    return np.where(u >= 0, 0.5 * pos, 1.0 - 0.5 * neg)


def s2_cell_id(lng, lat, level: int = S2_MAX_LEVEL) -> np.ndarray:
    """lat/lng → S2 cell id at ``level`` (uint64 returned as int64 view).

    Vectorized Hilbert traversal: 30 numpy iterations over all points.
    """
    if not 0 <= level <= S2_MAX_LEVEL:
        raise ValueError("level must be 0..30")
    x, y, z = _lnglat_to_xyz(lng, lat)
    face, u, v = _xyz_to_face_uv(x, y, z)
    s = _st_from_uv(u)
    t = _st_from_uv(v)
    max_size = np.uint64(1) << np.uint64(S2_MAX_LEVEL)
    i = np.clip((np.floor(s * float(max_size))).astype(np.int64), 0, int(max_size) - 1).astype(np.uint64)
    j = np.clip((np.floor(t * float(max_size))).astype(np.int64), 0, int(max_size) - 1).astype(np.uint64)

    # Hilbert: MSB-first walk, orientation state per point.
    pos = np.zeros(face.shape, dtype=np.uint64)
    orient = face & np.uint64(_SWAP)
    for k in range(S2_MAX_LEVEL - 1, -1, -1):
        bi = (i >> np.uint64(k)) & np.uint64(1)
        bj = (j >> np.uint64(k)) & np.uint64(1)
        ij = (bi << np.uint64(1)) | bj
        p = _IJ_TO_POS[orient.astype(np.int64), ij.astype(np.int64)]
        pos = (pos << np.uint64(2)) | p
        orient = orient ^ _POS_TO_ORIENT[p.astype(np.int64)]

    cell = (face << np.uint64(2 * S2_MAX_LEVEL + 1)) | (pos << np.uint64(1)) | np.uint64(1)
    if level < S2_MAX_LEVEL:
        cell = s2_parent(cell.view(np.int64), level).view(np.uint64)
    return cell.view(np.int64)


def s2_parent(cell_id: np.ndarray, level: int) -> np.ndarray:
    """Truncate a cell id to an ancestor level (standard lsb trick)."""
    c = np.asarray(cell_id, dtype=np.int64).view(np.uint64)
    new_lsb = np.uint64(1) << np.uint64(2 * (S2_MAX_LEVEL - level))
    parent = (c & ~(new_lsb - np.uint64(1))) | new_lsb
    return parent.view(np.int64)


def s2_level(cell_id: np.ndarray) -> np.ndarray:
    """Level from trailing-one position."""
    c = np.asarray(cell_id, dtype=np.int64).view(np.uint64)
    lsb = c & (~c + np.uint64(1))
    # log2(lsb) via float is exact for powers of two < 2^53; handle big via shifts
    lvl = np.zeros(c.shape, dtype=np.int64)
    x = lsb.copy()
    for shift in (32, 16, 8, 4, 2, 1):
        m = x >= (np.uint64(1) << np.uint64(shift))
        lvl[m] += shift
        x[m] >>= np.uint64(shift)
    return S2_MAX_LEVEL - lvl // 2


# ---------------------------------------------------------------------------
# XYZ / morton quadkey cells — the engine's grid-aligned default
# ---------------------------------------------------------------------------

def _interleave_bits(x: np.ndarray, y: np.ndarray) -> np.ndarray:
    """Morton code: spread 32-bit ints to even/odd bit positions (uint64)."""
    def spread(v):
        v = v.astype(np.uint64)
        v = (v | (v << np.uint64(16))) & np.uint64(0x0000FFFF0000FFFF)
        v = (v | (v << np.uint64(8))) & np.uint64(0x00FF00FF00FF00FF)
        v = (v | (v << np.uint64(4))) & np.uint64(0x0F0F0F0F0F0F0F0F)
        v = (v | (v << np.uint64(2))) & np.uint64(0x3333333333333333)
        v = (v | (v << np.uint64(1))) & np.uint64(0x5555555555555555)
        return v
    return spread(np.asarray(x)) | (spread(np.asarray(y)) << np.uint64(1))


def xyz_cell(lng, lat, zoom: int) -> np.ndarray:
    """lat/lng → packed tile-grid cell ``(zoom << 58) | morton(x, y)``.

    Alignment with the MVT tiling grid means a cover-join on this key is
    exactly the tile assignment (no refinement needed for whole tiles);
    PIP refinement only runs for sub-tile polygons.
    """
    tx, ty, _, _ = lnglat_to_tile(lng, lat, zoom)
    m = _interleave_bits(tx.astype(np.uint64), ty.astype(np.uint64))
    return ((np.uint64(zoom) << np.uint64(58)) | m).view(np.int64)


def xyz_cell_from_tile(tx: np.ndarray, ty: np.ndarray, zoom: int) -> np.ndarray:
    m = _interleave_bits(
        np.asarray(tx, dtype=np.uint64), np.asarray(ty, dtype=np.uint64)
    )
    return ((np.uint64(zoom) << np.uint64(58)) | m).view(np.int64)


def xyz_cell_decode(cell) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """cell → (zoom, x, y)."""
    c = np.asarray(cell, dtype=np.int64).view(np.uint64)
    zoom = (c >> np.uint64(58)).astype(np.int64)
    m = c & ((np.uint64(1) << np.uint64(58)) - np.uint64(1))

    def unspread(v):
        v = v & np.uint64(0x5555555555555555)
        v = (v | (v >> np.uint64(1))) & np.uint64(0x3333333333333333)
        v = (v | (v >> np.uint64(2))) & np.uint64(0x0F0F0F0F0F0F0F0F)
        v = (v | (v >> np.uint64(4))) & np.uint64(0x00FF00FF00FF00FF)
        v = (v | (v >> np.uint64(8))) & np.uint64(0x0000FFFF0000FFFF)
        v = (v | (v >> np.uint64(16))) & np.uint64(0x00000000FFFFFFFF)
        return v.astype(np.int64)

    return zoom, unspread(m), unspread(m >> np.uint64(1))


def xyz_ring(cell: np.ndarray, radius: int) -> np.ndarray:
    """All cells within Chebyshev distance ``radius`` of each input cell
    (the k-ring neighborhood used by the kNN ring-expansion join, J5).

    Returns shape (n, (2r+1)^2) int64; out-of-grid neighbors are -1.
    """
    zoom, x, y = xyz_cell_decode(cell)
    n_tiles = (np.int64(1) << zoom.astype(np.int64))
    side = 2 * radius + 1
    offs = np.arange(-radius, radius + 1, dtype=np.int64)
    ox, oy = np.meshgrid(offs, offs, indexing="ij")
    nx = x[:, None] + ox.ravel()[None, :]
    ny = y[:, None] + oy.ravel()[None, :]
    # wrap x around the antimeridian; clamp y
    nx = np.mod(nx, n_tiles[:, None])
    valid = (ny >= 0) & (ny < n_tiles[:, None])
    out = np.full((cell.shape[0] if hasattr(cell, "shape") else len(cell), side * side), -1, dtype=np.int64)
    for z in np.unique(zoom):
        rows = zoom == z
        vals = xyz_cell_from_tile(
            nx[rows].ravel(), np.clip(ny[rows], 0, None).ravel(), int(z)
        ).reshape(-1, side * side)
        out[rows] = np.where(valid[rows], vals, -1)
    return out
