"""Web Mercator projection kernels (both directions), vectorized numpy.

- tile_px → lat/lng (inverse):  ref src/Geometry/Geometry.cs:71-103
  (``ToLngLat``): given (zoom, tile_x, tile_y, extent) and in-tile pixel,
    size = extent * 2^zoom
    lng  = (px + tile_x*extent) * 360 / size - 180
    lat  = 360/pi * atan(exp((180 - (py + tile_y*extent)*360/size) * pi/180)) - 90
- lat/lng → tile (z,x,y) + in-tile px (forward; D19 in SURVEY §2.8):
  exact algebraic inverse of the above.

Bounds: ±180 lng, ±85.051128779806589 lat (ref: Geometry.cs:92-101).
Pure column math — the Spark layer re-expresses these with native
``pyspark.sql.functions`` so Catalyst codegens them; this numpy copy is
the single-process oracle used by tests.
"""

from __future__ import annotations

import numpy as np

MAX_LAT = 85.051128779806589  # ref: Geometry.cs bounds check
MAX_LNG = 180.0


def tile_to_lnglat(
    px: np.ndarray,
    py: np.ndarray,
    zoom: int,
    tile_x: np.ndarray,
    tile_y: np.ndarray,
    extent: int = 4096,
) -> tuple[np.ndarray, np.ndarray]:
    """Inverse Web Mercator. ref: src/Geometry/Geometry.cs:71-103.
    ``extent`` may be a scalar or a per-vertex array."""
    extent = np.asarray(extent, dtype=np.float64)
    size = extent * (2.0 ** zoom)
    x0 = np.asarray(tile_x, dtype=np.float64) * extent
    y0 = np.asarray(tile_y, dtype=np.float64) * extent
    lng = (np.asarray(px, dtype=np.float64) + x0) * 360.0 / size - 180.0
    g = (180.0 - (np.asarray(py, dtype=np.float64) + y0) * 360.0 / size) * np.pi / 180.0
    lat = 360.0 / np.pi * np.arctan(np.exp(g)) - 90.0
    return lng, lat


def lnglat_to_tile(
    lng: np.ndarray, lat: np.ndarray, zoom: int, extent: int = 4096
) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Forward Web Mercator → (tile_x, tile_y, in-tile px, py).

    Exact algebraic inverse of tile_to_lnglat; global pixel coords are
    computed in float64 then split into tile index + in-tile offset.
    """
    lng = np.clip(np.asarray(lng, dtype=np.float64), -MAX_LNG, MAX_LNG)
    lat = np.clip(np.asarray(lat, dtype=np.float64), -MAX_LAT, MAX_LAT)
    size = float(extent) * (2.0 ** zoom)
    gx = (lng + 180.0) / 360.0 * size
    s = np.sin(lat * np.pi / 180.0)
    gy = (0.5 - np.log((1.0 + s) / (1.0 - s)) / (4.0 * np.pi)) * size
    n_tiles = 2 ** zoom
    tx = np.clip(np.floor(gx / extent).astype(np.int64), 0, n_tiles - 1)
    ty = np.clip(np.floor(gy / extent).astype(np.int64), 0, n_tiles - 1)
    px = gx - tx * extent
    py = gy - ty * extent
    return tx, ty, px, py
