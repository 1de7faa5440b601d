"""Raster ↔ vector conversion (north-rule "raster↔vector" capability).

Rasterize: point features → per-tile density grids (a real raster
artifact: a G×G little-endian uint32 count grid in a BINARY column),
one shuffle on the tile key, whole-batch numpy inside the grouped map.
Vectorize: grids → vector features back out — nonzero pixels, and
run-length rectangle extraction (gaps-and-islands per grid row) with
tile-frame pixel bounds ready for the MVT encoder.

Scale shape: the only shuffle is the groupBy on (zoom, x, y) — the same
partitioning the encode/decode pipeline already uses, so rasterization
co-locates with tiling for free. Grids are bounded (G*G*4 bytes, 16 KiB
at G=64) regardless of input row count, so executor memory is stable at
any scale; the vectorize side is mapInPandas over whole batches of
grids (3-D numpy ops, no per-row Python).

The tile/pixel assignment is the engine's shared mercator math
(functions/native.py), so a DuckDB oracle recomputes every pixel count
and rectangle relationally — both directions are hash-gated.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions import native


def rasterize_points(
    pts: DataFrame, zoom: int, grid: int = 64, extent: int = 4096
) -> DataFrame:
    """(lng, lat) points → one row per non-empty tile:
    (zoom, x, y, grid binary, n_points).

    The grid is row-major uint32 little-endian, cell (gy, gx) counts
    points whose in-tile pixel falls in that G×G bucket.
    """
    cell_px = extent // grid
    assert cell_px * grid == extent, "grid must divide extent"
    g = grid

    keyed = pts.select(
        F.lit(zoom).alias("zoom"),
        native.tile_x(F.col("lng"), F.col("lat"), zoom, extent).alias("x"),
        native.tile_y(F.col("lng"), F.col("lat"), zoom, extent).alias("y"),
        native.tile_px(F.col("lng"), F.col("lat"), zoom, extent).alias("px"),
        native.tile_py(F.col("lng"), F.col("lat"), zoom, extent).alias("py"),
    )

    def _build(pdf):
        import numpy as np
        import pandas as pd

        gx = np.clip(
            np.floor(pdf["px"].to_numpy() / cell_px).astype(np.int64), 0, g - 1
        )
        gy = np.clip(
            np.floor(pdf["py"].to_numpy() / cell_px).astype(np.int64), 0, g - 1
        )
        counts = np.bincount(gy * g + gx, minlength=g * g).astype("<u4")
        return pd.DataFrame(
            {
                "zoom": [int(pdf["zoom"].iloc[0])],
                "x": [int(pdf["x"].iloc[0])],
                "y": [int(pdf["y"].iloc[0])],
                "grid": [counts.tobytes()],
                "n_points": [int(len(pdf))],
            }
        )

    return keyed.groupBy("zoom", "x", "y").applyInPandas(
        _build, schema="zoom int, x int, y int, grid binary, n_points long"
    )


def _grids_as_array(pdf, grid: int):
    import numpy as np

    return np.stack(
        [np.frombuffer(b, dtype="<u4").reshape(grid, grid) for b in pdf["grid"]]
    )


def grid_pixels(rasters: DataFrame, grid: int = 64) -> DataFrame:
    """Unpack rasters → one row per NONZERO pixel: (zoom,x,y,gy,gx,cnt).

    Whole-batch: all grids of an Arrow batch are stacked into a
    (B, G, G) array and np.nonzero'd at once.
    """
    g = grid

    def _unpack(batches):
        import numpy as np
        import pandas as pd

        for pdf in batches:
            if not len(pdf):
                continue
            a = _grids_as_array(pdf, g)
            b, gy, gx = np.nonzero(a)
            yield pd.DataFrame(
                {
                    "zoom": pdf["zoom"].to_numpy()[b],
                    "x": pdf["x"].to_numpy()[b],
                    "y": pdf["y"].to_numpy()[b],
                    "gy": gy.astype(np.int32),
                    "gx": gx.astype(np.int32),
                    "cnt": a[b, gy, gx].astype(np.int32),
                }
            )

    return rasters.mapInPandas(
        _unpack, schema="zoom int, x int, y int, gy int, gx int, cnt int"
    )


def vectorize_rect_runs(
    rasters: DataFrame, threshold: int = 1, grid: int = 64, extent: int = 4096
) -> DataFrame:
    """Raster → vector: maximal horizontal runs of pixels with
    cnt >= threshold, as tile-frame rectangles ready for the encoder:
    (zoom, x, y, gy, gx0, gx1, px_x0, px_y0, px_x1, px_y1, run_sum).

    Whole-batch run extraction: pad the (B, G, G) boolean mask with a
    False column on each side, diff along the row axis — starts/ends
    fall out of one np.nonzero each; run sums come from the row-wise
    cumsum (gather at ends minus gather at starts).
    """
    g = grid
    cell_px = extent // grid

    def _runs(batches):
        import numpy as np
        import pandas as pd

        for pdf in batches:
            if not len(pdf):
                continue
            a = _grids_as_array(pdf, g).astype(np.int64)
            mask = a >= threshold
            padded = np.zeros((mask.shape[0], g, g + 2), dtype=np.int8)
            padded[:, :, 1:-1] = mask
            d = np.diff(padded, axis=2)
            sb, sy, sx = np.nonzero(d == 1)   # run starts (inclusive)
            eb, ey, ex = np.nonzero(d == -1)  # run ends (exclusive)
            # starts/ends enumerate runs in identical (b, row, col) order
            cs = np.cumsum(a, axis=2)
            run_sum = cs[eb, ey, ex - 1] - np.where(
                sx > 0, cs[sb, sy, np.maximum(sx - 1, 0)], 0
            )
            yield pd.DataFrame(
                {
                    "zoom": pdf["zoom"].to_numpy()[sb],
                    "x": pdf["x"].to_numpy()[sb],
                    "y": pdf["y"].to_numpy()[sb],
                    "gy": sy.astype(np.int32),
                    "gx0": sx.astype(np.int32),
                    "gx1": (ex - 1).astype(np.int32),
                    "px_x0": (sx * cell_px).astype(np.int32),
                    "px_y0": (sy * cell_px).astype(np.int32),
                    "px_x1": (ex * cell_px).astype(np.int32),
                    "px_y1": ((sy + 1) * cell_px).astype(np.int32),
                    "run_sum": run_sum.astype(np.int64),
                }
            )

    return rasters.mapInPandas(
        _runs,
        schema=(
            "zoom int, x int, y int, gy int, gx0 int, gx1 int, "
            "px_x0 int, px_y0 int, px_x1 int, px_y1 int, run_sum long"
        ),
    )


def zonal_stats(
    cells: DataFrame,
    fences: DataFrame,
    x_col: str = "cell_lng",
    y_col: str = "cell_lat",
    value_col: str = "val",
) -> DataFrame:
    """Zonal statistics — aggregate a raster's cells per polygon zone
    (the classic raster×vector analysis: "mean rainfall per district").

    ``cells``: one row per raster cell with its CENTER coordinates and a
    value; ``fences``: convex CCW zone catalog (fence_id, edges), tiny →
    broadcast. A cell contributes to a zone iff its center is inside
    (the standard zonal rule — no partial-coverage weighting), tested
    with the exact sign-fold used everywhere else (+,-,* doubles only,
    so a SQL oracle replays it bit-for-bit).

    Scale shape: the raster side arrives already reduced (one row per
    cell, bounded by grid resolution, NOT by input points); the zone
    test is a broadcast join filter, and the per-zone rollup is ONE
    partially-aggregated shuffle on fence_id.
    """
    from .geofence import geofence_join

    tagged = geofence_join(cells, fences, x_col=x_col, y_col=y_col)
    # preserve the value column's type: float rasters ("mean rainfall")
    # must NOT be truncated to long; integral inputs keep the stable
    # BIGINT totals the oracles hash against. DECIMAL inputs are
    # deliberately NOT in this tuple: they stay decimal (SUM widens the
    # precision, exact) — casting decimal(p>18,0) to long could
    # overflow, and preserving the caller's exact type IS the contract.
    integral = dict(cells.dtypes).get(value_col) in (
        "tinyint", "smallint", "int", "bigint",
    )
    total = F.sum(value_col)
    mx = F.max(value_col)
    if integral:
        total, mx = total.cast("long"), mx.cast("long")
    return tagged.groupBy("fence_id").agg(
        F.count(F.lit(1)).alias("n_cells"),
        total.alias("total"),
        mx.alias("max_cell"),
    )
