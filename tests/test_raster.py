"""Raster↔vector operators: round-trip + crafted-grid rectangle truth."""

import numpy as np
from pyspark.sql import functions as F

from mvtspark.operators.raster import (
    grid_pixels,
    rasterize_points,
    vectorize_rect_runs,
)


def _pts_df(spark, n=2000):
    k = np.arange(n)
    lng = ((k * 137) % 3600) / 10.0 - 179.947
    lat = ((k * 73) % 1600) / 10.0 - 79.947
    return spark.createDataFrame(
        [(float(a), float(b)) for a, b in zip(lng, lat)], "lng double, lat double"
    )


def test_rasterize_conserves_points_and_counts(spark):
    pts = _pts_df(spark)
    r = rasterize_points(pts, zoom=3, grid=32).cache()
    total = r.agg(F.sum("n_points")).first()[0]
    assert total == 2000
    pix = grid_pixels(r, grid=32)
    # pixel counts sum back to the tile totals
    per_tile = pix.groupBy("zoom", "x", "y").agg(F.sum("cnt").alias("s"))
    joined = r.join(per_tile, ["zoom", "x", "y"]).where(
        F.col("s") != F.col("n_points")
    )
    assert joined.count() == 0
    # grid binary has the declared fixed size
    sizes = r.select(F.length("grid").alias("l")).distinct().collect()
    assert [row["l"] for row in sizes] == [32 * 32 * 4]
    r.unpersist()


def test_vectorize_rects_crafted_grid(spark):
    """A hand-built grid with known runs must produce exactly those
    rectangles (run bounds, px frame, and run sums)."""
    g = 8
    a = np.zeros((g, g), dtype="<u4")
    a[2, 1:4] = [5, 1, 7]     # threshold 2 splits this: runs [1,1] and [3,3]
    a[2, 6] = 9               # isolated run
    a[5, 0:8] = 2             # full-width run
    df = spark.createDataFrame(
        [(4, 3, 2, a.tobytes())], "zoom int, x int, y int, grid binary"
    )
    out = vectorize_rect_runs(df, threshold=2, grid=g, extent=4096).collect()
    rows = sorted((r["gy"], r["gx0"], r["gx1"], r["run_sum"]) for r in out)
    assert rows == [(2, 1, 1, 5), (2, 3, 3, 7), (2, 6, 6, 9), (5, 0, 7, 16)]
    cell = 4096 // g
    by_key = {(r["gy"], r["gx0"]): r for r in out}
    r0 = by_key[(5, 0)]
    assert (r0["px_x0"], r0["px_y0"], r0["px_x1"], r0["px_y1"]) == (
        0, 5 * cell, 8 * cell, 6 * cell
    )


def test_zonal_stats_preserves_float_values(spark):
    """Float rasters ('mean rainfall per district') must not be
    truncated to long; integral rasters keep BIGINT totals."""
    from mvtspark.operators.geofence import fence_catalog, hex_fences
    from mvtspark.operators.raster import zonal_stats

    # cells at the centers of the first two fences, fractional values
    fid0 = hex_fences(2)
    centers = []
    for fid, edges in fid0:
        cx = sum(e[0] for e in edges) / 6.0
        cy = sum(e[1] for e in edges) / 6.0
        centers.append((cx, cy))
    cells = spark.createDataFrame(
        [
            (centers[0][0], centers[0][1], 1.25),
            (centers[0][0] + 0.1, centers[0][1], 2.5),
            (centers[1][0], centers[1][1], 0.75),
        ],
        "cell_lng double, cell_lat double, val double",
    )
    out = {
        r.fence_id: (r.n_cells, r.total, r.max_cell)
        for r in zonal_stats(cells, fence_catalog(spark, 2)).collect()
    }
    assert out[0] == (2, 3.75, 2.5)
    assert out[1] == (1, 0.75, 0.75)

    # integral input keeps long totals (the oracled query's contract)
    icells = spark.createDataFrame(
        [(centers[0][0], centers[0][1], 3)],
        "cell_lng double, cell_lat double, val int",
    )
    idf = zonal_stats(icells, fence_catalog(spark, 2))
    dt = dict(idf.dtypes)
    assert dt["total"] == "bigint" and dt["max_cell"] == "bigint"
    assert idf.where(F.col("fence_id") == 0).first().total == 3


def test_vectorize_threshold_one_matches_nonzero_pixels(spark):
    pts = _pts_df(spark, 500)
    r = rasterize_points(pts, zoom=2, grid=16).cache()
    n_pix = grid_pixels(r, grid=16).count()
    runs = vectorize_rect_runs(r, threshold=1, grid=16).collect()
    # runs cover exactly the nonzero pixels
    assert sum(rr["gx1"] - rr["gx0"] + 1 for rr in runs) == n_pix
    # and run sums cover all points
    assert sum(rr["run_sum"] for rr in runs) == 500
    r.unpersist()
