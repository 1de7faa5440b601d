"""Incremental tile maintenance — CDC × tiling (north rule: resumable
planet-scale tile builds; this is the op that makes DAILY updates cheap).

A full rebuild re-aggregates 10^12 points; an incremental one touches
only the tiles a change batch dirties. Both halves here are
changes-bounded:

- :func:`dirty_tiles` — the (zoom, x, y) invalidation set: old + new
  location of every change, propagated up ``levels`` ancestors by
  integer halving. Work is O(|changes| × levels) before one distinct.
- :func:`tile_count_deltas` — the pure-delta maintenance path: per-tile
  count adjustments (+1 new location, −1 old location, per level)
  computed from the change batch ALONE — the fact table is never
  scanned. Applying deltas to a materialized counts table is a
  changes-sized merge (the CDC upsert shape, operators/cdc.py).
- :func:`rebuild_dirty_counts` — the recompute path for full-fidelity
  sinks (re-encode MVTs, not just counts): restrict the post-change
  fact table to dirty base tiles FIRST (an equi-join on the tile key —
  broadcast-able because the dirty set is changes-bounded, and exactly
  the predicate a (zoom, x, y)-partitioned layout prunes on), then
  re-aggregate per level only inside the dirty cover.

The two paths must agree; tests/test_incremental.py pins
delta-vs-recompute equality on randomized change batches.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _level_structs(zoom: int, levels: int) -> "F.Column":
    """(zoom-L, x>>L, y>>L) structs for L in [0, levels) — integer
    halving, the pyramid parent rule. Built with Python-int shift
    amounts so the whole array stays a codegen expression."""
    return F.array(
        *[
            F.struct(
                F.lit(zoom - l).alias("zoom"),
                F.shiftright("x", l).alias("x"),
                F.shiftright("y", l).alias("y"),
            )
            for l in range(levels)
        ]
    )


def _ancestors(df: DataFrame, zoom: int, levels: int) -> DataFrame:
    return df.select(
        F.explode(_level_structs(zoom, levels)).alias("a")
    ).select("a.zoom", "a.x", "a.y")


def dirty_tiles(
    changes: DataFrame, zoom: int, levels: int = 3
) -> DataFrame:
    """Distinct (zoom, x, y) invalidation set for a change batch.

    ``changes`` carries nullable old/new tile coords at base ``zoom``
    (old_x/old_y null for inserts, new_x/new_y null for deletes); a
    move dirties both locations. Ancestors up to ``levels`` zoom steps
    are dirtied by halving. One distinct shuffle, changes-bounded."""
    old = changes.where(F.col("old_x").isNotNull()).select(
        F.col("old_x").alias("x"), F.col("old_y").alias("y")
    )
    new = changes.where(F.col("new_x").isNotNull()).select(
        F.col("new_x").alias("x"), F.col("new_y").alias("y")
    )
    return _ancestors(old.unionAll(new), zoom, levels).distinct()


def tile_count_deltas(
    changes: DataFrame, zoom: int, levels: int = 3
) -> DataFrame:
    """Per-tile count deltas from the change batch alone: −1 at every
    old location, +1 at every new one, summed per (zoom, x, y) across
    ``levels`` ancestor zooms. Never touches the fact table — THE
    incremental maintenance path when per-tile counts are materialized
    (new_count = old_count + delta, a changes-sized CDC merge)."""
    old = changes.where(F.col("old_x").isNotNull()).select(
        F.col("old_x").alias("x"),
        F.col("old_y").alias("y"),
        F.lit(-1).alias("d"),
    )
    new = changes.where(F.col("new_x").isNotNull()).select(
        F.col("new_x").alias("x"),
        F.col("new_y").alias("y"),
        F.lit(1).alias("d"),
    )
    both = old.unionAll(new)
    lv = both.select(
        "d", F.explode(_level_structs(zoom, levels)).alias("a")
    ).select("a.zoom", "a.x", "a.y", "d")
    return (
        lv.groupBy("zoom", "x", "y")
        .agg(F.sum("d").cast("long").alias("delta"))
        .where(F.col("delta") != 0)
    )


def rebuild_dirty_counts(
    points_after: DataFrame,
    changes: DataFrame,
    zoom: int,
    levels: int = 3,
) -> DataFrame:
    """Recompute post-change counts for EVERY dirty tile (0 for tiles
    emptied by the batch). ``points_after`` must carry base-zoom
    (x, y); only rows inside the dirty base cover are aggregated —
    the join that a tile-partitioned layout turns into partition
    pruning. Ancestor counts aggregate the restricted rows once more
    per level inside the (small) dirty cover, never the full table."""
    dirty = dirty_tiles(changes, zoom, levels)
    # ancestor tiles cover clean base tiles too: restrict the fact rows
    # to base tiles inside ANY dirty ancestor's footprint, i.e. rows
    # whose ancestor at each level is dirty — per level independently.
    lv = points_after.select(
        F.explode(_level_structs(zoom, levels)).alias("a")
    ).select("a.zoom", "a.x", "a.y")
    counts = (
        lv.join(F.broadcast(dirty), ["zoom", "x", "y"], "left_semi")
        .groupBy("zoom", "x", "y")
        .agg(F.count(F.lit(1)).cast("long").alias("n_points"))
    )
    return (
        dirty.join(counts, ["zoom", "x", "y"], "left")
        .select(
            "zoom", "x", "y",
            F.coalesce("n_points", F.lit(0)).cast("long").alias("n_points"),
        )
    )
