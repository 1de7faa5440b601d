"""Incremental tile maintenance (operators/incremental.py): the pure
delta path and the restricted-recompute path must agree with a full
recompute on randomized change batches — the core incremental-engine
equivalence."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from mvtspark.operators.incremental import (
    dirty_tiles,
    rebuild_dirty_counts,
    tile_count_deltas,
)

ZOOM, LEVELS, N = 5, 3, 400


def _tiles(xs, ys):
    return list(zip(xs.tolist(), ys.tolist()))


@pytest.fixture()
def world(spark):
    """Base points + a change batch (inserts/moves/deletes) with tile
    coords at ZOOM, plus the before/after point sets."""
    rng = np.random.default_rng(11)
    side = 1 << ZOOM
    bx = rng.integers(0, side, N)
    by = rng.integers(0, side, N)
    base = spark.createDataFrame(
        [(i, int(bx[i]), int(by[i])) for i in range(N)],
        "pid long, x int, y int",
    )
    # every 5th point moves, every 7th (not moving) is deleted,
    # 40 brand-new points insert
    changes = []
    after = {}
    for i in range(N):
        if i % 5 == 0:
            nx, ny = int(rng.integers(0, side)), int(rng.integers(0, side))
            changes.append((int(bx[i]), int(by[i]), nx, ny))
            after[i] = (nx, ny)
        elif i % 7 == 0:
            changes.append((int(bx[i]), int(by[i]), None, None))
        else:
            after[i] = (int(bx[i]), int(by[i]))
    for j in range(40):
        nx, ny = int(rng.integers(0, side)), int(rng.integers(0, side))
        changes.append((None, None, nx, ny))
        after[N + j] = (nx, ny)
    chg = spark.createDataFrame(
        changes, "old_x int, old_y int, new_x int, new_y int"
    )
    pts_after = spark.createDataFrame(
        [(k, v[0], v[1]) for k, v in sorted(after.items())],
        "pid long, x int, y int",
    )
    return base, chg, pts_after


def _full_counts(pts, spark):
    """Oracle: full recompute at every level."""
    out = {}
    rows = pts.select("x", "y").collect()
    for lv in range(LEVELS):
        z = ZOOM - lv
        c = {}
        for r in rows:
            key = (z, r.x >> lv, r.y >> lv)
            c[key] = c.get(key, 0) + 1
        out.update(c)
    return out


def test_dirty_set_contains_all_changed_locations(world, spark):
    base, chg, _ = world
    dirty = {(r.zoom, r.x, r.y) for r in dirty_tiles(chg, ZOOM, LEVELS).collect()}
    for r in chg.collect():
        for ox, oy in ((r.old_x, r.old_y), (r.new_x, r.new_y)):
            if ox is None:
                continue
            for lv in range(LEVELS):
                assert (ZOOM - lv, ox >> lv, oy >> lv) in dirty


def test_delta_path_equals_full_recompute_diff(world, spark):
    base, chg, pts_after = world
    before = _full_counts(base, spark)
    after = _full_counts(pts_after, spark)
    want = {}
    for k in set(before) | set(after):
        d = after.get(k, 0) - before.get(k, 0)
        if d:
            want[k] = d
    got = {
        (r.zoom, r.x, r.y): r.delta
        for r in tile_count_deltas(chg, ZOOM, LEVELS).collect()
    }
    assert got == want


def test_rebuild_matches_full_recompute_on_dirty_tiles(world, spark):
    base, chg, pts_after = world
    after = _full_counts(pts_after, spark)
    rebuilt = {
        (r.zoom, r.x, r.y): r.n_points
        for r in rebuild_dirty_counts(pts_after, chg, ZOOM, LEVELS).collect()
    }
    dirty = {
        (r.zoom, r.x, r.y) for r in dirty_tiles(chg, ZOOM, LEVELS).collect()
    }
    assert set(rebuilt) == dirty  # every dirty tile gets a row, 0 included
    for k, n in rebuilt.items():
        assert n == after.get(k, 0), k


def test_delta_applies_onto_before_counts(world, spark):
    """new = old + delta — the materialized-counts maintenance merge."""
    base, chg, pts_after = world
    before = _full_counts(base, spark)
    after = _full_counts(pts_after, spark)
    deltas = {
        (r.zoom, r.x, r.y): r.delta
        for r in tile_count_deltas(chg, ZOOM, LEVELS).collect()
    }
    merged = dict(before)
    for k, d in deltas.items():
        merged[k] = merged.get(k, 0) + d
        if merged[k] == 0:
            del merged[k]
    assert merged == after
