"""Adaptive quadtree cover (operators/adaptive.py): partition
invariants on skewed data, plus the one-shuffle plan claim."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from mvtspark.operators.adaptive import adaptive_cell_cover

BASE, MAX, K = 2, 6, 50


@pytest.fixture()
def skewed(spark):
    """A hot cluster (city) + uniform background at MAX-zoom coords."""
    rng = np.random.default_rng(3)
    side = 1 << MAX
    hot = rng.integers(40, 44, size=(800, 2))  # 4x4 max-zoom cells
    cold = rng.integers(0, side, size=(400, 2))
    pts = np.vstack([hot, cold])
    return spark.createDataFrame(
        [(int(x), int(y)) for x, y in pts], "x int, y int"
    )


def _leaves(df):
    return [(r.zoom, r.x, r.y, r.n_points) for r in df.collect()]


def test_cover_partitions_points_exactly(skewed, spark):
    leaves = _leaves(adaptive_cell_cover(skewed, BASE, MAX, K))
    assert sum(n for *_, n in leaves) == skewed.count()
    # disjoint: no leaf is an ancestor of another
    cells = {(z, x, y) for z, x, y, _ in leaves}
    assert len(cells) == len(leaves)
    for z, x, y in cells:
        for az in range(BASE, z):
            assert (az, x >> (z - az), y >> (z - az)) not in cells


def test_every_leaf_fits_or_bottoms_out(skewed):
    for z, x, y, n in _leaves(adaptive_cell_cover(skewed, BASE, MAX, K)):
        assert n <= K or z == MAX, (z, x, y, n)
        assert BASE <= z <= MAX


def test_no_needless_splits_and_counts_correct(skewed, spark):
    pts = [(r.x, r.y) for r in skewed.collect()]

    def count_in(z, x, y):
        s = MAX - z
        return sum(1 for px, py in pts if (px >> s, py >> s) == (x, y))

    leaves = _leaves(adaptive_cell_cover(skewed, BASE, MAX, K))
    for z, x, y, n in leaves:
        assert n == count_in(z, x, y)
        # every proper ancestor above BASE must have overflowed
        for az in range(BASE, z):
            assert count_in(az, x >> (z - az), y >> (z - az)) > K


def test_skew_splits_city_keeps_ocean_coarse(skewed):
    leaves = _leaves(adaptive_cell_cover(skewed, BASE, MAX, K))
    # the hot block (max-zoom cells 40..43) holds 800 points — its
    # ancestors overflow K=50 all the way down, so some leaf covering
    # it must sit deep; the uniform background keeps coarse leaves
    hot_depth = max(
        z for z, x, y, n in leaves
        if x == (40 >> (MAX - z)) and y == (40 >> (MAX - z))
    )
    assert hot_depth >= MAX - 1
    assert any(z <= BASE + 1 for z, *_ in leaves)


def test_single_shuffle_for_all_levels(skewed):
    """The point table is shuffled exactly once: all_level_counts is
    ONE rollup exchange, it is localCheckpointed, and the tree walk's
    final plan reads the checkpointed blocks (no Expand / no point
    re-aggregation — only broadcast semi-joins and the union)."""
    from mvtspark.operators.adaptive import all_level_counts

    counts_plan = (
        all_level_counts(skewed, BASE, MAX)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert counts_plan.count("Expand") == 1
    assert counts_plan.count("Exchange hashpartitioning") == 1

    plan = (
        adaptive_cell_cover(skewed, BASE, MAX, K)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Expand" not in plan  # points never re-aggregated
    assert "ExistingRDD" in plan or "Scan ExistingRDD" in plan
    assert "Exchange hashpartitioning" not in plan  # only broadcasts
    assert "BroadcastHashJoin" in plan and "LeftSemi" in plan


def test_deep_zoom_unpack_is_integer_exact(spark):
    """Packed-key unpack must use integer `div`, not double division:
    at zoom 28 the key k = x*2^28 + y reaches 2^56, where the double
    quotient rounds across the boundary (k = 2^56 - 1 rounds to 2^56,
    so floor(k/2^28) reads back x+1). One point at the far corner pins
    the exact unpack."""
    side = 1 << 28
    pts = spark.createDataFrame([(side - 1, side - 1)], "x int, y int")
    leaves = _leaves(adaptive_cell_cover(pts, 28, 28, 10))
    assert leaves == [(28, side - 1, side - 1, 1)]
