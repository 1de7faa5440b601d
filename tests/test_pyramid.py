"""thin_pyramid: hand-computed thinning + coordinate halving, and the
WindowGroupLimit plan shape (top-K per parent without a global sort)."""

import io
from contextlib import redirect_stdout

from pyspark.sql import functions as F

from mvtspark.operators.pyramid import thin_pyramid


def _feats(spark, rows):
    return spark.createDataFrame(
        rows,
        "zoom int, x int, y int, feature_id long, weight long, "
        "px long, py long",
    )


def test_hand_case_thinning_and_halving(spark):
    # four z2 children of parent (1, 0, 0): tiles (0,0),(1,0),(0,1),(1,1)
    # k=2 keeps weights 9 and 7; ties impossible here
    rows = [
        (2, 0, 0, 10, 9, 100, 200),   # -> px (100+0)//2=50,  py 100
        (2, 1, 0, 11, 7, 101, 201),   # -> px (101+4096)//2=2098, py 100
        (2, 0, 1, 12, 5, 102, 202),   # thinned out
        (2, 1, 1, 13, 3, 103, 203),   # thinned out
        (2, 2, 2, 14, 1, 104, 204),   # different parent (1,1): kept
    ]
    out = thin_pyramid(_feats(spark, rows), 2, 1, k=2)
    lvl1 = {
        r.feature_id: r
        for r in out.where(F.col("zoom") == 1).collect()
    }
    assert set(lvl1) == {10, 11, 14}
    assert (lvl1[10].x, lvl1[10].y, lvl1[10].px, lvl1[10].py) == (0, 0, 50, 100)
    assert (lvl1[11].x, lvl1[11].y, lvl1[11].px, lvl1[11].py) == (0, 0, 2098, 100)
    assert (lvl1[14].x, lvl1[14].y, lvl1[14].px, lvl1[14].py) == (1, 1, 52, 102)
    # the source level passes through untouched
    assert out.where(F.col("zoom") == 2).count() == 5


def test_tie_breaks_to_lowest_feature_id(spark):
    rows = [(3, 0, 0, fid, 5, 0, 0) for fid in (42, 7, 99)]
    out = thin_pyramid(_feats(spark, rows), 3, 2, k=2)
    kept = sorted(r.feature_id for r in out.where(F.col("zoom") == 2).collect())
    assert kept == [7, 42]


def test_plan_uses_window_group_limit(spark):
    rows = [(4, x, y, x * 10 + y, x + y, 0, 0) for x in range(4) for y in range(4)]
    df = thin_pyramid(_feats(spark, rows), 4, 3, k=3)
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    assert "WindowGroupLimit" in buf.getvalue()


def test_pyramid_invariants_randomized(spark):
    """Randomized invariants over a synthetic level: every derived-level
    tile holds <= k rows; halved coordinates stay inside the extent;
    per-feature weights survive unchanged; output is independent of
    input partitioning."""
    import random

    rng = random.Random(1234)
    rows = [
        (5, rng.randrange(32), rng.randrange(32), fid,
         rng.randrange(1000), rng.randrange(4096), rng.randrange(4096))
        for fid in range(400)
    ]
    df1 = _feats(spark, rows).repartition(3)
    df8 = _feats(spark, rows).repartition(11)
    out1 = thin_pyramid(df1, 5, 2, k=5)
    out8 = thin_pyramid(df8, 5, 2, k=5)
    r1 = sorted(map(tuple, out1.collect()))
    assert r1 == sorted(map(tuple, out8.collect()))

    per_tile = {}
    weights = {fid: w for (_, _, _, fid, w, _, _) in rows}
    for zoom, x, y, fid, w, px, py in r1:
        assert 2 <= zoom <= 5
        assert 0 <= x < (1 << zoom) and 0 <= y < (1 << zoom)
        assert 0 <= px < 4096 and 0 <= py < 4096
        assert w == weights[fid]
        if zoom < 5:
            per_tile[(zoom, x, y)] = per_tile.get((zoom, x, y), 0) + 1
    assert per_tile and max(per_tile.values()) <= 5
