"""Geodesy functions (functions/geodesy.py): geohash pinned to the
public algorithm's published test vectors (encoder-independent goldens)
plus the prefix-containment property; haversine pinned to a known
city-pair distance and to basic metric identities."""

import pytest
from pyspark.sql import functions as F

from mvtspark.functions.geodesy import geohash, haversine_km

# (lat, lng, precision, expected) — public vectors: the canonical
# wikipedia/geohash.org examples
VECTORS = [
    (57.64911, 10.40744, 11, "u4pruydqqvj"),
    (42.605, -5.603, 5, "ezs42"),
    (-25.382708, -49.265506, 11, "6gkzwgjzn82"),
    (0.0, 0.0, 8, "s0000000"),
    (90.0, 180.0, 6, "zzzzzz"),   # NE edge clamps into the last cell
    (-90.0, -180.0, 6, "000000"),
]


def test_geohash_public_vectors(spark):
    df = spark.createDataFrame(
        [(i, v[0], v[1]) for i, v in enumerate(VECTORS)], ["i", "lat", "lng"]
    )
    cols = [
        geohash(F.col("lat"), F.col("lng"), v[2]).alias(f"g{i}")
        for i, v in enumerate(VECTORS)
    ]
    row = df.select("i", *cols).orderBy("i").collect()
    for i, (_lat, _lng, _p, want) in enumerate(VECTORS):
        assert row[i][f"g{i}"] == want


def test_geohash_prefix_containment(spark):
    """A cell's geohash at precision p is a prefix of every higher
    precision — the property that makes it a hierarchical cluster key."""
    df = spark.range(0, 2000).select(
        ((F.col("id") % 360) - 179.5 + 0.123).alias("lng"),
        (((F.col("id") * 7) % 170) - 84.5 + 0.321).alias("lat"),
    )
    out = df.select(
        geohash(F.col("lat"), F.col("lng"), 4).alias("g4"),
        geohash(F.col("lat"), F.col("lng"), 8).alias("g8"),
        geohash(F.col("lat"), F.col("lng"), 11).alias("g11"),
    )
    bad = out.where(
        ~F.col("g8").startswith(F.col("g4"))
        | ~F.col("g11").startswith(F.col("g8"))
    ).count()
    assert bad == 0


def test_geohash_precision_bounds():
    with pytest.raises(ValueError):
        geohash(F.lit(0.0), F.lit(0.0), 0)
    with pytest.raises(ValueError):
        geohash(F.lit(0.0), F.lit(0.0), 13)


def test_haversine_known_distance_and_identities(spark):
    df = spark.createDataFrame(
        [
            # Paris -> London: published great-circle ~343.5 km
            (48.8566, 2.3522, 51.5074, -0.1278, 343.5),
            # antipodal quarter: equator 90 degrees of longitude
            (0.0, 0.0, 0.0, 90.0, 10007.5),
        ],
        ["lat1", "lng1", "lat2", "lng2", "approx_km"],
    )
    rows = df.select(
        haversine_km(
            F.col("lat1"), F.col("lng1"), F.col("lat2"), F.col("lng2")
        ).alias("d"),
        haversine_km(
            F.col("lat2"), F.col("lng2"), F.col("lat1"), F.col("lng1")
        ).alias("d_sym"),
        haversine_km(
            F.col("lat1"), F.col("lng1"), F.col("lat1"), F.col("lng1")
        ).alias("d_self"),
        "approx_km",
    ).collect()
    for r in rows:
        assert r.d == pytest.approx(r.approx_km, rel=2e-3)
        assert r.d == r.d_sym  # symmetric op order -> bit-identical
        assert r.d_self == 0.0


def test_quadkey_bing_vector_and_prefix(spark):
    """Bing's documented example: tile (x=3, y=5, z=3) -> '213'; every
    quadkey's prefix is its ancestor tile's quadkey."""
    from mvtspark.functions.geodesy import quadkey

    df = spark.createDataFrame(
        [(3, 5), (0, 0), (7, 7), (4, 2)], "x int, y int"
    )
    rows = df.select(
        "x", "y",
        quadkey(F.col("x"), F.col("y"), 3).alias("qk3"),
        quadkey(
            F.shiftright(F.col("x"), 1), F.shiftright(F.col("y"), 1), 2
        ).alias("qk2"),
    ).collect()
    by_xy = {(r.x, r.y): r for r in rows}
    assert by_xy[(3, 5)].qk3 == "213"
    assert by_xy[(0, 0)].qk3 == "000"
    assert by_xy[(7, 7)].qk3 == "333"
    for r in rows:
        assert r.qk3.startswith(r.qk2)
        assert len(r.qk3) == 3 and set(r.qk3) <= set("0123")


def test_geohash_clamps_out_of_range_low_side(spark):
    """lng < -180 / lat < -90 clamp to the SW corner cell instead of
    quantizing negative and corrupting the Morton spread."""
    from pyspark.sql import functions as F

    from mvtspark.functions.geodesy import geohash

    df = spark.createDataFrame(
        [(-999.0, -999.0), (-180.0, -90.0), (200.0, 95.0), (180.0, 90.0)],
        "lng double, lat double",
    ).select(geohash(F.col("lat"), F.col("lng"), 6).alias("g"))
    a, b, c, d = [r.g for r in df.collect()]
    assert a == b  # low clamp == exact SW corner
    assert c == d  # high clamp == exact NE corner
    assert a == "000000"


def test_quadkey_wraps_out_of_grid_xy(spark):
    from pyspark.sql import functions as F

    from mvtspark.functions.geodesy import quadkey

    df = spark.createDataFrame(
        [(5, 3), (5 + 8, 3 + 8), (-3, 3)], "x long, y long"
    ).select(quadkey(F.col("x"), F.col("y"), 3).alias("q"))
    a, b, c = [r.q for r in df.collect()]
    assert a == b  # x,y wrap mod 2^zoom
    assert len(c) == 3 and set(c) <= set("0123")
