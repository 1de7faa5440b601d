"""Trajectory stats: independent-math parity, edge cases, plan shape."""

import math

from pyspark.sql import functions as F

from mvtspark.operators.trajectory import track_stats

R_KM = 6371.0088


def _hav_km(lat1, lng1, lat2, lng2):
    p1, p2 = math.radians(lat1), math.radians(lat2)
    dp = math.radians(lat2 - lat1) / 2
    dl = math.radians(lng2 - lng1) / 2
    a = math.sin(dp) ** 2 + math.cos(p1) * math.cos(p2) * math.sin(dl) ** 2
    return 2.0 * R_KM * math.asin(math.sqrt(a))


def _pings(spark, rows):
    return spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp, lat double, lng double"
    )


def test_known_track_matches_independent_math(spark):
    import datetime as dt

    t0 = dt.datetime(2024, 1, 1)
    coords = [(48.8566, 2.3522), (51.5074, -0.1278), (40.7128, -74.0060)]
    rows = [
        (i, 1, t0 + dt.timedelta(hours=i), lat, lng)
        for i, (lat, lng) in enumerate(coords)
    ]
    out = track_stats(_pings(spark, rows)).collect()[0]
    segs = [
        round(_hav_km(*coords[i], *coords[i + 1]) * 10000.0)
        for i in range(len(coords) - 1)
    ]
    assert out.n_pings == 3 and out.n_segments == 2
    assert out.total_km_e4 == sum(segs)
    assert out.max_km_e4 == max(segs)
    assert out.duration_s == 7200.0
    assert out.avg_kmh == round((sum(segs) / 1e4) / 2.0, 4)


def test_single_ping_and_empty_segments(spark):
    import datetime as dt

    rows = [(0, 7, dt.datetime(2024, 1, 1), 10.0, 20.0)]
    out = track_stats(_pings(spark, rows)).collect()[0]
    assert (out.n_pings, out.n_segments) == (1, 0)
    assert (out.total_km_e4, out.max_km_e4) == (0, 0)
    assert out.duration_s == 0.0 and out.avg_kmh == 0.0


def test_equal_timestamp_tiebreak_is_event_id(spark):
    import datetime as dt

    t = dt.datetime(2024, 1, 1)
    # same ts: order must be event_id 0,1,2 -> path A->B->C, not A->C->B
    rows = [
        (0, 1, t, 0.0, 0.0),
        (2, 1, t, 0.0, 2.0),
        (1, 1, t, 0.0, 1.0),
    ]
    out = track_stats(_pings(spark, rows)).collect()[0]
    expect = round(_hav_km(0, 0, 0, 1) * 1e4) + round(_hav_km(0, 1, 0, 2) * 1e4)
    assert out.total_km_e4 == expect


def test_plan_has_single_exchange(spark, sf_dir):
    """The groupBy must reuse the window's hash partitioning on user_id
    (one shuffle total), or the operator would re-shuffle the fact table."""
    e = spark.read.parquet(f"{sf_dir}/events.parquet")
    pings = e.select(
        "event_id",
        "user_id",
        "ts",
        ((F.col("event_id") % 3600) / 10.0 - 179.947).alias("lng"),
        (((F.col("event_id") * 7) % 1600) / 10.0 - 79.947).alias("lat"),
    )
    plan = track_stats(pings)._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange hashpartitioning") == 1, plan
