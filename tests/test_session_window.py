"""Native session_window boundary semantics (pins the oracle's > gap
break rule — events EXACTLY gap apart merge into one session)."""

import datetime as dt

from pyspark.sql import functions as F


def test_exact_gap_events_merge(spark):
    df = spark.createDataFrame(
        [
            (1, dt.datetime(2024, 1, 1, 0, 0, 0)),
            (1, dt.datetime(2024, 1, 1, 0, 30, 0)),  # exactly the gap
            (1, dt.datetime(2024, 1, 1, 1, 0, 0, 1)),  # 1 µs past it
        ],
        "user_id long, ts timestamp",
    )
    rows = sorted(
        df.groupBy("user_id", F.session_window("ts", "30 minutes").alias("sw"))
        .count()
        .select("sw.start", "sw.end", "count")
        .collect(),
        key=lambda r: r.start,
    )
    # first two merge (end = last + gap); the third, 1 µs beyond the
    # merged session's end, starts a new one
    assert [(r["count"]) for r in rows] == [2, 1]
    assert rows[0].end == dt.datetime(2024, 1, 1, 1, 0, 0)
    assert rows[1].start == dt.datetime(2024, 1, 1, 1, 0, 0, 1)
