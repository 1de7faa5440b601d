"""Bucketed-layout contract (sources/bucketed.py): a join between two
tables bucketed on the join key must plan with NO shuffle Exchange on
either side — the write-once/join-many co-location that makes repeated
fact-x-fact joins viable at 100 TB."""

import io
from contextlib import redirect_stdout

import pytest
from pyspark.sql import functions as F

from mvtspark.sources.bucketed import colocated_join, write_bucketed


@pytest.fixture()
def bucketed_tables(spark, tmp_path):
    events = spark.range(0, 20000).select(
        F.col("id").alias("event_id"),
        (F.col("id") % 997).alias("user_id"),
        (F.col("id") * 37 % 1000).alias("value"),
    )
    users = spark.range(0, 997).select(
        F.col("id").alias("user_id"),
        (F.col("id") % 7).alias("segment"),
    )
    write_bucketed(events, "b_events", str(tmp_path / "ev"),
                   ["user_id"], 8, sort_cols=["user_id"])
    write_bucketed(users, "b_users", str(tmp_path / "us"),
                   ["user_id"], 8, sort_cols=["user_id"])
    yield "b_events", "b_users"
    spark.sql("DROP TABLE IF EXISTS b_events")
    spark.sql("DROP TABLE IF EXISTS b_users")


def test_bucketed_join_has_no_shuffle(spark, bucketed_tables):
    left, right = bucketed_tables
    # force the SMJ path (broadcast would trivially hide the exchange)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = colocated_join(spark, left, right, ["user_id"])
        buf = io.StringIO()
        with redirect_stdout(buf):
            j.explain("formatted")
        plan = buf.getvalue()
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan, plan  # co-located: zero shuffle
        # correctness: every event matches exactly one user
        assert j.count() == 20000
        agg = (
            j.groupBy("segment").agg(F.sum("value").alias("s")).collect()
        )
        assert len(agg) == 7
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")


def test_unbucketed_same_join_does_shuffle(spark, bucketed_tables, tmp_path):
    """Control: identical data WITHOUT bucketing plans an Exchange —
    proving the bucketed layout (not AQE luck) removed it."""
    left, right = bucketed_tables
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        e = spark.table(left)
        u = spark.table(right)
        e.write.mode("overwrite").parquet(str(tmp_path / "ev_flat"))
        u.write.mode("overwrite").parquet(str(tmp_path / "us_flat"))
        j = spark.read.parquet(str(tmp_path / "ev_flat")).join(
            spark.read.parquet(str(tmp_path / "us_flat")), ["user_id"]
        )
        buf = io.StringIO()
        with redirect_stdout(buf):
            j.explain("formatted")
        assert "Exchange" in buf.getvalue()
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
