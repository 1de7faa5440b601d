"""Exact-integer moments vs Spark's built-in float aggregates."""

import pytest
from pyspark.sql import functions as F

import __spark_entry__ as entry


def test_moments_match_builtin_aggregates(spark, sf_dir):
    ours = {
        r.event_type: r
        for r in entry.value_moments(spark, sf_dir).collect()
    }
    theirs = {
        r.event_type: r
        for r in spark.read.parquet(f"{sf_dir}/events.parquet")
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.avg("value").alias("mean_value"),
            F.stddev_pop("value").alias("stddev_pop"),
            F.corr("value", F.col("user_id").cast("double")).alias("corr"),
        )
        .collect()
    }
    assert set(ours) == set(theirs) and len(ours) == 5
    for et, o in ours.items():
        t = theirs[et]
        assert o.n == t.n
        # built-ins accumulate floats in shuffle order; the exact-integer
        # path must agree to well past their round-off
        assert o.mean_value == pytest.approx(t.mean_value, abs=1e-6)
        assert o.stddev_pop == pytest.approx(t.stddev_pop, abs=1e-6)
        assert o.corr_value_user == pytest.approx(t.corr, abs=1e-6)


def test_histogram_covers_all_rows(spark, sf_dir):
    rows = entry.value_histogram(spark, sf_dir).collect()
    total = spark.read.parquet(f"{sf_dir}/events.parquet").count()
    assert sum(r.n for r in rows) == total
    assert all(0 <= r.bucket <= 12 for r in rows)


def test_props_json_typed_extraction(spark, sf_dir):
    rows = entry.props_json_extract(spark, sf_dir).collect()
    total = spark.read.parquet(f"{sf_dir}/events.parquet").count()
    assert sum(r.n for r in rows) == total
    for r in rows:
        # every k in the group is ≡ k_mod (mod 10)
        assert r.sum_k % 10 == (r.k_mod * r.n) % 10
        assert r.max_k % 10 == r.k_mod
