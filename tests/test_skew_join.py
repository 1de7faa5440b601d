"""Skew-safe joins: salted parity + AQE skew-split runtime evidence."""

from pyspark.sql import functions as F

from mvtspark.operators.skew import salted_join


def _skewed_fact(spark, n=200_000):
    # 90% of rows share key 0; the rest spread over 1..9
    return spark.range(n).select(
        F.col("id").alias("event_id"),
        F.when(F.col("id") % 10 < 9, F.lit(0).cast("long"))
        .otherwise(F.col("id") % 10)
        .alias("k"),
    )


def test_salted_join_matches_plain_join(spark):
    fact = _skewed_fact(spark, 50_000)
    dim = spark.range(10).select(
        F.col("id").alias("k"), (F.col("id") * 7).alias("dval")
    )
    salted = salted_join(fact, dim, on="k", tiebreak="event_id").select(
        "event_id", "k", "dval"
    )
    plain = fact.join(dim, "k").select("event_id", "k", "dval")
    assert salted.count() == plain.count()
    assert salted.exceptAll(plain).count() == 0
    assert plain.exceptAll(salted).count() == 0


def test_salted_join_spreads_hot_key(spark):
    """The hot key's rows must land in ALL n_salt salt groups."""
    fact = _skewed_fact(spark, 50_000)
    dim = spark.range(10).select(F.col("id").alias("k"))
    f = fact.withColumn("_salt", F.pmod(F.hash(F.col("event_id")), F.lit(8)))
    per_salt = (
        f.where(F.col("k") == 0).groupBy("_salt").count().collect()
    )
    assert len(per_salt) == 8
    counts = [r["count"] for r in per_salt]
    assert min(counts) > 0.5 * max(counts)  # roughly even spread


def test_aqe_splits_skewed_smj(spark):
    """Dynamic counterpart: with lowered thresholds AQE must mark the
    oversized partition of a sort-merge join `skew=true` and split it."""
    conf = spark.conf
    saved = {
        k: conf.get(k)
        for k in (
            "spark.sql.autoBroadcastJoinThreshold",
            "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
            "spark.sql.adaptive.advisoryPartitionSizeInBytes",
            "spark.sql.adaptive.coalescePartitions.enabled",
            "spark.sql.adaptive.forceOptimizeSkewedJoin",
        )
    }
    try:
        conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "1")
        conf.set(
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
            "32KB",
        )
        conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "32KB")
        conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
        # OptimizeSkewedJoin declines when the split would add an extra
        # shuffle for the downstream single-partition agg; force it, as
        # a real skewed job (whose downstream IS partitioned) would get
        conf.set("spark.sql.adaptive.forceOptimizeSkewedJoin", "true")
        fact = _skewed_fact(spark, 400_000).withColumn(
            "pad", F.sha2(F.col("event_id").cast("string"), 256)
        )
        dim = spark.range(10).select(
            F.col("id").alias("k"),
            F.sha2(F.col("id").cast("string"), 256).alias("dpad"),
        )
        # keep the wide columns live through the agg (column pruning
        # would otherwise shrink the hot partition under the threshold),
        # and collect() the SAME DataFrame whose QueryExecution holds
        # the join — AQE only annotates skew=true in the finalized plan
        # of an executed query
        joined = (
            fact.join(dim.hint("merge"), "k")
            .groupBy()
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.max("pad").alias("mp"),
                F.max("dpad").alias("md"),
            )
        )
        [row] = joined.collect()
        assert row["n"] == 400_000
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "skew=true" in plan, plan[:4000]
        assert "AQEShuffleRead skewed" in plan
    finally:
        for k, v in saved.items():
            if v is None:
                conf.unset(k)
            else:
                conf.set(k, v)
