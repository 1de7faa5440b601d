"""Runtime row-level filtering (bloom) — the engine prunes the fact
scan with a bloom filter built from the selective dimension side of a
shuffle join. At 100 TB the fact side always clears the default 10 GB
application-side threshold, so injection is automatic; here the
threshold is lowered to simulate at-scale conditions and the plan is
asserted, plus result parity with the filter disabled."""

import io
from contextlib import redirect_stdout

from pyspark.sql import functions as F

_SIM_CONF = {
    "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
    "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold": "100MB",
    "spark.sql.autoBroadcastJoinThreshold": "-1",  # force the shuffle join
}


def _with_conf(spark, conf):
    old = {}
    for k, v in conf.items():
        try:
            old[k] = spark.conf.get(k)
        except Exception:
            old[k] = None
        spark.conf.set(k, v)
    return old


def _restore(spark, old):
    for k, v in old.items():
        if v is None:
            spark.conf.unset(k)
        else:
            spark.conf.set(k, v)


def test_bloom_filter_prunes_fact_scan(spark, tmp_path):
    fact_p, dim_p = str(tmp_path / "fact"), str(tmp_path / "dim")
    spark.range(200_000).select(
        F.col("id").alias("k"), (F.col("id") % 97).alias("v")
    ).write.parquet(fact_p)
    spark.range(1_000).select(
        F.col("id").alias("k"), (F.col("id") % 5).alias("grp")
    ).write.parquet(dim_p)

    def q():
        f = spark.read.parquet(fact_p)
        d = spark.read.parquet(dim_p).where("grp = 3")
        return f.join(d, "k").groupBy("grp").agg(
            F.count(F.lit(1)).alias("n"), F.sum("v").alias("sv")
        )

    old = _with_conf(spark, _SIM_CONF)
    try:
        df = q()
        plan = df._jdf.queryExecution().optimizedPlan().toString()
        assert "bloom_filter" in plan.lower() or "might_contain" in plan.lower()
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        assert "might_contain" in buf.getvalue().lower()
        with_filter = df.collect()
        spark.conf.set(
            "spark.sql.optimizer.runtime.bloomFilter.enabled", "false"
        )
        without = q().collect()
        assert sorted(map(tuple, with_filter)) == sorted(map(tuple, without))
        assert with_filter[0].n == 200  # ids ≡ 3 (mod 5) under 1000
    finally:
        spark.conf.set(
            "spark.sql.optimizer.runtime.bloomFilter.enabled", "true"
        )
        _restore(spark, old)
