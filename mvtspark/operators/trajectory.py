"""Per-entity trajectory statistics — ordered track → segment metrics.

The track-processing shape every geotagged-event pipeline needs (fleet
telemetry, photo-upload trails, check-in streams): order each entity's
pings by event time, measure consecutive-ping great-circle segments,
and reduce to per-entity movement stats.

Scale shape: ONE shuffle. The lag window hash-partitions by the entity
key; the follow-up ``groupBy`` on the same key reuses that exchange
(Catalyst sees the child output partitioning), so the whole operator
is window + map-side-partial agg over a single repartition of the
fact table. No self-join, no collect.

Cross-engine determinism discipline (same as `functions/geodesy.py`
call sites): each segment's haversine km is scaled to km·10⁴ and
rounded to an exact integer (~0.1 m resolution, absorbing libm ulps)
BEFORE summing — integer sums are order-independent, so the
oracle's aggregation order can't produce a different double. Derived
ratios (avg speed) divide the already-exact integer totals, giving
both engines bit-identical operands.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from mvtspark.functions.geodesy import haversine_km


def track_stats(
    pings: DataFrame,
    entity_col: str = "user_id",
    ts_col: str = "ts",
    tiebreak_col: str = "event_id",
    lat_col: str = "lat",
    lng_col: str = "lng",
) -> DataFrame:
    """Per-entity movement stats from a geotagged ping table.

    Returns one row per entity: ``n_pings``, ``n_segments``,
    ``total_km_e4`` / ``max_km_e4`` (exact integer km·10⁴),
    ``duration_s`` (first→last ping), ``avg_kmh`` (rounded to 4).
    Ordering is (ts, tiebreak) so equal-timestamp pings are
    deterministic.
    """
    w = Window.partitionBy(entity_col).orderBy(ts_col, tiebreak_col)
    seg = (
        pings.withColumn("_plat", F.lag(lat_col).over(w))
        .withColumn("_plng", F.lag(lng_col).over(w))
        .withColumn(
            "_seg_e4",
            F.when(
                F.col("_plat").isNotNull(),
                # round at the already-scaled level: the rounded double
                # is integral, so the long cast is exact in any engine
                # (round(km,4)*1e4 is NOT integral — Spark's cast
                # truncates it while DuckDB's rounds)
                F.round(
                    haversine_km(
                        F.col("_plat"),
                        F.col("_plng"),
                        F.col(lat_col),
                        F.col(lng_col),
                    )
                    * 10000.0,
                    0,
                ).cast("long"),
            ),
        )
    )
    dur_s = (
        F.unix_micros(F.max(ts_col).cast("timestamp"))
        - F.unix_micros(F.min(ts_col).cast("timestamp"))
    ) / F.lit(1_000_000.0)
    total_e4 = F.coalesce(F.sum("_seg_e4"), F.lit(0)).cast("long")
    return (
        seg.groupBy(entity_col)
        .agg(
            F.count(F.lit(1)).alias("n_pings"),
            F.count("_seg_e4").alias("n_segments"),
            total_e4.alias("total_km_e4"),
            F.coalesce(F.max("_seg_e4"), F.lit(0)).cast("long").alias("max_km_e4"),
            dur_s.alias("duration_s"),
        )
        .withColumn(
            "avg_kmh",
            F.when(
                F.col("duration_s") > 0,
                F.round(
                    (F.col("total_km_e4") / 10000.0)
                    / (F.col("duration_s") / 3600.0),
                    4,
                ),
            ).otherwise(F.lit(0.0)),
        )
    )
