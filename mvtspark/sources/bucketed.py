"""Bucketed table layout for co-located joins (100-TB design surface).

At fact-x-fact scale (events x user profiles, points x per-tile stats)
neither side broadcasts, and a repeated sort-merge join pays a full
shuffle of BOTH tables every query. Writing both tables bucketed (and
sorted) on the join key moves that shuffle to WRITE time, once:
Spark's bucketed scan exposes the hash-partitioning to Catalyst, which
then plans the join with NO Exchange on either side (and with sorted
buckets, no Sort either). The same layout serves every future join on
that key — the batch analog of the Iceberg `bucket(n, key)` partition
transform the SURVEY's production notes assume.

Both helpers are thin — the point is the LAYOUT CONTRACT, asserted by
`tests/test_bucketed_join.py` (the join plan over two bucketed tables
must contain no shuffle) and documented in PLANS.md.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    path: str,
    bucket_cols: list[str],
    n_buckets: int,
    sort_cols: list[str] | None = None,
) -> None:
    """Persist ``df`` as an external bucketed (+sorted) table.

    Bucket count is the knob to keep per-bucket data under executor
    memory at target scale (buckets >= max-parallelism, ideally a
    multiple of it); both sides of a co-located join must use the SAME
    count and columns."""
    w = (
        df.write.mode("overwrite")
        .option("path", path)
        .bucketBy(n_buckets, *bucket_cols)
    )
    if sort_cols:
        w = w.sortBy(*sort_cols)
    w.saveAsTable(table)


def colocated_join(
    spark: SparkSession, left_table: str, right_table: str, on: list[str]
) -> DataFrame:
    """Join two same-bucketed tables on their bucket key — Catalyst
    reuses the on-disk hash partitioning (zero Exchange)."""
    return spark.table(left_table).join(spark.table(right_table), on)
