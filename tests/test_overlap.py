"""bbox_overlap_join (operators/overlap.py): the PBSM grid join must
agree pair-for-pair with the naive inequality cross join, emit each
pair exactly once (corner rule), and honor closed-interval boundary
semantics."""

from pyspark.sql import functions as F

from mvtspark.operators.overlap import bbox_overlap_join


def _rects(spark, n, seed_mul, prefix):
    x0 = F.col("id") * seed_mul % 10000
    y0 = F.col("id") * (seed_mul * 3 + 1) % 10000
    w = F.col("id") % 900 + 100
    h = (F.col("id") * 3) % 900 + 100
    return spark.range(0, n).select(
        F.col("id").alias(f"{prefix}id"),
        x0.alias(f"{prefix}xmin"),
        y0.alias(f"{prefix}ymin"),
        (x0 + w).alias(f"{prefix}xmax"),
        (y0 + h).alias(f"{prefix}ymax"),
    )


def test_overlap_matches_naive_and_unique(spark):
    a = _rects(spark, 300, 48271, "a_")
    b = _rects(spark, 300, 16807, "b_")
    got = bbox_overlap_join(a, b, cell=512).cache()
    naive = (
        a.crossJoin(b)
        .where(
            (F.col("a_xmin") <= F.col("b_xmax"))
            & (F.col("b_xmin") <= F.col("a_xmax"))
            & (F.col("a_ymin") <= F.col("b_ymax"))
            & (F.col("b_ymin") <= F.col("a_ymax"))
        )
        .select(
            "a_id",
            "b_id",
            F.greatest("a_xmin", "b_xmin").alias("ixmin"),
            F.greatest("a_ymin", "b_ymin").alias("iymin"),
            F.least("a_xmax", "b_xmax").alias("ixmax"),
            F.least("a_ymax", "b_ymax").alias("iymax"),
        )
    )
    n_got = got.count()
    assert n_got > 0
    # exactly-once: no pair appears twice
    assert got.select("a_id", "b_id").distinct().count() == n_got
    assert got.exceptAll(naive).count() == 0
    assert naive.exceptAll(got).count() == 0


def test_overlap_touching_edges_count(spark):
    a = spark.createDataFrame(
        [(1, 0, 0, 10, 10)], ["a_id", "a_xmin", "a_ymin", "a_xmax", "a_ymax"]
    )
    b = spark.createDataFrame(
        # touches right edge / corner / disjoint by one
        [(1, 10, 0, 20, 10), (2, 10, 10, 20, 20), (3, 11, 0, 20, 10)],
        ["b_id", "b_xmin", "b_ymin", "b_xmax", "b_ymax"],
    )
    got = {
        (r.b_id, r.ixmin, r.iymin, r.ixmax, r.iymax)
        for r in bbox_overlap_join(a, b, cell=8).collect()
    }
    assert got == {(1, 10, 0, 10, 10), (2, 10, 10, 10, 10)}
