"""CDC latest-wins upsert: semantics and plan shape."""

from pyspark.sql import functions as F

from mvtspark.operators.cdc import latest_wins_upsert


def _feed(spark):
    rows = [
        # key 1: insert -> update (survives with v2 payload)
        (1, 10, 1, "upsert", 100),
        (1, 11, 2, "upsert", 200),
        # key 2: insert -> delete (gone)
        (2, 20, 1, "upsert", 300),
        (2, 21, 2, "delete", 0),
        # key 3: delete -> later re-insert (resurrected)
        (3, 30, 1, "delete", 0),
        (3, 31, 2, "upsert", 400),
        # key 4: same version ts, tiebreak on change_id (higher wins)
        (4, 40, 5, "upsert", 500),
        (4, 41, 5, "upsert", 600),
    ]
    return spark.createDataFrame(
        rows, "key long, change_id long, ver long, op string, payload long"
    )


def test_upsert_semantics(spark):
    snap = {
        r.key: r
        for r in latest_wins_upsert(
            _feed(spark),
            key_cols=["key"],
            order_cols=["ver", "change_id"],
            is_delete=F.col("op") == "delete",
        ).collect()
    }
    assert set(snap) == {1, 3, 4}  # 2 deleted
    assert snap[1].payload == 200 and snap[1].change_id == 11
    assert snap[3].payload == 400  # resurrection after delete
    assert snap[4].payload == 600  # change_id tiebreak at equal ver


def test_plan_is_partial_agg_not_window(spark):
    df = latest_wins_upsert(
        _feed(spark), key_cols=["key"], order_cols=["ver", "change_id"]
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan
    assert "max_by" in plan and "partial_max_by" in plan, plan


def test_scd2_intervals_chain(spark):
    from mvtspark.operators.cdc import scd2_intervals

    rows = sorted(
        scd2_intervals(
            _feed(spark),
            key_cols=["key"],
            order_cols=["ver", "change_id"],
            ts_col="ver",
        )
        .where(F.col("key") == 1)
        .collect(),
        key=lambda r: r.ver,
    )
    assert [(r.valid_from, r.valid_to, r.is_current) for r in rows] == [
        (1, 2, False),
        (2, None, True),
    ]
