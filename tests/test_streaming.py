"""Structured Streaming wrappers (SURVEY §2.10): windowed per-tile
counts with watermark + dedup, and the foreachBatch MVT-encode sink with
checkpoint lineage."""

import os
import uuid

import pytest
from pyspark.sql import functions as F

from mvtspark.sources.images import synth_points
from mvtspark.streaming import (
    file_points_stream,
    stream_encode_sink,
    stream_tile_counts,
)

N = 500
ZOOM = 6


@pytest.fixture()
def points_dir(spark, tmp_path):
    """Two micro-batch files of deterministic points with event time;
    batch 2 duplicates half of batch 1 (dedup must drop them)."""
    path = str(tmp_path / "pts")
    pts = synth_points(spark, N).withColumn(
        "ingest_ts", F.timestamp_seconds(F.lit(1_700_000_000))
    )
    pts.coalesce(1).write.mode("overwrite").parquet(path + "/b1")
    dup = pts.limit(N // 2)
    dup.coalesce(1).write.mode("overwrite").parquet(path + "/b2")
    flat = str(tmp_path / "flat")
    os.makedirs(flat)
    i = 0
    for sub in ("b1", "b2"):
        for f_ in os.listdir(os.path.join(path, sub)):
            if f_.endswith(".parquet"):
                os.rename(
                    os.path.join(path, sub, f_),
                    os.path.join(flat, f"part-{i}.parquet"),
                )
                i += 1
    return flat


def test_stream_tile_counts_dedup_matches_batch(spark, points_dir, tmp_path):
    stream = file_points_stream(spark, points_dir, max_files_per_trigger=1)
    counts = stream_tile_counts(stream, zoom=ZOOM)
    qname = f"tc_{uuid.uuid4().hex[:8]}"
    q = (
        counts.writeStream.outputMode("complete")
        .format("memory")
        .queryName(qname)
        .option("checkpointLocation", str(tmp_path / "ckpt_q"))
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = spark.table(qname).groupBy().agg(
        F.sum("image_count").alias("n"), F.count(F.lit(1)).alias("tiles")
    ).collect()[0]

    # batch oracle: same pipeline, duplicates removed
    from mvtspark.operators.spatial import assign_tiles

    batch = (
        assign_tiles(spark.read.parquet(points_dir).dropDuplicates(["image_id"]),
                     zoom=ZOOM)
        .groupBy("zoom", "x", "y").count()
    )
    exp = batch.groupBy().agg(
        F.sum("count").alias("n"), F.count(F.lit(1)).alias("tiles")
    ).collect()[0]
    assert got.n == exp.n == N  # duplicates deduped, nothing lost
    assert got.tiles == exp.tiles


def test_stream_encode_sink_writes_tiles_and_lineage(spark, points_dir, tmp_path):
    tiles_path = str(tmp_path / "tiles")
    ckpt_path = str(tmp_path / "lineage")
    stream = file_points_stream(spark, points_dir, max_files_per_trigger=1)
    writer = stream_encode_sink(
        stream, zoom=ZOOM, tiles_path=tiles_path, checkpoint_path=ckpt_path
    )
    q = writer.option("checkpointLocation", str(tmp_path / "ckpt_s")).start()
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    tiles = spark.read.parquet(tiles_path)
    assert tiles.agg(F.sum("feature_count")).collect()[0][0] == N + N // 2
    # every tile decodes back cleanly with our own kernels
    from mvtspark.sources.tiles import decode_tiles

    dec = decode_tiles(tiles.select("zoom", "x", "y", "mvt"))
    assert dec.where(F.col("decode_error").isNotNull()).count() == 0

    lineage = spark.read.parquet(ckpt_path)
    # one stage per micro-batch epoch, row counts sum to total tiles
    assert lineage.select("stage").distinct().count() >= 2
    assert (
        lineage.agg(F.sum("row_count")).collect()[0][0] == tiles.count()
    )


def test_epoch_replay_is_exactly_once(spark, tmp_path):
    """Crash-replay matrix for the foreachBatch sink (VERDICT r3 #7):
    Structured Streaming re-delivers the same (data, epoch_id) after a
    failure, so the writer must be idempotent per epoch. Drives
    make_epoch_batch_writer directly through the three states a crash
    can leave behind:

    a. epoch fully committed → replay is a NO-OP (tile bytes, row
       counts and lineage rows all unchanged);
    b. crash AFTER the data write but BEFORE the lineage marker →
       replay overwrites the partial epoch dir, no duplicates;
    c. distinct epochs still accumulate (idempotence isn't 'write
       once ever').
    """
    from mvtspark.streaming import make_epoch_batch_writer

    tiles_path = str(tmp_path / "tiles")
    ckpt_path = str(tmp_path / "lineage")
    pts = synth_points(spark, 300).withColumn(
        "ingest_ts", F.timestamp_seconds(F.lit(1_700_000_000))
    )
    b0, b1 = pts.limit(200), pts.subtract(pts.limit(200))
    batch = make_epoch_batch_writer(ZOOM, tiles_path, ckpt_path)

    def snapshot():
        t = spark.read.parquet(tiles_path)
        rows = t.count()
        feats = t.agg(F.sum("feature_count")).collect()[0][0]
        lin = spark.read.parquet(ckpt_path).count()
        return rows, feats, lin

    # (a) committed epoch replayed → byte-for-byte no-op
    batch(b0, 0)
    first = snapshot()
    files = {
        f: os.path.getmtime(os.path.join(r, f))
        for r, _, fs in os.walk(tiles_path) for f in fs
    }
    batch(b0, 0)  # replay
    assert snapshot() == first
    assert {
        f: os.path.getmtime(os.path.join(r, f))
        for r, _, fs in os.walk(tiles_path) for f in fs
    } == files  # nothing rewritten, not even same-content files

    # (b) partial epoch dir without its marker (crash mid-epoch):
    # pollute epoch=1 with a copy of epoch 0's output, then replay
    spark.read.parquet(tiles_path + "/epoch=0").drop("epoch").write.mode(
        "overwrite"
    ).parquet(tiles_path + "/epoch=1")
    batch(b1, 1)
    t1 = spark.read.parquet(tiles_path + "/epoch=1")
    assert t1.agg(F.sum("feature_count")).collect()[0][0] == 100
    # (c) the two committed epochs accumulate exactly once each
    total = spark.read.parquet(tiles_path)
    assert total.agg(F.sum("feature_count")).collect()[0][0] == 300
    lineage = spark.read.parquet(ckpt_path)
    assert lineage.select("stage").distinct().count() == 2
    assert lineage.agg(F.sum("row_count")).collect()[0][0] == total.count()


def test_counts_ledger_maintenance_exactly_once(spark, points_dir, tmp_path):
    """streaming × incremental: the delta-ledger sink maintains
    materialized per-tile counts across micro-batches; the ledger sum
    must equal a full batch recompute at EVERY level, a replayed epoch
    must be a no-op, and the end-to-end stream wiring must agree with
    the directly-driven writer."""
    from mvtspark.operators.spatial import assign_tiles
    from mvtspark.streaming import (
        read_tile_counts,
        stream_tile_counts_maintenance,
    )

    ZM, LV = ZOOM, 3
    counts_path = str(tmp_path / "counts")
    ckpt_path = str(tmp_path / "lineage")
    stream = file_points_stream(spark, points_dir, max_files_per_trigger=1)
    q = (
        stream_tile_counts_maintenance(
            stream, ZM, counts_path, ckpt_path, levels=LV
        )
        .option("checkpointLocation", str(tmp_path / "ckpt_s"))
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    got = {
        (r.zoom, r.x, r.y): r.n_points
        for r in read_tile_counts(spark, counts_path).collect()
    }
    # oracle: full recompute over ALL arrived points (stream is
    # insert-only here; duplicates in batch 2 are real arrivals)
    pts = assign_tiles(spark.read.parquet(points_dir), zoom=ZM)
    want = {}
    for r in pts.select("x", "y").collect():
        for lv in range(LV):
            k = (ZM - lv, r.x >> lv, r.y >> lv)
            want[k] = want.get(k, 0) + 1
    assert got == want

    # replay the first committed epoch directly → ledger unchanged
    from mvtspark.streaming import make_counts_maintenance_writer

    lineage = spark.read.parquet(ckpt_path)
    n_lineage = lineage.count()
    batch = make_counts_maintenance_writer(ZM, counts_path, ckpt_path, LV)
    first = spark.read.parquet(points_dir).limit(100)
    batch(first, 0)  # epoch 0 already committed by the stream
    assert {
        (r.zoom, r.x, r.y): r.n_points
        for r in read_tile_counts(spark, counts_path).collect()
    } == want
    assert spark.read.parquet(ckpt_path).count() == n_lineage


def test_ledger_compaction_preserves_counts(spark, tmp_path):
    """compact_tile_counts folds old epochs into the epoch=-1 base:
    the ledger sum is invariant across compaction, later epochs keep
    accumulating, and both crash windows (pre-commit tmp garbage;
    post-commit interrupted swap) recover to the same state."""
    import json as _json
    import os as _os

    from mvtspark.streaming import (
        compact_tile_counts,
        make_counts_maintenance_writer,
        read_tile_counts,
    )

    counts_path = str(tmp_path / "counts")
    ckpt_path = str(tmp_path / "lineage")
    pts = synth_points(spark, 300).withColumn(
        "ingest_ts", F.timestamp_seconds(F.lit(1_700_000_000))
    )
    batch = make_counts_maintenance_writer(ZOOM, counts_path, ckpt_path, 2)
    batch(pts.limit(100), 0)
    batch(pts.subtract(pts.limit(100)).limit(100), 1)
    batch(pts.subtract(pts.limit(200)), 2)

    def snap():
        return {
            (r.zoom, r.x, r.y): r.n_points
            for r in read_tile_counts(spark, counts_path).collect()
        }

    before = snap()
    assert compact_tile_counts(spark, counts_path, ckpt_path, 1) == 2
    assert snap() == before
    dirs = sorted(
        d for d in _os.listdir(counts_path) if d.startswith("epoch=")
    )
    assert dirs == ["epoch=-1", "epoch=2"]
    # compact everything (old base + epoch 2) → single base, same sum
    assert compact_tile_counts(spark, counts_path, ckpt_path, 2) == 1
    assert snap() == before
    # pre-commit crash: stray tmp without manifest is discarded
    _os.makedirs(_os.path.join(counts_path, "_compact_tmp"), exist_ok=True)
    assert compact_tile_counts(spark, counts_path, ckpt_path, 99) == 0
    assert snap() == before
    assert not _os.path.exists(_os.path.join(counts_path, "_compact_tmp"))
    # UNCOMMITTED epoch (writer crashed before its marker): compaction
    # must leave it alone — the stream will overwrite it on replay, and
    # folding it first would double-count that replay
    spark.read.parquet(counts_path + "/epoch=-1").write.mode(
        "overwrite"
    ).parquet(counts_path + "/epoch=7")  # garbage deltas, no marker
    assert compact_tile_counts(spark, counts_path, ckpt_path, 99) == 0
    assert "epoch=7" in set(_os.listdir(counts_path))
    batch7 = make_counts_maintenance_writer(ZOOM, counts_path, ckpt_path, 2)
    replay7 = pts.limit(30)
    batch7(replay7, 7)  # the stream's replay commits epoch 7 properly
    want7 = dict(before)
    from mvtspark.operators.spatial import assign_tiles as _at

    for r in _at(replay7, zoom=ZOOM).select("x", "y").collect():
        for lv in range(2):
            k = (ZOOM - lv, r.x >> lv, r.y >> lv)
            want7[k] = want7.get(k, 0) + 1
    assert snap() == want7
    # now committed → a later compaction folds it
    assert compact_tile_counts(spark, counts_path, ckpt_path, 99) == 1
    assert snap() == want7
    # post-commit crash: manifest written, swap interrupted → the next
    # compaction call replays the swap before doing anything else
    batch(pts.limit(50), 3)  # one more epoch to fold
    after3 = snap()
    led = spark.read.parquet(counts_path)
    folded = (
        led.where(F.col("epoch") <= 3).drop("epoch")
        .groupBy("zoom", "x", "y")
        .agg(F.sum("delta").cast("long").alias("delta"))
        .where(F.col("delta") != 0)
    )
    folded.write.mode("overwrite").parquet(
        _os.path.join(counts_path, "_compact_tmp")
    )
    with open(_os.path.join(counts_path, "_compact_manifest.json"), "w") as f:
        _json.dump([3], f)  # commit point reached, swap never ran
    assert compact_tile_counts(spark, counts_path, ckpt_path, 3) == 0
    assert snap() == after3
    assert sorted(
        d for d in _os.listdir(counts_path) if d.startswith("epoch=")
    ) == ["epoch=-1"]


def test_stateful_running_totals_accumulate_across_batches(spark, tmp_path):
    """applyInPandasWithState: a tile hit in BOTH micro-batches must
    emit two updates with a growing total (state survived the batch
    boundary); final MAX per tile equals the batch-side count."""
    import uuid

    from mvtspark.streaming import file_points_stream, stream_running_tile_totals
    from mvtspark.operators.spatial import assign_tiles

    path = str(tmp_path / "in")
    pts = synth_points(spark, 800).withColumn(
        "ingest_ts", F.timestamp_seconds(F.lit(1_700_000_000))
    )
    b1 = pts.where(F.col("image_id") < "img000000000400")
    b2 = pts.where(F.col("image_id") >= "img000000000400")
    b1.coalesce(1).write.mode("append").parquet(path)
    b2.coalesce(1).write.mode("append").parquet(path)

    stream = file_points_stream(spark, path, max_files_per_trigger=1)
    name = "stt_" + uuid.uuid4().hex[:8]
    q = (
        stream_running_tile_totals(stream, zoom=4)
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    emitted = spark.table(name)
    # at zoom 4 the city clusters guarantee tiles present in both halves:
    # those tiles emit one update per batch, the second strictly larger
    multi = (
        emitted.groupBy("zoom", "x", "y")
        .agg(
            F.count(F.lit(1)).alias("n_updates"),
            F.max("total").alias("final"),
            F.min("total").alias("first"),
        )
        .where(F.col("n_updates") >= 2)
    )
    rows = multi.collect()
    assert rows, "no tile saw more than one micro-batch"
    assert all(r.final > r.first for r in rows)
    # final totals match the batch-side truth
    batch_counts = {
        (r.zoom, r.x, r.y): r.cnt
        for r in assign_tiles(pts, zoom=4)
        .groupBy("zoom", "x", "y")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .collect()
    }
    finals = {
        (r.zoom, r.x, r.y): r.final
        for r in emitted.groupBy("zoom", "x", "y")
        .agg(F.max("total").alias("final"))
        .collect()
    }
    assert finals == batch_counts


def test_geofence_transitions_state_spans_batches(spark, tmp_path):
    """A user whose track is SPLIT across two ordered micro-batch files
    must not re-emit an 'enter' for a fence it was already inside — the
    state store's last_mask carries the membership across batches."""
    import datetime as dt
    import os as _os
    import time

    from mvtspark.operators.geofence import hex_fences
    from mvtspark.streaming import file_pings_stream, stream_geofence_transitions

    fences = hex_fences(1)
    # fence 0 center:
    edges = fences[0][1]
    cx = sum(e[0] for e in edges) / 6
    cy = sum(e[1] for e in edges) / 6
    t0 = dt.datetime(2024, 1, 1)

    def ping(i, inside):
        off = 0.3 if inside else 50.0
        return (7, t0 + dt.timedelta(minutes=i), cx + off, cy)

    base = str(tmp_path / "in")
    # batch 1: outside -> inside (one enter); still inside at batch end
    b1 = spark.createDataFrame(
        [ping(0, False), ping(1, True), ping(2, True)],
        "user_id long, ts timestamp_ntz, lng double, lat double",
    )
    # batch 2: starts inside (NO new enter), then exits (one exit)
    b2 = spark.createDataFrame(
        [ping(3, True), ping(4, False)],
        "user_id long, ts timestamp_ntz, lng double, lat double",
    )
    b1.coalesce(1).write.mode("append").parquet(base)
    time.sleep(0.05)
    b2.coalesce(1).write.mode("append").parquet(base)
    # force strictly increasing mtimes so file order == event order
    files = sorted(
        (f for f in _os.listdir(base) if f.endswith(".parquet")),
        key=lambda f: _os.path.getmtime(_os.path.join(base, f)),
    )
    for k, f in enumerate(files):
        p = _os.path.join(base, f)
        _os.utime(p, (1_700_000_000 + k, 1_700_000_000 + k))

    stream = file_pings_stream(spark, base, max_files_per_trigger=1)
    name = "geot_" + uuid.uuid4().hex[:8]
    q = (
        stream_geofence_transitions(stream, fences)
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = sorted(spark.table(name).collect(), key=lambda r: r.ts_us)
    assert [(r.fence_id, r.entered) for r in rows] == [(0, True), (0, False)]
    assert rows[0].user_id == 7


def test_geofence_emits_catalog_fence_ids_not_bit_positions(spark, tmp_path):
    """A fence catalog with NON-contiguous ids (3, 7) must emit those
    ids in alerts, not the 0/1 bit positions of the sorted catalog."""
    import datetime as dt
    import uuid

    from mvtspark.operators.geofence import hex_fences
    from mvtspark.streaming import file_pings_stream, stream_geofence_transitions

    base_fences = hex_fences(2)
    # relabel to sparse ids; fence "7" is the original fence 1
    fences = [(3, base_fences[0][1]), (7, base_fences[1][1])]
    edges = base_fences[1][1]
    cx = sum(e[0] for e in edges) / 6
    cy = sum(e[1] for e in edges) / 6
    t0 = dt.datetime(2024, 1, 1)
    rows = [
        (9, t0, cx + 50.0, cy),                       # outside all
        (9, t0 + dt.timedelta(minutes=1), cx, cy),     # enters fence "7"
        (9, t0 + dt.timedelta(minutes=2), cx + 50.0, cy),  # exits
    ]
    base = str(tmp_path / "in")
    spark.createDataFrame(
        rows, "user_id long, ts timestamp_ntz, lng double, lat double"
    ).coalesce(1).write.mode("append").parquet(base)

    stream = file_pings_stream(spark, base)
    name = "geoid_" + uuid.uuid4().hex[:8]
    q = (
        stream_geofence_transitions(stream, fences)
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = sorted(spark.table(name).collect(), key=lambda r: r.ts_us)
    assert [(r.fence_id, r.entered) for r in got] == [(7, True), (7, False)]


def test_streaming_session_merges_across_batches(spark, tmp_path):
    """One user's session SPLIT across two micro-batch files must merge
    in the state store into a single session (events 10 min apart,
    gap 30 min), emitted once when the sentinel advances the watermark."""
    import datetime as dt
    import os as _os
    import uuid

    from mvtspark.streaming import file_sessions_stream, stream_user_sessions

    t0 = dt.datetime(2024, 1, 1)
    base = str(tmp_path / "in")
    b1 = [(7, t0), (7, t0 + dt.timedelta(minutes=10))]
    b2 = [(7, t0 + dt.timedelta(minutes=20)), (8, t0)]
    b3 = [(-1, t0 + dt.timedelta(days=365))]  # sentinel: flush watermark
    for rows in (b1, b2, b3):
        spark.createDataFrame(rows, "user_id long, ts timestamp").coalesce(
            1
        ).write.mode("append").parquet(base)
    files = sorted(
        (f for f in _os.listdir(base) if f.endswith(".parquet")),
        key=lambda f: _os.path.getmtime(_os.path.join(base, f)),
    )
    for i, f in enumerate(files):
        _os.utime(_os.path.join(base, f), (1_700_000_000 + i,) * 2)

    stream = file_sessions_stream(spark, base, max_files_per_trigger=1)
    name = "sessm_" + uuid.uuid4().hex[:8]
    q = (
        stream_user_sessions(stream, gap="30 minutes")
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(300)
    rows = {
        r.user_id: r
        for r in spark.table(name).where("user_id != -1").collect()
    }
    us = lambda d: int(d.timestamp() * 1_000_000)
    assert rows[7].n_events == 3  # merged across batch 1 and 2
    assert rows[7].session_start_us == us(t0.replace(tzinfo=dt.timezone.utc))
    assert rows[7].session_end_us == us(
        (t0 + dt.timedelta(minutes=50)).replace(tzinfo=dt.timezone.utc)
    )
    assert rows[8].n_events == 1


def test_ledger_read_skips_uncommitted_epoch(spark, tmp_path):
    """Exactly-once READ path: an epoch dir whose writer crashed after
    the parquet write but before its lineage marker must not be summed
    (its deltas are partial/stale until the stream replays the epoch).
    read_tile_counts(checkpoint_path=...) filters to committed epochs
    (plus the epoch=-1 base); the unfiltered read documents the dirty
    window."""
    from mvtspark.streaming import (
        make_counts_maintenance_writer,
        read_tile_counts,
    )

    counts_path = str(tmp_path / "counts")
    ckpt_path = str(tmp_path / "lineage")
    pts = synth_points(spark, 200).withColumn(
        "ingest_ts", F.timestamp_seconds(F.lit(1_700_000_000))
    )
    batch = make_counts_maintenance_writer(ZOOM, counts_path, ckpt_path, 2)
    batch(pts.limit(100), 0)
    batch(pts.subtract(pts.limit(100)), 1)
    committed = {
        (r.zoom, r.x, r.y): r.n_points
        for r in read_tile_counts(spark, counts_path, ckpt_path).collect()
    }
    # simulate the crash window: epoch 2's parquet lands, marker never
    # written (half the batch → partial deltas)
    from mvtspark.operators.incremental import tile_count_deltas
    from mvtspark.operators.spatial import assign_tiles

    half = assign_tiles(pts.limit(50), zoom=ZOOM).select(
        F.lit(None).cast("int").alias("old_x"),
        F.lit(None).cast("int").alias("old_y"),
        F.col("x").cast("int").alias("new_x"),
        F.col("y").cast("int").alias("new_y"),
    )
    tile_count_deltas(half, ZOOM, 2).write.mode("overwrite").parquet(
        counts_path + "/epoch=2"
    )
    filtered = {
        (r.zoom, r.x, r.y): r.n_points
        for r in read_tile_counts(spark, counts_path, ckpt_path).collect()
    }
    dirty = {
        (r.zoom, r.x, r.y): r.n_points
        for r in read_tile_counts(spark, counts_path).collect()
    }
    assert filtered == committed  # uncommitted epoch invisible
    assert dirty != committed  # the raw read really had a dirty window
    # once the "replay" commits epoch 2, the filtered read picks it up
    batch(pts.limit(50), 2)
    after = {
        (r.zoom, r.x, r.y): r.n_points
        for r in read_tile_counts(spark, counts_path, ckpt_path).collect()
    }
    assert sum(after.values()) == sum(committed.values()) + 50 * 2


def test_read_stream_tiles_flat_schema_and_committed_filter(
    spark, points_dir, tmp_path
):
    """read_stream_tiles restores the pre-epoch flat schema (no epoch
    column) and, given the checkpoint, hides a half-written epoch."""
    from mvtspark.streaming import make_epoch_batch_writer, read_stream_tiles

    tiles_path = str(tmp_path / "tiles")
    ckpt_path = str(tmp_path / "lineage")
    batch = make_epoch_batch_writer(ZOOM, tiles_path, ckpt_path)
    pts = spark.read.parquet(points_dir)
    batch(pts.limit(200), 0)
    committed = read_stream_tiles(spark, tiles_path, ckpt_path)
    assert "epoch" not in committed.columns
    n0 = committed.count()
    assert n0 > 0
    # crash window: epoch 1 parquet exists, no marker
    spark.read.parquet(tiles_path + "/epoch=0").write.mode(
        "overwrite"
    ).parquet(tiles_path + "/epoch=1")
    assert read_stream_tiles(spark, tiles_path, ckpt_path).count() == n0
    assert read_stream_tiles(spark, tiles_path).count() == 2 * n0
