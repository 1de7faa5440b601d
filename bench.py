"""Benchmark harness (reference protocol: warm-up run discarded, timed
runs averaged — src/Bench/Program.cs:68-114; population stddev per
BASELINE.md).

Default mode: run the headline suite at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and print ONE JSON
line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...} plus throughput extras
(rows_per_sec / tiles_per_sec for the north-star spatial job).

Scaling-evidence mode (BASELINE.md "sandbox scaling evidence"):
    python bench.py --scaling
runs the identical spatial job at local[8] and local[32] on the SAME
pre-generated parquet input in fresh subprocesses (fresh JVM each) and
writes BENCH.md with throughput@both + efficiency = (T8/T32)/4.

Worker mode (internal, used by --scaling):
    python bench.py --job spatial --cores N --points <parquet> --json-only
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
RUNS = int(os.environ.get("BENCH_RUNS", "2"))
POINTS_DEFAULT = "/tmp/mvtspark_bench/points.parquet"

# north-star spatial job size: ~2M points at sf0.1
N_POINTS = {"0.001": 20_000, "0.01": 200_000, "0.1": 2_000_000}


def _sf_tag() -> str:
    for tag in ("0.001", "0.01", "0.1"):
        if SF_DIR.rstrip("/").endswith(f"sf{tag}"):
            return tag
    return "0.1"


def _spark(cores: int):
    from mvtspark.session import get_spark

    return get_spark("bench", cores=cores, shuffle_partitions=cores * 2)


def gen_points(spark, n: int, path: str) -> None:
    from mvtspark.sources.images import synth_points

    if os.path.exists(os.path.join(path, "_SUCCESS")):
        return
    synth_points(spark, n).write.mode("overwrite").parquet(path)


def spatial_job(spark, points_path: str):
    """The north-star job: tile assignment (D19, native) → broadcast PIP
    spatial join (J4) → salted per-tile aggregation (A7). Returns
    (n_rows_in, n_tiles_out)."""
    from pyspark.sql import functions as F

    from mvtspark.operators.spatial import (
        assign_tiles, salted_tile_counts, spatial_join_pip,
    )

    pts = spark.read.parquet(points_path)
    assigned = assign_tiles(pts, zoom=10)
    extent = 4096
    ring_x = F.array(*[F.lit(v).cast("long") for v in (0, extent, extent, 0, 0)])
    ring_y = F.array(*[F.lit(v).cast("long") for v in (0, 0, extent, extent, 0)])
    polys = (
        assigned.select("zoom", "x", "y").distinct()
        .withColumns({"extent": F.lit(extent), "ring_x": ring_x, "ring_y": ring_y})
    )
    joined = spatial_join_pip(assigned, polys, broadcast_dim=True)
    counts = salted_tile_counts(joined, salt_buckets=16)
    row = counts.agg(
        F.sum("image_count").alias("rows"), F.count(F.lit(1)).alias("tiles")
    ).collect()[0]
    return int(row.rows), int(row.tiles)


def mvt_codec_job(spark, points_path: str, cap: int = 300_000):
    """Encode per-tile MVT protobufs from joined points and decode them
    back (S9 + D1-D8) — the reference Bench's decode loop, distributed."""
    from pyspark.sql import functions as F

    from mvtspark.operators.spatial import assign_tiles
    from mvtspark.sources.tiles import decode_tiles, encode_tiles

    pts = spark.read.parquet(points_path)
    total = pts.count()
    if total > cap:  # distributed downsample — never a single-task limit()
        pts = pts.sample(fraction=cap / total, seed=42)
    a = assign_tiles(pts, zoom=10)
    feats = a.select(
        "zoom", "x", "y", F.lit(4096).alias("extent"),
        F.xxhash64("image_id").bitwiseAND(F.lit((1 << 62) - 1)).alias("feature_id"),
        F.lit(1).alias("geom_type"),
        F.array(F.lit(0), F.lit(1)).cast("array<int>").alias("part_offsets"),
        F.array(F.col("px")).alias("xs"),
        F.array(F.col("py")).alias("ys"),
        F.to_json(F.struct("caption")).alias("props"),
    )
    tiles = encode_tiles(feats, layer_name="images")
    dec = decode_tiles(tiles.select("zoom", "x", "y", "mvt"))
    n = dec.where(F.col("decode_error").isNull()).count()
    return n


def timed(fn, runs: int = RUNS):
    import gc

    fn()  # warm-up, discarded (ref Program.cs:86-91)
    times = []
    for _ in range(runs):
        gc.collect()  # flush py4j detach backlog outside the timed window
        t0 = time.time()
        out = fn()
        times.append(time.time() - t0)
    return sum(times) / len(times), times, out


def run_worker(job: str, cores: int, points_path: str) -> dict:
    spark = _spark(cores)
    if job == "spatial":
        avg, times, (rows, tiles) = timed(lambda: spatial_job(spark, points_path))
        return {
            "job": job, "cores": cores, "sec": round(avg, 3),
            "runs": times, "rows": rows, "tiles": tiles,
            "rows_per_sec": round(rows / avg, 1),
            "tiles_per_sec": round(tiles / avg, 1),
            "stddev_pop": round(statistics.pstdev(times), 3) if len(times) > 1 else 0.0,
        }
    raise SystemExit(f"unknown job {job}")


def suite(spark) -> dict[str, float]:
    """Headline per-query timings at SF_DIR (driver contract queries —
    the ones that exercise distinct plan shapes at scale)."""
    import __spark_entry__ as entry

    qs = entry.queries()
    names = [
        "q1_pricing_summary", "q3_shipping_priority", "q5_region_revenue",
        "top_orders_per_customer", "sessionize_events", "events_hourly",
        "tile_assign_events", "knn_sites", "text_stats",
        "minhash_lsh", "simhash_pairs", "embedding_cosine_pairs", "ann_topk",
    ]
    out: dict[str, float] = {}
    for name in names:
        fn = qs[name]

        def run(fn=fn):
            fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()

        avg, _, _ = timed(run)
        out[name] = round(avg, 3)
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--scaling", action="store_true")
    ap.add_argument("--job")
    ap.add_argument("--cores", type=int, default=CPUS)
    ap.add_argument("--points", default=POINTS_DEFAULT)
    ap.add_argument("--json-only", action="store_true")
    args = ap.parse_args()

    sf = _sf_tag()
    n_points = N_POINTS[sf]

    if args.job:  # worker mode
        print(json.dumps(run_worker(args.job, args.cores, args.points)))
        return

    if args.scaling:
        spark = _spark(CPUS)
        gen_points(spark, n_points, args.points)
        spark.stop()
        results = []
        for cores in (8, 32):
            env = dict(os.environ, SPARK_GRAFT_CPUS=str(cores))
            p = subprocess.run(
                [sys.executable, __file__, "--job", "spatial",
                 "--cores", str(cores), "--points", args.points],
                capture_output=True, text=True, env=env,
            )
            line = [l for l in p.stdout.splitlines() if l.startswith("{")][-1]
            results.append(json.loads(line))
        eff = (results[0]["sec"] / results[1]["sec"]) / (32 / 8)
        report = {
            "n_points": n_points, "sf": float(sf),
            "local8": results[0], "local32": results[1],
            "scaling_efficiency": round(eff, 3),
        }
        _write_bench_md(report)
        print(json.dumps(report))
        return

    # default: headline suite + spatial throughput, one JSON line
    spark = _spark(CPUS)
    gen_points(spark, n_points, args.points)
    q = suite(spark)
    sp_avg, _, (rows, tiles) = timed(lambda: spatial_job(spark, args.points))
    q["spatial_join_pipeline"] = round(sp_avg, 3)
    mv_avg, _, n_feats = timed(lambda: mvt_codec_job(spark, args.points))
    q["mvt_encode_decode"] = round(mv_avg, 3)
    total = round(sum(q.values()), 3)
    print(json.dumps({
        "metric": "tile-assignment + spatial-join + headline-suite elapsed",
        "value": total,
        "unit": "sec",
        "queries": q,
        "sf": float(sf),
        "cores": CPUS,
        "spatial_rows": rows,
        "spatial_tiles": tiles,
        "rows_per_sec": round(rows / sp_avg, 1),
        "tiles_per_sec": round(tiles / sp_avg, 1),
        "mvt_features_decoded": n_feats,
        "mvt_features_per_sec": round(n_feats / mv_avg, 1),
    }))


def _write_bench_md(report: dict) -> None:
    l8, l32 = report["local8"], report["local32"]
    md = f"""# BENCH — scaling evidence (sandbox substitute for N→4N executors)

Same job, same input ({report['n_points']:,} synthetic geotagged points,
sf{report['sf']}), fresh JVM per run, warm-up discarded, {len(l8['runs'])} timed
runs averaged (reference protocol, src/Bench/Program.cs:68-114).

Job: tile assignment (native Web-Mercator, D19) → broadcast PIP spatial
join (J4) → salted two-stage per-tile aggregation (A7) → count action.

| parallelism | elapsed (s) | rows/sec | tiles/sec |
|---|---|---|---|
| local[8]  | {l8['sec']} | {l8['rows_per_sec']:,.0f} | {l8['tiles_per_sec']:,.0f} |
| local[32] | {l32['sec']} | {l32['rows_per_sec']:,.0f} | {l32['tiles_per_sec']:,.0f} |

**Scaling efficiency (8 → 32 cores, 4×): {report['scaling_efficiency']}**
(target ≥ 0.8 per BASELINE.json north rule; efficiency =
(T₈ / T₃₂) / 4).

Caveats: single-box local mode shares one JVM heap, one shuffle service
and one OS page cache between "executors"; on a real 1000-executor
cluster the same plan shape (broadcast dim join, salted partial/final
agg, no driver-side loops) is what keeps the scaling linear — there is
no stage whose cost is independent of partition count except the final
single-row collect.
"""
    with open(os.path.join(os.path.dirname(os.path.abspath(__file__)), "BENCH.md"), "w") as f:
        f.write(md)


if __name__ == "__main__":
    main()
