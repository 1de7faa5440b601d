"""spark-submit entry point for the north-star pipeline (BASELINE.json
north_rule: "run via spark-submit --py-files on a multi-executor
cluster at two cluster sizes").

Cluster usage:

    cd /root/repo && zip -r /tmp/mvtspark.zip mvtspark
    spark-submit --py-files /tmp/mvtspark.zip \
        --conf spark.sql.adaptive.enabled=true \
        --conf spark.sql.shuffle.partitions=<3x total cores> \
        jobs/run_pipeline.py \
        --images <iceberg-or-parquet path | synth:N> --zoom 10 \
        --tiles-out /data/tiles --checkpoint /data/ckpt [--resume]

Local (sandbox) smoke:

    python jobs/run_pipeline.py --images synth:20000 --zoom 8 \
        --tiles-out /tmp/mvt_out/tiles --checkpoint /tmp/mvt_out/ckpt

Stages (each records per-partition lineage + row counts in the
checkpoint table; --resume anti-joins planned tiles against completed
ones so a killed job restarts at partition granularity):
  1. assign   — native Web-Mercator tile assignment (D19, codegen)
  2. join     — broadcast PIP spatial join against tile rings (J4)
  3. agg      — salted two-stage per-tile counts (A7)
  4. encode   — per-(zoom,x,y) MVT protobuf encode (S9) + decode-parity
"""

from __future__ import annotations

import argparse
import os
import sys
import uuid

# local fallback: on a cluster --py-files ships mvtspark; running the file
# directly needs the repo root on the DRIVER's sys.path and — because
# Python UDF workers are separate processes that only inherit PYTHONPATH,
# not sys.path — on PYTHONPATH too, before the session (and its worker
# env snapshot) is created
_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)
os.environ["PYTHONPATH"] = _REPO + os.pathsep + os.environ.get("PYTHONPATH", "")

from pyspark.sql import SparkSession, functions as F


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--images", required=True,
                    help="parquet/iceberg path, or synth:N for the generator")
    ap.add_argument("--zoom", type=int, default=10)
    ap.add_argument("--extent", type=int, default=4096)
    ap.add_argument("--salt-buckets", type=int, default=16)
    ap.add_argument("--tiles-out", required=True)
    ap.add_argument("--checkpoint", required=True)
    ap.add_argument("--job-id", default=None)
    ap.add_argument("--resume", action="store_true")
    args = ap.parse_args()

    spark = SparkSession.builder.appName("mvtspark-pipeline").getOrCreate()

    from mvtspark.operators.spatial import (
        assign_tiles, salted_tile_counts, spatial_join_pip,
    )
    from mvtspark.sources.checkpoint import (
        pending_work, read_checkpoint, write_stage_checkpoint,
    )
    from mvtspark.sources.images import synth_points
    from mvtspark.sources.tiles import decode_tiles, encode_tiles

    if args.resume and not args.job_id:
        # a fresh random id would match NO checkpoint rows: the anti-join
        # re-plans everything and append-mode writing then DUPLICATES the
        # finished tiles — fail loudly instead of silently redoing work
        ap.error("--resume requires --job-id (the id of the killed run)")
    job_id = args.job_id or f"pipeline-{uuid.uuid4().hex[:8]}"

    if args.images.startswith("synth:"):
        images = synth_points(spark, int(args.images.split(":", 1)[1]))
    else:
        reader = spark.read
        images = (
            reader.format("iceberg").load(args.images)
            if "/" not in args.images
            else reader.parquet(args.images)
        )

    assigned = assign_tiles(images, zoom=args.zoom, extent=args.extent)

    if args.resume:
        ckpt = read_checkpoint(spark, args.checkpoint)
        planned = assigned.select("zoom", "x", "y").distinct()
        todo = pending_work(planned, ckpt, job_id=job_id, stage="encode",
                            keys=("zoom", "x", "y"))
        assigned = assigned.join(F.broadcast(todo), ["zoom", "x", "y"], "left_semi")

    ring_x = F.array(*[F.lit(v).cast("long")
                       for v in (0, args.extent, args.extent, 0, 0)])
    ring_y = F.array(*[F.lit(v).cast("long")
                       for v in (0, 0, args.extent, args.extent, 0)])
    polys = (
        assigned.select("zoom", "x", "y").distinct()
        .withColumns({"extent": F.lit(args.extent),
                      "ring_x": ring_x, "ring_y": ring_y})
    )
    joined = spatial_join_pip(assigned, polys, broadcast_dim=True)

    counts = salted_tile_counts(joined, salt_buckets=args.salt_buckets)
    write_stage_checkpoint(counts, args.checkpoint, job_id=job_id,
                           stage="agg", lineage="salted_tile_counts",
                           part_cols=("zoom",))

    feats = joined.select(
        "zoom", "x", "y", F.col("extent"),
        F.xxhash64("image_id").bitwiseAND(F.lit((1 << 62) - 1)).alias("feature_id"),
        F.lit(1).alias("geom_type"),
        F.array(F.lit(0), F.lit(1)).cast("array<int>").alias("part_offsets"),
        F.array(F.col("px")).alias("xs"),
        F.array(F.col("py")).alias("ys"),
        F.to_json(F.struct("caption")).alias("props"),
    )
    tiles = encode_tiles(feats, layer_name="images")
    tiles.write.mode("append").parquet(args.tiles_out)

    written = spark.read.parquet(args.tiles_out)
    write_stage_checkpoint(written, args.checkpoint, job_id=job_id,
                           stage="encode", lineage="encode_tiles",
                           part_cols=("zoom", "x", "y"))

    bad = (
        decode_tiles(written.select("zoom", "x", "y", "mvt"))
        .where(F.col("decode_error").isNotNull()).count()
    )
    n_tiles = written.count()
    print(f"job={job_id} tiles={n_tiles} decode_errors={bad}")
    if bad:
        sys.exit(2)


if __name__ == "__main__":
    main()
