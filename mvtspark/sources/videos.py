"""Synthetic video corpus in the MRV container (kernels/video.py).

FIXTURES.md-style determinism: every clip is derivable from its
video_id alone (seed = vid % 251, n_frames = 50 + vid % 200), so any
executor regenerates its partition without shuffle or driver broadcast,
and a SQL oracle can recompute per-frame pixel sums / md5 hashes from
the same closed form (synth_frames' (x*3 + y*7 + c*11 + f*13 + seed)
mod 256).
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession


def synth_videos(
    spark: SparkSession,
    n: int,
    w: int = 8,
    h: int = 6,
    key_int: int = 4,
    n_partitions: int = 8,
) -> DataFrame:
    """n clips of real MRV bytes: (video_id, bytes, w, h, fmt, n_frames).

    The per-row loop is per CLIP (one whole video each) — the pixel work
    inside is whole-clip vectorized numpy, same granularity defense as
    the image operators."""

    def _gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from mvtspark.kernels.video import encode_mrv, synth_frames

        for pdf in batches:
            out = []
            for vid in pdf["id"]:
                vid = int(vid)
                n_frames = 50 + vid % 200
                frames = synth_frames(vid % 251, n_frames, w, h)
                out.append(
                    dict(
                        video_id=f"vid{vid}",
                        bytes=encode_mrv(frames, key_int=key_int),
                        w=w,
                        h=h,
                        fmt="mrv",
                        n_frames=n_frames,
                    )
                )
            yield pd.DataFrame(
                out,
                columns=["video_id", "bytes", "w", "h", "fmt", "n_frames"],
            )

    return spark.range(0, n, numPartitions=n_partitions).mapInPandas(
        _gen,
        schema=(
            "video_id string, bytes binary, w int, h int, "
            "fmt string, n_frames int"
        ),
    )
