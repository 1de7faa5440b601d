"""Synthetic geotagged image+caption table (FIXTURES.md §1; shape from
BASELINE.json ``input_hint``).

Generated DISTRIBUTED: ``spark.range(n)`` → ``mapInPandas`` — every
column is a pure function of the row id, so generation needs no driver
collect, no broadcast state, and no shuffle; at 10^12 rows the same code
runs unchanged (range splits across executors).

Schema (exact input_hint shape):
  image_id string, bytes binary, w int, h int, fmt string,
  caption string, phash bigint
plus derived geotags (lat, lng) used by the spatial join — derivable
from image_id alone so any stage can recompute them (BASELINE.json:15,
FIXTURES.md §1).

In production this is an Iceberg table scan
(``spark.read.format("iceberg").load("db.images")``, SURVEY §2.1 S7);
the Iceberg runtime jars are not in this sandbox, so the deterministic
generator + parquet is the documented fallback with identical schema.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

IMAGES_SCHEMA = (
    "image_id string, bytes binary, w int, h int, fmt string, "
    "caption string, phash long, lat double, lng double"
)

META_SCHEMA = (
    "image_id string, w int, h int, fmt string, caption string, "
    "phash long, lat double, lng double"
)


def _gen(batches: Iterator[pd.DataFrame], with_bytes: bool) -> Iterator[pd.DataFrame]:
    import numpy as np

    from mvtspark.kernels.image import (
        decode_image,
        phash64,
        synth_caption,
        synth_image,
        synth_latlng,
    )

    for pdf in batches:
        ids = pdf["id"].to_numpy()
        lat, lng = synth_latlng(ids)
        rows: dict[str, list] = {
            "image_id": [f"img{i:012d}" for i in ids],
            "bytes": [],
            "w": [],
            "h": [],
            "fmt": [],
            "caption": [],
            "phash": [],
        }
        for k, i in enumerate(ids):
            data, w, h, fmt = synth_image(int(i))
            if with_bytes:
                rows["bytes"].append(data)
            rows["w"].append(w)
            rows["h"].append(h)
            rows["fmt"].append(fmt)
            rows["caption"].append(synth_caption(int(i), lat[k], lng[k]))
            img = decode_image(data, w, h, fmt)  # raw view or PNG inflate
            rows["phash"].append(phash64(img))
        if not with_bytes:
            del rows["bytes"]
        out = pd.DataFrame(rows)
        out["lat"] = lat
        out["lng"] = lng
        yield out


def synth_images(
    spark: SparkSession, n: int, partitions: int | None = None, with_bytes: bool = True
) -> DataFrame:
    """Deterministic images table of n rows (seed embedded in kernels)."""
    partitions = partitions or max(8, n // 25_000)
    rng = spark.range(0, n, numPartitions=partitions)
    schema = IMAGES_SCHEMA if with_bytes else META_SCHEMA
    return rng.mapInPandas(lambda it: _gen(it, with_bytes), schema=schema)


SMOOTH_SCHEMA = "image_id string, bytes binary, w int, h int, fmt string"


def synth_smooth_images(
    spark: SparkSession, n: int, partitions: int | None = None
) -> DataFrame:
    """Deterministic SMOOTH images table (kernels/image.py
    ``synth_smooth_image``) — the natural-content corpus for the
    chroma-subsampled lossy mode, where the PSNR >= 40 dB bound is
    content-dependent (uniform noise fails 4:2:0 by construction)."""

    def _gen_smooth(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from mvtspark.kernels.image import synth_smooth_image

        for pdf in batches:
            rows = []
            for i in pdf["id"]:
                data, w, h, fmt = synth_smooth_image(int(i))
                rows.append((f"img{int(i):012d}", data, w, h, fmt))
            yield pd.DataFrame(
                rows, columns=["image_id", "bytes", "w", "h", "fmt"]
            )

    partitions = partitions or max(8, n // 25_000)
    rng = spark.range(0, n, numPartitions=partitions)
    return rng.mapInPandas(_gen_smooth, schema=SMOOTH_SCHEMA)


POINTS_SCHEMA = "image_id string, caption string, lat double, lng double"


def synth_points(
    spark: SparkSession, n: int, partitions: int | None = None
) -> DataFrame:
    """Geotag/caption-only variant of :func:`synth_images` for the spatial
    benchmarks — identical ids/lat/lng/captions, but fully vectorized
    (no per-row image synthesis), so generation doesn't pollute the
    tile-assignment + spatial-join throughput measurement."""

    def _pts(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        from mvtspark.kernels.image import CITY_LATLNG, _NOUNS, synth_latlng

        for pdf in batches:
            ids = pdf["id"].to_numpy()
            lat, lng = synth_latlng(ids)
            d = (CITY_LATLNG[None, :, 0] - lat[:, None]) ** 2 + (
                CITY_LATLNG[None, :, 1] - lng[:, None]
            ) ** 2
            city = np.argmin(d, axis=1)
            yield pd.DataFrame(
                {
                    "image_id": [f"img{i:012d}" for i in ids],
                    "caption": [
                        f"caption for img{i:012d}: {_NOUNS[i % 8]} near city{c}"
                        for i, c in zip(ids, city)
                    ],
                    "lat": lat,
                    "lng": lng,
                }
            )

    partitions = partitions or max(8, n // 100_000)
    return spark.range(0, n, numPartitions=partitions).mapInPandas(
        _pts, schema=POINTS_SCHEMA
    )
