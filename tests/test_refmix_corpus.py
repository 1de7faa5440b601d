"""Spot goldens for the reference-bench-corpus-shape synthesis
(bench.py::_refmix_corpus): the 210-tile z14 grid of
src/Bench/Program.cs:23-63 with a realistic 5-layer mix.

Golden values below are HAND-COMPUTED from the generation formulas
(xs[v] = (id*31 + v*977 + ord*7919) % 4096 etc.) — they pin the
corpus, the multi-layer protobuf concatenation, and the decode path
independently of the encoder."""

import pytest


@pytest.fixture(scope="module")
def refmix(spark):
    import bench

    return bench._refmix_corpus(spark)


def test_grid_shape_and_layer_order(spark, refmix):
    from pyspark.sql import functions as F

    from mvtspark.sources.tiles import layers_index

    assert refmix.count() == 210
    corners = {
        (r.x, r.y)
        for r in refmix.select("x", "y")
        .where((F.col("x").isin(4680, 4693)) & (F.col("y").isin(6260, 6274)))
        .collect()
    }
    assert corners == {(4680, 6260), (4680, 6274), (4693, 6260), (4693, 6274)}

    idx = layers_index(refmix)
    one = idx.where((F.col("x") == 4680) & (F.col("y") == 6260)).orderBy(
        "layer"
    )
    got = {r.layer: r.feature_count for r in one.collect()}
    assert got == {
        "water": 8, "landuse": 40, "roads": 380, "buildings": 650, "poi": 120,
    }
    # concat order is the REFMIX_SPECS order (layer message order on the
    # wire), independent of alphabetical
    names = [
        r.layer
        for r in idx.where((F.col("x") == 4681) & (F.col("y") == 6261))
        .collect()
    ]
    assert names == ["water", "landuse", "roads", "buildings", "poi"]


def test_feature_totals(spark, refmix):
    from pyspark.sql import functions as F

    import bench
    from mvtspark.sources.tiles import decode_tiles

    dec = decode_tiles(refmix).where(F.col("decode_error").isNull())
    per_layer = {
        r.layer: r.n
        for r in dec.groupBy("layer").agg(F.count("*").alias("n")).collect()
    }
    assert per_layer == {
        lyr: 210 * fpt for lyr, fpt, _, _ in bench.REFMIX_SPECS
    }


def test_spot_goldens_poi_and_building(spark, refmix):
    """Feature id=0 of poi (ord 4, salt 31676) and buildings (ord 3,
    salt 23757) — vertices hand-computed from the formulas."""
    from pyspark.sql import functions as F

    from mvtspark.sources.tiles import decode_tiles

    dec = decode_tiles(refmix).where(
        (F.col("x") == 4680) & (F.col("y") == 6260)
    )
    poi = dec.where(F.col("feature_id") == 4_000_000_001).collect()
    assert len(poi) == 1
    p = poi[0]
    assert p.layer == "poi" and p.geom_type == 1
    assert list(p.xs) == [3004] and list(p.ys) == [3004]
    assert '"name": "poi0"' in p.props and '"kind": "cafe"' in p.props

    bld = dec.where(F.col("feature_id") == 3_000_000_001).collect()
    assert len(bld) == 1
    b = bld[0]
    assert b.layer == "buildings" and b.geom_type == 3
    assert list(b.xs) == [3277, 158, 1135, 2112, 3277]
    assert list(b.ys) == [3277, 3954, 535, 1212, 3277]
    assert '"height": 3' in b.props
