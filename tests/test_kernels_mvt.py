"""MVT codec tests — synthesized fixture corpus per FIXTURES.md §4.

Mirrors reference tests:
- single-point tile golden (src/VectorTiles.Tests/TestMvtSingle.cs:26-41)
- value-type round-trip incl. SInt-no-zigzag quirk (VectorTileReader.cs:186-201)
- invalid corpus must raise in strict mode (TestInvalidMvtInBulk.cs:46-65)
- property iteration round-trip (TestMvtInBulk.cs:279-298)
"""

import gzip

import numpy as np
import pytest

from mvtspark.kernels import geom, mvt, pbf


def make_single_point_tile() -> bytes:
    """Equivalent of the reference's Feature-single-point.mvt fixture:
    1 layer 'layer_name', 1 POINT feature id=123, property hello=world."""
    feat = mvt.Feature(
        id=123,
        geom_type=mvt.GEOM_POINT if hasattr(mvt, "GEOM_POINT") else 1,
        geometry=geom.encode_commands(
            np.array([25]), np.array([17]), np.array([0, 1]), geom.GEOM_POINT
        ),
        tags=np.array([0, 0], dtype=np.int64),
    )
    layer = mvt.Layer(
        name="layer_name",
        version=2,
        extent=4096,
        keys=["hello"],
        values=[(mvt.V_STRING, "world")],
        features=[feat],
    )
    return mvt.encode_tile([layer])


def test_single_point_golden():
    """TestMvtSingle.cs:26-41 equivalents."""
    data = make_single_point_tile()
    layers = mvt.decode_tile(data, validate=True)
    assert list(layers) == ["layer_name"]
    layer = layers["layer_name"]
    assert layer.version == 2
    assert layer.extent == 4096
    assert len(layer.features) == 1
    f = layer.features[0]
    assert f.id == 123
    assert f.geom_type == geom.GEOM_POINT
    xs, ys, off = geom.decode_commands(f.geometry, f.geom_type)
    assert xs.tolist() == [25] and ys.tolist() == [17]
    # property via map AND via key-probe (GetProperties + GetValue paths)
    assert layer.properties(f) == {"hello": "world"}
    assert layer.get_value(f, "hello") == "world"
    with pytest.raises(mvt.MvtError):
        layer.get_value(f, "nonexistent")


def test_value_types_roundtrip():
    """One feature per ValueType 1-7, exact round-trip incl. quirks."""
    vals = [
        (mvt.V_STRING, "strval"),
        (mvt.V_FLOAT, np.float32(1.5).item()),
        (mvt.V_DOUBLE, 2.25),
        (mvt.V_INT, -42),
        (mvt.V_UINT, 77),
        (mvt.V_SINT, 1234),  # stored/decoded as plain varint — NO zigzag
        (mvt.V_BOOL, True),
    ]
    feats = [
        mvt.Feature(
            id=i + 1,
            geom_type=geom.GEOM_POINT,
            geometry=np.array([9, 2 * i, 2 * i], dtype=np.uint32),
            tags=np.array([i, i], dtype=np.int64),
        )
        for i in range(7)
    ]
    layer = mvt.Layer(
        name="vals", version=2, keys=[f"k{i}" for i in range(7)], values=vals,
        features=feats,
    )
    out = mvt.decode_tile(mvt.encode_tile([layer]), validate=True)["vals"]
    assert out.values == vals
    for i, f in enumerate(out.features):
        assert out.properties(f) == {f"k{i}": vals[i][1]}


def test_sint_no_zigzag_quirk():
    """The reference decodes SInt WITHOUT zigzag (VectorTileReader.cs:194-196).
    A spec-compliant encoder writing zigzag(-5)=9 must therefore decode as 9."""
    payload = pbf.varint_field(mvt.V_SINT, 9)
    t, v = mvt._decode_value(memoryview(payload))
    assert t == mvt.V_SINT
    assert v == 9  # NOT -5


def test_gzip_rejected():
    data = gzip.compress(make_single_point_tile())
    with pytest.raises(mvt.MvtError, match="gzip"):
        mvt.decode_tile(data)


def test_empty_rejected():
    with pytest.raises(mvt.MvtError):
        mvt.decode_tile(b"")


def _tile_with(layer_kwargs=None, feat_kwargs=None) -> bytes:
    fk = dict(
        id=1,
        geom_type=geom.GEOM_POINT,
        geometry=np.array([9, 2, 2], dtype=np.uint32),
        tags=np.array([], dtype=np.int64),
    )
    fk.update(feat_kwargs or {})
    lk = dict(name="a", version=2, extent=4096, keys=[], values=[])
    lk.update(layer_kwargs or {})
    layer = mvt.Layer(**lk, features=[mvt.Feature(**fk)])
    return mvt.encode_tile([layer])


@pytest.mark.parametrize(
    "bad",
    [
        dict(layer_kwargs={"version": 1}),       # version != 2
        dict(layer_kwargs={"name": ""}),          # empty layer name
        dict(feat_kwargs={"geom_type": 0}),       # unknown geom type
        dict(feat_kwargs={"tags": np.array([0], dtype=np.int64)}),  # odd tags
        dict(feat_kwargs={"tags": np.array([5, 0], dtype=np.int64)}),  # key idx OOB
    ],
)
def test_invalid_corpus_raises(bad):
    data = _tile_with(**bad)
    with pytest.raises(mvt.MvtError):
        mvt.decode_tile(data, validate=True)
    # lenient mode (validate=False ≈ bench mode) must NOT raise
    mvt.decode_tile(data, validate=False)


def test_extent_zero_rejected():
    data = _tile_with(layer_kwargs={"extent": 0})
    # extent=0 is elided on encode (default applies); force it on the wire
    layer = mvt.Layer(
        name="a", version=2, extent=4096, keys=[], values=[],
        features=[mvt.Feature(id=1, geom_type=1, geometry=np.array([9, 2, 2], dtype=np.uint32))],
    )
    body = mvt.encode_layer(layer) + pbf.varint_field(mvt.L_EXTENT, 0)
    data = pbf.ld_field(mvt.T_LAYERS, body)
    with pytest.raises(mvt.MvtError, match="extent"):
        mvt.decode_tile(data, validate=True)


def test_duplicate_layer_name_rejected():
    one = make_single_point_tile()
    with pytest.raises(mvt.MvtError, match="duplicate"):
        mvt.decode_tile(one + one)


def test_duplicate_values_rejected():
    layer = mvt.Layer(
        name="a", version=2, keys=["k1", "k2"],
        values=[(mvt.V_STRING, "x"), (mvt.V_STRING, "x")],
        features=[
            mvt.Feature(id=1, geom_type=1, geometry=np.array([9, 2, 2], dtype=np.uint32),
                        tags=np.array([0, 0], dtype=np.int64))
        ],
    )
    data = mvt.encode_tile([layer])
    with pytest.raises(mvt.MvtError, match="distinct"):
        mvt.decode_tile(data, validate=True)


def test_full_tile_roundtrip_multifeature():
    """encode → decode → re-encode is byte-identical (S9 parity core)."""
    rng = np.random.default_rng(7)
    feats = []
    for i in range(20):
        n = rng.integers(3, 12)
        xs = rng.integers(0, 4096, n).astype(np.int64)
        ys = rng.integers(0, 4096, n).astype(np.int64)
        xs = np.concatenate([xs, xs[:1]])
        ys = np.concatenate([ys, ys[:1]])
        cmds = geom.encode_commands(xs, ys, np.array([0, n + 1]), geom.GEOM_POLYGON)
        feats.append(
            mvt.Feature(id=i + 1, geom_type=geom.GEOM_POLYGON, geometry=cmds,
                        tags=np.array([0, i % 3], dtype=np.int64))
        )
    layer = mvt.Layer(
        name="rand", version=2, keys=["cls"],
        values=[(mvt.V_INT, 0), (mvt.V_INT, 1), (mvt.V_INT, 2)], features=feats,
    )
    data1 = mvt.encode_tile([layer])
    decoded = mvt.decode_tile(data1, validate=True)
    data2 = mvt.encode_tile(list(decoded.values()))
    assert data1 == data2
    # geometry round-trip through decode_commands too
    for i, f in enumerate(decoded["rand"].features):
        xs, ys, off = geom.decode_commands(f.geometry, f.geom_type)
        assert xs[0] == xs[-1] and ys[0] == ys[-1]  # rings closed
        re = geom.encode_commands(xs, ys, off, f.geom_type)
        assert re.tolist() == f.geometry.tolist()


def test_raster_tag5_passthrough_byte_exact():
    """Feature.Raster (tag 5) — declared but never decoded by the
    reference (Constants.cs:65, TestPbfReader.cs:39) — round-trips
    byte-exact through our codec, coexists with geometry/tags, and an
    absent field stays None. Wire golden: the raster field is a plain
    length-delimited blob (key 0x2a = tag 5 << 3 | WT 2)."""
    payload = bytes(range(256)) * 3  # binary, non-UTF8, length 768
    feats = [
        mvt.Feature(
            id=1, geom_type=1,
            geometry=geom.encode_commands(
                np.array([9]), np.array([9]), np.array([0, 1]), 1
            ),
            tags=np.array([0, 0], dtype=np.int64),
            raster=payload,
        ),
        mvt.Feature(  # no raster → None after decode
            id=2, geom_type=1,
            geometry=geom.encode_commands(
                np.array([1]), np.array([2]), np.array([0, 1]), 1
            ),
            tags=np.array([0, 0], dtype=np.int64),
        ),
    ]
    layer = mvt.Layer(
        name="r", version=2, keys=["k"], values=[(mvt.V_INT, 7)],
        features=feats,
    )
    data1 = mvt.encode_tile([layer])
    # wire-level golden: key byte for tag 5 / wiretype 2, then varint len
    assert bytes([0x2A]) + pbf.encode_varint_stream(
        np.array([len(payload)], dtype=np.uint64)
    ) + payload in data1
    dec = mvt.decode_tile(data1, validate=True)
    f1, f2 = dec["r"].features
    assert f1.raster == payload and f2.raster is None
    assert mvt.encode_tile(list(dec.values())) == data1  # byte-exact


def test_raster_column_in_decode_tiles(spark):
    """decode_tiles(raster=True) surfaces the tag-5 payload as a
    nullable binary column; the default path's schema is unchanged."""
    import pandas as pd

    from mvtspark.sources.tiles import decode_tiles

    def mk_tile(fid, with_raster):
        f = mvt.Feature(
            id=fid, geom_type=1,
            geometry=geom.encode_commands(
                np.array([fid]), np.array([fid]), np.array([0, 1]), 1
            ),
            tags=np.array([0, 0], dtype=np.int64),
            raster=(b"RR%d" % fid) * fid if with_raster else None,
        )
        layer = mvt.Layer(name="r", version=2, keys=["k"],
                          values=[(mvt.V_INT, 1)], features=[f])
        return mvt.encode_tile([layer])

    rows = [(0, i, 0, mk_tile(i, i % 2 == 1)) for i in range(1, 5)]
    tiles = spark.createDataFrame(
        rows, "zoom int, x int, y int, mvt binary"
    )
    dec = decode_tiles(tiles, raster=True).orderBy("x").collect()
    assert [r.raster for r in dec] == [
        b"RR1" * 1, None, b"RR3" * 3, None
    ]
    assert "raster" not in decode_tiles(tiles).columns  # default unchanged


def test_raster_length_overrun_raises():
    """A corrupt tag-5 length that overruns the feature must fail
    loudly (memoryview slices truncate silently otherwise) — same rule
    as decode_tile's layer-length guard, invalid corpus class 4."""
    from mvtspark.sources.invalid_corpus import _FEATURE, _layer, _tile

    # key 0x2A = tag 5 << 3 | WT 2, length 16 claimed, 2 bytes present
    bad = _tile(_layer(feature=_FEATURE + bytes([0x2A, 0x10, 0x01, 0x02])))
    with pytest.raises(mvt.MvtError, match="raster length overruns"):
        mvt.decode_tile(bad, validate=True)
    with pytest.raises(mvt.MvtError, match="raster length overruns"):
        mvt.decode_tile(bad, validate=False)
