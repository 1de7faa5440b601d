"""Property-based kernel invariants (Hypothesis; SURVEY §5 test plan —
the reference pins these as parametrized invariants, we generalize them
to randomized ones):

- varint/zigzag encode∘decode = id over the full uint64/int64 domain
- command-stream encode∘decode = id for arbitrary multi-part geometries
- scaling linearity: decode(scale·s) == scale × decode(s) per vertex
  (ref TestMvtInBulk.cs:142-175)
- clip(0-buffer) is a no-op on in-bounds geometry
  (ref TestMvtInBulk.cs:183-209)
- MVT tile encode∘decode = id for arbitrary point/line features
"""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from mvtspark.kernels import geom as gk
from mvtspark.kernels import pbf

U64 = st.integers(min_value=0, max_value=2**64 - 1)
I64 = st.integers(min_value=-(2**63), max_value=2**63 - 1)


@given(st.lists(U64, max_size=200))
@settings(max_examples=200, deadline=None)
def test_varint_roundtrip(vals):
    buf = pbf.encode_varint_stream(np.array(vals, dtype=np.uint64))
    out = pbf.decode_varint_stream(np.frombuffer(buf, dtype=np.uint8))
    assert out.astype(np.uint64).tolist() == vals


@given(st.lists(I64, max_size=200))
@settings(max_examples=200, deadline=None)
def test_zigzag_roundtrip(vals):
    v = np.array(vals, dtype=np.int64)
    assert pbf.zigzag_decode(pbf.zigzag_encode(v)).tolist() == vals


coords = st.integers(min_value=-(2**28), max_value=2**28 - 1)


def _parts(draw, min_len):
    n_parts = draw(st.integers(1, 4))
    xs, ys, offs = [], [], [0]
    for _ in range(n_parts):
        m = draw(st.integers(min_len, 12))
        xs += [draw(coords) for _ in range(m)]
        ys += [draw(coords) for _ in range(m)]
        offs.append(len(xs))
    return (
        np.array(xs, dtype=np.int64),
        np.array(ys, dtype=np.int64),
        np.array(offs, dtype=np.int64),
    )


@st.composite
def line_geometry(draw):
    return _parts(draw, 2)


@st.composite
def point_geometry(draw):
    return _parts(draw, 1)


@given(line_geometry())
@settings(max_examples=100, deadline=None)
def test_command_stream_roundtrip_linestring(geometry):
    xs, ys, offs = geometry
    cmds = gk.encode_commands(xs, ys, offs, geom_type=2)
    dx, dy, doffs = gk.decode_commands(cmds, geom_type=2)
    assert dx.tolist() == xs.tolist()
    assert dy.tolist() == ys.tolist()
    assert doffs.tolist() == offs.tolist()


@given(point_geometry())
@settings(max_examples=100, deadline=None)
def test_command_stream_roundtrip_points(geometry):
    xs, ys, offs = geometry
    # multipoint: reference decodes all MoveTo params into ONE part
    # (DecodeGeometry.cs:52-66), so encode as a single part
    offs = np.array([0, len(xs)], dtype=np.int64)
    cmds = gk.encode_commands(xs, ys, offs, geom_type=1)
    dx, dy, doffs = gk.decode_commands(cmds, geom_type=1)
    assert dx.tolist() == xs.tolist()
    assert dy.tolist() == ys.tolist()


@given(line_geometry(), st.sampled_from([1.5, 2.25, 5.75, 197.3]))
@settings(max_examples=50, deadline=None)
def test_scaling_linearity(geometry, scale):
    """ref TestMvtInBulk.cs:142-175: scaled == scale × raw, with the
    reference's banker's rounding (Convert.ToInt64 ≡ np.rint)."""
    xs, _, _ = geometry
    scaled = gk.scale_coords(xs, scale, target="long")
    expect = np.rint(xs.astype(np.float64) * scale).astype(np.int64)
    assert scaled.tolist() == expect.tolist()


@given(st.lists(st.tuples(st.integers(0, 4096), st.integers(0, 4096)),
                min_size=3, max_size=12))
@settings(max_examples=100, deadline=None)
def test_clip_noop_inbounds(pts):
    """ref TestMvtInBulk.cs:183-209: clipping with buffer 0 leaves
    in-bounds [0, extent] geometry unchanged (up to ring closure)."""
    xs = np.array([p[0] for p in pts], dtype=np.int64)
    ys = np.array([p[1] for p in pts], dtype=np.int64)
    parts = gk.clip_line(xs, ys, 4096, 0)
    assert len(parts) == 1
    cx, cy = parts[0]
    assert np.asarray(cx).astype(np.int64).tolist() == xs.tolist()
    assert np.asarray(cy).astype(np.int64).tolist() == ys.tolist()


@given(
    st.lists(
        st.tuples(st.integers(0, 4095), st.integers(0, 4095), st.integers(0, 6)),
        min_size=1, max_size=20,
    )
)
@settings(max_examples=50, deadline=None)
def test_tile_codec_roundtrip(feats):
    """Whole-tile encode∘decode identity over arbitrary point features
    with a small property vocabulary."""
    from mvtspark.kernels import mvt as mk

    layer = mk.Layer(name="t", version=2, extent=4096)
    layer.keys = ["p"]
    layer.values = [(mk.V_INT, v) for v in range(7)]
    for i, (x, y, tag) in enumerate(feats):
        cmds = gk.encode_commands(
            np.array([x], np.int64), np.array([y], np.int64),
            np.array([0, 1], np.int64), geom_type=1,
        )
        layer.features.append(
            mk.Feature(id=i + 1, geom_type=1, geometry=cmds,
                       tags=np.array([0, tag], np.int64))
        )
    blob = mk.encode_tile([layer])
    dec = mk.decode_tile(blob, validate=True)
    lay = dec["t"]
    assert len(lay.features) == len(feats)
    for f, (x, y, tag) in zip(lay.features, feats):
        dx, dy, _ = gk.decode_commands(f.geometry, 1)
        assert (dx[0], dy[0]) == (x, y)
        assert lay.properties(f)["p"] == tag
