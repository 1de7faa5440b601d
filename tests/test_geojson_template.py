"""Exact-string parity of to_geojson with the reference's GeoJSON
template (src/ExtensionMethods/VectorTile.cs:47-48,103-196):

- feature template {"type":"Feature","geometry":{"type":"T",
  "coordinates":[C]},"properties":P}
- properties {"id":ID,"lyr":"LAYER"} + one ,"k":"v" per tag with the
  VALUE stringified inside quotes regardless of its type
  (VectorTile.cs:68-72 string.Format over the value object)
- multipart promotion Point->MultiPoint etc. (VectorTile.cs:87-151);
  a SINGLEPART point serializes only geomWgs84[0][0] (:158-161)
- projection per Geometry.cs:71-103 (recomputed here independently)

Expected strings are assembled in this file from the reference's
formulas and templates, NOT by calling the engine's serializer."""

import math

import pandas as pd
import pytest
from pyspark.sql import functions as F

from mvtspark.sources.tiles import to_geojson


def proj(px, py, zoom=0, tx=0, ty=0, extent=4096):
    # independent re-derivation of Geometry.cs:71-103
    size = extent * (2 ** zoom)
    lng = (px + tx * extent) * 360.0 / size - 180.0
    lat = (
        360.0 / math.pi
        * math.atan(math.exp((180.0 - (py + ty * extent) * 360.0 / size) * math.pi / 180.0))
        - 90.0
    )
    return lng, lat


def fmt(v: float) -> str:
    # .NET invariant {0} for double: shortest round-trip, integral
    # values carry no fraction
    s = repr(float(v))
    return s[:-2] if s.endswith(".0") else s


def c(px, py):
    lng, lat = proj(px, py)
    return f"[{fmt(lng)},{fmt(lat)}]"


def _features_df(spark, rows):
    pdf = pd.DataFrame(
        rows,
        columns=[
            "zoom", "x", "y", "layer", "extent", "feature_id", "geom_type",
            "part_offsets", "xs", "ys", "props", "decode_error",
        ],
    )
    return spark.createDataFrame(
        pdf,
        schema=(
            "zoom int, x int, y int, layer string, extent int, "
            "feature_id long, geom_type int, part_offsets array<int>, "
            "xs array<long>, ys array<long>, props string, "
            "decode_error string"
        ),
    )


def test_reference_template_exact_string(spark):
    rows = [
        # singlepart point, one string prop
        (0, 0, 0, "layer_name", 4096, 1, 1, [0, 1], [2048], [2048],
         '{"name": "center"}', None),
        # multipoint (two 1-point parts: each MoveTo point is a part)
        (0, 0, 0, "layer_name", 4096, 2, 1, [0, 1, 2], [0, 4096], [0, 4096],
         None, None),
        # linestring, bool + int props stringified C#-style
        (0, 0, 0, "layer_name", 4096, 3, 2, [0, 3], [0, 1024, 2048],
         [0, 1024, 2048], '{"ok": true, "n": 7}', None),
        # polygon ring (closed first==last)
        (0, 0, 0, "layer_name", 4096, 4, 3, [0, 5],
         [0, 4096, 4096, 0, 0], [0, 0, 4096, 4096, 0], None, None),
        # multilinestring
        (0, 0, 0, "layer_name", 4096, 5, 2, [0, 2, 4],
         [0, 1024, 2048, 4096], [0, 1024, 2048, 4096], None, None),
        # error row must be skipped
        (0, 0, 0, None, None, None, None, None, None, None, None, "boom"),
    ]
    out = to_geojson(_features_df(spark, rows)).collect()
    assert len(out) == 1
    doc = out[0].geojson

    f1 = ('{"type":"Feature","geometry":{"type":"Point","coordinates":'
          f'[{fmt(proj(2048, 2048)[0])},{fmt(proj(2048, 2048)[1])}]}},'
          '"properties":{"id":1,"lyr":"layer_name","name":"center"}}')
    f2 = ('{"type":"Feature","geometry":{"type":"MultiPoint","coordinates":'
          f'[{c(0, 0)},{c(4096, 4096)}]}},'
          '"properties":{"id":2,"lyr":"layer_name"}}')
    f3 = ('{"type":"Feature","geometry":{"type":"LineString","coordinates":'
          f'[{c(0, 0)},{c(1024, 1024)},{c(2048, 2048)}]}},'
          '"properties":{"id":3,"lyr":"layer_name","ok":"True","n":"7"}}')
    f4 = ('{"type":"Feature","geometry":{"type":"Polygon","coordinates":'
          f'[[{c(0, 0)},{c(4096, 0)},{c(4096, 4096)},{c(0, 4096)},{c(0, 0)}]]}},'
          '"properties":{"id":4,"lyr":"layer_name"}}')
    f5 = ('{"type":"Feature","geometry":{"type":"MultiLineString","coordinates":'
          f'[[{c(0, 0)},{c(1024, 1024)}],[{c(2048, 2048)},{c(4096, 4096)}]]}},'
          '"properties":{"id":5,"lyr":"layer_name"}}')
    expected = ('{"type":"FeatureCollection","features":['
                + ",".join([f1, f2, f3, f4, f5]) + "]}")
    assert doc == expected


def test_singlepart_point_serializes_first_vertex_only(spark):
    # ref VectorTile.cs:158-161: singlepart POINT writes geomWgs84[0][0]
    rows = [
        (0, 0, 0, "l", 4096, 9, 1, [0, 2], [2048, 0], [2048, 0], None, None),
    ]
    doc = to_geojson(_features_df(spark, rows)).collect()[0].geojson
    assert '"coordinates":[0,0]' in doc
    assert "MultiPoint" not in doc


def test_world_corner_lat_values(spark):
    # the classic Web-Mercator bound must print shortest-round-trip
    rows = [
        (0, 0, 0, "l", 4096, 1, 1, [0, 1], [0], [0], None, None),
    ]
    doc = to_geojson(_features_df(spark, rows)).collect()[0].geojson
    lat = 360.0 / math.pi * math.atan(math.exp(math.pi)) - 90.0
    assert f'"coordinates":[-180,{fmt(lat)}]' in doc
    assert abs(lat - 85.0511287798066) < 1e-10


def test_property_strings_are_json_escaped(spark):
    """Documented divergence from the reference's raw interpolation:
    quotes/backslashes/control chars in property values or layer names
    must yield VALID JSON (the reference would emit a malformed doc)."""
    import json as _json

    rows = [
        (0, 0, 0, 'we"ird\\lyr', 4096, 1, 1, [0, 1], [2048], [2048],
         _json.dumps({'k"1': 'say "hi"\n'}), None),
    ]
    doc = to_geojson(_features_df(spark, rows)).collect()[0].geojson
    parsed = _json.loads(doc)  # must not raise
    props = parsed["features"][0]["properties"]
    assert props["lyr"] == 'we"ird\\lyr'
    assert props['k"1'] == 'say "hi"\n'


def test_fmt_invariant_dotnet_exponent_convention():
    """Near-zero doubles format with .NET's uppercase exponent marker
    (both formatters share shortest-round-trip digits and the 1e-4
    e-notation threshold; only the spelling differed)."""
    from mvtspark.sources.tiles import _fmt_invariant

    vals = [1.5e-05, -2.5e-07, 0.0001, 0.0, -0.0, 1.0, -12.5, 179.999999]
    got = list(_fmt_invariant(vals))
    assert got == ["1.5E-05", "-2.5E-07", "0.0001", "0", "-0", "1", "-12.5",
                   "179.999999"]
