"""Native Column expressions — stay JVM-side / whole-stage-codegen.

Web Mercator both ways as pure ``pyspark.sql.functions`` math so Catalyst
folds, prunes and codegens them (SURVEY §4: prefer native F.* where no
kernel is needed). Mirrors kernels/proj.py (the numpy oracle) exactly:

- inverse (tile px → lat/lng): ref src/Geometry/Geometry.cs:71-103
- forward (lat/lng → tile/px): D19, algebraic inverse

Also: geometry-type enum description (ref src/ExtensionMethods/Enums.cs:28-44)
and z-x-y filename parsing (ref src/DemoConsoleApp/program.cs:109-148).
"""

from __future__ import annotations

import math

from pyspark.sql import Column
from pyspark.sql import functions as F

MAX_LAT = 85.051128779806589
EXTENT = 4096


def _clipped(lng: Column, lat: Column) -> tuple[Column, Column]:
    lng = F.greatest(F.lit(-180.0), F.least(F.lit(180.0), lng.cast("double")))
    lat = F.greatest(F.lit(-MAX_LAT), F.least(F.lit(MAX_LAT), lat.cast("double")))
    return lng, lat


def _global_xy(lng: Column, lat: Column, zoom: int, extent: int = EXTENT):
    lng, lat = _clipped(lng, lat)
    size = F.lit(float(extent) * (2.0 ** zoom))
    gx = (lng + F.lit(180.0)) / F.lit(360.0) * size
    s = F.sin(F.radians(lat))
    gy = (F.lit(0.5) - F.log((F.lit(1.0) + s) / (F.lit(1.0) - s)) / F.lit(4.0 * math.pi)) * size
    return gx, gy


def tile_x(lng: Column, lat: Column, zoom: int, extent: int = EXTENT) -> Column:
    gx, _ = _global_xy(lng, lat, zoom, extent)
    n = (1 << zoom) - 1
    return F.greatest(F.lit(0), F.least(F.lit(n), F.floor(gx / F.lit(extent)))).cast("int")


def tile_y(lng: Column, lat: Column, zoom: int, extent: int = EXTENT) -> Column:
    _, gy = _global_xy(lng, lat, zoom, extent)
    n = (1 << zoom) - 1
    return F.greatest(F.lit(0), F.least(F.lit(n), F.floor(gy / F.lit(extent)))).cast("int")


def tile_px(lng: Column, lat: Column, zoom: int, extent: int = EXTENT) -> Column:
    """In-tile x pixel (double, [0, extent))."""
    gx, _ = _global_xy(lng, lat, zoom, extent)
    return gx - tile_x(lng, lat, zoom, extent).cast("double") * F.lit(float(extent))


def tile_py(lng: Column, lat: Column, zoom: int, extent: int = EXTENT) -> Column:
    _, gy = _global_xy(lng, lat, zoom, extent)
    return gy - tile_y(lng, lat, zoom, extent).cast("double") * F.lit(float(extent))


def lng_from_tile(px: Column, tx: Column, zoom: int, extent: int = EXTENT) -> Column:
    """ref Geometry.cs:71-103: lng = (px + x*e)*360/size - 180."""
    size = F.lit(float(extent) * (2.0 ** zoom))
    return (px.cast("double") + tx.cast("double") * F.lit(float(extent))) * F.lit(360.0) / size - F.lit(180.0)


def lat_from_tile(py: Column, ty: Column, zoom: int, extent: int = EXTENT) -> Column:
    """ref Geometry.cs:71-103: lat = 360/pi*atan(exp((180 - y*360/size)*pi/180)) - 90."""
    size = F.lit(float(extent) * (2.0 ** zoom))
    g = (
        (F.lit(180.0) - (py.cast("double") + ty.cast("double") * F.lit(float(extent))) * F.lit(360.0) / size)
        * F.lit(math.pi / 180.0)
    )
    return F.lit(360.0 / math.pi) * F.atan(F.exp(g)) - F.lit(90.0)


def geom_type_name(geom_type: Column) -> Column:
    """ref src/ExtensionMethods/Enums.cs:28-44 + Geometry.cs:25-34."""
    return (
        F.when(geom_type == 1, F.lit("Point"))
        .when(geom_type == 2, F.lit("LineString"))
        .when(geom_type == 3, F.lit("Polygon"))
        .otherwise(F.lit("Unknown"))
    )


def parse_zxy_filename(path: Column) -> tuple[Column, Column, Column]:
    """'.../14-4680-6260.mvt' → (z, x, y). ref DemoConsoleApp/program.cs:109-148."""
    pat = r"(\d+)-(\d+)-(\d+)\.mvt$"
    return (
        F.regexp_extract(path, pat, 1).cast("int"),
        F.regexp_extract(path, pat, 2).cast("int"),
        F.regexp_extract(path, pat, 3).cast("int"),
    )
