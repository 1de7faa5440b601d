"""Great-circle distance + geohash cell index — pure native columns.

Two more members of the engine's cell/metric toolkit (alongside
S2 `kernels/cells.py`, Morton `sources/clustered.py`, hex
`functions/hexgrid.py`):

- ``haversine_km``: spherical great-circle distance.  The planar
  squared-distance used by the kNN ring join is fine inside one tile;
  ranking sites hundreds of km apart needs the real metric.  Built
  from codegen trig (sin/cos/asin) — no UDF, no shuffle.
- ``geohash``: the standard base-32 geohash string (lng bit first,
  MSB-down interleave).  Quantization is pure +,-,*,/ floor arithmetic
  (IEEE-exact, so DuckDB recomputes it bit-identically — unlike trig,
  no rounding discipline needed), then the same magic-mask Morton
  spread as the Z-order layout, then an 8-way base-32 digit lookup.

At scale both are scan-local (zero shuffle); geohash doubles as yet
another clustering/bucketing key with the prefix-containment property
(a cell's prefix is its parent cell).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

EARTH_RADIUS_KM = 6371.0088  # IUGG mean radius

GEOHASH_BASE32 = "0123456789bcdefghjkmnpqrstuvwxyz"

# 32-bit -> even-bit-positions spread (same constants as
# kernels/cells._interleave_bits, all < 2^63 so plain long literals)
_SPREAD64_ROUNDS = (
    (16, 0x0000FFFF0000FFFF),
    (8, 0x00FF00FF00FF00FF),
    (4, 0x0F0F0F0F0F0F0F0F),
    (2, 0x3333333333333333),
    (1, 0x5555555555555555),
)


def haversine_km(
    lat1: Column, lng1: Column, lat2: Column, lng2: Column
) -> Column:
    """Great-circle distance in km (haversine form — stable for the
    small angles where the spherical law of cosines loses bits)."""
    p1, p2 = F.radians(lat1), F.radians(lat2)
    dp = F.radians(lat2 - lat1) / 2
    dl = F.radians(lng2 - lng1) / 2
    a = F.sin(dp) * F.sin(dp) + F.cos(p1) * F.cos(p2) * F.sin(dl) * F.sin(dl)
    return F.lit(2.0 * EARTH_RADIUS_KM) * F.asin(F.sqrt(a))


def _spread64(c: Column) -> Column:
    for shift, mask in _SPREAD64_ROUNDS:
        c = c.bitwiseOR(F.shiftleft(c, shift)).bitwiseAND(F.lit(mask))
    return c


def geohash(lat: Column, lng: Column, precision: int = 8) -> Column:
    """Base-32 geohash string of length ``precision`` (≤ 12).

    Quantizes each axis to ``ceil(5p/2)`` bits, interleaves with the
    longitude bit most significant, and emits 5-bit digits MSB-down —
    the classic public algorithm, expressed as one codegen'd column."""
    if not 1 <= precision <= 12:
        raise ValueError("geohash precision must be in 1..12")
    nbits = 5 * precision
    lng_bits = (nbits + 1) // 2
    lat_bits = nbits // 2
    qlng = F.floor((lng + 180.0) / 360.0 * F.lit(float(1 << lng_bits)))
    qlat = F.floor((lat + 90.0) / 180.0 * F.lit(float(1 << lat_bits)))
    # clamp BOTH edges: the north/east degenerate edge (lng=180, lat=90)
    # high-clamps, and out-of-range inputs (lng<-180, lat<-90) would
    # otherwise quantize negative and corrupt the Morton spread
    qlng = F.greatest(
        F.least(qlng, F.lit((1 << lng_bits) - 1)), F.lit(0)
    ).cast("long")
    qlat = F.greatest(
        F.least(qlat, F.lit((1 << lat_bits) - 1)), F.lit(0)
    ).cast("long")
    if lng_bits == lat_bits:
        # even total bits: MSB is a lng bit at an odd position from LSB
        z = _spread64(qlat).bitwiseOR(F.shiftleft(_spread64(qlng), 1))
    else:
        # odd total bits: lng's extra MSB lands on an even position, so
        # the roles swap — lng on even bits, lat on odd
        z = _spread64(qlng).bitwiseOR(F.shiftleft(_spread64(qlat), 1))
    digits = [
        F.substring(
            F.lit(GEOHASH_BASE32),
            (
                F.shiftright(z, 5 * (precision - 1 - i)).bitwiseAND(F.lit(31))
                + 1
            ).cast("int"),
            1,
        )
        for i in range(precision)
    ]
    return F.concat(*digits)


def quadkey(x: Column, y: Column, zoom: int) -> Column:
    """Bing-Maps base-4 quadkey of a (zoom, x, y) tile.

    The string cell key whose every prefix is the ancestor tile (like
    geohash, but exactly aligned to the XYZ pyramid): digit i is
    ``x_bit + 2*y_bit`` at level i, MSB-down.  Pure codegen bit math —
    an equality/prefix predicate on quadkeys prunes a tile subtree in
    one string comparison."""
    if zoom < 1:
        raise ValueError("quadkey needs zoom >= 1")
    # wrap into the 2^zoom grid: tile x wraps the antimeridian by
    # definition, and masking y too keeps out-of-range inputs from
    # emitting digits that decode to a DIFFERENT pyramid level
    x = x.bitwiseAND(F.lit((1 << zoom) - 1))
    y = y.bitwiseAND(F.lit((1 << zoom) - 1))
    digits = [
        F.substring(
            F.lit("0123"),
            (
                F.shiftright(x, i - 1).bitwiseAND(F.lit(1))
                + F.shiftleft(
                    F.shiftright(y, i - 1).bitwiseAND(F.lit(1)), 1
                )
                + 1
            ).cast("int"),
            1,
        )
        for i in range(zoom, 0, -1)
    ]
    return F.concat(*digits)
