"""Spark-facing functions: native Column expressions + pandas UDFs."""

from .native import (  # noqa: F401
    geom_type_name,
    lat_from_tile,
    lng_from_tile,
    tile_px,
    tile_py,
    tile_x,
    tile_y,
)
from .udfs import (  # noqa: F401
    pip_contains,
    s2_cell,
    s2_parent_cell,
    xyz_cell,
)
