"""Vectorized pandas/Arrow UDFs over the numpy kernels (no per-row Python
at DataFrame level — the ``input_hint`` contract).

Everything here is a thin Arrow-batch adapter: pd.Series in → numpy
kernel → pd.Series out. Kernel imports happen inside the functions so
executors only unpickle module-level names (closure-capture hygiene).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.types import ByteType, LongType


def s2_cell(lng: Column, lat: Column, level: int) -> Column:
    """lat/lng → S2 cell id at level (D18). Kernel: kernels/cells.py."""

    @F.pandas_udf(LongType())
    def _f(lng_s: pd.Series, lat_s: pd.Series) -> pd.Series:
        from mvtspark.kernels.cells import s2_cell_id

        return pd.Series(s2_cell_id(lng_s.to_numpy(), lat_s.to_numpy(), level))

    return _f(lng, lat)


def s2_parent_cell(cell: Column, level: int) -> Column:
    @F.pandas_udf(LongType())
    def _f(c: pd.Series) -> pd.Series:
        from mvtspark.kernels.cells import s2_parent

        return pd.Series(s2_parent(c.to_numpy(), level))

    return _f(cell)


def xyz_cell(lng: Column, lat: Column, zoom: int) -> Column:
    """lat/lng → packed Morton tile cell at zoom (grid-aligned join key)."""

    @F.pandas_udf(LongType())
    def _f(lng_s: pd.Series, lat_s: pd.Series) -> pd.Series:
        from mvtspark.kernels.cells import xyz_cell as _xyz

        return pd.Series(_xyz(lng_s.to_numpy(), lat_s.to_numpy(), zoom))

    return _f(lng, lat)


def pip_contains(px: Column, py: Column, ring_x: Column, ring_y: Column) -> Column:
    """Ray-cast point-in-polygon refinement (J4 phase 2).

    Inputs: point tile-coords (long) + ring arrays (array<long>).
    Output: tinyint {0 out, 1 in, -1 boundary} — reference semantics
    (src/Geometry/clipper.cs:4025-4077).

    Vectorization note: points are grouped by identical ring within each
    Arrow batch, so the kernel runs once per distinct polygon per batch
    (many points × one ring), not per row.
    """

    @F.pandas_udf(ByteType())
    def _f(
        px_s: pd.Series, py_s: pd.Series, rx_s: pd.Series, ry_s: pd.Series
    ) -> pd.Series:
        import numpy as np

        from mvtspark.kernels.geom import point_in_polygon

        out = np.zeros(len(px_s), dtype=np.int8)
        if len(px_s) == 0:
            return pd.Series(out)
        # group rows by ring identity (rings repeat: one per tile polygon)
        keys = rx_s.map(lambda a: a.tobytes() if hasattr(a, "tobytes") else bytes(bytearray()))
        px_np = px_s.to_numpy()
        py_np = py_s.to_numpy()
        for _, idx in pd.Series(range(len(px_s))).groupby(keys).groups.items():
            ii = np.asarray(idx)
            rx = np.asarray(rx_s.iloc[ii[0]], dtype=np.int64)
            ry = np.asarray(ry_s.iloc[ii[0]], dtype=np.int64)
            out[ii] = point_in_polygon(
                px_np[ii].astype(np.int64), py_np[ii].astype(np.int64), rx, ry
            )
        return pd.Series(out)

    return _f(px, py, ring_x, ring_y)
