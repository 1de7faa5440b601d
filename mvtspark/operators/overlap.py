"""Rectangle-overlap spatial join — partition-based (PBSM), never O(n²).

The classic scale trap for "find all overlapping boxes" is the
inequality join (a.xmin <= b.xmax AND ...) — Spark can only plan that
as a nested-loop cross product.  The partition-based spatial-merge
shape used here instead:

1. snap each rectangle to the grid cells it covers (``sequence`` +
   two ``explode``s — native, no UDF) — a bounded fan-out of
   O(area / cell area) rows per rect;
2. equi-join on the cell key — a plain hash join, ONE shuffle, with
   each cell only meeting its local rects (dense cells are the skew
   knob: pick ``cell`` so city-dense cells stay under executor memory);
3. keep a pair only in the cell containing the intersection's
   top-left corner — the standard duplicate-avoidance trick: every
   true overlap is emitted in EXACTLY one cell, so no distinct/dedup
   shuffle is ever needed.

Cell size trades fan-out (small cells → more copies per rect) against
join selectivity (big cells → more false candidate pairs); at 100 TB
pick it near the median rect size so both stay O(1) per rect.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _cover_cells(df: DataFrame, cell: int, prefix: str) -> DataFrame:
    """Explode each rect to the grid cells its bbox covers."""
    c = F.lit(cell)
    return (
        df.withColumn(
            "_cx",
            F.explode(
                F.sequence(
                    F.floor(F.col(f"{prefix}xmin") / c),
                    F.floor(F.col(f"{prefix}xmax") / c),
                )
            ),
        )
        .withColumn(
            "_cy",
            F.explode(
                F.sequence(
                    F.floor(F.col(f"{prefix}ymin") / c),
                    F.floor(F.col(f"{prefix}ymax") / c),
                )
            ),
        )
    )


def bbox_overlap_join(
    left: DataFrame,
    right: DataFrame,
    cell: int = 1024,
    left_cols: tuple[str, str, str, str, str] = (
        "a_id", "a_xmin", "a_ymin", "a_xmax", "a_ymax",
    ),
    right_cols: tuple[str, str, str, str, str] = (
        "b_id", "b_xmin", "b_ymin", "b_xmax", "b_ymax",
    ),
) -> DataFrame:
    """All pairs of overlapping rectangles + their intersection bbox.

    ``left``/``right`` carry (id, xmin, ymin, xmax, ymax) integer
    columns named per ``left_cols``/``right_cols``.  Touching edges
    count as overlap (closed intervals — the reference's boundary
    convention, clipper.cs PIP treats on-edge as contained).
    Returns (a_id, b_id, ixmin, iymin, ixmax, iymax).
    """
    la = _cover_cells(left, cell, left_cols[1][: -len("xmin")])
    rb = _cover_cells(right, cell, right_cols[1][: -len("xmin")])
    aid, axmin, aymin, axmax, aymax = left_cols
    bid, bxmin, bymin, bxmax, bymax = right_cols
    j = la.join(rb, ["_cx", "_cy"])
    ixmin = F.greatest(F.col(axmin), F.col(bxmin))
    iymin = F.greatest(F.col(aymin), F.col(bymin))
    ixmax = F.least(F.col(axmax), F.col(bxmax))
    iymax = F.least(F.col(aymax), F.col(bymax))
    overlap = (ixmin <= ixmax) & (iymin <= iymax)
    # report-once rule: only the cell holding the intersection's
    # top-left corner emits the pair
    canonical = (F.floor(ixmin / F.lit(cell)) == F.col("_cx")) & (
        F.floor(iymin / F.lit(cell)) == F.col("_cy")
    )
    return j.where(overlap & canonical).select(
        aid,
        bid,
        ixmin.alias("ixmin"),
        iymin.alias("iymin"),
        ixmax.alias("ixmax"),
        iymax.alias("iymax"),
    )
