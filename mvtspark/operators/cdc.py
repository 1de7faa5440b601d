"""CDC compaction: latest-wins upsert snapshot (MERGE INTO semantics).

The maintenance op every Iceberg/Delta-shaped pipeline runs: collapse a
change feed (inserts/updates/deletes keyed by a business key, ordered
by a version column) into the current snapshot — keep each key's
latest row, drop keys whose latest change is a delete marker.

Plan shape: ONE aggregation, not a window.  ``max_by(struct(row),
struct(version, tiebreak))`` reduces with map-side partials, so each
map task pre-collapses its keys before the shuffle — a window
(partition sort + rank) would shuffle every change row and sort it.
At 100 TB of accumulated changes that difference is the job.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def latest_wins_upsert(
    changes: DataFrame,
    key_cols: Sequence[str],
    order_cols: Sequence[str],
    is_delete: Column | None = None,
) -> DataFrame:
    """Current snapshot of a change feed: one row per key (the latest by
    ``order_cols`` lexicographically; make the combination unique — e.g.
    include an id tiebreak — for determinism), excluding keys whose
    latest change satisfies ``is_delete``.  Output columns = input
    columns."""
    cols = changes.columns
    last = (
        changes.groupBy(*key_cols)
        .agg(
            F.max_by(
                F.struct(*[F.col(c) for c in cols]),
                F.struct(*[F.col(c) for c in order_cols]),
            ).alias("_last")
        )
        .select(*[F.col(f"_last.{c}").alias(c) for c in cols])
    )
    if is_delete is not None:
        last = last.where(~is_delete)
    return last


def scd2_intervals(
    changes: DataFrame,
    key_cols: Sequence[str],
    order_cols: Sequence[str],
    ts_col: str,
) -> DataFrame:
    """Slowly-changing-dimension type-2 history: every change row plus
    its validity interval — ``valid_from`` = its own ``ts_col``,
    ``valid_to`` = the next change's timestamp for the key (NULL while
    current), ``is_current`` on the open row.  One lead window — one
    shuffle on the key; the companion ``latest_wins_upsert`` is the
    compacted head of this table."""
    from pyspark.sql import Window

    w = Window.partitionBy(*key_cols).orderBy(*order_cols)
    return (
        changes.withColumn("valid_from", F.col(ts_col))
        .withColumn("valid_to", F.lead(ts_col).over(w))
        .withColumn("is_current", F.col("valid_to").isNull())
    )
