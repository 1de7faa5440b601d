"""Skew-safe joins: explicit salting + AQE skew-split evidence.

Two complementary mechanisms for the north rule's "skew handled
explicitly":

- ``salted_join``: the static mechanism. When one join key dominates
  (a city tile, a bot user), a plain hash join lands the whole hot key
  on ONE reducer. Salting appends ``pmod(hash(tiebreak), n_salt)`` to
  the fact side's key and explodes the (small-but-not-broadcastable)
  build side once per salt, so the hot key's rows spread over
  ``n_salt`` reducers. Deterministic (the salt is a pure function of a
  row column, not partition id or random), so results are set-equal to
  the plain join — which is exactly what the oracle checks.
- AQE skew split (``spark.sql.adaptive.skewJoin``): the dynamic
  mechanism — at runtime Spark splits oversized shuffle partitions of
  a sort-merge join and replicates the matching build partitions.
  `tests/test_skew_join.py` drives it with lowered thresholds and
  asserts ``skew=true`` appears in the executed plan, the runtime
  counterpart of this module's static salt.

Salting an AGGREGATION is different (the salt must stay constant per
map task to preserve partial aggregation — see
`operators/spatial.py::salted_tile_counts`); join salts must be
per-row or the hot key would not spread.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    on: str,
    tiebreak: str,
    n_salt: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Inner/left join ``fact ⋈ dim`` on column ``on``, skew-spread.

    ``tiebreak`` is any fact column with per-row variety (an id); the
    salt is ``pmod(hash(tiebreak), n_salt)``.  The dim side is
    replicated ``n_salt`` times via a literal-range explode (bounded,
    deterministic).  Result is row-equal to the unsalted join.
    """
    if how not in ("inner", "left"):
        raise ValueError("salted_join supports inner/left")
    f = fact.withColumn(
        "_salt", F.pmod(F.hash(F.col(tiebreak)), F.lit(n_salt))
    )
    d = dim.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(n_salt)]))
    )
    return f.hint("shuffle_hash").join(d, [on, "_salt"], how).drop("_salt")
