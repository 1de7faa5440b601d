"""Deterministic sampling / splitting for training-data pipelines
(SURVEY brief: first-class LLM-pipeline operators).

Everything here is HASH-deterministic, never random: a document's
membership in a sample or split depends only on its stable key, so
(a) reruns and backfills are reproducible, (b) train/eval membership
can never flip between pipeline versions (the classic eval-leak bug
with `df.sample(seed=...)`, whose output changes with partitioning),
and (c) a second engine can recompute membership exactly — DuckDB
parses the same md5-hex prefix (`('0x' || substr(md5(k),1,8))::BIGINT`)
that Spark's native `conv(substring(md5(k),1,8),16,10)` produces, which
keeps every operator below oracle-checkable.

All expressions are built-in column functions — whole-stage codegen,
zero Python.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_BUCKETS = 1 << 32  # md5 32-bit prefix space


def hash_bucket(key: Column) -> Column:
    """Uniform deterministic bucket in [0, 2^32): first 4 md5 bytes of
    the stringified key, big-endian (identical in DuckDB via
    ``('0x' || substr(md5(k), 1, 8))::BIGINT``)."""
    return F.conv(
        F.substring(F.md5(key.cast("string")), 1, 8), 16, 10
    ).cast("long")


def stratified_sample(
    docs: DataFrame,
    fractions: dict[str, float],
    strata_col: str = "lang",
    key_col: str = "doc_id",
    default_frac: float = 0.0,
) -> DataFrame:
    """Keep a per-stratum deterministic fraction of rows.

    One codegen'd filter — no shuffle, no sampling state; at 100 TB the
    predicate rides the scan. Per-stratum rates are exact in
    expectation and stable per key."""
    bucket = hash_bucket(F.col(key_col))
    frac: Column = F.lit(float(default_frac))
    for stratum, f in sorted(fractions.items()):
        frac = F.when(F.col(strata_col) == stratum, F.lit(float(f))).otherwise(frac)
    return docs.where(bucket < (frac * F.lit(float(_BUCKETS))).cast("long"))


def train_eval_split(
    docs: DataFrame, eval_frac: float = 0.1, key_col: str = "doc_id",
    salt: str = "split",
) -> DataFrame:
    """Append a deterministic ``split`` column ('train' / 'eval').

    The key is salted so the split buckets are independent of any
    sampling decision made with :func:`hash_bucket` on the bare key
    (otherwise sample and split would correlate)."""
    bucket = hash_bucket(F.concat(F.col(key_col).cast("string"), F.lit(":" + salt)))
    return docs.withColumn(
        "split",
        F.when(
            bucket < F.lit(int(eval_frac * _BUCKETS)), F.lit("eval")
        ).otherwise(F.lit("train")),
    )
