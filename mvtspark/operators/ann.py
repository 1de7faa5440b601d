"""Similarity search over embedding columns (array<float>).

- brute_force_topk: exact cosine top-k for a query set — the
  correctness baseline. Query side is broadcast (it's small by
  definition); similarity is native zip_with/aggregate (codegen), top-k
  via window row_number (Spark's TakeOrderedAndProject shape).
- ivf_topk: the scale path — coarse quantizer (IVF): vectors are
  bucketed to their nearest of C centroids (computed once, broadcast);
  queries probe ``nprobe`` nearest buckets only. At 10^12 vectors the
  probe join touches ~nprobe/C of the data instead of all of it.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.types import IntegerType


def _norm(col):
    return F.sqrt(
        F.aggregate(col, F.lit(0.0), lambda a, v: a + v.cast("double") * v)
    )


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def brute_force_topk(
    emb: DataFrame, queries: DataFrame, k: int = 5
) -> DataFrame:
    """Exact cosine top-k: for each query vector, the k most similar
    corpus vectors (excluding itself when ids collide).

    Output: (query_id, vec_id, cosine, rank).
    """
    q = F.broadcast(
        queries.select(
            F.col("vec_id").alias("query_id"),
            F.col("embedding").alias("q_emb"),
            _norm(F.col("embedding")).alias("q_norm"),
        )
    )
    c = emb.select(
        "vec_id", "embedding", _norm(F.col("embedding")).alias("c_norm")
    )
    scored = (
        c.crossJoin(q)
        .where(F.col("vec_id") != F.col("query_id"))
        .withColumn(
            "cosine",
            _dot(F.col("q_emb"), F.col("embedding"))
            / (F.col("q_norm") * F.col("c_norm")),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(
            "query_id", "vec_id", F.round("cosine", 6).alias("cosine"), "rank"
        )
    )


def ivf_assign(emb: DataFrame, n_centroids: int = 16) -> DataFrame:
    """Assign each vector to its nearest deterministic centroid.

    Centroids are the embeddings of vec_id 0..C-1 (deterministic seed
    set — a k-means step can replace this without changing the plan).
    Assignment is a vectorized pandas UDF over a broadcast centroid
    matrix (numpy matmul per Arrow batch).
    """
    cent_rows = (
        emb.where(F.col("vec_id") < n_centroids)
        .select("vec_id", "embedding")
        .collect()
    )
    import numpy as np

    cent = np.array([r.embedding for r in sorted(cent_rows, key=lambda r: r.vec_id)], dtype=np.float64)
    cent /= np.linalg.norm(cent, axis=1, keepdims=True)

    @F.pandas_udf(IntegerType())
    def _assign(embs: pd.Series) -> pd.Series:
        M = np.array(list(embs), dtype=np.float64)
        M /= np.maximum(np.linalg.norm(M, axis=1, keepdims=True), 1e-12)
        return pd.Series(np.argmax(M @ cent.T, axis=1).astype(np.int32))

    return emb.withColumn("ivf_bucket", _assign(F.col("embedding")))


def ivf_topk(
    emb: DataFrame, queries: DataFrame, k: int = 5,
    n_centroids: int = 16, nprobe: int = 4,
) -> DataFrame:
    """Approximate cosine top-k probing only ``nprobe`` IVF buckets."""
    import numpy as np

    corpus = ivf_assign(emb, n_centroids)
    cent_rows = (
        emb.where(F.col("vec_id") < n_centroids).select("vec_id", "embedding").collect()
    )
    cent = np.array([r.embedding for r in sorted(cent_rows, key=lambda r: r.vec_id)], dtype=np.float64)
    cent /= np.linalg.norm(cent, axis=1, keepdims=True)

    @F.pandas_udf("array<int>")
    def _probes(embs: pd.Series) -> pd.Series:
        M = np.array(list(embs), dtype=np.float64)
        M /= np.maximum(np.linalg.norm(M, axis=1, keepdims=True), 1e-12)
        order = np.argsort(-(M @ cent.T), axis=1)[:, :nprobe].astype(np.int32)
        return pd.Series(list(order))

    q = F.broadcast(
        queries.select(
            F.col("vec_id").alias("query_id"),
            F.col("embedding").alias("q_emb"),
            _norm(F.col("embedding")).alias("q_norm"),
            F.explode(_probes(F.col("embedding"))).alias("ivf_bucket"),
        )
    )
    scored = (
        corpus.join(q, "ivf_bucket")
        .where(F.col("vec_id") != F.col("query_id"))
        .withColumn(
            "cosine",
            _dot(F.col("q_emb"), F.col("embedding"))
            / (F.col("q_norm") * _norm(F.col("embedding"))),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "vec_id", F.round("cosine", 6).alias("cosine"), "rank")
    )
