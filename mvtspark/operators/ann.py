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
    emb: DataFrame, queries: DataFrame, k: int = 5, use_arrow: bool = True
) -> DataFrame:
    """Exact cosine top-k: for each query vector, the k most similar
    corpus vectors (excluding itself when ids collide).

    ``use_arrow`` (default): the query matrix is collected (queries are
    small by definition) and shipped inside a ``mapInPandas`` closure;
    each corpus Arrow batch is scored against ALL queries with numpy and
    emits only its LOCAL top-k per query, so the final global window
    sees ≤ k × n_batches × n_queries rows instead of |corpus| × |queries|.
    The per-pair arithmetic runs dimension-sequentially (acc += a_d·b_d),
    bit-identical to the relational left-fold (and the DuckDB oracle's
    list_sum), so both paths hash-match. This is the 10^12-row shape:
    corpus scanned once, nothing but top-k crosses a shuffle.

    ``use_arrow=False``: pure-relational reference path (broadcast
    nested-loop cross join + native higher-order-function fold).

    Output: (query_id, vec_id, cosine, rank).
    """
    if use_arrow:
        return _brute_force_topk_arrow(emb, queries, k)
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


def _seq_fold_dots(M, Q):
    """Per-pair dot products + norms with DIMENSION-SEQUENTIAL float64
    accumulation — the same operation order as a relational left fold,
    so results are bit-identical to F.aggregate / DuckDB list_sum
    (numpy's pairwise-summing ``dot`` is faster but not order-stable)."""
    import numpy as np

    n, d = M.shape
    dots = np.zeros((n, Q.shape[0]), dtype=np.float64)
    m_norm2 = np.zeros(n, dtype=np.float64)
    for j in range(d):
        col = M[:, j]
        m_norm2 += col * col
        dots += col[:, None] * Q[None, :, j]
    return dots, np.sqrt(m_norm2)


def _brute_force_topk_arrow(emb: DataFrame, queries: DataFrame, k: int) -> DataFrame:
    import numpy as np

    q_rows = sorted(
        queries.select("vec_id", "embedding").collect(), key=lambda r: r.vec_id
    )
    q_ids = np.array([r.vec_id for r in q_rows], dtype=np.int64)
    Q = np.array([r.embedding for r in q_rows], dtype=np.float64)
    _, q_norms = _seq_fold_dots(Q, Q[:0])

    def _score(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            ids = pdf["vec_id"].to_numpy()
            M = np.array(list(pdf["embedding"]), dtype=np.float64)
            dots, c_norms = _seq_fold_dots(M, Q)
            cos = dots / (c_norms[:, None] * q_norms[None, :])
            out = []
            for qi in range(len(q_ids)):
                mask = ids != q_ids[qi]
                c = cos[mask, qi]
                cand = ids[mask]
                if not c.size:
                    continue
                kk = min(k, c.size)
                # local top-k by (cos desc, vec_id asc) — ties broken the
                # same way the global window does
                order = np.lexsort((cand, -c))[:kk]
                out.append(
                    pd.DataFrame(
                        {
                            "query_id": q_ids[qi],
                            "vec_id": cand[order],
                            "cosine": c[order],
                        }
                    )
                )
            if out:
                yield pd.concat(out, ignore_index=True)

    scored = emb.select("vec_id", "embedding").mapInPandas(
        _score, schema="query_id long, vec_id long, cosine double"
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "vec_id", F.round("cosine", 6).alias("cosine"), "rank")
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
