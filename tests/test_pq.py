"""PQ ANN: codeword self-coding, numpy ADC parity, rank ordering."""

import numpy as np
from pyspark.sql import functions as F

from mvtspark.operators.pq import pq_encode, pq_topk

M, K, DIM, SUB = 8, 16, 64, 8


def _emb(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


def test_codewords_encode_to_themselves(spark, sf_dir):
    rows = (
        pq_encode(_emb(spark, sf_dir))
        .where(F.col("vec_id") < K)
        .collect()
    )
    assert len(rows) == K
    for r in rows:
        assert r.codes == [r.vec_id] * M, (r.vec_id, r.codes)


def test_adc_matches_numpy(spark, sf_dir):
    emb = _emb(spark, sf_dir)
    data = {r.vec_id: np.array(r.embedding, dtype=np.float64)
            for r in emb.collect()}
    cb = np.stack([data[i] for i in range(K)])

    def codes_of(v):
        return [
            int(np.argmin(((cb[:, j*SUB:(j+1)*SUB] - v[j*SUB:(j+1)*SUB]) ** 2).sum(1)))
            for j in range(M)
        ]

    out = pq_topk(emb, emb.where(F.col("vec_id") < 2), k=3).collect()
    for r in out:
        q = data[r.query_id]
        cd = codes_of(data[r.vec_id])
        adc = sum(
            float(((q[j*SUB:(j+1)*SUB] - cb[cd[j], j*SUB:(j+1)*SUB]) ** 2).sum())
            for j in range(M)
        )
        assert abs(r.adc - adc) < 1e-6, (r, adc)


def test_rank_is_adc_ascending(spark, sf_dir):
    emb = _emb(spark, sf_dir)
    out = pq_topk(emb, emb.where(F.col("vec_id") < 3), k=5).collect()
    by_q = {}
    for r in out:
        by_q.setdefault(r.query_id, []).append(r)
    for rows in by_q.values():
        rows.sort(key=lambda r: r.rank)
        assert [r.rank for r in rows] == list(range(1, len(rows) + 1))
        assert all(a.adc <= b.adc for a, b in zip(rows, rows[1:]))
        assert all(r.vec_id != r.query_id for r in rows)


def test_ivf_pq_probe_all_equals_pq(spark, sf_dir):
    """With nprobe == n_centroids every bucket is probed, so the IVFADC
    candidate set is the whole corpus and the output must be IDENTICAL
    to plain PQ top-k (same codes, same ADC tables, same ranks)."""
    from pyspark.sql import functions as F

    from mvtspark.operators.pq import ivf_pq_topk, pq_topk

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    q = emb.where(F.col("vec_id") < 3)
    a = sorted(map(tuple, pq_topk(emb, q, k=4).collect()))
    b = sorted(map(tuple, ivf_pq_topk(emb, q, k=4, nprobe=16).collect()))
    assert a == b


def test_ivf_pq_output_shape(spark, sf_dir):
    from pyspark.sql import functions as F

    from mvtspark.operators.pq import ivf_pq_topk

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    rows = ivf_pq_topk(emb, emb.where(F.col("vec_id") < 2), k=3).collect()
    by_q = {}
    for r in rows:
        by_q.setdefault(r.query_id, []).append(r)
        assert r.vec_id != r.query_id
    for qid, rs in by_q.items():
        assert sorted(x.rank for x in rs) == [1, 2, 3]
        ordered = sorted(rs, key=lambda x: x.rank)
        assert all(
            ordered[i].adc <= ordered[i + 1].adc for i in range(len(rs) - 1)
        )
