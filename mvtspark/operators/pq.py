"""Product quantization (PQ) ANN — codes, ADC scoring, top-k.

The third member of the similarity-search ladder (`operators/ann.py`:
brute-force exact → IVF coarse buckets → PQ compressed codes).  At
10^12 vectors the corpus no longer fits as raw floats; PQ stores
``m`` small codes per vector (here 8 × one-of-16 ≈ 4 bytes vs 256
bytes of float64), and queries score against codes via the asymmetric
distance computation (ADC): a per-query lookup table of
query-subvector → codeword distances, so scoring a corpus row is
``m`` table lookups + adds — no float vector math per pair.

Plan shape, fully relational (oracle-checkable end-to-end):

- codebooks: the first ``k_codes`` vectors' subvectors (a k-means
  step can replace this seed set without changing the plan), broadcast;
- encode: corpus × codebook (broadcast, no shuffle), per-subspace L2
  as an ordered fold, per-subspace argmin via ``min_by`` — ONE
  partially-aggregated shuffle for all ``m`` codes at once;
- ADC: per-query distance tables built relationally and broadcast;
  the approximate distance is an ordered ``aggregate`` fold over the
  code array indexing the table — codegen lookups, deterministic
  float order, so DuckDB's ``list_sum`` replays it bit-for-bit.

Like every float path in this repo, all reductions are left folds in
a pinned order — never a shuffle-order-dependent SUM over doubles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _sub_l2(a, b, j: int, sub: int):
    """Ordered-fold squared L2 between subvectors j of two float arrays."""
    da = F.slice(a, j * sub + 1, sub)
    db = F.slice(b, j * sub + 1, sub)
    sq = F.zip_with(
        da,
        db,
        lambda x, y: (x.cast("double") - y.cast("double"))
        * (x.cast("double") - y.cast("double")),
    )
    return F.aggregate(sq, F.lit(0.0), lambda acc, v: acc + v)


def _codebook(emb: DataFrame, k_codes: int) -> DataFrame:
    return F.broadcast(
        emb.where(F.col("vec_id") < k_codes).select(
            F.col("vec_id").cast("int").alias("cent_id"),
            F.col("embedding").alias("c_emb"),
        )
    )


def train_pq_codebooks(
    emb: DataFrame,
    m: int = 8,
    k_codes: int = 16,
    dim: int = 64,
    iters: int = 10,
    sample_mod: int = 1,
) -> DataFrame:
    """Deterministic per-subspace Lloyd's k-means codebooks.

    The standard production shape (what FAISS does): codebooks train
    driver-side on a BOUNDED deterministic sample (``vec_id %
    sample_mod == 0`` — at 10^12 vectors pass a mod that yields ~1M
    rows), then broadcast. The plan downstream is IDENTICAL to the
    seed-set default — a tiny (cent_id, c_emb) dim — only the codeword
    VALUES improve (recall@10 roughly doubles on the synthetic corpus;
    see BENCH.md "ANN recall"). Deterministic: init = first k_codes
    sample rows per subspace (the untrained seed set), fixed iteration
    count, numpy float64 — no RNG anywhere.

    Returns (cent_id int, c_emb array<double>): per-subspace centroids
    packed into full-dim rows, so `pq_encode`/`_adc_table` slice them
    exactly like the seed-set codebook."""
    import numpy as np

    rows = sorted(
        emb.where((F.col("vec_id") % sample_mod) == 0)
        .select("vec_id", "embedding")
        .collect(),
        key=lambda r: r.vec_id,
    )
    X = np.array([r.embedding for r in rows], dtype=np.float64)
    if len(X) < k_codes:
        raise ValueError(
            f"PQ training sample has {len(X)} vectors < k_codes="
            f"{k_codes}; lower sample_mod"
        )
    sub = dim // m
    cb = np.empty((k_codes, dim), dtype=np.float64)
    for j in range(m):
        S = X[:, j * sub:(j + 1) * sub]
        C = S[:k_codes].copy()
        for _ in range(iters):
            d2 = ((S[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
            assign = d2.argmin(axis=1)
            for c in range(k_codes):
                pts = S[assign == c]
                if len(pts):
                    C[c] = pts.mean(axis=0)
        cb[:, j * sub:(j + 1) * sub] = C
    spark = emb.sparkSession
    return F.broadcast(
        spark.createDataFrame(
            [(int(c), [float(v) for v in cb[c]]) for c in range(k_codes)],
            "cent_id int, c_emb array<double>",
        )
    )


def pq_encode(
    emb: DataFrame, m: int = 8, k_codes: int = 16, dim: int = 64,
    codebook: DataFrame | None = None,
) -> DataFrame:
    """(vec_id, codes array<int>[m]) — per-subspace nearest codeword.

    All ``m`` argmins come out of ONE ``min_by`` aggregation over the
    broadcast corpus × codebook product (ties to the smaller cent_id),
    with map-side partials collapsing the ``k_codes``-way blowup
    before the shuffle. ``codebook`` defaults to the seed-set dim
    (oracle-reproducible); pass ``train_pq_codebooks(...)`` for the
    k-means-trained variant (same plan, better codewords)."""
    sub = dim // m
    cb = _codebook(emb, k_codes) if codebook is None else codebook
    scored = emb.select("vec_id", "embedding").crossJoin(cb)
    aggs = [
        F.min_by(
            F.col("cent_id"),
            F.struct(
                _sub_l2(F.col("embedding"), F.col("c_emb"), j, sub).alias("d"),
                F.col("cent_id").alias("c"),
            ),
        ).alias(f"_c{j}")
        for j in range(m)
    ]
    return (
        scored.groupBy("vec_id")
        .agg(*aggs)
        .select(
            "vec_id", F.array(*[f"_c{j}" for j in range(m)]).alias("codes")
        )
    )


def _adc_table(
    queries: DataFrame, cb: DataFrame, m: int, k_codes: int, sub: int
) -> DataFrame:
    """Per-query ADC table: qtab[j*k_codes + c] = d(q_sub_j,
    codeword_c_j), assembled in index order via array_sort so the fold
    below can address it positionally."""
    dists = F.array(
        *[
            _sub_l2(F.col("embedding"), F.col("c_emb"), j, sub)
            for j in range(m)
        ]
    )
    qd = (
        queries.select(F.col("vec_id").alias("query_id"), "embedding")
        .crossJoin(cb)
        .select(
            "query_id",
            F.posexplode(dists).alias("j", "dist"),
            F.col("cent_id"),
        )
        .select(
            "query_id",
            (F.col("j") * k_codes + F.col("cent_id")).alias("idx"),
            "dist",
        )
    )
    return (
        qd.groupBy("query_id")
        .agg(F.array_sort(F.collect_list(F.struct("idx", "dist"))).alias("t"))
        .select(
            "query_id",
            F.transform("t", lambda x: x["dist"]).alias("qtab"),
        )
    )


def _adc_fold(m: int, k_codes: int):
    """Approximate distance: ordered fold of m positional lookups of
    the broadcast qtab — codegen adds, deterministic float order, so
    DuckDB's list_sum replays it bit-for-bit."""
    return F.aggregate(
        F.sequence(F.lit(0), F.lit(m - 1)),
        F.lit(0.0),
        lambda acc, j: acc
        + F.element_at(
            F.col("qtab"),
            j * k_codes + F.element_at(F.col("codes"), j + 1) + 1,
        ),
    )


def _adc_topk(scored: DataFrame, k: int) -> DataFrame:
    w = Window.partitionBy("query_id").orderBy(F.asc("adc"), F.asc("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "vec_id", F.round("adc", 6).alias("adc"), "rank")
    )


def pq_topk(
    emb: DataFrame,
    queries: DataFrame,
    k: int = 5,
    m: int = 8,
    k_codes: int = 16,
    dim: int = 64,
    codebook: DataFrame | None = None,
) -> DataFrame:
    """Approximate top-k nearest (smallest ADC distance) per query.

    Output: (query_id, vec_id, adc, rank) — ``adc`` is the summed
    per-subspace query→codeword squared L2, the standard PQ distance
    estimate."""
    sub = dim // m
    cb = _codebook(emb, k_codes) if codebook is None else codebook
    codes = pq_encode(emb, m, k_codes, dim, codebook=cb)
    qtab = _adc_table(queries, cb, m, k_codes, sub)
    scored = (
        codes.crossJoin(F.broadcast(qtab))
        .where(F.col("vec_id") != F.col("query_id"))
        .withColumn("adc", _adc_fold(m, k_codes))
    )
    return _adc_topk(scored, k)


def ivf_pq_topk(
    emb: DataFrame,
    queries: DataFrame,
    k: int = 5,
    m: int = 8,
    k_codes: int = 16,
    dim: int = 64,
    n_centroids: int = 16,
    nprobe: int = 4,
    codebook: DataFrame | None = None,
    centroids: DataFrame | None = None,
) -> DataFrame:
    """IVF coarse filter + PQ ADC rerank — the composition actually
    deployed at 10^12 vectors (Jégou et al.'s IVFADC): the probe
    EQUI-JOIN on ivf_bucket touches ~nprobe/C of the corpus and every
    touched row costs m table lookups over 4-byte codes, so per-query
    work is (nprobe/C)·n·m adds — vs pq_topk's full code scan and
    ivf_topk's full-float math inside probes. Corpus side is two
    narrow passes (bucket assignment + codes, each ONE partially-
    aggregated shuffle); the query side (probes × ADC tables) is tiny
    and broadcast. Fully relational → DuckDB-oracled end-to-end."""
    from .ann import _centroid_dim, _dot, ivf_assign

    sub = dim // m
    cb = _codebook(emb, k_codes) if codebook is None else codebook
    buckets = ivf_assign(emb, n_centroids, centroids=centroids).select(
        "vec_id", "ivf_bucket"
    )
    codes = pq_encode(emb, m, k_codes, dim, codebook=cb).join(buckets, "vec_id")

    cent = _centroid_dim(emb, n_centroids) if centroids is None else centroids
    qsim = _dot(F.col("embedding"), F.col("c_emb")) / F.col("cent_norm")
    wq = Window.partitionBy("vec_id").orderBy(F.desc("qsim"), F.asc("cent_id"))
    probes = (
        queries.select("vec_id", "embedding")
        .crossJoin(cent)
        .withColumn("qsim", qsim)
        .withColumn("probe_rank", F.row_number().over(wq))
        .where(F.col("probe_rank") <= nprobe)
        .select(
            F.col("vec_id").alias("query_id"),
            F.col("cent_id").alias("ivf_bucket"),
        )
    )
    qtab = _adc_table(queries, cb, m, k_codes, sub)
    probe_tabs = probes.join(qtab, "query_id")  # nprobe rows per query
    scored = (
        codes.join(F.broadcast(probe_tabs), "ivf_bucket")
        .where(F.col("vec_id") != F.col("query_id"))
        .withColumn("adc", _adc_fold(m, k_codes))
    )
    return _adc_topk(scored, k)
