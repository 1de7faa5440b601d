"""Deterministic sampling/splitting operators (operators/sample.py):
membership must be a pure function of the key — identical across runs,
partitionings, and engines (md5-hex prefix, oracle-checked in the
driver contract) — with per-stratum rates near their targets."""

from pyspark.sql import functions as F

from mvtspark.operators.sample import (
    hash_bucket,
    stratified_sample,
    train_eval_split,
)


def test_sampling_is_partitioning_invariant(spark):
    d = spark.range(0, 2000).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") % 3 == 0, "en").otherwise("de").alias("lang"),
    )
    a = stratified_sample(d.repartition(1), {"en": 0.5}, default_frac=0.2)
    b = stratified_sample(d.repartition(16), {"en": 0.5}, default_frac=0.2)
    ids_a = sorted(r.doc_id for r in a.collect())
    ids_b = sorted(r.doc_id for r in b.collect())
    assert ids_a == ids_b and len(ids_a) > 0


def test_rates_and_split_fractions(spark):
    d = spark.range(0, 20000).select(
        F.col("id").alias("doc_id"), F.lit("en").alias("lang")
    )
    s = stratified_sample(d, {"en": 0.5})
    n = s.count()
    assert abs(n / 20000 - 0.5) < 0.02
    sp = train_eval_split(d, eval_frac=0.1)
    ev = sp.where(F.col("split") == "eval").count()
    assert abs(ev / 20000 - 0.1) < 0.01
    # split must be independent of the bare-key bucket (salted)
    joint = train_eval_split(s, eval_frac=0.1).where(
        F.col("split") == "eval").count()
    assert abs(joint / n - 0.1) < 0.02


def test_bucket_matches_md5_prefix(spark):
    import hashlib

    rows = spark.range(0, 50).select(
        F.col("id"), hash_bucket(F.col("id")).alias("b")
    ).collect()
    for r in rows:
        exp = int(hashlib.md5(str(r.id).encode()).hexdigest()[:8], 16)
        assert r.b == exp


def test_repetition_signals_on_crafted_docs(spark):
    """Repetition filters must actually fire: a degenerate doc (one
    token repeated) maxes all three signals; distinct text scores ~0."""
    from mvtspark.operators.text import repetition_stats

    docs = spark.createDataFrame(
        [
            (1, "spam spam spam spam spam spam"),
            (2, "alpha beta gamma delta epsilon zeta"),
            (3, "line one\nline one\nline two"),
        ],
        "doc_id long, text string",
    )
    r = {x.doc_id: x for x in repetition_stats(docs).collect()}
    assert r[1].top_token_frac == 1.0
    assert r[1].dup_3gram_frac > 0.5
    assert r[2].dup_3gram_frac == 0.0 and r[2].dup_line_frac == 0.0
    assert abs(r[2].top_token_frac - 1 / 6) < 1e-6
    assert abs(r[3].dup_line_frac - 1 / 3) < 1e-6
