"""Large-star/small-star connected components: label parity with
min-label, and the logarithmic round bound on a diameter-heavy chain
(the case min-label propagation cannot handle in bounded rounds)."""

import math

from pyspark.sql import functions as F


def _chain_edges(spark, n, seg):
    e = spark.range(n).select(F.col("id").alias("doc_a"))
    return e.where((F.col("doc_a") + 1) % seg != 0).where(
        F.col("doc_a") + 1 < n
    ).select("doc_a", (F.col("doc_a") + 1).alias("doc_b"))


def test_two_star_matches_min_label_on_clique_mix(spark):
    from mvtspark.operators.dedup import connected_components

    # two triangles sharing no nodes + a bridge pair + a 6-chain
    pairs = [(0, 1), (1, 2), (0, 2), (10, 11), (11, 12), (10, 12),
             (20, 21), (30, 31), (31, 32), (32, 33), (33, 34), (34, 35)]
    edges = spark.createDataFrame(pairs, "doc_a long, doc_b long")
    a = sorted(
        (r.doc_id, r.group_id, r.group_size)
        for r in connected_components(edges).collect()
    )
    b = sorted(
        (r.doc_id, r.group_id, r.group_size)
        for r in connected_components(edges, algorithm="two-star").collect()
    )
    assert a == b
    assert {(0, 0, 3), (20, 20, 2), (35, 30, 6)} <= set(b)


def test_two_star_logarithmic_rounds(spark):
    """A 1024-node chain converges in O(log n) two-star rounds —
    min-label would need ~1024 (it raises at max_iter=15)."""
    import pytest

    from mvtspark.operators.dedup import _two_star_cc, connected_components

    edges = _chain_edges(spark, 1024, 1024)
    labels, rounds = _two_star_cc(
        edges.select(F.col("doc_a").alias("a"), F.col("doc_b").alias("b")),
        max_iter=30,
    )
    assert rounds <= 2 * int(math.log2(1024)) + 3
    got = {(r.id, r.lbl) for r in labels.collect()}
    assert got == {(i, 0) for i in range(1024)}

    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(edges, max_iter=15).collect()


def test_two_star_segmented_chains(spark):
    from mvtspark.operators.dedup import connected_components

    out = connected_components(
        _chain_edges(spark, 300, 100), algorithm="two-star"
    )
    rows = out.collect()
    assert len(rows) == 300
    for r in rows:
        assert r.group_id == (r.doc_id // 100) * 100
        assert r.group_size == 100
