"""TF-IDF top terms: hand-computed scores, rank/tie rules."""

import math

from mvtspark.operators.text import tfidf_top_terms


def test_hand_computed_scores(spark):
    docs = spark.createDataFrame(
        [
            (1, "apple banana apple"),
            (2, "banana cherry"),
            (3, "cherry cherry cherry date"),
        ],
        "doc_id long, text string",
    )
    out = {
        (r.doc_id, r.term): (r.score, r.rank)
        for r in tfidf_top_terms(docs, k=3).collect()
    }

    def idf(dfc):
        return math.log(4.0 / (dfc + 1.0)) + 1.0

    # doc 1: apple tf=2 df=1, banana tf=1 df=2
    assert out[(1, "apple")] == (round(2 * idf(1), 6), 1)
    assert out[(1, "banana")] == (round(1 * idf(2), 6), 2)
    # doc 3: cherry tf=3 df=2 beats date tf=1 df=1
    assert out[(3, "cherry")][1] == 1
    assert out[(3, "date")] == (round(1 * idf(1), 6), 2)


def test_ties_break_by_term_asc(spark):
    docs = spark.createDataFrame(
        [(1, "zebra apple"), (2, "other words")], "doc_id long, text string"
    )
    rows = sorted(
        (r for r in tfidf_top_terms(docs, k=3).collect() if r.doc_id == 1),
        key=lambda r: r.rank,
    )
    # equal tf and df -> equal score; rank order must be alphabetical
    assert [r.term for r in rows] == ["apple", "zebra"]
    assert rows[0].score == rows[1].score


def test_whitespace_and_case_normalization(spark):
    docs = spark.createDataFrame(
        [(1, "  Apple   APPLE\napple\t")], "doc_id long, text string"
    )
    rows = tfidf_top_terms(docs, k=3).collect()
    assert len(rows) == 1 and rows[0].term == "apple"


def test_cms_never_underestimates_and_merges(spark):
    """CMS property: estimate >= true count for EVERY token; and the
    sketch of a union equals cell-wise addition of shard sketches."""
    from pyspark.sql import functions as F

    from mvtspark.operators.text import cms_estimate, cms_sketch

    words = (["spark"] * 50 + ["tile"] * 30 + ["arrow"] * 7
             + [f"w{i}" for i in range(200)])
    toks = spark.createDataFrame([(w,) for w in words], "tok string")
    sk = cms_sketch(toks, depth=4, width=256)  # narrow: force collisions
    truth = {r.tok: r.n for r in toks.groupBy("tok").agg(
        F.count(F.lit(1)).alias("n")).collect()}
    est = {
        r.tok: r.cms_n
        for r in cms_estimate(
            toks.select("tok").distinct(), sk, depth=4, width=256
        ).collect()
    }
    assert set(est) == set(truth)
    assert all(est[t] >= n for t, n in truth.items())
    assert est["spark"] >= 50 and est["tile"] >= 30

    # merge = cell-wise addition: groupBy over the shard-sketch union
    half = len(words) // 2
    s1 = cms_sketch(spark.createDataFrame([(w,) for w in words[:half]], "tok string"), 4, 256)
    s2 = cms_sketch(spark.createDataFrame([(w,) for w in words[half:]], "tok string"), 4, 256)
    merged = (
        s1.unionByName(s2).groupBy("d", "bucket").agg(F.sum("c").alias("c"))
    )
    a = sorted(map(tuple, sk.collect()))
    b = sorted(map(tuple, merged.collect()))
    assert a == b


def test_cms_depth_rows_are_independent(spark):
    """Regression for the low-bits hash flaw: with bucket = (h*A_d) mod
    width, an odd A_d is a bijection mod 2^width-bits, so two tokens
    colliding at depth 0 collided at EVERY depth (depth bought nothing).
    The multiply-shift high-bits family must separate some depth-0
    collision pair at another depth."""
    from mvtspark.operators.text import _cms_buckets_udf

    import pyspark.sql.functions as F

    toks = spark.createDataFrame(
        [(f"tok{i}",) for i in range(4000)], "tok string"
    ).withColumn("b", _cms_buckets_udf(4, 256)(F.col("tok")))
    rows = toks.select("b").collect()
    by_d0 = {}
    for r in rows:
        by_d0.setdefault(r.b[0], []).append(tuple(r.b))
    split = 0
    for group in by_d0.values():
        if len(group) > 1 and len(set(group)) > 1:
            split += 1
    # 4000 tokens over 256 buckets -> plenty of d0 collisions; almost
    # all must separate at a deeper row under an independent family
    assert split >= 0.9 * sum(1 for g in by_d0.values() if len(g) > 1)


def test_cms_estimate_zero_for_unseen_token(spark):
    """A query token absent from the stream must estimate 0 (sparse
    sketch cells coalesce to zero), not vanish from the output."""
    from pyspark.sql import functions as F

    from mvtspark.operators.text import cms_estimate, cms_sketch

    toks = spark.createDataFrame([("aaa",), ("bbb",)], "tok string")
    sk = cms_sketch(toks, depth=4, width=4096)
    q = spark.createDataFrame([("aaa",), ("never-seen",)], "tok string")
    est = {r.tok: r.cms_n for r in cms_estimate(q, sk, 4, 4096).collect()}
    assert est["aaa"] >= 1
    assert est["never-seen"] == 0
