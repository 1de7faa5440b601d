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
