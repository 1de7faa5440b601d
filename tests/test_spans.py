"""Repeated-span detection (operators/spans.py) — hand-computed truths
plus the per-doc profile's internal consistency."""

import pytest
from pyspark.sql import functions as F

from mvtspark.operators.spans import repeated_spans, span_dedup_stats

DOCS = [
    # docs 0 and 1 share the 4-token span "the quick brown fox"
    (0, "The quick brown fox jumps over a lazy dog"),
    (1, "Watch the QUICK brown FOX leap away now"),
    (2, "completely different words here entirely unrelated text"),
    (3, "short doc"),  # < window → contributes no spans
    # doc 4 repeats a span INSIDE itself (n_occ 2, but n_docs 1)
    (4, "alpha beta gamma delta alpha beta gamma delta"),
]


@pytest.fixture()
def docs(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


def test_cross_doc_span_found(docs, spark):
    out = repeated_spans(docs, window=4, min_docs=2).collect()
    # exactly one span recurs across >= 2 distinct docs
    assert len(out) == 1
    r = out[0]
    assert (r.n_occ, r.n_docs) == (2, 2)
    assert (r.first_doc, r.first_pos) == (0, 1)  # "the quick brown fox"
    # key is the md5 of the lowercased joined window
    import hashlib

    assert r.span_key == hashlib.md5(b"the quick brown fox").hexdigest()


def test_within_doc_repeat_respects_min_docs(docs):
    # with min_docs=1 the self-repeat in doc 4 appears too
    out = {
        r.span_key: r
        for r in repeated_spans(docs, window=4, min_docs=1).collect()
    }
    import hashlib

    k = hashlib.md5(b"alpha beta gamma delta").hexdigest()
    assert out[k].n_occ == 2 and out[k].n_docs == 1
    assert out[k].first_doc == 4 and out[k].first_pos == 1


def test_span_dedup_stats_profile(docs):
    prof = {r.doc_id: r for r in span_dedup_stats(docs, window=4).collect()}
    assert 3 not in prof  # too short: no spans at all
    # doc 0: 6 spans, 1 duplicated; doc 2: none duplicated
    assert prof[0].n_spans == 6 and prof[0].n_dup_spans == 1
    assert prof[2].n_dup_spans == 0 and prof[2].dup_ratio == 0.0
    assert abs(prof[0].dup_ratio - 1 / 6) < 1e-6
    # ratios are consistent
    for r in prof.values():
        assert 0 <= r.n_dup_spans <= r.n_spans


def test_overlong_document_fails_loudly(spark):
    """The packed (doc,pos) argmin needs pos < 1e6 — a >1M-token
    document must RAISE (assert_true in the filter), never silently
    corrupt first_doc/first_pos."""
    import pytest

    big = spark.createDataFrame(
        [(0, "tok " * 1_000_001)], "doc_id long, text string"
    )
    with pytest.raises(Exception) as ei:
        repeated_spans(big, window=4, min_docs=1).collect()
    assert "exceeds 1000000 tokens" in str(ei.value)


def test_spans_hot_path_is_codegen(docs):
    """No Python evaluation anywhere: the plan must contain no
    *InPandas/PythonUDF nodes (sequence/transform/md5 are all JVM)."""
    plan = repeated_spans(docs)._jdf.queryExecution().executedPlan().toString()
    assert "Pandas" not in plan and "PythonUDF" not in plan
    assert "HashAggregate" in plan  # map-side partial agg present


def test_randomized_brute_force_parity(spark):
    """repeated_spans must equal a pure-Python brute force on random
    corpora from a tiny vocabulary (which forces genuine cross- and
    within-doc span collisions), across windows and min_docs."""
    import hashlib
    import random

    for seed, window, min_docs in ((1, 3, 2), (2, 5, 2), (3, 4, 3)):
        rng = random.Random(seed)
        vocab = ["aa", "bb", "cc", "dd"]
        docs = [
            (d, " ".join(rng.choice(vocab) for _ in range(rng.randint(0, 30))))
            for d in range(40)
        ]
        # brute force
        occ = {}
        for d, text in docs:
            toks = text.lower().split()
            for i in range(len(toks) - window + 1):
                k = hashlib.md5(
                    " ".join(toks[i : i + window]).encode()
                ).hexdigest()
                occ.setdefault(k, []).append((d, i + 1))
        want = {}
        for k, locs in occ.items():
            nd = len({d for d, _ in locs})
            if nd >= min_docs:
                fd, fp = min(locs)
                want[k] = (len(locs), nd, fd, fp)
        df = spark.createDataFrame(docs, "doc_id long, text string")
        got = {
            r.span_key: (r.n_occ, r.n_docs, r.first_doc, r.first_pos)
            for r in repeated_spans(
                df, window=window, min_docs=min_docs
            ).collect()
        }
        assert got == want, (seed, window, min_docs)
