"""Inverted-index search (operators/search.py): brute-force parity and
the query-never-touches-documents plan property."""

import pytest
from pyspark.sql import functions as F

from mvtspark.operators.search import build_postings, search_all_terms

DOCS = [
    (0, "the cat sat on the mat"),
    (1, "the dog sat on the LOG"),
    (2, "cat and dog and cat again"),
    (3, "nothing relevant here"),
    (4, "THE the the"),  # tf-heavy single-term doc
]


@pytest.fixture()
def postings(spark):
    docs = spark.createDataFrame(DOCS, "doc_id long, text string")
    return build_postings(docs)


def test_postings_shape(postings):
    rows = {(r.term, r.doc_id): r.tf for r in postings.collect()}
    assert rows[("the", 0)] == 2 and rows[("the", 4)] == 3
    assert rows[("cat", 2)] == 2 and ("log", 1) in rows
    assert all(t == t.lower() for t, _ in rows)


def test_conjunctive_search_matches_brute_force(postings):
    for terms in (["cat"], ["the", "sat"], ["cat", "dog"],
                  ["THE", "the"], ["absent"], ["cat", "absent"]):
        got = {
            r.doc_id: (r.n_terms_matched, r.total_tf)
            for r in search_all_terms(postings, terms).collect()
        }
        want = {}
        tl = sorted({t.lower() for t in terms})
        for d, text in DOCS:
            toks = text.lower().split()
            if all(t in toks for t in tl):
                want[d] = (len(tl), sum(toks.count(t) for t in tl))
        assert got == want, terms


def test_empty_query_rejected(postings):
    with pytest.raises(ValueError):
        search_all_terms(postings, [])


def test_query_plan_reads_postings_only(spark, tmp_path, postings):
    """Query-time plan over MATERIALIZED postings: an isin filter that
    reaches the parquet scan + one aggregate — no Generate (re-explode)
    and no document-table access."""
    path = str(tmp_path / "postings")
    postings.write.mode("overwrite").parquet(path)
    p = spark.read.parquet(path)
    plan = (
        search_all_terms(p, ["cat", "dog"])
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Generate" not in plan  # never re-tokenizes documents
    assert "PushedFilters" in plan and "In(term" in plan
    assert "HashAggregate" in plan