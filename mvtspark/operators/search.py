"""Inverted-index search over the document corpus — the secondary-index
shape: build term postings ONCE (bucketed by term), answer conjunctive
keyword queries from the postings alone without ever rescanning the
documents.

100-TB shape: the postings build is one explode + one (term, doc_id)
aggregation with map-side partials; stored bucketed by term, a query
reads only its terms' buckets. Query evaluation broadcasts the (tiny)
term list, so matching is a broadcast semi-probe + one per-doc
aggregation over postings rows — document text is never touched at
query time.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .text import tokens


def build_postings(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(term, doc_id, tf) — one row per distinct term per document,
    engine-wide tokenization (lowercased whitespace split). Write this
    ``bucketBy(term)`` in production so query probes prune buckets."""
    return (
        docs.select(
            "doc_id",
            F.explode(tokens(F.lower(F.col(text_col)))).alias("term"),
        )
        .where(F.col("term") != "")
        .groupBy("term", "doc_id")
        .agg(F.count(F.lit(1)).cast("long").alias("tf"))
    )


def search_all_terms(postings: DataFrame, terms: list[str]) -> DataFrame:
    """Documents containing EVERY term in ``terms`` →
    (doc_id, n_terms_matched, total_tf), ranked by the caller.

    The term list is a literal broadcast filter (isin over a small
    list — at scale, the bucket-pruned probe); the AND semantics are a
    per-doc distinct-term count equal to |terms|. One aggregation
    shuffle over the (already small) matching postings."""
    if not terms:
        raise ValueError("search_all_terms needs at least one term")
    want = sorted({t.lower() for t in terms})
    hits = postings.where(F.col("term").isin(want))
    return (
        hits.groupBy("doc_id")
        .agg(
            F.countDistinct("term").alias("_nt"),
            F.sum("tf").cast("long").alias("total_tf"),
        )
        .where(F.col("_nt") == len(want))
        .select(
            "doc_id",
            F.col("_nt").cast("long").alias("n_terms_matched"),
            "total_tf",
        )
    )
