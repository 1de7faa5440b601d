"""Exact repeated-span detection — the "dedup substrings, not documents"
pass of a training-data pipeline (published recipe: hash every W-token
window, drop/flag windows that recur across documents; catches the
boilerplate MinHash misses because the surrounding document differs).

Scale shape (10^12 docs): span generation is PURE whole-stage codegen —
``sequence → transform(slice → concat_ws → md5) → explode`` — no Python
anywhere on the fact path; the only wide operation is the aggregation on
the 128-bit span key, which Spark partially aggregates map-side, so a
boilerplate span occurring 10^9 times arrives at its reducer as one
(count, doc-count) partial per map task rather than 10^9 rows, and no
pair list is ever materialized (never O(occurrences²)).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .text import tokens

# pos packs into doc_id*1e6+pos for an order-exact (doc, pos) argmin
# computed on plain BIGINTs by both engines — bounded by an assert_true
# guard in the plan, so a pathological >1M-token document fails the job
# loudly instead of corrupting the packed key.
_MAX_POS = 1_000_000


def _span_keys(
    docs: DataFrame, window: int, text_col: str, with_pos: bool
) -> DataFrame:
    """(doc_id, [pos,] span_key) — one row per W-token window, pure
    codegen. Shared by both public ops so the tokenization and hashing
    can never drift between them. Tokenization is the engine-wide
    whitespace rule (operators/text.py) over lowercased text; ``pos``
    is the 1-based token index."""
    t = tokens(F.lower(F.col(text_col)))
    cond = F.size("t") >= window
    if with_pos:
        # loud scale guard rides the filter (a Filter condition is never
        # pruned, unlike an unused projected column): the packed
        # (doc, pos) argmin needs pos < _MAX_POS; assert_true returns
        # NULL on success and raises the job otherwise. The
        # with_pos=False path never packs positions, so a >1M-token
        # document is legal there and must NOT fail the job.
        cond = cond & F.assert_true(
            F.size("t") < _MAX_POS,
            f"document exceeds {_MAX_POS} tokens; packed span positions"
            " would corrupt",
        ).isNull()
    base = docs.select(F.col("doc_id"), t.alias("t")).where(cond)
    # sequence() descends when stop < start — the >= window filter above
    # is what makes (size - window + 1) a valid ascending stop.
    starts = F.sequence(F.lit(1), F.size("t") - window + 1)
    if with_pos:
        return base.select(
            "doc_id",
            F.explode(
                F.transform(
                    starts,
                    lambda i: F.struct(
                        i.alias("pos"),
                        F.md5(
                            F.concat_ws(" ", F.slice("t", i, window))
                        ).alias("span_key"),
                    ),
                )
            ).alias("s"),
        ).select(
            "doc_id", F.col("s.pos").alias("pos"), F.col("s.span_key")
        )
    return base.select(
        "doc_id",
        F.explode(
            F.transform(
                starts,
                lambda i: F.md5(F.concat_ws(" ", F.slice("t", i, window))),
            )
        ).alias("span_key"),
    )


def repeated_spans(
    docs: DataFrame,
    window: int = 8,
    min_docs: int = 2,
    text_col: str = "text",
) -> DataFrame:
    """Spans of ``window`` tokens occurring in >= ``min_docs`` distinct
    documents → (span_key, n_occ, n_docs, first_doc, first_pos).

    ``first_doc``/``first_pos`` name the canonical occurrence (lowest
    (doc_id, pos)) so a downstream cut pass can KEEP exactly one copy.
    """
    spans = _span_keys(docs, window, text_col, with_pos=True)
    agg = (
        spans.groupBy("span_key")
        .agg(
            F.count(F.lit(1)).alias("n_occ"),
            F.countDistinct("doc_id").alias("n_docs"),
            F.min(
                F.col("doc_id") * F.lit(_MAX_POS) + F.col("pos")
            ).alias("_first_loc"),
        )
        .where(F.col("n_docs") >= min_docs)
    )
    return agg.select(
        "span_key",
        F.col("n_occ").cast("long").alias("n_occ"),
        F.col("n_docs").cast("long").alias("n_docs"),
        # integer division (div), NOT floor(double /): the packed key
        # exceeds 2^53 once doc_id ~ 1e10 and a double quotient could
        # round across the boundary
        F.expr(f"_first_loc div {_MAX_POS}").cast("long").alias("first_doc"),
        (F.col("_first_loc") % _MAX_POS).cast("long").alias("first_pos"),
    )


def span_dedup_stats(
    docs: DataFrame,
    window: int = 8,
    min_docs: int = 2,
    text_col: str = "text",
) -> DataFrame:
    """Per-document duplication profile from the repeated-span set:
    (doc_id, n_spans, n_dup_spans, dup_ratio) — the score a pipeline
    thresholds to drop boilerplate-heavy documents.

    One span generation pass feeds BOTH sides: the duplicated-span set
    is a small re-aggregation of the exploded spans (bounded by distinct
    recurring keys — the broadcast side), and the same spans aggregate
    per doc; the fact table is tokenized exactly once per branch of the
    self-join, never re-deriving the expression (shared _span_keys).
    """
    spans = _span_keys(docs, window, text_col, with_pos=False)
    dup = (
        spans.groupBy("span_key")
        .agg(F.countDistinct("doc_id").alias("_nd"))
        .where(F.col("_nd") >= min_docs)
        .select("span_key")
    )
    marked = spans.join(F.broadcast(dup), "span_key", "left_semi")
    per_doc = spans.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_spans")
    )
    per_dup = marked.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_dup_spans")
    )
    j = per_doc.join(per_dup, "doc_id", "left").select(
        "doc_id",
        F.col("n_spans").cast("long").alias("n_spans"),
        F.coalesce("n_dup_spans", F.lit(0)).cast("long").alias("n_dup_spans"),
    )
    return j.withColumn(
        "dup_ratio",
        F.round(F.col("n_dup_spans") / F.col("n_spans"), 6),
    )
