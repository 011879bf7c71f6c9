"""Standing-query matching — the reverse-search / percolator pattern
(register queries once, match every incoming document against them).

The streaming-ingestion twin of top-k search: instead of a query
scanning the corpus, each arriving doc is probed against a registered
query set. The query side is tiny by construction (alert rules,
routing filters), so the plan is one broadcast term join + one
doc-keyed aggregate — per micro-batch cost is O(batch tokens), never
O(corpus), which is what makes it a standing Structured-Streaming
stage (see ``percolate_batch_fn``).

Reference tie-in: inverts the Q4 point-lookup shape (prs.py:86-105) —
the "index" is the query set, the probes are the documents.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from antidb_spark.functions.analyze import distinct_tokens


def percolate(
    docs: DataFrame,
    queries: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    query_id_col: str = "query_id",
    query_text_col: str = "query_text",
    require_all: bool = True,
) -> DataFrame:
    """(doc id, query_id, n_matched, n_terms): which registered queries
    match each document. ``require_all=True`` (default) keeps full
    conjunctive matches only — every distinct query term present in the
    doc; ``False`` keeps any-term hits with the match count for
    downstream thresholding. Token-less queries match nothing."""
    d = docs.select(
        F.col(id_col), F.explode(distinct_tokens(text_col)).alias("term")
    )
    q = queries.select(
        F.col(query_id_col),
        F.explode(distinct_tokens(query_text_col)).alias("term"),
    )
    qn = q.groupBy(query_id_col).agg(F.count(F.lit(1)).alias("n_terms"))
    hits = (
        d.join(F.broadcast(q), "term")
        .groupBy(id_col, query_id_col)
        .agg(F.count(F.lit(1)).alias("n_matched"))
        .join(F.broadcast(qn), query_id_col)
    )
    if require_all:
        hits = hits.filter(F.col("n_matched") == F.col("n_terms"))
    return hits.select(id_col, query_id_col, "n_matched", "n_terms")


def percolate_batch_fn(
    queries: DataFrame,
    out_dir: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    require_all: bool = True,
) -> Callable[[DataFrame, int], None]:
    """foreachBatch hook: append each micro-batch's percolator matches
    (plus ``batch_id`` for exactly-once replay dedup, the
    ``PostingsDeltaSink`` discipline) to a parquet alert log."""

    def _fn(batch: DataFrame, batch_id: int) -> None:
        out = percolate(
            batch, queries, id_col=id_col, text_col=text_col,
            require_all=require_all,
        ).withColumn("batch_id", F.lit(batch_id))
        out.write.mode("append").parquet(out_dir)

    return _fn
