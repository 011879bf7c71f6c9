"""Top-k BM25 query plans (SURVEY §3.2 Spark lifecycle).

Plan shape (single query):

    corpus ─ tokenize/explode/groupBy ─► postings ──┬──────────────┐
                                                    │              │
    query ─ SAME analyzer ─► term DF ── broadcast ──┤ (prune)      │
                                                    ▼              ▼
                              pruned postings ─ df per term    doc_lengths
                                                    └─── score ────┘
                   groupBy(doc).sum(contrib) ─► orderBy desc ─► LIMIT k
                                           (TakeOrderedAndProject)

Scale properties:
- The query-term relation is tiny → broadcast; pruning postings to query
  terms happens BEFORE any wide shuffle, so the scored relation is
  |matching postings|, not |corpus|.
- df computed AFTER pruning is still exact (pruned postings retain every
  doc of each query term).
- Exact df/doclen come from the stats tables at index time (M2); here they
  are recomputed for the index-free path.
- Final top-k is TakeOrderedAndProject — no global sort materialization.
- Deterministic tiebreak (score DESC, *id_cols ASC) → rank identity.
"""

from __future__ import annotations

import operator as _op
from collections.abc import Sequence
from functools import reduce

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from antidb_spark.functions.analyze import py_tokens, tokens
from antidb_spark.functions.bm25 import contribution
from antidb_spark.operators.stats import (
    build_postings,
    corpus_stats,
    doc_lengths,
    term_dfs,
)
from antidb_spark.schema import DOC_ID_COLS


def query_terms_df(spark, queries: Sequence[str]) -> DataFrame:
    """(query_id, term) with the SAME analyzer as the corpus (the
    idx.py:143-148 ↔ prs.py:46-49 normalization-parity invariant).
    Terms are deduplicated per query (qtf ignored)."""
    rows = [(i, q) for i, q in enumerate(queries)]
    raw = spark.createDataFrame(rows, "query_id int, q string")
    return raw.select(
        "query_id", F.explode(F.array_distinct(tokens("q"))).alias("term")
    )


def bm25_topk(
    corpus: DataFrame,
    query: str,
    k: int = 10,
    id_cols: Sequence[str] = DOC_ID_COLS,
    text_col: str = "text",
    postings: DataFrame | None = None,
    dl: DataFrame | None = None,
) -> DataFrame:
    """Top-k BM25 for one query → (*id_cols, score) ordered."""
    out = bm25_topk_batch(
        corpus, [query], k=k, id_cols=id_cols, text_col=text_col,
        postings=postings, dl=dl,
    )
    return out.drop("query_id")


def bm25_topk_batch(
    corpus: DataFrame,
    queries: Sequence[str],
    k: int = 10,
    id_cols: Sequence[str] = DOC_ID_COLS,
    text_col: str = "text",
    postings: DataFrame | None = None,
    dl: DataFrame | None = None,
) -> DataFrame:
    """Batch top-k: (query_id, *id_cols, score), top-k per query via a
    window (reference analog: `eq(*qs)` concatenating per-query results
    in argument order, prs.py:88-89 / tests.py:266-273)."""
    spark = corpus.sparkSession
    if postings is None:
        postings = build_postings(corpus, id_cols=id_cols, text_col=text_col)
    if dl is None:
        dl = doc_lengths(postings, id_cols=id_cols)
    stats = corpus_stats(dl)

    qt = query_terms_df(spark, queries)
    terms = qt.select("term").distinct()
    # Prune postings to the union of query terms BEFORE any wide join;
    # df computed after pruning is still exact (every doc of each query
    # term survives the prune).
    hit = postings.join(F.broadcast(terms), "term")
    dfs = hit.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    pruned = hit.join(F.broadcast(qt), "term")

    scored = (
        pruned.join(F.broadcast(dfs), "term")
        .join(dl, list(id_cols))
        .crossJoin(F.broadcast(stats))
        .withColumn(
            "contrib",
            contribution(F.col("tf"), F.col("df"), F.col("dl"),
                         F.col("avgdl"), F.col("n_docs")),
        )
        .groupBy("query_id", *id_cols)
        .agg(F.sum("contrib").alias("score"))
    )
    w = (
        Window.partitionBy("query_id")
        .orderBy(F.desc("score"), *[F.asc(c) for c in id_cols])
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .drop("rank")
        .orderBy("query_id", F.desc("score"), *[F.asc(c) for c in id_cols])
    )


def bm25_scores_pinned(
    corpus: DataFrame,
    query: str,
    id_cols: Sequence[str] = DOC_ID_COLS,
    text_col: str = "text",
) -> DataFrame:
    """Cross-engine-deterministic per-doc BM25 scores for EVERY doc
    matching ≥ 1 query term (no top-k cut): per-term contributions are
    summed in SORTED-TERM order via fixed-order column addition (each
    per-term tf aggregates at most one posting per doc), and the score
    is ROUNDED to 4 decimals, so an independent engine (DuckDB oracle)
    computing the same math produces identical values. Output:
    (*id_cols, score[double, rounded]), unordered.

    This is the shared scoring core of ``bm25_topk_pinned`` (global
    top-k) and ``bm25_grouped_topk`` (per-group rollup — group maxima
    need every matching doc, not just the global top k).

    SINGLE-PASS plan: the corpus is tokenized exactly once. One
    doc-keyed aggregation produces (dl, tf per query term) per doc; a
    second aggregation over that (already tiny, one row per doc)
    relation yields (n_docs, avgdl, df per term) as a broadcast single
    row; scoring is then a pure expression. The previous shape
    (separate dl / stats / df subtrees joined back) re-ran the
    tokenize+explode scan 4× — Catalyst does not reuse those
    exchanges — which tripled the wall time of the index-free path."""
    spark = corpus.sparkSession
    q_terms = sorted(set(py_tokens(query)))
    if not q_terms:
        # Miss → empty, never an error (README.md:59, tests.py:264-265).
        schema = ", ".join(
            [f"{c} {corpus.schema[c].dataType.simpleString()}" for c in id_cols]
            + ["score double"]
        )
        return spark.createDataFrame([], schema)
    postings = build_postings(corpus, id_cols=id_cols, text_col=text_col)
    n = len(q_terms)
    perdoc = postings.groupBy(*id_cols).agg(
        F.sum("tf").alias("dl"),
        *[
            F.sum(F.when(F.col("term") == t, F.col("tf"))).alias(f"tf{i}")
            for i, t in enumerate(q_terms)
        ],
    )
    # n_docs/avgdl/df in ONE pass over the per-doc relation (count of a
    # nullable column = non-null count = docs containing the term)
    aux = perdoc.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.avg("dl").alias("avgdl"),
        *[F.count(F.col(f"tf{i}")).alias(f"df{i}") for i in range(n)],
    )
    parts = [
        F.coalesce(
            contribution(F.col(f"tf{i}"), F.col(f"df{i}"), F.col("dl"),
                         F.col("avgdl"), F.col("n_docs")),
            F.lit(0.0),
        )
        for i in range(n)
    ]
    score = F.round(reduce(_op.add, parts), 4)
    return (
        perdoc.crossJoin(F.broadcast(aux))
        # only docs matching ≥1 query term compete (miss semantics)
        .filter(
            reduce(_op.or_, [F.col(f"tf{i}").isNotNull() for i in range(n)])
        )
        .withColumn("score", score)
        .select(*id_cols, "score")
    )


def bm25_topk_pinned(
    corpus: DataFrame,
    query: str,
    k: int = 10,
    id_cols: Sequence[str] = DOC_ID_COLS,
    text_col: str = "text",
) -> DataFrame:
    """Cross-engine-deterministic top-k (``bm25_scores_pinned`` +
    rounded-score/id ordering + LIMIT — a TakeOrderedAndProject, no
    global sort materialization). Output: (*id_cols, score)."""
    return (
        bm25_scores_pinned(corpus, query, id_cols=id_cols, text_col=text_col)
        .orderBy(F.desc("score"), *[F.asc(c) for c in id_cols])
        .limit(k)
    )


def bm25_grouped_topk(
    corpus: DataFrame,
    query: str,
    group_col: str,
    k: int = 10,
    id_cols: Sequence[str] = DOC_ID_COLS,
    text_col: str = "text",
) -> DataFrame:
    """Group-level (conversation-level) ranking: score every matching
    doc, roll up per group, rank groups. Output (group_col, n_hits,
    best_score) ordered by (best_score DESC, group ASC), top k.

    The rollup uses only order-free aggregates over the already-rounded
    per-doc scores (max, count) so the result is cross-engine exact.
    Scale shape: per-doc scoring is the single-pass pinned plan; the
    group rollup is one map-side-combinable shuffle on group_col keyed
    by groups (≪ docs), then a TakeOrderedAndProject over groups. The
    per-group winner CANNOT be derived from a global top-k cut (a
    group's best doc may sit below the global k-th doc), which is why
    this consumes ``bm25_scores_pinned`` and not ``bm25_topk_pinned``."""
    scores = bm25_scores_pinned(
        corpus, query, id_cols=id_cols, text_col=text_col
    )
    if group_col not in id_cols:
        # group attribute lives on the doc row (documents.source);
        # pruned 2-column re-scan + one id-keyed join. When the group
        # IS an id component (transcripts: conv_id of (conv_id,
        # turn_idx)) no join is needed at all.
        scores = scores.join(corpus.select(*id_cols, group_col),
                             list(id_cols))
    return (
        scores
        .groupBy(group_col)
        .agg(
            F.count(F.lit(1)).alias("n_hits"),
            F.max("score").alias("best_score"),
        )
        .orderBy(F.desc("best_score"), F.asc(group_col))
        .limit(k)
    )
