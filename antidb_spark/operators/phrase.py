"""Positional postings + exact phrase search.

The reference's query surface is key-equality/range only; a full-text
engine needs phrase queries ("exact sequence of tokens"), which require
per-(term, doc) POSITION lists — the positional-postings layer classic
inverted indexes add beside tf.

Spark-first design (no UDFs anywhere):

- ``positional_postings``: posexplode of the shared analyzer's token
  array → (term, *id_cols, positions: array<int>, tf). One shuffle
  (groupBy term+doc with map-side combine); positions are
  ascending-sorted for deterministic output.
- ``phrase_search``: for phrase t₀ t₁ … tₙ₋₁, a doc matches where some
  anchor p has tᵢ at position p+i for all i. Instead of n-1 self-joins,
  the per-doc position lists of the phrase's terms are collected into
  ONE map column (map_from_entries over a single groupBy), and the
  anchor set is folded as pure array expressions:
  ``anchors ∩= shift(positions[tᵢ], -i)`` — whole-stage codegen, one
  shuffle total. phrase_freq = |anchors|.

Scale shape: the postings relation is pruned to the phrase's terms
BEFORE the doc-keyed shuffle, so the aggregated relation is
|postings of phrase terms|, not |corpus|; skew on stopword-only
phrases is bounded by the doc key (each doc is one group).

DuckDB oracle: the same fold is expressible with list_transform /
list_intersect (``__spark_entry__``), so the entry is hash-checked.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from antidb_spark.functions.analyze import py_tokens, tokens
from antidb_spark.schema import DOC_ID_COLS


def positional_postings(
    corpus: DataFrame,
    id_cols: Sequence[str] = DOC_ID_COLS,
    text_col: str = "text",
) -> DataFrame:
    """(term, *id_cols, positions array<int> ascending, tf)."""
    pos = corpus.select(
        *id_cols, F.posexplode(tokens(text_col)).alias("pos", "term")
    )
    return (
        pos.groupBy("term", *id_cols)
        .agg(F.sort_array(F.collect_list("pos")).alias("positions"))
        .withColumn("tf", F.size("positions").cast("long"))
    )


def phrase_search(
    corpus: DataFrame,
    phrase: str,
    id_cols: Sequence[str] = DOC_ID_COLS,
    text_col: str = "text",
) -> DataFrame:
    """Docs containing the exact token sequence of ``phrase`` (under the
    shared analyzer): (*id_cols, phrase_freq) with phrase_freq = number
    of occurrences, ordered (phrase_freq desc, *id_cols). Empty phrase
    or no match → empty (miss semantics, never an error)."""
    terms = py_tokens(phrase)
    spark = corpus.sparkSession
    if not terms:
        schema = ", ".join(
            [f"{c} {corpus.schema[c].dataType.simpleString()}" for c in id_cols]
            + ["phrase_freq long"]
        )
        return spark.createDataFrame([], schema)
    uniq = sorted(set(terms))
    posts = positional_postings(corpus, id_cols, text_col).filter(
        F.col("term").isin(uniq)
    )
    per_doc = (
        posts.groupBy(*id_cols)
        .agg(
            F.map_from_entries(
                F.collect_list(F.struct("term", "positions"))
            ).alias("pm")
        )
        .filter(F.size("pm") == len(uniq))  # every phrase term present
    )
    anchors = F.element_at(F.col("pm"), F.lit(terms[0]))
    for i, t in enumerate(terms[1:], start=1):
        anchors = F.array_intersect(
            anchors,
            F.transform(
                F.element_at(F.col("pm"), F.lit(t)), lambda p: p - i
            ),
        )
    return (
        per_doc.withColumn("phrase_freq", F.size(anchors).cast("long"))
        .filter(F.col("phrase_freq") > 0)
        .select(*id_cols, "phrase_freq")
        .orderBy(F.desc("phrase_freq"), *[F.asc(c) for c in id_cols])
    )
