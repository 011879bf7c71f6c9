"""Corpus statistics as grouped aggregates (SURVEY §2.6).

The reference has no aggregations; BM25 needs exact tf/df/doclen/avgdl/N.
Everything here is a plain Catalyst-planned groupBy — partial (map-side)
aggregation, whole-stage codegen, and AQE partition coalescing are free.

Scale notes (100 TB / 10^12 turns):
- ``build_postings``: explode → groupBy(term, doc). The groupBy key
  includes the doc id, so cardinality ≈ corpus token pairs but map-side
  combine collapses within-partition duplicates before the shuffle; a
  single turn's tokens are always co-partitioned (they start in one row).
- ``term_dfs``: one row per (term, doc) in, one per term out — partial
  count per partition shrinks the shuffle to |vocab| per partition.
- df must be EXACT (not approx_count_distinct): rank identity of BM25
  depends on it (SURVEY §2.6). Counting rows of the already-distinct
  postings relation gives exact df without a countDistinct shuffle.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from antidb_spark.functions.analyze import tokens
from antidb_spark.schema import DOC_ID_COLS


def build_postings(
    corpus: DataFrame,
    id_cols: Sequence[str] = DOC_ID_COLS,
    text_col: str = "text",
) -> DataFrame:
    """(term, *id_cols, tf) — the distributed index-entry relation.

    Reference analog: one `[sort_key, lstart]` per extracted key with
    tuple fan-out (idx.py:141-149) = tokenize + explode; tf is new
    (needed for BM25, absent in the offset index).
    """
    return (
        corpus.select(*id_cols, F.explode(tokens(text_col)).alias("term"))
        .groupBy("term", *id_cols)
        .agg(F.count(F.lit(1)).alias("tf"))
    )


def doc_lengths(postings: DataFrame, id_cols: Sequence[str] = DOC_ID_COLS) -> DataFrame:
    """(*id_cols, dl): total tokens per document. Invariant: sum(tf) per
    doc == token count of the doc's text under the shared analyzer."""
    return postings.groupBy(*id_cols).agg(F.sum("tf").alias("dl"))


def term_dfs(postings: DataFrame) -> DataFrame:
    """(term, df): EXACT document frequency. postings is already distinct
    on (term, doc), so df = row count per term — no countDistinct needed."""
    return postings.groupBy("term").agg(F.count(F.lit(1)).alias("df"))


def corpus_stats(doclens: DataFrame) -> DataFrame:
    """Single-row (n_docs, avgdl). Kept as a DataFrame (broadcast into the
    scoring plan) instead of collected scalars — no driver round-trip."""
    return doclens.agg(
        F.count(F.lit(1)).alias("n_docs"), F.avg("dl").alias("avgdl")
    )


def exact_quantiles(
    df: DataFrame,
    col: str,
    qs: Sequence[float],
    n_partitions: int | None = None,
) -> DataFrame:
    """(q, value) EXACT order statistics of ``col``: for each q the
    value at ascending rank ``floor(q × (n-1))`` — quantile-by-rank,
    deterministic and engine-independent (duplicate values make any
    tiebreak invisible in the output value).

    Spark's exact ``percentile`` aggregate buffers every value on one
    reducer; this instead rides the ``assign_doc_ords`` two-pass range
    machinery: ONE range shuffle on the value column, per-partition
    counts to the driver (one row each), an Arrow numbering pass, and a
    broadcast join against the |qs| target ranks — every partition does
    bounded work at any scale, the profile the 100 TB corpus-statistics
    pass needs. Reference tie-in: the same sorted-run + offsets layout
    the index build uses (SURVEY O1-O3), pointed at statistics.
    """
    import math

    from antidb_spark.operators.build import assign_doc_ords

    for q in qs:
        if not (0.0 <= q <= 1.0):
            raise ValueError(f"quantile must be in [0,1], got {q}")
    spark = df.sparkSession
    n = df.count()
    rank_rows = [
        (float(q), int(math.floor(q * (n - 1)))) for q in sorted(set(qs))
    ]
    rank_df = spark.createDataFrame(rank_rows, "q double, _r long")
    if n == 0:
        return rank_df.filter(F.lit(False)).select(
            "q", F.lit(None).cast(df.schema[col].dataType).alias("value")
        )
    ords = assign_doc_ords(
        df.select(col), id_cols=[col], n_partitions=n_partitions
    )
    return (
        ords.join(F.broadcast(rank_df), ords["doc_ord"] == rank_df["_r"])
        .select("q", F.col(col).alias("value"))
    )
