"""BM25 scoring math — plain column arithmetic + a pandas/numpy oracle.

Float discipline (SURVEY §7.4): float64 everywhere; the oracle scorer sums
per-term contributions in sorted-term order, and rank-identity tests
compare with a fixed tolerance plus deterministic tiebreak
(score DESC, conv_id ASC, turn_idx ASC).

Variant: Lucene-style BM25 with idf = ln(1 + (N - df + 0.5)/(df + 0.5)),
k1 = 1.2, b = 0.75. Query terms are deduplicated (qtf ignored).
"""

from __future__ import annotations

from collections.abc import Sequence

import numpy as np
import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F

from antidb_spark.functions.analyze import py_tokens

K1 = 1.2
B = 0.75


def idf(df_col: Column, n_docs_col: Column) -> Column:
    return F.log(
        F.lit(1.0)
        + (n_docs_col.cast("double") - df_col + F.lit(0.5)) / (df_col + F.lit(0.5))
    )


def tf_weight(tf_col: Column, dl_col: Column, avgdl_col: Column) -> Column:
    tf = tf_col.cast("double")
    return (tf * (K1 + 1.0)) / (
        tf + K1 * (1.0 - B + B * dl_col.cast("double") / avgdl_col)
    )


def contribution(tf_col: Column, df_col: Column, dl_col: Column,
                 avgdl_col: Column, n_docs_col: Column) -> Column:
    """Per-(term, doc) BM25 contribution; a document's score is the sum
    over its matching query terms."""
    return idf(df_col, n_docs_col) * tf_weight(tf_col, dl_col, avgdl_col)


# --- SQL oracle fragments (DuckDB) ------------------------------------

SQL_IDF = "ln(1.0 + (({n}) - ({df}) + 0.5) / (({df}) + 0.5))"
SQL_TFW = "(({tf}) * (1.2 + 1.0)) / (({tf}) + 1.2 * (1.0 - 0.75 + 0.75 * ({dl}) / ({avgdl})))"


def sql_contribution(tf: str, df: str, dl: str, avgdl: str, n: str) -> str:
    return f"({SQL_IDF.format(n=n, df=df)}) * ({SQL_TFW.format(tf=tf, dl=dl, avgdl=avgdl)})"


# --- Exact pandas/numpy oracle scorer ----------------------------------
# This plays the role of "the reference engine's results on its query
# set" (SURVEY §5.3): an independent single-node implementation the Spark
# top-k must be rank-identical to.

def pandas_bm25_topk(
    corpus: pd.DataFrame,
    query: str,
    k: int = 10,
    id_cols: Sequence[str] = ("conv_id", "turn_idx"),
    text_col: str = "text",
) -> pd.DataFrame:
    """Exact BM25 top-k over a pandas corpus. Deterministic: per-term
    contributions are summed in sorted-term order; ties broken by id_cols
    ascending."""
    docs = corpus.reset_index(drop=True)
    tok_lists = docs[text_col].map(py_tokens)
    n_docs = len(docs)
    dl = tok_lists.map(len).to_numpy(dtype=np.float64)
    avgdl = dl.mean() if n_docs else 0.0

    q_terms = sorted(set(py_tokens(query)))
    scores = np.zeros(n_docs, dtype=np.float64)
    for term in q_terms:  # sorted order pins float association
        tf = np.array([toks.count(term) for toks in tok_lists], dtype=np.float64)
        df_t = int((tf > 0).sum())
        if df_t == 0:
            continue
        idf_t = np.log(1.0 + (n_docs - df_t + 0.5) / (df_t + 0.5))
        tfw = (tf * (K1 + 1.0)) / (tf + K1 * (1.0 - B + B * dl / avgdl))
        scores += idf_t * np.where(tf > 0, tfw, 0.0)

    out = docs[list(id_cols)].copy()
    out["score"] = scores
    out = out[out["score"] > 0.0]
    out = out.sort_values(
        by=["score", *id_cols], ascending=[False] + [True] * len(id_cols)
    ).head(k)
    return out.reset_index(drop=True)
