"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash → CORRECTNESS_r{N}.json).

Cross-engine float discipline: every query whose output contains doubles
pins the association order of float sums (sorted-term fixed-order adds)
and rounds at the output boundary, so Spark and DuckDB produce identical
values (see antidb_spark.operators.topk.bm25_topk_pinned).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from antidb_spark.functions.analyze import py_tokens, sql_tokens, tokens
from antidb_spark.functions.bm25 import sql_contribution
from antidb_spark.operators.stats import (
    build_postings,
    corpus_stats,
    doc_lengths,
    term_dfs,
)
from antidb_spark.operators.topk import bm25_topk_pinned

DOC_ID = ("doc_id",)
FLAGSHIP_QUERY = "spark query join performance"


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


# DuckDB CTE producing the same (doc_id, term) token stream as the Spark
# analyzer (shared-analyzer invariant).
TOK_CTE = (
    "tok AS (SELECT doc_id, t.term AS term FROM documents, "
    f"unnest({sql_tokens('text')}) AS t(term) WHERE t.term <> '')"
)
POST_CTE = (
    "post AS (SELECT term, doc_id, count(*)::BIGINT AS tf FROM tok "
    "GROUP BY term, doc_id)"
)
DL_CTE = "dl AS (SELECT doc_id, sum(tf)::BIGINT AS dl FROM post GROUP BY doc_id)"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: BM25 top-10 over sf0.001 documents."""
    corpus = _docs(spark, "/root/testdata/sf0.001")
    return bm25_topk_pinned(corpus, FLAGSHIP_QUERY, k=10, id_cols=DOC_ID)


# --- queries ------------------------------------------------------------


def _q_term_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P3/P6: tokenize → explode → count per term."""
    return (
        _docs(spark, sf_dir)
        .select(F.explode(tokens("text")).alias("term"))
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def _q_postings(spark: SparkSession, sf_dir: str) -> DataFrame:
    return build_postings(_docs(spark, sf_dir), id_cols=DOC_ID)


def _q_term_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    return term_dfs(build_postings(_docs(spark, sf_dir), id_cols=DOC_ID))


def _q_doc_lengths(spark: SparkSession, sf_dir: str) -> DataFrame:
    return doc_lengths(
        build_postings(_docs(spark, sf_dir), id_cols=DOC_ID), id_cols=DOC_ID
    )


def _q_corpus_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    st = corpus_stats(
        doc_lengths(
            build_postings(_docs(spark, sf_dir), id_cols=DOC_ID), id_cols=DOC_ID
        )
    )
    return st.select("n_docs", F.round("avgdl", 6).alias("avgdl"))


def _q_topk_bm25(spark: SparkSession, sf_dir: str) -> DataFrame:
    return bm25_topk_pinned(_docs(spark, sf_dir), FLAGSHIP_QUERY, k=10, id_cols=DOC_ID)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "term_counts": _q_term_counts,
        "postings_tf": _q_postings,
        "term_df": _q_term_df,
        "doc_lengths": _q_doc_lengths,
        "corpus_stats": _q_corpus_stats,
        "topk_bm25": _q_topk_bm25,
    }


# --- oracle SQL ---------------------------------------------------------


def _topk_oracle(query: str, k: int) -> str:
    terms = sorted(set(py_tokens(query)))
    in_list = ", ".join(f"'{t}'" for t in terms)
    contrib = sql_contribution(tf="p.tf", df="d.df", dl="l.dl",
                               avgdl="s.avgdl", n="s.n_docs")
    per_term_sums = " + ".join(
        f"coalesce(sum(CASE WHEN p.term = '{t}' THEN {contrib} END), 0.0)"
        for t in terms
    )
    return f"""
WITH {TOK_CTE}, {POST_CTE}, {DL_CTE},
st AS (SELECT count(*)::BIGINT AS n_docs, avg(dl) AS avgdl FROM dl),
dfs AS (SELECT term, count(*)::BIGINT AS df FROM post
        WHERE term IN ({in_list}) GROUP BY term)
SELECT p.doc_id AS doc_id, round({per_term_sums}, 4) AS score
FROM post p
JOIN dfs d ON p.term = d.term
JOIN dl l ON p.doc_id = l.doc_id
CROSS JOIN st s
GROUP BY p.doc_id
ORDER BY score DESC, doc_id ASC
LIMIT {k}
"""


def oracle_sql() -> dict[str, str]:
    return {
        "term_counts": (
            f"WITH {TOK_CTE} SELECT term, count(*)::BIGINT AS n FROM tok "
            "GROUP BY term"
        ),
        "postings_tf": f"WITH {TOK_CTE} SELECT term, doc_id, count(*)::BIGINT "
                       "AS tf FROM tok GROUP BY term, doc_id",
        "term_df": (
            f"WITH {TOK_CTE}, {POST_CTE} "
            "SELECT term, count(*)::BIGINT AS df FROM post GROUP BY term"
        ),
        "doc_lengths": f"WITH {TOK_CTE}, {POST_CTE} "
                       "SELECT doc_id, sum(tf)::BIGINT AS dl FROM post GROUP BY doc_id",
        "corpus_stats": (
            f"WITH {TOK_CTE}, {POST_CTE}, {DL_CTE} "
            "SELECT count(*)::BIGINT AS n_docs, round(avg(dl), 6) AS avgdl FROM dl"
        ),
        "topk_bm25": _topk_oracle(FLAGSHIP_QUERY, 10),
    }
