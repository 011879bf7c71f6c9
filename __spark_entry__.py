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

from antidb_spark.functions.analyze import (
    distinct_tokens,
    py_tokens,
    sql_tokens,
    tokens,
)
from antidb_spark.functions.bm25 import sql_contribution
from antidb_spark.operators.lookup import (
    KeyedIndex,
    annotate,
    lookup_with_fallback,
)
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


def _doc_index(spark: SparkSession, sf_dir: str) -> KeyedIndex:
    """Inverted index over documents: KeyedIndex with deduplicated token
    keys (the reference's test_mtd shape, tests.py:689-693)."""
    return KeyedIndex(
        _docs(spark, sf_dir), distinct_tokens("text"), id_cols=["doc_id"],
        multi=True,
    )


EQ_PROBES = ["spark", "zzzmiss", "data"]
DUMP_PROBES = ["spark", "sprk", "zzz", "data"]
FB_PROBES = ["spark", "sprk", "zzz"]
FB_SYNONYMS = [("sprk", "spark"), ("zzz", "nothing")]
RNG_LO, RNG_HI = "query", "sort"


def _q_eq_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q4/Q5: batch point lookup, per-query groups, join back to base."""
    return _doc_index(spark, sf_dir).eq(*EQ_PROBES)


def _q_rng_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q6: inclusive range over the term space (multiset: one row per
    matching (term, doc) pair)."""
    return _doc_index(spark, sf_dir).rng(RNG_LO, RNG_HI)


def _q_lookup_dump(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A2 dump side: probes with no posting (left-anti)."""
    probes = spark.createDataFrame([(p,) for p in DUMP_PROBES], "probe string")
    _ann, dump = annotate(probes, "probe", _doc_index(spark, sf_dir))
    return dump


def _q_fallback_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1: lookup with synonym fallback, first hit wins."""
    probes = spark.createDataFrame([(p,) for p in FB_PROBES], "probe string")
    syn = spark.createDataFrame(FB_SYNONYMS, "syn_from string, syn_to string")
    return lookup_with_fallback(probes, "probe", _doc_index(spark, sf_dir), syn)


def _q_interval_days(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P7 interval expansion at the relational level: one row per covered
    day per order, then per-day coverage counts."""
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    return (
        orders.select(
            F.explode(
                F.expr(
                    "sequence(to_date(o_orderdate), "
                    "date_add(to_date(o_orderdate), cast(o_orderkey % 4 as int)), "
                    "interval 1 day)"
                )
            ).alias("d")
        )
        .groupBy("d")
        .agg(F.count(F.lit(1)).alias("n_orders"))
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "term_counts": _q_term_counts,
        "postings_tf": _q_postings,
        "term_df": _q_term_df,
        "doc_lengths": _q_doc_lengths,
        "corpus_stats": _q_corpus_stats,
        "topk_bm25": _q_topk_bm25,
        "eq_lookup": _q_eq_lookup,
        "rng_lookup": _q_rng_lookup,
        "lookup_dump": _q_lookup_dump,
        "fallback_join": _q_fallback_join,
        "interval_days": _q_interval_days,
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


DTOK_CTE = "dtok AS (SELECT DISTINCT term, doc_id FROM tok)"


def _values(rows) -> str:
    def lit(v):
        return f"'{v}'" if isinstance(v, str) else str(v)

    return ", ".join(
        "(" + ", ".join(lit(c) for c in (r if isinstance(r, tuple) else (r,)))
        + ")"
        for r in rows
    )


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
        "eq_lookup": f"""
WITH {TOK_CTE}, {DTOK_CTE},
q(query_ord, term) AS (VALUES {_values(list(enumerate(EQ_PROBES)))})
SELECT q.query_ord, d.* FROM q
JOIN dtok t ON q.term = t.term
JOIN documents d ON t.doc_id = d.doc_id
""",
        "rng_lookup": f"""
WITH {TOK_CTE}, {DTOK_CTE}
SELECT d.* FROM dtok t JOIN documents d ON t.doc_id = d.doc_id
WHERE t.term >= '{RNG_LO}' AND t.term <= '{RNG_HI}'
""",
        "lookup_dump": f"""
WITH {TOK_CTE}, {DTOK_CTE}
SELECT p.probe FROM (VALUES {_values(DUMP_PROBES)}) p(probe)
WHERE p.probe NOT IN (SELECT term FROM dtok)
""",
        "fallback_join": f"""
WITH {TOK_CTE}, {DTOK_CTE},
probes(probe) AS (VALUES {_values(FB_PROBES)}),
syn(syn_from, syn_to) AS (VALUES {_values(FB_SYNONYMS)}),
hits AS (
  SELECT p.probe, d.doc_id, 0 AS path, NULL AS syn
  FROM probes p JOIN dtok d ON p.probe = d.term
  UNION ALL
  SELECT p.probe, d.doc_id, 1, s.syn_to
  FROM probes p JOIN syn s ON p.probe = s.syn_from
  JOIN dtok d ON s.syn_to = d.term),
first_hit AS (
  SELECT probe, doc_id FROM (
    SELECT probe, doc_id,
           row_number() OVER (PARTITION BY probe
                              ORDER BY path, syn NULLS FIRST, doc_id) rn
    FROM hits) WHERE rn = 1)
SELECT p.probe AS probe, f.doc_id AS doc_id
FROM probes p LEFT JOIN first_hit f USING (probe)
""",
        "interval_days": """
SELECT d::date AS d, count(*)::BIGINT AS n_orders
FROM orders, unnest(generate_series(
    o_orderdate::date,
    o_orderdate::date + (o_orderkey % 4)::int * interval 1 day,
    interval 1 day)) AS g(d)
GROUP BY d::date
""",
    }
