"""BPE-ish token counting: cross-engine pattern identity + plan shape."""

from __future__ import annotations

import duckdb

from antidb_spark.operators.textstats import BPE_SPLIT_RE, token_count_stats

TRICKY = [
    (0, "Hello world, it's 2026!"),
    (1, "Don't  split-up URLs: http://x.co/a?b=1"),
    (2, ""),
    (3, "    "),
    (4, "we'll we've I'm you're he'd o'clock 'quoted'"),
    (5, "tabs\tand\nnewlines\r\nmixed   runs"),
    (6, "ünïcödé stays punct-class: 日本語"),
    (7, "a1b2c3 123abc !!!???"),
    (8, "vertical\x0btab and form\x0cfeed"),
]


def test_bpe_counts_match_duckdb(spark):
    df = spark.createDataFrame(TRICKY, ["doc_id", "text"])
    got = {
        r["doc_id"]: (r["n_ws_tokens"], r["n_bpe_tokens"], r["chars_per_bpe"])
        for r in token_count_stats(df).collect()
    }
    con = duckdb.connect()
    con.register("documents", df.toPandas())
    pat = BPE_SPLIT_RE.replace("'", "''")
    oracle = con.sql(
        f"""
SELECT doc_id,
  len(list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'),
                  t -> t <> ''))::BIGINT AS ws,
  len(regexp_extract_all(text, '{pat}'))::BIGINT AS bpe,
  round(CASE WHEN len(regexp_extract_all(text, '{pat}')) > 0
        THEN length(text)::DOUBLE / len(regexp_extract_all(text, '{pat}'))
        ELSE 0.0 END, 6) AS cpb
FROM documents
"""
    ).fetchall()
    assert got == {r[0]: (r[1], r[2], r[3]) for r in oracle}
    # empty / whitespace-only docs: analyzer sees 0 tokens, the BPE
    # pretokenizer sees the whitespace run (1 token for doc 3)
    assert got[2] == (0, 0, 0.0)
    assert got[3][0] == 0 and got[3][1] == 1


def test_token_stats_plan_is_scan_project(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    plan = token_count_stats(docs)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "Python" not in plan
