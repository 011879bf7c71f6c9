"""Score explanation (per-term BM25 breakdown) and standing-query
percolation."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from antidb_spark.functions.bm25 import B, K1
from antidb_spark.operators.build import IndexBuilder
from antidb_spark.operators.percolate import percolate, percolate_batch_fn
from antidb_spark.synth import synth_transcripts, vocabulary

_V = vocabulary(2000)
QUERY = f"the {_V[200]} {_V[1000]}"


@pytest.fixture(scope="module")
def built(spark, tmp_path_factory):
    corpus = synth_transcripts(spark, n_convs=40, seed=7).cache()
    corpus.count()
    b = IndexBuilder(spark, str(tmp_path_factory.mktemp("xidx")))
    b.build(corpus)
    yield b, corpus
    corpus.unpersist()


def test_explain_consistent_with_query_pinned(built):
    b, _ = built
    tops = b.query_pinned(QUERY, k=5).toPandas()
    exp = b.explain(QUERY, k=5).toPandas()
    # same doc set, same scores
    tkeys = {(r.conv_id, r.turn_idx): r.score for r in tops.itertuples()}
    ekeys = {(r.conv_id, r.turn_idx): r.score for r in exp.itertuples()}
    assert ekeys == tkeys
    # per-doc contribution sum reproduces the pinned 4dp score
    sums = exp.groupby(["conv_id", "turn_idx"])["contribution"].sum()
    for key, s in sums.items():
        assert abs(s - tkeys[key]) < 5e-4, (key, s, tkeys[key])
    # factor identity per row: contribution == idf * tf_weight
    for r in exp.itertuples():
        assert abs(r.contribution - r.idf * r.tf_weight) < 5e-6
    # factors recompute from the raw counts
    n_docs = b.catalog.read("stats").first()["n_docs"]
    avgdl = b.catalog.read("stats").first()["avgdl"]
    for r in exp.itertuples():
        want_idf = math.log(1 + (n_docs - r.df + 0.5) / (r.df + 0.5))
        want_tfw = (r.tf * (K1 + 1)) / (
            r.tf + K1 * (1 - B + B * r.dl / avgdl)
        )
        assert abs(r.idf - want_idf) < 1e-6
        assert abs(r.tf_weight - want_tfw) < 1e-6


def test_explain_excludes_deleted_docs(spark, tmp_path):
    corpus = synth_transcripts(spark, n_convs=12, seed=11)
    b = IndexBuilder(spark, str(tmp_path / "didx"))
    b.build(corpus)
    top1 = b.query_pinned(QUERY, k=1).first()
    b.delete_docs(
        spark.createDataFrame(
            [(top1["conv_id"], top1["turn_idx"])], "conv_id string, turn_idx int"
        )
    )
    exp = b.explain(QUERY, k=5).toPandas()
    assert (top1["conv_id"], top1["turn_idx"]) not in {
        (r.conv_id, r.turn_idx) for r in exp.itertuples()
    }
    # still consistent with the post-delete query
    tops = b.query_pinned(QUERY, k=5).toPandas()
    assert {(r.conv_id, r.turn_idx) for r in exp.itertuples()} == {
        (r.conv_id, r.turn_idx) for r in tops.itertuples()
    }


def test_explain_empty_query(built):
    b, _ = built
    assert b.explain("!!! ???", k=5).count() == 0


DOCS = [
    (0, "spark join performance tuning"),
    (1, "window merge sort in spark"),
    (2, "unrelated text about cats"),
    (3, "join window merge"),
]
QUERIES = [
    ("q_spark_join", "spark join"),
    ("q_merge", "merge window"),
    ("q_never", "zzzqqq"),
]


def test_percolate_conjunctive(spark):
    docs = spark.createDataFrame(DOCS, "doc_id long, text string")
    qdf = spark.createDataFrame(QUERIES, "query_id string, query_text string")
    got = {
        (r["doc_id"], r["query_id"]): (r["n_matched"], r["n_terms"])
        for r in percolate(docs, qdf).collect()
    }
    assert got == {
        (0, "q_spark_join"): (2, 2),
        (1, "q_merge"): (2, 2),
        (3, "q_merge"): (2, 2),
    }


def test_percolate_any_mode_counts(spark):
    docs = spark.createDataFrame(DOCS, "doc_id long, text string")
    qdf = spark.createDataFrame(QUERIES, "query_id string, query_text string")
    got = {
        (r["doc_id"], r["query_id"]): r["n_matched"]
        for r in percolate(docs, qdf, require_all=False).collect()
    }
    assert got[(3, "q_spark_join")] == 1  # has 'join' only
    assert got[(0, "q_merge")] == 0 if (0, "q_merge") in got else True
    assert all(q != "q_never" for _, q in got)


def test_percolate_streaming_alert_log(spark, tmp_path):
    import os
    import time

    src = str(tmp_path / "src")
    out = str(tmp_path / "alerts")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(src)
    docs = spark.createDataFrame(DOCS, "doc_id long, text string")
    docs.write.mode("overwrite").parquet(src)
    qdf = spark.createDataFrame(QUERIES, "query_id string, query_text string")
    stream = spark.readStream.schema("doc_id long, text string").parquet(src)
    q = (
        stream.writeStream.foreachBatch(percolate_batch_fn(qdf, out))
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    time.sleep(0.2)
    log = spark.read.parquet(out)
    got = {(r["doc_id"], r["query_id"]) for r in log.collect()}
    assert got == {
        (0, "q_spark_join"), (1, "q_merge"), (3, "q_merge"),
    }
    assert log.select("batch_id").distinct().count() >= 1


def test_facet_histogram_matches_bruteforce(spark, tmp_path):
    corpus = synth_transcripts(spark, n_convs=20, seed=5).withColumn(
        "n_chars", F.length("text")
    )
    b = IndexBuilder(spark, str(tmp_path / "hidx"))
    b.build(corpus)
    b.build_doc_meta(corpus, ["n_chars"])
    got = {r["bucket"]: r["n_docs"]
           for r in b.facet_histogram(QUERY, "n_chars", 50).collect()}
    from antidb_spark.functions.analyze import py_tokens

    terms = set(py_tokens(QUERY))
    want: dict[int, int] = {}
    for row in corpus.collect():
        if terms & set(py_tokens(row["text"])):
            bk = row["n_chars"] - row["n_chars"] % 50
            want[bk] = want.get(bk, 0) + 1
    assert got == want
    with pytest.raises(ValueError):
        b.facet_histogram(QUERY, "n_chars", 0)
    with pytest.raises(ValueError):
        b.facet_histogram(QUERY, "nope", 50)


def test_connected_dup_groups(spark):
    from antidb_spark.operators.dedup import connected_dup_groups

    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (5, 6), (8, 9), (9, 10), (3, 11)],
        "id_a long, id_b long",
    )
    got = {r["id"]: r["group_id"]
           for r in connected_dup_groups(pairs).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 11: 1, 5: 5, 6: 5, 8: 8, 9: 8, 10: 8}


def test_connected_dup_groups_diameter_guard(spark):
    from antidb_spark.operators.dedup import connected_dup_groups

    chain = spark.createDataFrame(
        [(i, i + 1) for i in range(12)], "id_a long, id_b long"
    )
    # a 12-edge chain collapses fine with enough rounds...
    got = {r["id"]: r["group_id"]
           for r in connected_dup_groups(chain, max_iter=25).collect()}
    assert set(got.values()) == {0}
    # ...and raises (never returns a partial grouping) when capped
    with pytest.raises(RuntimeError):
        connected_dup_groups(chain, max_iter=2)


def test_percolate_scale_broadcast_and_correct(spark):
    """10⁴ standing queries (the alerting-at-scale shape): the query
    side must STAY broadcast — no sort-merge join, no corpus-side
    exchange before the match aggregate — and matches must equal the
    brute-force set intersection on a sampled batch."""
    import itertools

    from antidb_spark.functions.analyze import py_tokens

    v = vocabulary(2000)
    pairs = list(itertools.islice(
        ((a, b) for a in range(0, 2000, 7) for b in range(3, 2000, 11)),
        10_000,
    ))
    qdf = spark.createDataFrame(
        [(f"q{i:05d}", f"{v[a]} {v[b]}") for i, (a, b) in enumerate(pairs)],
        "query_id string, query_text string",
    )
    docs = synth_transcripts(spark, n_convs=8, seed=3).select(
        F.monotonically_increasing_id().alias("doc_id"), "text"
    ).cache()
    out = percolate(docs, qdf)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    # the ONLY exchange is the (doc, query) match aggregate — the doc
    # token stream itself never shuffles before the broadcast join
    assert plan.count("Exchange hashpartitioning") <= 2  # partial+final agg

    got = {(r["doc_id"], r["query_id"]) for r in out.collect()}
    queries = {f"q{i:05d}": {v[a], v[b]} for i, (a, b) in enumerate(pairs)}
    sample = docs.limit(20).collect()
    for row in sample:
        toks = set(py_tokens(row["text"]))
        for qid, qterms in queries.items():
            if qterms <= toks:
                assert (row["doc_id"], qid) in got
            else:
                assert (row["doc_id"], qid) not in got
    docs.unpersist()
