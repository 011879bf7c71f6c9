"""BM25 rank-identity: Spark plan vs exact pandas/numpy oracle (SURVEY §5.3)
plus stats invariants on the synthetic corpus."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from antidb_spark.functions.analyze import py_tokens
from antidb_spark.functions.bm25 import pandas_bm25_topk
from antidb_spark.operators.stats import (
    build_postings,
    corpus_stats,
    doc_lengths,
    term_dfs,
)
from antidb_spark.operators.topk import bm25_topk, bm25_topk_batch
from antidb_spark.synth import query_set, synth_transcripts


@pytest.fixture(scope="module")
def corpus(spark):
    df = synth_transcripts(spark, n_convs=40, mean_turns=6, seed=42)
    df.cache().count()
    return df


@pytest.fixture(scope="module")
def corpus_pd(corpus):
    return corpus.orderBy("conv_id", "turn_idx").toPandas()


def test_stats_invariants(corpus, corpus_pd):
    post = build_postings(corpus)
    dl = doc_lengths(post).toPandas().set_index(["conv_id", "turn_idx"])["dl"]
    for _, row in corpus_pd.head(50).iterrows():
        assert dl[(row["conv_id"], row["turn_idx"])] == len(py_tokens(row["text"]))

    dfs = term_dfs(post).toPandas().set_index("term")["df"]
    # exact df for a few terms, recomputed naively
    for term in ["the", "a"] + list(dfs.index[:5]):
        naive = sum(term in set(py_tokens(t)) for t in corpus_pd["text"])
        assert dfs.get(term, 0) == naive

    st = corpus_stats(doc_lengths(build_postings(corpus))).collect()[0]
    assert st["n_docs"] == len(corpus_pd)
    total = sum(len(py_tokens(t)) for t in corpus_pd["text"])
    assert abs(st["avgdl"] - total / len(corpus_pd)) < 1e-9


@pytest.mark.parametrize("qi", [0, 3, 11, 17, 29])
def test_topk_rank_identical_to_oracle(corpus, corpus_pd, qi):
    query = query_set(50, seed=42)[qi]
    got = bm25_topk(corpus, query, k=10).toPandas()
    want = pandas_bm25_topk(corpus_pd, query, k=10)
    assert list(map(tuple, got[["conv_id", "turn_idx"]].values)) == list(
        map(tuple, want[["conv_id", "turn_idx"]].values)
    ), query
    np.testing.assert_allclose(got["score"], want["score"], rtol=1e-9)


def test_topk_batch_matches_singles(corpus, corpus_pd):
    queries = query_set(50, seed=42)[:8]
    batch = bm25_topk_batch(corpus, queries, k=5).toPandas()
    for i, q in enumerate(queries):
        got = batch[batch["query_id"] == i]
        want = pandas_bm25_topk(corpus_pd, q, k=5)
        assert list(got["conv_id"]) == list(want["conv_id"]), q
        np.testing.assert_allclose(got["score"], want["score"], rtol=1e-9)


def test_miss_is_empty_not_error(corpus):
    """Reference: miss → empty generator, never an error (README.md:59,
    tests.py:264-265)."""
    assert bm25_topk(corpus, "zzzznotaword9x", k=10).count() == 0


def test_empty_query_is_empty_not_error(corpus):
    from antidb_spark.operators.topk import bm25_topk_pinned

    for q in ["", "!!! --- ,,,"]:
        df = bm25_topk_pinned(corpus, q, k=5)
        assert df.count() == 0
        assert df.columns == ["conv_id", "turn_idx", "score"]


def test_pinned_matches_oracle(corpus, corpus_pd):
    from antidb_spark.operators.topk import bm25_topk_pinned

    query = query_set(50, seed=42)[5]
    got = bm25_topk_pinned(corpus, query, k=10).toPandas()
    want = pandas_bm25_topk(corpus_pd, query, k=10)
    assert list(got["turn_idx"]) == list(want["turn_idx"])
    np.testing.assert_allclose(got["score"], want["score"].round(4), atol=5e-5)


def test_topk_stable_under_repartitioning(corpus, corpus_pd):
    """Partitioning must be invisible in results (SURVEY §5.4)."""
    query = query_set(50, seed=42)[1]
    shuffled = corpus.repartition(13, "role")
    got = bm25_topk(shuffled, query, k=10).toPandas()
    want = pandas_bm25_topk(corpus_pd, query, k=10)
    assert list(got["turn_idx"]) == list(want["turn_idx"])
