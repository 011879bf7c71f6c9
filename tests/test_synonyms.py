"""Synonym-group ranking (`IndexBuilder.query_synonyms`) against an
independent pandas blended-statistics reference.

The Lucene SynonymQuery contract: each query token plus its synonyms
scores as ONE logical term — per-doc tf is the SUM of member tfs, df is
the number of docs containing ANY member. Empty synonyms must degrade
bit-exactly to `query_pinned`; a synonym absent from the corpus must be
a no-op; a multi-word synonym contributes each of its tokens to the
group.
"""

from __future__ import annotations

import numpy as np
import pytest

from antidb_spark.functions.analyze import py_tokens
from antidb_spark.functions.bm25 import B, K1
from antidb_spark.operators.build import IndexBuilder


@pytest.fixture(scope="module")
def built(spark, tmp_path_factory):
    from antidb_spark.synth import synth_transcripts

    corpus = synth_transcripts(spark, n_convs=40, seed=29).cache()
    corpus.count()
    b = IndexBuilder(spark, str(tmp_path_factory.mktemp("synidx")))
    b.build(corpus)
    yield b, corpus
    corpus.unpersist()


def _pandas_synonyms(corpus_pd, query: str,
                     synonyms: dict[str, list[str]], k: int):
    """Blended-statistics BM25 over synonym groups (sorted-rep float
    fold, 4dp rounding — the engine's pinned discipline)."""
    tok_lists = corpus_pd["text"].map(py_tokens)
    n_docs = len(corpus_pd)
    dl = tok_lists.map(len).to_numpy(dtype=np.float64)
    avgdl = dl.mean()
    scores = np.zeros(n_docs)
    for rep in sorted(set(py_tokens(query))):
        members = {rep}
        for s in synonyms.get(rep, ()):
            members.update(py_tokens(s))
        tf = np.array(
            [sum(t.count(m) for m in members) for t in tok_lists],
            dtype=np.float64,
        )
        df_g = int((tf > 0).sum())
        if df_g == 0:
            continue
        idf_g = np.log(1.0 + (n_docs - df_g + 0.5) / (df_g + 0.5))
        tfw = (tf * (K1 + 1.0)) / (tf + K1 * (1.0 - B + B * dl / avgdl))
        scores += np.where(tf > 0, idf_g * tfw, 0.0)
    out = corpus_pd[["conv_id", "turn_idx"]].copy()
    out["score"] = np.round(scores, 4)
    return out.sort_values(
        by=["score", "conv_id", "turn_idx"], ascending=[False, True, True]
    ).head(k).reset_index(drop=True)


def test_matches_pandas_reference(built):
    b, corpus = built
    syn = {"the": ["of"], "to": ["and", "in"]}
    got = b.query_synonyms("the to", synonyms=syn, k=10).toPandas()
    want = _pandas_synonyms(
        corpus.orderBy("conv_id", "turn_idx").toPandas(), "the to", syn, 10
    )
    assert got[["conv_id", "turn_idx"]].values.tolist() == \
        want[["conv_id", "turn_idx"]].values.tolist()
    np.testing.assert_allclose(got["score"], want["score"], rtol=1e-9)


def test_empty_synonyms_equal_pinned(built):
    b, _ = built
    q = "the of and"
    got = b.query_synonyms(q, synonyms={}, k=10).toPandas()
    want = b.query_pinned(q, k=10).toPandas()
    assert got.values.tolist() == want.values.tolist()


def test_unknown_synonym_is_noop(built):
    b, _ = built
    q = "the of"
    base = b.query_synonyms(q, synonyms={}, k=10).toPandas()
    got = b.query_synonyms(
        q, synonyms={"the": ["zzqxnotaterm"]}, k=10
    ).toPandas()
    assert got.values.tolist() == base.values.tolist()


def test_multiword_synonym_contributes_each_token(built):
    b, corpus = built
    syn_multi = {"the": ["of and"]}
    syn_split = {"the": ["of", "and"]}
    got = b.query_synonyms("the", synonyms=syn_multi, k=10).toPandas()
    want = b.query_synonyms("the", synonyms=syn_split, k=10).toPandas()
    assert got.values.tolist() == want.values.tolist()
    ref = _pandas_synonyms(
        corpus.orderBy("conv_id", "turn_idx").toPandas(), "the",
        {"the": ["of", "and"]}, 10,
    )
    assert got[["conv_id", "turn_idx"]].values.tolist() == \
        ref[["conv_id", "turn_idx"]].values.tolist()


def test_blending_changes_ranking_vs_per_term(built):
    b, _ = built
    # scoring "the"+"of" as one group must differ from scoring them as
    # two independent terms on this corpus (different idf + tf pooling)
    blended = b.query_synonyms("the", synonyms={"the": ["of"]},
                               k=10).toPandas()
    per_term = b.query_pinned("the of", k=10).toPandas()
    assert blended["score"].tolist() != per_term["score"].tolist()


def test_empty_query_is_empty(built):
    b, _ = built
    assert b.query_synonyms("", synonyms={"x": ["y"]}, k=5).count() == 0
