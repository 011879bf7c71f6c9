"""Fielded indexing + BM25F (`operators/fielded.py`) against an
independent pandas reference.

The transcripts corpus exercises the hard fielded case: `tool` is NULL
on most turns, so most docs are absent from the tool sub-index's
ordinal space entirely — blending must join on id columns, and
field-absent docs must contribute 0 for that field. The single-field
degenerate form must be rank-identical to `query_pinned` with scores
related by exactly 1/(k1+1) (the Lucene-omitted numerator factor).
"""

from __future__ import annotations

import numpy as np
import pytest

from antidb_spark.functions.analyze import py_tokens
from antidb_spark.functions.bm25 import B, K1
from antidb_spark.operators.build import IndexBuilder
from antidb_spark.operators.fielded import FieldedIndex

IDS = ("conv_id", "turn_idx")


@pytest.fixture(scope="module")
def built(spark, tmp_path_factory):
    from antidb_spark.synth import synth_transcripts

    corpus = synth_transcripts(spark, n_convs=40, seed=31).cache()
    corpus.count()
    fx = FieldedIndex(
        spark, str(tmp_path_factory.mktemp("fidx")),
        fields=["text", "tool"], id_cols=IDS,
    )
    fx.build(corpus)
    yield fx, corpus
    corpus.unpersist()


def _field_tokens(val) -> list[str]:
    return py_tokens(val) if val else []


def _pandas_bm25f(corpus_pd, query: str, weights: dict[str, float],
                  k: int, fields=("text", "tool")):
    """Independent BM25F: per-field normalized tf blended (sorted-field
    fold), document-level df over the blend, idf saturating the blended
    pseudo-frequency; 4dp rounding at the boundary."""
    n_docs = len(corpus_pd)
    reps = sorted(set(py_tokens(query)))
    per_field = {}
    for f in sorted(fields):
        w = float(weights.get(f, 1.0))
        toks = corpus_pd[f].map(_field_tokens)
        dl = toks.map(len).to_numpy(dtype=np.float64)
        has = dl > 0
        avgdl = dl[has].mean() if has.any() else 1.0
        norm = 1.0 - B + B * np.where(has, dl / avgdl, 1.0)
        per_field[f] = (w, toks, norm)
    scores = np.zeros(n_docs)
    for term in reps:
        tfn = np.zeros(n_docs)
        for f in sorted(fields):
            w, toks, norm = per_field[f]
            tf = np.array([t.count(term) for t in toks], dtype=np.float64)
            tfn += w * tf / norm
        df_t = int((tfn > 0).sum())
        if df_t == 0:
            continue
        idf_t = np.log(1.0 + (n_docs - df_t + 0.5) / (df_t + 0.5))
        scores += np.where(tfn > 0, idf_t * tfn / (K1 + tfn), 0.0)
    out = corpus_pd[list(IDS)].copy()
    out["score"] = np.round(scores, 4)
    return out.sort_values(
        by=["score", *IDS], ascending=[False, True, True]
    ).head(k).reset_index(drop=True)


def test_matches_pandas_reference(built):
    fx, corpus = built
    weights = {"text": 1.0, "tool": 2.5}
    q = "the of python search"
    got = fx.query_bm25f(q, weights=weights, k=10).toPandas()
    want = _pandas_bm25f(
        corpus.orderBy(*IDS).toPandas(), q, weights, 10
    )
    assert got[list(IDS)].values.tolist() == want[list(IDS)].values.tolist()
    np.testing.assert_allclose(got["score"], want["score"], rtol=1e-9)


def test_single_field_degenerate_form(built, spark, tmp_path):
    """One field, w=1, b=B: matches the single-field pandas reference,
    and scores relate to `query_pinned` by exactly 1/(k1+1) — BM25F
    drops BM25's rank-neutral numerator factor. (Full rank identity
    with the pinned top-k is NOT asserted: both round to 4dp, and the
    scale factor regroups rounding ties.)"""
    _, corpus = built
    fx1 = FieldedIndex(spark, str(tmp_path / "one"), fields=["text"],
                       id_cols=IDS)
    fx1.build(corpus)
    q = "the of and"
    got = fx1.query_bm25f(q, k=10).toPandas()
    want = _pandas_bm25f(
        corpus.orderBy(*IDS).toPandas(), q, {}, 10, fields=("text",)
    )
    assert got[list(IDS)].values.tolist() == want[list(IDS)].values.tolist()
    np.testing.assert_allclose(got["score"], want["score"], rtol=1e-9)
    pinned = fx1.sub["text"].query_pinned(q, k=10).toPandas()
    pscore = {
        tuple(r[:-1]): r[-1]
        for r in pinned[[*IDS, "score"]].values.tolist()
    }
    common = [
        (tuple(r[:-1]), r[-1])
        for r in got[[*IDS, "score"]].values.tolist()
        if tuple(r[:-1]) in pscore
    ]
    assert len(common) >= 5
    np.testing.assert_allclose(
        [s for _, s in common],
        [pscore[ids] / (K1 + 1.0) for ids, _ in common],
        atol=2e-4,
    )


def test_zero_weight_drops_field(built):
    fx, corpus = built
    q = "the python"
    got = fx.query_bm25f(
        q, weights={"text": 1.0, "tool": 0.0}, k=10
    ).toPandas()
    want = _pandas_bm25f(
        corpus.orderBy(*IDS).toPandas(), q, {}, 10, fields=("text",)
    )
    assert got[list(IDS)].values.tolist() == want[list(IDS)].values.tolist()
    np.testing.assert_allclose(got["score"], want["score"], rtol=1e-9)


def test_tool_boost_promotes_tool_turns(built, spark):
    fx, corpus = built
    base = fx.query_bm25f(
        "the python", weights={"text": 1.0, "tool": 0.0}, k=10
    ).toPandas()
    boosted = fx.query_bm25f(
        "the python", weights={"text": 1.0, "tool": 50.0}, k=10
    ).toPandas()
    assert base[list(IDS)].values.tolist() != \
        boosted[list(IDS)].values.tolist()
    # every boosted top doc must actually be a python-tool turn
    tool_docs = {
        (r["conv_id"], r["turn_idx"])
        for r in corpus.filter("tool = 'python'").collect()
    }
    top = {tuple(r) for r in boosted[list(IDS)].values.tolist()}
    assert top <= tool_docs


def test_query_field_scopes_to_field(built, spark):
    fx, corpus = built
    hits = fx.query_field("tool", "search", k=1000).toPandas()
    want = {
        (r["conv_id"], r["turn_idx"])
        for r in corpus.filter("tool = 'search'").collect()
    }
    assert {tuple(r) for r in hits[list(IDS)].values.tolist()} == want


def test_empty_and_nomatch_queries(built):
    fx, _ = built
    assert fx.query_bm25f("", k=5).count() == 0
    assert fx.query_bm25f("zzqxnotaterm", k=5).count() == 0


def test_idempotent_reopen(built, spark):
    fx, _ = built
    # a fresh handle over the committed root needs no corpus at all
    fx2 = FieldedIndex(spark, fx.root, fields=["text", "tool"], id_cols=IDS)
    fx2.build(None)
    a = fx.query_bm25f("the python", k=5).toPandas()
    b = fx2.query_bm25f("the python", k=5).toPandas()
    assert a.values.tolist() == b.values.tolist()
