"""Property-based invariants (hypothesis) for the pure-Python kernels
that the Spark operators are built on — no SparkSession needed, so
these run in milliseconds and explore far more cases than the golden
tests (SURVEY §5.4)."""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from antidb_spark.functions.analyze import py_tokens
from antidb_spark.functions.bm25 import pandas_bm25_topk
from antidb_spark.functions.packing import (
    pack_postings,
    unpack_postings,
    varint_decode,
    varint_encode,
)
from antidb_spark.operators.textstats import _py_winnow

texts = st.text(
    alphabet=st.characters(min_codepoint=32, max_codepoint=0x2FF),
    max_size=200,
)


@given(st.lists(st.integers(0, 2**63 - 1), max_size=200))
def test_varint_roundtrip(vals):
    arr = np.array(vals, dtype=np.uint64)
    assert (varint_decode(varint_encode(arr)) == arr).all()


@given(st.lists(st.tuples(st.integers(0, 2**40), st.integers(1, 10**6)),
                max_size=150))
def test_pack_roundtrip_any_sorted_ords(pairs):
    pairs = sorted(set(pairs), key=lambda p: p[0])
    # doc ordinals must be strictly increasing per posting list
    seen, uniq = set(), []
    for o, tf in pairs:
        if o not in seen:
            seen.add(o)
            uniq.append((o, tf))
    ords = np.array([o for o, _ in uniq], dtype=np.uint64)
    tfs = np.array([t for _, t in uniq], dtype=np.uint64)
    d, t = unpack_postings(*pack_postings(ords, tfs))
    assert (d == ords).all() and (t == tfs).all()


@given(texts)
def test_tokens_are_normalized(s):
    toks = py_tokens(s)
    for t in toks:
        assert t == t.lower() and t != ""
        assert all(c.isascii() and (c.isdigit() or c.islower()) for c in t)


@given(texts)
def test_winnow_deterministic_and_covering(s):
    fps = _py_winnow(s)
    assert fps == _py_winnow(s)
    assert fps == sorted(set(fps))
    if py_tokens(s):
        assert len(fps) >= 1


def _md5_gram_hash(s: str) -> int:
    """Python twin of textstats.gram_hash / the DuckDB hex cast."""
    import hashlib

    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


@given(texts, texts)
def test_gram_hash_consistency(a, b):
    h = _md5_gram_hash(a)
    assert h == _md5_gram_hash(a)
    assert 0 <= h < (1 << 60)  # 15 hex digits → positive int64
    if a != b:
        assert h != _md5_gram_hash(b)  # 60-bit: no collision expected


@settings(max_examples=25, deadline=None)
@given(
    st.lists(
        st.lists(st.sampled_from("alpha beta gamma delta eps".split()),
                 min_size=1, max_size=12).map(" ".join),
        min_size=1, max_size=15,
    ),
    st.sampled_from(["alpha", "beta gamma", "delta eps alpha"]),
)
def test_bm25_oracle_invariants(docs, query):
    """Oracle scorer: scores positive iff a query term matches; output
    sorted by (score desc, id asc); k bound respected."""
    import pandas as pd

    corpus = pd.DataFrame(
        {"conv_id": [f"c{i:03d}" for i in range(len(docs))],
         "turn_idx": [0] * len(docs), "text": docs}
    )
    out = pandas_bm25_topk(corpus, query, k=5)
    assert len(out) <= 5
    assert (out["score"] > 0).all()
    q_terms = set(py_tokens(query))
    matched_ids = {
        f"c{i:03d}" for i, d in enumerate(docs) if q_terms & set(py_tokens(d))
    }
    assert set(out["conv_id"]) <= matched_ids
    scores = list(out["score"])
    assert scores == sorted(scores, reverse=True)
