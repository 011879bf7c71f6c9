"""Dedup operators: exact, n-gram Jaccard (exact), MinHash LSH, SimHash.

Oracle strategy: `ngram_jaccard_pairs` is the exact gold standard
(pinned here by a brute-force pandas computation); the probabilistic
paths (MinHash, SimHash banding) are validated against it — MinHash
output must be a subset with high recall, SimHash banding must be
EXACTLY the ≤3-Hamming pairs (pigeonhole guarantee).
"""

from __future__ import annotations

from itertools import combinations

import pytest

from antidb_spark.functions.analyze import py_tokens
from antidb_spark.operators.dedup import (
    exact_dups,
    minhash_near_dups,
    minhash_signatures,
    ngram_jaccard_pairs,
    simhash64,
    simhash_near_dups,
)

DOCS = [
    (0, "the quick brown fox jumps over the lazy dog"),
    (1, "the quick brown fox jumps over the lazy cat"),       # near-dup of 0
    (2, "The quick brown fox jumps over the lazy dog"),       # exact dup of 0 (case)
    (3, "completely different text about spark and indexes"),
    (4, "totally unrelated words regarding databases systems"),
    (5, "the quick brown fox jumps over the lazy dog today"), # near-dup of 0
    (6, "spark and indexes text completely different about"), # same tokens as 3, shuffled
]


def _py_shingles(text: str, n: int = 3) -> set[str]:
    toks = py_tokens(text)
    if len(toks) >= n:
        return {" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)}
    return {" ".join(toks)}


def _py_jaccard_pairs(docs, n=3, threshold=0.3):
    out = {}
    for (ia, ta), (ib, tb) in combinations(docs, 2):
        sa, sb = _py_shingles(ta, n), _py_shingles(tb, n)
        j = len(sa & sb) / len(sa | sb)
        if j >= threshold:
            out[(ia, ib)] = round(j, 6)
    return out


@pytest.fixture(scope="module")
def docs_df(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


def test_exact_dups(docs_df):
    groups = exact_dups(docs_df).collect()
    assert len(groups) == 1
    assert groups[0]["doc_ids"] == [0, 2]
    assert groups[0]["group_size"] == 2


def test_ngram_jaccard_matches_bruteforce(docs_df):
    got = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in ngram_jaccard_pairs(docs_df, threshold=0.3).collect()
    }
    want = _py_jaccard_pairs(DOCS, threshold=0.3)
    assert got == want
    assert (0, 2) in got and got[(0, 2)] == 1.0


def test_ngram_jaccard_hot_shingle_cap(spark):
    """Planted corpus-frequency shingle: the df cap drops it from
    candidate generation (keeping the self-join linear), but every
    surviving candidate still gets TRUE full-set Jaccard — so a
    qualifying pair sharing any sub-cap shingle is reported with its
    exact (not capped-underestimate) similarity."""
    hot = "common boiler plate"  # one shingle shared by EVERY doc
    docs = [(i, f"{hot} unique{i} filler{i} tail{i}") for i in range(30)]
    # one genuine near-dup pair sharing rare shingles beyond the hot one
    docs += [
        (100, f"{hot} alpha beta gamma delta epsilon"),
        (101, f"{hot} alpha beta gamma delta zeta"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")

    capped = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in ngram_jaccard_pairs(df, threshold=0.2, max_shingle_df=5).collect()
    }
    want = _py_jaccard_pairs(docs, threshold=0.2)
    # (100, 101) qualifies via sub-cap shingles → found, with TRUE Jaccard
    assert capped[(100, 101)] == want[(100, 101)]
    # pairs whose ONLY shared shingle is the hot one are the documented
    # exactness boundary: absent under the cap, present without it
    assert all(p == (100, 101) for p in capped)
    uncapped = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in ngram_jaccard_pairs(df, threshold=0.2, max_shingle_df=None).collect()
    }
    assert uncapped == want


def test_minhash_subset_of_exact(docs_df):
    exact = set(_py_jaccard_pairs(DOCS, threshold=0.5))
    mh = {
        (r["id_a"], r["id_b"])
        for r in minhash_near_dups(docs_df, threshold=0.5).collect()
    }
    # verified candidates: never a false positive...
    assert mh <= exact
    # ...and identical docs are always found (all 64 minhashes equal)
    assert (0, 2) in mh


def test_minhash_signature_properties(docs_df):
    sigs = {r["doc_id"]: r["sig"] for r in minhash_signatures(docs_df).collect()}
    assert sigs[0] == sigs[2]          # identical shingle sets
    assert sigs[0] != sigs[3]
    sim_01 = sum(a == b for a, b in zip(sigs[0], sigs[1])) / 64
    sim_03 = sum(a == b for a, b in zip(sigs[0], sigs[3])) / 64
    assert sim_01 > sim_03             # signature similarity tracks Jaccard


def test_simhash_identical_and_near(docs_df):
    hs = {r["doc_id"]: r["simhash"] for r in simhash64(docs_df).collect()}
    assert hs[0] == hs[2]              # exact dup → same simhash
    assert hs[3] == hs[6]              # simhash is order-insensitive (same tf bag)
    pairs = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in simhash_near_dups(docs_df, max_distance=3).collect()
    }
    assert pairs[(0, 2)] == 0
    assert pairs[(3, 6)] == 0


def test_simhash_banding_exact_for_d3(spark):
    """Pigeonhole exactness: banding must find EVERY pair within
    Hamming distance 3 — compare against brute force on a corpus with
    engineered small perturbations."""
    docs = [(i, f"alpha beta gamma delta epsilon zeta w{i % 3}") for i in range(12)]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    hs = {r["doc_id"]: r["simhash"] for r in simhash64(df).collect()}
    brute = {
        (a, b): bin(hs[a] ^ hs[b]).count("1")
        for a, b in combinations(sorted(hs), 2)
        if bin(hs[a] ^ hs[b]).count("1") <= 3
    }
    got = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in simhash_near_dups(df, max_distance=3).collect()
    }
    assert got == brute


def test_simhash_excludes_empty_docs(spark):
    """Tokenless docs all hash to simhash 0 and would pair quadratically
    in one bucket; the operator excludes them from pairing (near-dup of
    nothing is not a signal — filter empties with quality_scores)."""
    docs = [
        (0, "real content words here"),
        (1, "real content words here"),
        (2, "...!!!"),
        (3, "???"),
        (4, ""),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    pairs = {
        (r["id_a"], r["id_b"])
        for r in simhash_near_dups(df, max_distance=3).collect()
    }
    assert (0, 1) in pairs
    assert all(a not in (2, 3, 4) and b not in (2, 3, 4) for a, b in pairs)
