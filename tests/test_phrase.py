"""Positional postings + phrase search vs a brute-force Python oracle."""

from __future__ import annotations

import pytest

from antidb_spark.functions.analyze import py_tokens
from antidb_spark.operators.phrase import phrase_search, positional_postings

DOCS = [
    (0, "spark runs fast and spark runs far"),
    (1, "runs spark runs fast runs fast"),
    (2, "fast spark! spark RUNS fast."),
    (3, "nothing to see here"),
    (4, "spark runs"),
    (5, "runs runs runs runs"),
    (6, "a b a b a"),
]


def _py_phrase(docs, phrase):
    terms = py_tokens(phrase)
    out = {}
    for i, text in docs:
        toks = py_tokens(text)
        n = sum(
            1
            for s in range(len(toks) - len(terms) + 1)
            if toks[s : s + len(terms)] == terms
        )
        if n:
            out[i] = n
    return out


@pytest.fixture(scope="module")
def docs_df(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string").cache()


@pytest.mark.parametrize(
    "phrase",
    [
        "spark runs",
        "spark runs fast",
        "runs fast",
        "runs runs",        # overlapping occurrences of a repeated term
        "a b a",            # repeated term at distance 2
        "spark",            # single term → tf semantics
        "fast spark spark runs",
        "zzz missing",      # miss → empty
    ],
)
def test_phrase_matches_bruteforce(docs_df, phrase):
    got = {
        r["doc_id"]: r["phrase_freq"]
        for r in phrase_search(docs_df, phrase, id_cols=("doc_id",)).collect()
    }
    assert got == _py_phrase(DOCS, phrase), phrase


def test_phrase_empty_and_ordering(docs_df):
    assert phrase_search(docs_df, "  ...  ", id_cols=("doc_id",)).count() == 0
    rows = phrase_search(docs_df, "runs fast", id_cols=("doc_id",)).collect()
    freqs = [r["phrase_freq"] for r in rows]
    assert freqs == sorted(freqs, reverse=True)  # ordered by freq desc


def test_positional_postings_roundtrip(docs_df):
    rows = positional_postings(docs_df, id_cols=("doc_id",)).collect()
    by_key = {(r["doc_id"], r["term"]): r for r in rows}
    toks0 = py_tokens(DOCS[0][1])
    want_spark = [i for i, t in enumerate(toks0) if t == "spark"]
    assert list(by_key[(0, "spark")]["positions"]) == want_spark
    assert by_key[(0, "spark")]["tf"] == len(want_spark)
