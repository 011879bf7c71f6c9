"""Text-analysis operators: lang-id, quality, token counts, winnowing."""

from __future__ import annotations

import pytest

from antidb_spark.functions.analyze import py_tokens
from antidb_spark.operators.textstats import (
    _py_winnow,
    clone_candidates,
    lang_id,
    quality_scores,
    winnow_fingerprints,
)

DOCS = [
    (0, "the cat is on the mat and it is not happy with that"),
    (1, "der Hund ist nicht auf der Matte und die Katze auch nicht"),
    (2, "le chat est dans la maison pour le moment mais pas nous"),
    (3, "el gato es una mascota para la casa pero no es este"),
    (4, "xqz zzk 12345 9@@@!!"),
    (5, ""),
]


@pytest.fixture(scope="module")
def docs_df(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


def test_lang_id(docs_df):
    got = {r["doc_id"]: r["pred_lang"] for r in lang_id(docs_df).collect()}
    assert got[0] == "en"
    assert got[1] == "de"
    assert got[2] == "fr"
    assert got[3] == "es"
    assert got[4] == "und"
    assert got[5] == "und"


def test_quality_scores(docs_df):
    q = {r["doc_id"]: r.asDict() for r in quality_scores(docs_df).collect()}
    assert q[0]["n_tokens"] == len(py_tokens(DOCS[0][1]))
    assert q[0]["quality"] > q[4]["quality"]  # English prose beats noise
    assert q[5]["n_tokens"] == 0 and q[5]["quality"] <= 0.3
    assert 0.0 <= q[0]["quality"] <= 1.0
    # mean token length exact for doc 0
    toks = py_tokens(DOCS[0][1])
    assert abs(q[0]["mean_tok_len"] - sum(map(len, toks)) / len(toks)) < 1e-6


def test_winnow_matches_python_oracle(docs_df):
    got = {
        r["doc_id"]: list(r["fps"]) for r in winnow_fingerprints(docs_df).collect()
    }
    for i, text in DOCS:
        assert got[i] == _py_winnow(text), i


def test_winnow_shared_fingerprints(spark):
    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    docs = [
        (0, base + " lambda mu nu xi omicron pi rho sigma tau upsilon"),
        (1, base + " lambda mu nu xi omicron pi rho sigma tau phi"),  # clone
        (2, "completely different content with no overlap at all here now ok"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    pairs = {
        (r["id_a"], r["id_b"]): r["shared_fps"]
        for r in clone_candidates(df, min_shared=2).collect()
    }
    assert (0, 1) in pairs and pairs[(0, 1)] >= 2
    assert not any(2 in p for p in pairs)


def test_clone_candidates_hot_fp_cap(spark):
    """Planted boilerplate fingerprint skew: max_fp_df drops corpus-wide
    fingerprints from CANDIDATE GENERATION (bounding the fp⋈fp self-join
    at df² per sub-cap fp), while shared_fps is verified over the FULL
    per-doc sets — so a qualifying pair sharing any sub-cap fp reports
    its exact shared count."""
    hot = "alpha beta gamma delta epsilon zeta eta theta"  # shared k-grams
    docs = [
        (i, f"{hot} unique{i}a unique{i}b unique{i}c unique{i}d unique{i}e")
        for i in range(30)
    ]
    rare = "omega psi chi phi upsilon tau sigma rho"
    docs += [(100, f"{hot} {rare} onlyx"), (101, f"{hot} {rare} onlyy")]
    df = spark.createDataFrame(docs, "doc_id long, text string")

    capped = {
        (r["id_a"], r["id_b"]): r["shared_fps"]
        for r in clone_candidates(df, min_shared=2, max_fp_df=5).collect()
    }
    uncapped = {
        (r["id_a"], r["id_b"]): r["shared_fps"]
        for r in clone_candidates(df, min_shared=2, max_fp_df=None).collect()
    }
    # the clone pair shares rare (sub-cap) fps → found, with the SAME
    # exact shared count as the uncapped run (full-set verify counts
    # the hot boilerplate fp too — exact, not a capped underestimate)
    assert (100, 101) in capped
    assert capped[(100, 101)] == uncapped[(100, 101)] >= 2
    assert set(capped) == {(100, 101)}
    # boilerplate-ONLY pairs (winnowing collapses the shared prefix to
    # one corpus-wide fp) are the documented exactness boundary:
    # present uncapped at min_shared=1, absent under the cap
    cap1 = {
        (r["id_a"], r["id_b"])
        for r in clone_candidates(df, min_shared=1, max_fp_df=5).collect()
    }
    uncap1 = {
        (r["id_a"], r["id_b"])
        for r in clone_candidates(df, min_shared=1, max_fp_df=None).collect()
    }
    assert (0, 1) in uncap1 and (0, 1) not in cap1
    assert cap1 == {(100, 101)}
