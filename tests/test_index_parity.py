"""antidb-parity eq/rng served from the PHYSICAL packed index must agree
with the index-free postings relation (Prs.eq/rng vs the .adb archive)."""

from __future__ import annotations

import pytest

from antidb_spark.err import QueryStartGtEndError
from antidb_spark.operators.build import IndexBuilder
from antidb_spark.operators.stats import build_postings
from antidb_spark.synth import synth_transcripts


@pytest.fixture(scope="module")
def built(spark, tmp_path_factory):
    corpus = synth_transcripts(spark, n_convs=30, seed=42).cache()
    corpus.count()
    b = IndexBuilder(spark, str(tmp_path_factory.mktemp("pidx")))
    b.build(corpus)
    post = build_postings(corpus).cache()
    post.count()
    yield b, post
    corpus.unpersist()
    post.unpersist()


def test_eq_terms_matches_postings(spark, built):
    b, post = built
    got = b.eq_terms("the", "zzzmiss", "kemuba0").toPandas()
    # per-query groups in argument order; miss contributes nothing
    for ord_, term in [(0, "the"), (2, "kemuba0")]:
        grp = got[got["query_ord"] == ord_]
        want = (
            post.filter(post.term == term)
            .select("conv_id", "turn_idx", "tf")
            .orderBy("conv_id", "turn_idx")
            .toPandas()
        )
        assert grp[["conv_id", "turn_idx", "tf"]].values.tolist() == \
            want.values.tolist(), term
    assert (got["query_ord"] == 1).sum() == 0  # miss → empty


def test_eq_terms_duplicate_query_args(spark, built):
    """Batch semantics: repeating a query term repeats its group
    (eq(*qs) concatenation, tests.py:266-273)."""
    b, post = built
    term = post.filter("length(term) > 4").orderBy("term").first()["term"]
    got = b.eq_terms(term, term).toPandas()
    g0 = got[got["query_ord"] == 0][["conv_id", "turn_idx"]].values.tolist()
    g1 = got[got["query_ord"] == 1][["conv_id", "turn_idx"]].values.tolist()
    assert g0 == g1 and len(g0) > 0


def test_rng_terms_inclusive_and_ordered(spark, built):
    b, post = built
    lo, hi = "ka", "ko"
    got = b.rng_terms(lo, hi).toPandas()
    want = (
        post.filter((post.term >= lo) & (post.term <= hi))
        .select("term", "conv_id", "turn_idx", "tf")
        .orderBy("term", "conv_id", "turn_idx")
        .toPandas()
    )
    assert got.values.tolist() == want.values.tolist()
    assert len(got) > 0


def test_rng_terms_start_gt_end_raises(built):
    b, _ = built
    with pytest.raises(QueryStartGtEndError):
        b.rng_terms("zz", "aa")


def test_rng_terms_empty_range(built):
    b, _ = built
    assert b.rng_terms("zzza", "zzzb").count() == 0
