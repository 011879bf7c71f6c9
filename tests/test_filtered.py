"""Metadata-filtered / conjunctive top-k and positional highlights,
served from the committed index, against brute-force references.

The scoring core (`_pinned_doc_scores`) is already pinned by the
`indexed_topk` DuckDB oracle; these tests pin the NEW result-set
semantics layered on it: the docmeta predicate restricts results
without changing scores, `require_all` keeps exactly the docs
containing every term, and `term_positions` returns the true first
position / hit count per (top doc, term).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from antidb_spark.operators.build import IndexBuilder
from antidb_spark.operators.phrase import (
    build_positional_index,
    positional_postings,
    term_positions,
)
from antidb_spark.operators.stats import build_postings
from antidb_spark.synth import synth_transcripts, vocabulary

_V = vocabulary(2000)
# stopword + mid + rare — mixed-selectivity, all guaranteed in-vocab
QUERY = f"the {_V[200]} {_V[1000]}"


@pytest.fixture(scope="module")
def built(spark, tmp_path_factory):
    corpus = synth_transcripts(spark, n_convs=40, seed=7).cache()
    corpus.count()
    b = IndexBuilder(spark, str(tmp_path_factory.mktemp("fidx")))
    b.build(corpus)
    aged = corpus.withColumn(
        "age_days", ((F.col("turn_idx") * 37) % 365).cast("int")
    )
    b.build_doc_meta(aged, ["role", "age_days"])
    build_positional_index(b, corpus)
    yield b, corpus
    corpus.unpersist()


def _all_scores(b):
    """(conv_id, turn_idx, score) for every candidate doc, via the
    oracle-pinned scoring path with k = everything."""
    return b.query_pinned(QUERY, k=1_000_000).toPandas()


def test_filtered_matches_bruteforce_filter(spark, built):
    b, corpus = built
    meta = corpus.select("conv_id", "turn_idx", "role").toPandas()
    allsc = _all_scores(b).merge(meta, on=["conv_id", "turn_idx"])
    want = (
        allsc[allsc["role"] == "assistant"]
        .sort_values(["score", "conv_id", "turn_idx"],
                     ascending=[False, True, True])
        .head(10)[["conv_id", "turn_idx", "score"]]
    )
    got = b.query_filtered(QUERY, "role = 'assistant'", k=10).toPandas()
    assert got.values.tolist() == want.values.tolist()
    assert len(got) == 10
    # non-vacuous: the unfiltered top-10 must differ, else the corpus
    # seed stopped exercising the filter
    unfiltered = b.query_pinned(QUERY, k=10).toPandas()
    assert got.values.tolist() != unfiltered.values.tolist()


def test_filtered_true_predicate_equals_pinned(built):
    b, _ = built
    got = b.query_filtered(QUERY, "role IS NOT NULL", k=10).toPandas()
    want = b.query_pinned(QUERY, k=10).toPandas()
    assert got.values.tolist() == want.values.tolist()


def test_filtered_no_match_is_empty(built):
    b, _ = built
    assert b.query_filtered(QUERY, "role = 'nobody'", k=10).count() == 0


def test_filtered_requires_docmeta(spark, built, tmp_path):
    _, corpus = built
    b2 = IndexBuilder(spark, str(tmp_path / "nometa"))
    b2.build(corpus.limit(50))
    with pytest.raises(ValueError, match="docmeta"):
        b2.query_filtered(QUERY, "role = 'user'")


def _conj_pair(corpus):
    """Find ("will", B) where B is a mid-frequency word whose doc set
    both intersects and escapes will's doc set — so the conjunctive
    result is non-empty AND differs from the disjunctive one. Discovered
    from the corpus (seed-robust) instead of hard-coded."""
    post = build_postings(corpus)
    pdf = post.select("term", "conv_id", "turn_idx").toPandas()
    docs_by_term = pdf.groupby("term")[["conv_id", "turn_idx"]].apply(
        lambda g: set(zip(g["conv_id"], g["turn_idx"]))
    )
    will = docs_by_term["will"]
    for t in sorted(docs_by_term.index):
        if t == "will" or t in QUERY.split():
            continue
        d = docs_by_term[t]
        if 3 <= len(d) <= 60 and (d & will) and (d - will):
            return f"will {t}", d & will
    raise AssertionError("no conjunctive pair found in corpus")


def test_require_all_conjunctive_semantics(spark, built):
    b, corpus = built
    q, have_both = _conj_pair(corpus)
    assert have_both, "seed must give conjunctive matches"
    allsc = b.query_pinned(q, k=1_000_000).toPandas()
    mask = [
        (r.conv_id, r.turn_idx) in have_both for r in allsc.itertuples()
    ]
    want = (
        allsc[mask]
        .sort_values(["score", "conv_id", "turn_idx"],
                     ascending=[False, True, True])
        .head(10)
    )
    got = b.query_pinned(q, k=10, require_all=True).toPandas()
    assert got.values.tolist() == want.values.tolist()
    # disjunctive top-10 must differ (docs with only one term outrank
    # some conjunctive docs on this corpus) for the test to bite
    assert got.values.tolist() != b.query_pinned(q, k=10).toPandas().values.tolist()


def test_filtered_and_conjunctive_compose(built):
    b, corpus = built
    # two stopwords co-occur in most turns → conjunctive ∩ role-filter
    # is guaranteed non-empty at this corpus size
    got = b.query_filtered(
        "the will", "role = 'user'", k=10, require_all=True
    ).toPandas()
    assert len(got) > 0
    meta = corpus.select("conv_id", "turn_idx", "role").toPandas()
    merged = got.merge(meta, on=["conv_id", "turn_idx"])
    assert (merged["role"] == "user").all()
    post = build_postings(corpus).filter(
        F.col("term").isin(["the", "will"])
    ).toPandas()
    per_doc = post.groupby(["conv_id", "turn_idx"])["term"].nunique()
    for r in merged.itertuples():
        assert per_doc[(r.conv_id, r.turn_idx)] == 2


def test_exclude_not_semantics(spark, built):
    b, corpus = built
    ex = "will"
    post = build_postings(corpus).filter(F.col("term") == ex)
    ex_docs = set(
        map(tuple, post.select("conv_id", "turn_idx").toPandas().values)
    )
    assert ex_docs, "exclude term must occur"
    allsc = _all_scores(b)
    mask = [
        (r.conv_id, r.turn_idx) not in ex_docs for r in allsc.itertuples()
    ]
    want = (
        allsc[mask]
        .sort_values(["score", "conv_id", "turn_idx"],
                     ascending=[False, True, True])
        .head(10)
    )
    got = b.query_pinned(QUERY, k=10, exclude=ex).toPandas()
    assert got.values.tolist() == want.values.tolist()
    # must differ from the unexcluded ranking (the stopword sits in
    # most docs, so some top-10 docs get knocked out)
    assert got.values.tolist() != b.query_pinned(QUERY, k=10).toPandas().values.tolist()
    # excluded docs never appear even deeper in the ranking
    deep = b.query_pinned(QUERY, k=1_000, exclude=ex).toPandas()
    assert all(
        (r.conv_id, r.turn_idx) not in ex_docs for r in deep.itertuples()
    )


def test_exclude_composes_with_filter(built):
    b, corpus = built
    got = b.query_filtered(
        QUERY, "role = 'assistant'", k=10, exclude="will"
    ).toPandas()
    assert len(got) > 0
    meta = corpus.select("conv_id", "turn_idx", "role").toPandas()
    merged = got.merge(meta, on=["conv_id", "turn_idx"])
    assert (merged["role"] == "assistant").all()
    post = build_postings(corpus).filter(F.col("term") == "will")
    ex_docs = set(
        map(tuple, post.select("conv_id", "turn_idx").toPandas().values)
    )
    assert all(
        (r.conv_id, r.turn_idx) not in ex_docs for r in got.itertuples()
    )


def test_term_positions_matches_positional_postings(spark, built):
    b, corpus = built
    got = term_positions(b, QUERY, k=10).toPandas()
    top = b.query_pinned(QUERY, k=10).toPandas()
    top_ids = set(map(tuple, top[["conv_id", "turn_idx"]].values.tolist()))
    # exactly the top-k docs appear, each with ≥1 matching term
    assert set(map(tuple, got[["conv_id", "turn_idx"]].values.tolist())) \
        == top_ids
    pp = (
        positional_postings(corpus)
        .filter(F.col("term").isin(sorted(set(QUERY.split()))))
        .toPandas()
    )
    want = {}
    for r in pp.itertuples():
        if (r.conv_id, r.turn_idx) in top_ids:
            want[(r.conv_id, r.turn_idx, r.term)] = (
                min(r.positions), len(r.positions)
            )
    got_map = {
        (r.conv_id, r.turn_idx, r.term): (r.first_pos, r.n_hits)
        for r in got.itertuples()
    }
    assert got_map == want
    # ordered (conv_id, turn_idx, term)
    key = got[["conv_id", "turn_idx", "term"]].values.tolist()
    assert key == sorted(key)


def test_term_positions_warm_matches_distributed(built):
    from antidb_spark.operators.phrase import term_positions_warm

    b, _ = built
    want = term_positions(b, QUERY, k=10).toPandas()
    got = term_positions_warm(b, QUERY, k=10)
    assert got.values.tolist() == want.values.tolist()
    assert len(got) > 0
    # empty / miss queries
    assert term_positions_warm(b, "", k=5).empty
    assert term_positions_warm(b, "zzznotaword0", k=5).empty


def test_term_positions_empty_query(built):
    b, _ = built
    out = term_positions(b, "", k=10)
    assert out.count() == 0
    assert [f.name for f in out.schema.fields] == [
        "conv_id", "turn_idx", "term", "first_pos", "n_hits"
    ]


def test_facet_counts_match_bruteforce(spark, built):
    b, corpus = built
    from antidb_spark.functions.analyze import py_tokens

    terms = sorted(set(py_tokens(QUERY)))
    toks = corpus.select(
        "conv_id", "turn_idx", "role",
        F.explode(F.expr(
            "filter(split(regexp_replace(lower(text), "
            "'[^a-z0-9]+', ' '), ' '), x -> x <> '')"
        )).alias("t"),
    ).toPandas()
    m = toks[toks["t"].isin(terms)]
    cand = m[["conv_id", "turn_idx", "role"]].drop_duplicates()
    want = (
        cand.groupby("role", as_index=False).size()
        .rename(columns={"role": "facet", "size": "n_docs"})
        .sort_values(["n_docs", "facet"], ascending=[False, True])
        .reset_index(drop=True)
    )
    got = b.facet_counts(QUERY, "role").toPandas()
    assert got.astype({"n_docs": "int64"}).values.tolist() == \
        want.astype({"n_docs": "int64"}).values.tolist()
    assert len(got) > 1  # both roles appear — the facet is non-vacuous


def test_facet_counts_require_all_shrinks(built):
    b, _ = built
    dis = b.facet_counts(QUERY, "role").toPandas()
    con = b.facet_counts(QUERY, "role", require_all=True).toPandas()
    assert con["n_docs"].sum() <= dis["n_docs"].sum()


def test_facet_counts_validates(built):
    b, _ = built
    import pytest as _pytest

    with _pytest.raises(ValueError):
        b.facet_counts(QUERY, "nope_col")
    assert b.facet_counts("", "role").count() == 0
    assert b.facet_counts("zzznotaword0", "role").count() == 0


def test_search_after_paging(built):
    b, _ = built
    full = b.query_pinned(QUERY, k=20).toPandas()
    assert len(full) == 20
    p1 = full.head(10)
    last = p1.iloc[-1]
    p2 = b.query_pinned(
        QUERY, k=10, after=(float(last["score"]),
                            last["conv_id"], int(last["turn_idx"]))
    ).toPandas()
    assert p2.values.tolist() == full.tail(10).values.tolist()
    # cursor past the end → empty
    tail = full.iloc[-1]
    beyond = b.query_pinned(
        QUERY, k=10, after=(-1.0, tail["conv_id"], int(tail["turn_idx"]))
    ).toPandas()
    assert beyond.empty
    # malformed cursor arity → error
    import pytest as _pytest

    with _pytest.raises(ValueError):
        b.query_pinned(QUERY, k=10, after=(1.0, "x")).collect()


def test_more_like_this_matches_pinned_over_selection(built):
    import math
    from collections import Counter

    from antidb_spark.functions.analyze import py_tokens

    b, corpus = built
    text = corpus.orderBy("conv_id", "turn_idx").limit(1).collect()[0]["text"]
    tf = Counter(py_tokens(text))
    dfs = b._term_dfs(sorted(tf))
    n_docs, _ = b._corpus_stats()
    w = sorted(
        ((t, tf[t] * math.log(1.0 + (n_docs - d + 0.5) / (d + 0.5)))
         for t, d in dfs.items()),
        key=lambda kv: (-kv[1], kv[0]),
    )
    sel = sorted(t for t, _ in w[:4])
    got = b.more_like_this(text, m=4, k=10).toPandas()
    want = b.query_pinned(" ".join(sel), k=10).toPandas()
    assert got.values.tolist() == want.values.tolist()
    # characteristic (rare) terms select few-but-nonzero matching docs
    assert 1 <= len(got) <= 10
    assert b.more_like_this("", m=4).count() == 0
    assert b.more_like_this("zzznotaword0 qqq", m=4).count() == 0


def _docs_with(corpus, term):
    post = build_postings(corpus).filter(F.col("term") == term)
    return set(
        map(tuple, post.select("conv_id", "turn_idx").toPandas().values)
    )


def test_query_bool_semantics(built):
    """bool(must, should, must_not) == pinned scores over must ∪ should,
    filtered to docs containing every must term and no must_not term."""
    b, corpus = built
    must, must_not = "the", "will"
    should = " ".join(QUERY.split()[1:])  # the mid + rare words
    combined = f"{must} {should}"
    allsc = b.query_pinned(combined, k=1_000_000).toPandas()
    must_docs = _docs_with(corpus, must)
    ex_docs = _docs_with(corpus, must_not)
    assert must_docs and ex_docs
    mask = [
        (r.conv_id, r.turn_idx) in must_docs
        and (r.conv_id, r.turn_idx) not in ex_docs
        for r in allsc.itertuples()
    ]
    want = (
        allsc[mask]
        .sort_values(["score", "conv_id", "turn_idx"],
                     ascending=[False, True, True])
        .head(10)
    )
    got = b.query_bool(
        must=must, should=should, must_not=must_not, k=10
    ).toPandas()
    assert got.values.tolist() == want.values.tolist()
    assert len(got) > 0
    # non-vacuous: each clause must change the plain disjunctive top-10
    assert got.values.tolist() != b.query_pinned(combined, k=10).toPandas().values.tolist()


def test_query_bool_degenerate_forms(built):
    b, _ = built
    # must only == require_all; should only == plain pinned
    q = "the will"
    assert (
        b.query_bool(must=q, k=10).toPandas().values.tolist()
        == b.query_pinned(q, k=10, require_all=True).toPandas().values.tolist()
    )
    assert (
        b.query_bool(should=QUERY, k=10).toPandas().values.tolist()
        == b.query_pinned(QUERY, k=10).toPandas().values.tolist()
    )
    # must_not without any positive clause → empty, not an error
    assert b.query_bool(must_not="the").count() == 0
    assert b.query_bool().count() == 0
    # overlap: a term in both must and should counts once
    assert (
        b.query_bool(must="the", should="the will", k=10)
        .toPandas().values.tolist()
        == b.query_bool(must="the", should="will", k=10)
        .toPandas().values.tolist()
    )


def test_query_decayed_matches_bruteforce(spark, built):
    import numpy as np

    from antidb_spark.functions.analyze import py_tokens

    b, corpus = built
    q_terms = sorted(set(py_tokens(QUERY)))
    # unrounded fixed-order fold from the scoring core's c{i} columns
    sc = b._pinned_doc_scores(q_terms).toPandas()
    raw = np.zeros(len(sc))
    for i in range(len(q_terms)):
        raw = raw + sc[f"c{i}"].fillna(0.0).to_numpy()
    dm = (
        b.catalog.read("docmap")
        .select("doc_ord", "conv_id", "turn_idx")
        .toPandas()
    )
    out = sc[["doc_ord"]].copy()
    out["raw"] = raw
    meta = corpus.select(
        "conv_id", "turn_idx",
        ((F.col("turn_idx") * 37) % 365).cast("int").alias("age_days"),
    ).toPandas()
    out = out.merge(dm, on="doc_ord").merge(meta, on=["conv_id", "turn_idx"])
    out["score"] = np.round(
        out["raw"].to_numpy()
        * (1.0 / (1.0 + out["age_days"].to_numpy() / 30.0)), 4
    )
    want = (
        out.sort_values(["score", "conv_id", "turn_idx"],
                        ascending=[False, True, True])
        .head(10)[["conv_id", "turn_idx", "score"]]
        .reset_index(drop=True)
    )
    got = b.query_decayed(QUERY, k=10, half_life_days=30.0).toPandas()
    assert got[["conv_id", "turn_idx"]].values.tolist() == \
        want[["conv_id", "turn_idx"]].values.tolist()
    np.testing.assert_allclose(got["score"], want["score"], rtol=1e-9)
    assert len(got) == 10
    # recency provably re-ranks: different from the undecayed top-10
    plain = b.query_pinned(QUERY, k=10).toPandas()
    assert got.values.tolist() != plain.values.tolist()


def test_query_decayed_validates(built):
    b, _ = built
    import pytest as _pt

    with _pt.raises(ValueError, match="half_life"):
        b.query_decayed(QUERY, half_life_days=0.0)
    # empty / punctuation-only query → empty frame, never an error
    assert b.query_decayed("***", k=5).count() == 0


def test_query_bool_min_should_match(built):
    """msm == brute-force 'at least m optional terms present' filter
    over the must-filtered candidate set; msm=0 is a no-op; msm >
    #optional terms is empty (the Lucene contract)."""
    b, corpus = built
    # dense stopwords with partial overlap (probed at seed=7: 157 docs
    # hold the+to+and, another 157 hold the + exactly one of to/and),
    # so msm=1 vs msm=2 provably split the candidate set
    must = "the"
    opt_terms = ["to", "and"]
    should = " ".join(opt_terms)
    combined = f"{must} {should}"
    allsc = b.query_pinned(combined, k=1_000_000).toPandas()
    must_docs = _docs_with(corpus, must)
    opt_docs = [_docs_with(corpus, t) for t in opt_terms]
    for msm in (1, 2):
        mask = [
            (r.conv_id, r.turn_idx) in must_docs
            and sum((r.conv_id, r.turn_idx) in s for s in opt_docs) >= msm
            for r in allsc.itertuples()
        ]
        want = (
            allsc[mask]
            .sort_values(["score", "conv_id", "turn_idx"],
                         ascending=[False, True, True])
            .head(10)
        )
        got = b.query_bool(
            must=must, should=should, k=10, min_should_match=msm
        ).toPandas()
        assert got.values.tolist() == want.values.tolist()
        assert len(got) > 0
    # msm provably bites: each tightening strictly shrinks the
    # candidate set (157 docs hold the+to+and, 157 more exactly one)
    n0 = b.query_bool(must=must, should=should, k=1_000_000).count()
    n1 = b.query_bool(
        must=must, should=should, k=1_000_000, min_should_match=1
    ).count()
    n2 = b.query_bool(
        must=must, should=should, k=1_000_000, min_should_match=2
    ).count()
    assert n0 > n1 > n2 > 0
    # more optional matches required than optional terms exist → empty
    assert b.query_bool(
        must=must, should=should, k=10, min_should_match=3
    ).count() == 0
    # a should term repeated in must is NOT optional: must='the' makes
    # 'the' required, leaving 2 optional terms, so msm=3 is impossible
    assert b.query_bool(
        must="the", should=combined, k=10, min_should_match=3
    ).count() == 0
    # but with must empty all 3 are optional and msm=3 has matches
    assert b.query_bool(
        should=combined, k=10, min_should_match=3
    ).count() > 0


def test_significant_terms_matches_bruteforce(built):
    """JLH scores/top-k == pandas recompute over the raw postings."""
    import numpy as np

    b, corpus = built
    q = "kifaba1"  # df=5 at seed=7 — a small, distinctive foreground
    min_dc, k = 2, 10
    post = build_postings(corpus).toPandas()
    post["doc"] = list(zip(post["conv_id"], post["turn_idx"]))
    fg_docs = set(post.loc[post["term"] == q, "doc"])
    assert 0 < len(fg_docs) < post["doc"].nunique()
    n_fg, n_docs = len(fg_docs), post["doc"].nunique()
    fg = post[post["doc"].isin(fg_docs) & (post["term"] != q)]
    fg_df = fg.groupby("term").size()
    fg_df = fg_df[fg_df >= min_dc]
    bg_df = post.groupby("term").size()
    tbl = fg_df.rename("fg_df").to_frame().join(bg_df.rename("bg_df"))
    fg_pct = tbl["fg_df"] / n_fg
    bg_pct = tbl["bg_df"] / n_docs
    tbl["score"] = np.round((fg_pct - bg_pct) * (fg_pct / bg_pct), 6)
    want = (
        tbl.reset_index()
        .sort_values(["score", "term"], ascending=[False, True])
        .head(k)
    )
    got = b.significant_terms(q, k=k, min_doc_count=min_dc).toPandas()
    assert got["term"].tolist() == want["term"].tolist()
    assert got["fg_df"].tolist() == want["fg_df"].tolist()
    assert got["bg_df"].tolist() == want["bg_df"].tolist()
    np.testing.assert_allclose(got["score"], want["score"], rtol=1e-9)
    # empty query → empty frame with the contract schema, not an error
    empty = b.significant_terms("***", k=5)
    assert empty.count() == 0
    assert empty.columns == ["term", "fg_df", "bg_df", "score"]


def test_complete_prefix_ranking(built):
    """complete == df-ranked vocabulary under the prefix; the warm
    tier returns the identical list; empty prefix → empty."""
    b, corpus = built
    post = build_postings(corpus).toPandas()
    dfs = post.groupby("term").size().rename("df").reset_index()
    prefix = "t"  # the, to, … — many terms share it
    under = dfs[dfs["term"].str.startswith(prefix)]
    assert len(under) > 1  # prefix must be non-trivially shared
    k = max(2, len(under) - 1)  # the top-k cut provably bites
    want = (
        under.sort_values(["df", "term"], ascending=[False, True])
        .head(k)
    )
    got = b.complete(prefix, k=k).toPandas()
    assert got["term"].tolist() == want["term"].tolist()
    assert got["df"].tolist() == want["df"].tolist()
    assert b.complete_local(prefix, k=k) == [
        (t, int(d)) for t, d in got.values.tolist()
    ]
    assert b.complete("", k=5).count() == 0
    assert b.complete_local("", k=5) == []
    assert b.complete("zzzznotaprefix", k=5).count() == 0


def test_group_top_hits_matches_bruteforce(spark, built):
    """Per-group top-n hits == pandas two-level ranking over the
    oracle-pinned per-doc scores; both the group cut and the
    per-group cut provably bite."""
    b, corpus = built
    n, kg = 2, 3
    allsc = _all_scores(b)
    meta = corpus.select("conv_id", "turn_idx", "role").toPandas()
    j = allsc.merge(meta, on=["conv_id", "turn_idx"])
    best = j.groupby("role")["score"].max().rename("best_score")
    winners = (
        best.reset_index()
        .sort_values(["best_score", "role"], ascending=[False, True])
        .head(kg)
    )
    assert j["role"].nunique() > kg or kg >= j["role"].nunique()
    rows = []
    for _, g in winners.iterrows():
        members = (
            j[j["role"] == g["role"]]
            .sort_values(["score", "conv_id", "turn_idx"],
                         ascending=[False, True, True])
            .head(n)
        )
        for rank, (_, m) in enumerate(members.iterrows(), start=1):
            rows.append([g["role"], g["best_score"], rank,
                         m["conv_id"], int(m["turn_idx"]), m["score"]])
    got = b.group_top_hits(QUERY, "role", n_per_group=n, k_groups=kg)
    assert got.columns == [
        "role", "best_score", "rank", "conv_id", "turn_idx", "score"
    ]
    assert got.toPandas().values.tolist() == rows
    # per-group cut bites: every winner group has more than n matches
    assert all(
        (j["role"] == r).sum() > n for r in winners["role"]
    )


def test_group_top_hits_id_component_and_validation(built):
    b, corpus = built
    # grouping by an id component (conv_id) drops it from member cols
    got = b.group_top_hits(QUERY, "conv_id", n_per_group=2, k_groups=5)
    df = got.toPandas()
    assert got.columns == [
        "conv_id", "best_score", "rank", "turn_idx", "score"
    ]
    assert df["conv_id"].nunique() == 5
    assert df.groupby("conv_id")["rank"].max().le(2).all()
    # group winners' best == their rank-1 member score
    r1 = df[df["rank"] == 1]
    assert (r1["best_score"] == r1["score"]).all()
    # unknown group column raises; empty query → empty, contract schema
    import pytest as _pt

    with _pt.raises(ValueError, match="docmeta column"):
        b.group_top_hits(QUERY, "nope")
    empty = b.group_top_hits("***", "role")
    assert empty.count() == 0
    assert empty.columns == [
        "role", "best_score", "rank", "conv_id", "turn_idx", "score"
    ]


def test_query_rescored_matches_bruteforce(built):
    """Rescore window == pandas recompute: base top-window scores +
    weight·phrase_freq (from the oracle-pinned ad-hoc phrase search),
    one 4dp boundary round; docs outside the window never re-enter."""
    import numpy as np

    from antidb_spark.operators.phrase import phrase_search

    b, corpus = built
    phrase, window, weight, k = "of the", 30, 0.2, 10
    base = b.query_pinned(QUERY, k=window).toPandas()
    ph = phrase_search(corpus, phrase).toPandas()
    m = base.merge(ph, on=["conv_id", "turn_idx"], how="left")
    m["phrase_freq"] = m["phrase_freq"].fillna(0).astype(int)
    assert (m["phrase_freq"] > 0).any()  # the boost must bite
    m["rescored"] = np.round(
        m["score"] + weight * m["phrase_freq"], 4
    )
    want = (
        m.sort_values(["rescored", "conv_id", "turn_idx"],
                      ascending=[False, True, True])
        .head(k)[["conv_id", "turn_idx", "score", "rescored"]]
    )
    got = b.query_rescored(
        QUERY, phrase, window=window, weight=weight, k=k
    ).toPandas()
    assert got.values.tolist() == want.values.tolist()
    # rescoring provably reorders vs the plain ranking
    plain = b.query_pinned(QUERY, k=k).toPandas()
    assert got[["conv_id", "turn_idx"]].values.tolist() != \
        plain[["conv_id", "turn_idx"]].values.tolist()
    # empty phrase degrades to the base ranking with rescored == score
    deg = b.query_rescored(QUERY, "", window=window, k=k).toPandas()
    assert deg[["conv_id", "turn_idx", "score"]].values.tolist() == \
        plain.values.tolist()
    assert (deg["rescored"] == deg["score"]).all()


def test_facet_cardinality_matches_bruteforce(spark, built):
    b, corpus = built
    got = b.facet_cardinality(QUERY, "role").toPandas()
    allsc = _all_scores(b)
    meta = corpus.select("conv_id", "turn_idx", "role").toPandas()
    m = allsc.merge(meta, on=["conv_id", "turn_idx"])
    assert got["n_values"].iloc[0] == m["role"].nunique()
    assert got["n_docs"].iloc[0] == len(m)
    # require_all shrinks the matching set, never grows it
    conj = b.facet_cardinality(QUERY, "role", require_all=True).toPandas()
    assert conj["n_docs"].iloc[0] <= got["n_docs"].iloc[0]
    # empty query → empty frame; unknown column raises
    assert b.facet_cardinality("***", "role").count() == 0
    import pytest as _pt

    with _pt.raises(ValueError, match="docmeta column"):
        b.facet_cardinality(QUERY, "nope")


def test_group_must_match_bruteforce(built):
    """Group-level boolean (has_child shape): groups == convs having a
    member matching EVERY clause; score == sum of per-clause best
    member scores; conjunction provably drops groups."""
    import numpy as np

    b, corpus = built
    clauses = ["kifaba1", "to and"]  # rare clause gates ~5 of 40 convs
    per = []
    for c in clauses:
        m = b.query_pinned(c, k=1_000_000, require_all=True).toPandas()
        per.append(m.groupby("conv_id")["score"].max())
    both = sorted(set(per[0].index) & set(per[1].index))
    assert 0 < len(both) < corpus.select("conv_id").distinct().count()
    want = sorted(
        (
            (round(float(per[0][g] + per[1][g]), 4), g)
            for g in both
        ),
        key=lambda t: (-t[0], t[1]),
    )[:10]
    got = b.group_must_match(clauses, "conv_id", k=10).toPandas()
    assert got["conv_id"].tolist() == [g for _, g in want]
    np.testing.assert_allclose(
        got["score"], [s for s, _ in want], rtol=1e-9
    )
    assert (got["best_0"] <= got["score"]).all()
    # validation: empty clause list / tokenless clause / unknown group
    import pytest as _pt

    with _pt.raises(ValueError, match="clause"):
        b.group_must_match([], "conv_id")
    with _pt.raises(ValueError, match="no tokens"):
        b.group_must_match(["***"], "conv_id")
    with _pt.raises(ValueError, match="docmeta column"):
        b.group_must_match(["the"], "nope")
