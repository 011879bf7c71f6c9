"""Tombstone deletes: O(delta) document deletion with segment-style
visibility — results exclude deleted docs instantly, ranking statistics
(df/avgdl/n_docs) keep counting them until ``purge_deleted`` or a full
rebuild (the standard delete-visibility contract; what keeps a delete
O(delta) instead of the reference's from-scratch rebuild, idx.py:85-92).

Pins: every query path excludes deleted docs; surviving docs' SCORES are
bit-identical to pre-delete (the stale-stats contract is observable);
warm == batch after deletes; pruning stays lossless (disarmed);
deletes survive O(delta) appends and segment merges; purge and full
rebuilds physically remove the docs and restore exact statistics.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from antidb_spark.operators.build import IndexBuilder
from antidb_spark.operators.phrase import (
    build_positional_index,
    near_query,
    near_warm,
    phrase_query,
    phrase_warm,
    term_positions,
)
from antidb_spark.operators.stats import build_postings
from antidb_spark.streaming.incremental import (
    PostingsDeltaSink,
    compact_incremental,
)
from antidb_spark.synth import synth_transcripts, vocabulary

_V = vocabulary(2000)
# stopword + mid + rare — mixed selectivity (same shape as test_filtered)
QUERY = f"the {_V[200]} {_V[1000]}"


@pytest.fixture(scope="module")
def built(spark, tmp_path_factory):
    """Index (docmeta + positional layers) over 24 convs; the top-3 docs
    of QUERY are deleted AFTER capturing pre-delete ground truth."""
    corpus = synth_transcripts(spark, n_convs=24, seed=11).cache()
    corpus.count()
    b = IndexBuilder(spark, str(tmp_path_factory.mktemp("delidx")))
    b.build(corpus, n_partitions=4)
    b.build_doc_meta(corpus, ["role"])
    build_positional_index(b, corpus, n_partitions=4)
    pre_all = b.query_pinned(QUERY, k=1_000_000).toPandas()
    top3 = pre_all.head(3)
    deleted = set(map(tuple, top3[["conv_id", "turn_idx"]].values.tolist()))
    n = b.delete_docs([(c, int(t)) for c, t in sorted(deleted)])
    assert n == 3
    yield b, corpus, pre_all, deleted
    corpus.unpersist()


def _drop_deleted(pdf, deleted, id_cols=("conv_id", "turn_idx")):
    mask = [
        tuple(getattr(r, c) for c in id_cols) not in deleted
        for r in pdf.itertuples()
    ]
    return pdf[mask]


def test_pinned_excludes_deleted_scores_unchanged(built):
    b, _, pre_all, deleted = built
    got = b.query_pinned(QUERY, k=10).toPandas()
    want = (
        _drop_deleted(pre_all, deleted)
        .sort_values(["score", "conv_id", "turn_idx"],
                     ascending=[False, True, True])
        .head(10)
    )
    # deleted docs gone AND surviving scores bit-identical to
    # pre-delete (stats intentionally stale until purge)
    assert got.values.tolist() == want.values.tolist()
    assert not any(
        (r.conv_id, r.turn_idx) in deleted for r in got.itertuples()
    )
    # non-vacuous: the pre-delete top-10 contained the deleted docs
    assert any(
        (r.conv_id, r.turn_idx) in deleted
        for r in pre_all.head(10).itertuples()
    )


def test_batch_and_warm_match_after_delete(built):
    b, _, _, deleted = built
    pinned = b.query_pinned(QUERY, k=10).toPandas()
    batch = b.query_batch([QUERY], k=10).toPandas().drop(columns=["query_id"])
    assert not any(
        (r.conv_id, r.turn_idx) in deleted for r in batch.itertuples()
    )
    # batch/warm rank by unrounded scores while the pinned family rounds
    # to 4dp before ranking (pre-existing contract), so compare the two
    # families only ABOVE the rounded-tie boundary of the 10th score
    cut = pinned["score"].min()
    br = batch.assign(score=batch["score"].round(4))

    def norm(df):
        # within a rounded-score tie group batch orders by the raw
        # float, pinned by ids — normalize the within-group order
        return (
            df[df["score"] > cut]
            .sort_values(["score", "conv_id", "turn_idx"],
                         ascending=[False, True, True])
            .values.tolist()
        )

    assert norm(br) == norm(pinned)
    assert len(norm(br)) > 0
    warm = b.query_warm(QUERY, k=10)
    assert warm.values.tolist() == batch.values.tolist()
    # pruning stays LOSSLESS with tombstones (it disarms): explicit
    # prune request returns the identical result
    pruned = (
        b.query_batch([QUERY], k=10, prune=True)
        .toPandas().drop(columns=["query_id"])
    )
    assert pruned.values.tolist() == batch.values.tolist()


def test_match_paths_exclude_deleted(built):
    b, corpus, _, deleted = built
    # hit_count: distinct matching docs minus the deleted ones
    post = build_postings(corpus).filter(
        F.col("term").isin(sorted(set(QUERY.split())))
    )
    match_docs = set(
        map(tuple, post.select("conv_id", "turn_idx").toPandas().values)
    )
    want_n = len(match_docs - deleted)
    assert b.hit_count(QUERY).collect()[0]["n_docs"] == want_n
    assert len(match_docs) > want_n  # deletion actually bites
    # facet_counts: per-role counts over alive matches only
    meta = corpus.select("conv_id", "turn_idx", "role").toPandas()
    alive = meta[
        [tuple(v) in (match_docs - deleted)
         for v in meta[["conv_id", "turn_idx"]].values.tolist()]
    ]
    want = sorted(
        alive.groupby("role").size().items(), key=lambda kv: (-kv[1], kv[0])
    )
    got = b.facet_counts(QUERY, "role").toPandas()
    assert list(map(tuple, got.values.tolist())) == [
        (r, int(n)) for r, n in want
    ]
    # eq_terms: postings lookups never return deleted docs
    t = QUERY.split()[0]
    got_eq = b.eq_terms(t).toPandas()
    assert not any(
        (r.conv_id, r.turn_idx) in deleted for r in got_eq.itertuples()
    )
    term_docs = set(
        map(tuple, post.filter(F.col("term") == t)
            .select("conv_id", "turn_idx").toPandas().values)
    )
    assert set(
        map(tuple, got_eq[["conv_id", "turn_idx"]].values.tolist())
    ) == term_docs - deleted


def test_positional_paths_exclude_deleted(built):
    b, corpus, _, deleted = built
    # pick a phrase present in at least one deleted doc
    texts = corpus.toPandas().set_index(["conv_id", "turn_idx"])["text"]
    phrase = None
    for d in sorted(deleted):
        words = texts.loc[d].split()
        if len(words) >= 2:
            phrase = f"{words[0]} {words[1]}"
            break
    assert phrase is not None
    got = phrase_query(b, phrase).toPandas()
    assert not any(
        (r.conv_id, r.turn_idx) in deleted for r in got.itertuples()
    )
    warm = phrase_warm(b, phrase)
    assert warm.values.tolist() == got.values.tolist()
    ta, tb = phrase.split()
    if ta != tb:
        near = near_query(b, ta, tb, 5).toPandas()
        assert not any(
            (r.conv_id, r.turn_idx) in deleted for r in near.itertuples()
        )
        nwarm = near_warm(b, ta, tb, 5)
        assert nwarm.values.tolist() == near.values.tolist()
    # snippet positions follow the (already-filtered) top-k
    snip = term_positions(b, QUERY, k=10).toPandas()
    assert not any(
        (r.conv_id, r.turn_idx) in deleted for r in snip.itertuples()
    )


def test_delete_validation_and_idempotence(built):
    b, corpus, _, deleted = built
    # re-delete and unknown ids are no-ops
    assert b.delete_docs([(c, int(t)) for c, t in sorted(deleted)]) == 0
    assert b.delete_docs([("conv_zz_nope", 0)]) == 0
    assert b.delete_docs([]) == 0
    # DataFrame input (extra columns ignored) — delete one more live doc
    extra = (
        b.query_pinned(QUERY, k=1).toPandas()
        .rename(columns={"score": "ignored"})
    )
    df = b.spark.createDataFrame(extra)
    assert b.delete_docs(df) == 1
    gone = (extra.iloc[0]["conv_id"], extra.iloc[0]["turn_idx"])
    got = b.query_pinned(QUERY, k=10).toPandas()
    assert not any(
        (r.conv_id, r.turn_idx) == gone for r in got.itertuples()
    )


def test_purge_restores_exact_stats(spark, tmp_path):
    corpus = synth_transcripts(spark, n_convs=10, seed=5).cache()
    corpus.count()
    b = IndexBuilder(spark, str(tmp_path / "purge_idx"))
    b.build(corpus, n_partitions=4)
    doomed = b.query_pinned(QUERY, k=2).toPandas()
    ids = [(r.conv_id, int(r.turn_idx)) for r in doomed.itertuples()]
    assert b.delete_docs(ids) == 2
    m = b.purge_deleted(n_partitions=4)
    assert m == {"mode": "purged", "n_purged": 2}
    assert not b.catalog.exists("tombstones")
    # results + statistics identical to a from-scratch build over the
    # filtered corpus (scores now reflect the TRUE df/avgdl/n_docs)
    keep = corpus.filter(
        ~F.struct("conv_id", "turn_idx").isin(
            [F.struct(F.lit(c), F.lit(t)) for c, t in ids]
        )
    )
    ref = IndexBuilder(spark, str(tmp_path / "ref_idx"))
    ref.build(keep, n_partitions=4)
    for q in [QUERY, "the will", _V[1000]]:
        got = b.query_pinned(q, k=20).toPandas()
        want = ref.query_pinned(q, k=20).toPandas()
        assert got.values.tolist() == want.values.tolist(), q
    assert b._corpus_stats() == ref._corpus_stats()
    # pruning re-armed: prune on/off identical again (and θ is exact)
    p_on = b.query_batch([QUERY], k=10, prune=True).toPandas()
    p_off = b.query_batch([QUERY], k=10, prune=False).toPandas()
    assert p_on.values.tolist() == p_off.values.tolist()
    assert b.purge_deleted() == {"mode": "noop"}
    corpus.unpersist()


def test_deletes_survive_append_compaction(spark, tmp_path):
    corpus = synth_transcripts(spark, n_convs=16, seed=9).cache()
    corpus.count()
    base = corpus.filter(F.col("conv_id") < "conv_00000012")
    tail = corpus.filter(F.col("conv_id") >= "conv_00000012")
    b = IndexBuilder(spark, str(tmp_path / "app_idx"))
    b.build(base, n_partitions=4)
    doomed = b.query_pinned(QUERY, k=1).toPandas()
    gone = (doomed.iloc[0]["conv_id"], int(doomed.iloc[0]["turn_idx"]))
    assert b.delete_docs([gone]) == 1
    sink = PostingsDeltaSink(str(tmp_path / "app_sink"))
    sink(tail, batch_id=0)
    m = compact_incremental(spark, sink, b, n_partitions=4)
    assert m["mode"] == "append"
    # tombstones intact (committed ordinals never move on append)
    assert b._n_tombstones() == 1
    got = b.query_pinned(QUERY, k=1_000_000).toPandas()
    assert not any(
        (r.conv_id, r.turn_idx) == gone for r in got.itertuples()
    )
    # appended docs searchable; warm == batch on the appended index
    tail_ids = set(
        map(tuple, tail.select("conv_id", "turn_idx").toPandas().values)
    )
    assert any(
        (r.conv_id, r.turn_idx) in tail_ids for r in got.itertuples()
    )
    warm = b.query_warm(QUERY, k=10)
    batch = b.query_batch([QUERY], k=10).toPandas().drop(columns=["query_id"])
    assert warm.values.tolist() == batch.values.tolist()
    corpus.unpersist()


def test_full_rebuild_purges_deleted(spark, tmp_path):
    corpus = synth_transcripts(spark, n_convs=10, seed=3).cache()
    corpus.count()
    b = IndexBuilder(spark, str(tmp_path / "fr_idx"))
    b.build(corpus, n_partitions=4)
    doomed = b.query_pinned(QUERY, k=1).toPandas()
    gone = (doomed.iloc[0]["conv_id"], int(doomed.iloc[0]["turn_idx"]))
    assert b.delete_docs([gone]) == 1
    n0, _ = b._corpus_stats()
    # a delta that UPDATES an existing (different, alive) doc forces the
    # full-rebuild path, which physically purges tombstoned docs
    victim = corpus.filter(
        ~((F.col("conv_id") == gone[0]) & (F.col("turn_idx") == gone[1]))
    ).orderBy("conv_id", "turn_idx").limit(1)
    sink = PostingsDeltaSink(str(tmp_path / "fr_sink"))
    sink(victim, batch_id=0)
    m = compact_incremental(spark, sink, b, n_partitions=4)
    assert m["mode"] == "full"
    assert not b.catalog.exists("tombstones")
    got = b.query_pinned(QUERY, k=1_000_000).toPandas()
    assert not any(
        (r.conv_id, r.turn_idx) == gone for r in got.itertuples()
    )
    n1, _ = b._corpus_stats()
    assert n1 == n0 - 1  # the purged doc left the statistics too
    corpus.unpersist()


def test_merge_carries_tombstones(spark, tmp_path):
    corpus = synth_transcripts(spark, n_convs=12, seed=8).cache()
    corpus.count()
    a = corpus.filter(F.col("conv_id") < "conv_00000006")
    c = corpus.filter(F.col("conv_id") >= "conv_00000006")
    from antidb_spark.operators.merge import merge_index

    dst = IndexBuilder(spark, str(tmp_path / "m_dst"))
    dst.build(a, n_partitions=4)
    src = IndexBuilder(spark, str(tmp_path / "m_src"))
    src.build(c, n_partitions=4)
    d0 = dst.query_pinned(QUERY, k=1).toPandas().iloc[0]
    s0 = src.query_pinned(QUERY, k=1).toPandas().iloc[0]
    gone_dst = (str(d0["conv_id"]), int(d0["turn_idx"]))
    gone_src = (str(s0["conv_id"]), int(s0["turn_idx"]))
    assert dst.delete_docs([gone_dst]) == 1
    assert src.delete_docs([gone_src]) == 1
    m = merge_index(spark, dst, src, n_partitions=4)
    assert m["tombstones"] == "merged"
    assert dst._n_tombstones() == 2
    got = dst.query_pinned(QUERY, k=1_000_000).toPandas()
    ids = set(map(tuple, got[["conv_id", "turn_idx"]].values.tolist()))
    assert gone_dst not in ids and gone_src not in ids
    # both segments' alive docs present
    assert any(i[0] < "conv_00000006" for i in ids)
    assert any(i[0] >= "conv_00000006" for i in ids)
    corpus.unpersist()


def test_delete_everything_empties_results(spark, tmp_path):
    corpus = synth_transcripts(spark, n_convs=4, seed=2).cache()
    corpus.count()
    b = IndexBuilder(spark, str(tmp_path / "all_idx"))
    b.build(corpus, n_partitions=2)
    n = corpus.count()
    ids = [
        (r.conv_id, int(r.turn_idx))
        for r in corpus.select("conv_id", "turn_idx").toPandas().itertuples()
    ]
    assert b.delete_docs(ids) == n
    assert b.query_pinned(QUERY, k=10).count() == 0
    assert b.query_warm(QUERY, k=10).empty
    assert b.hit_count(QUERY).collect()[0]["n_docs"] == 0
    assert b.eq_terms("the").count() == 0
    corpus.unpersist()


def test_grouped_excludes_tombstoned_docs(spark, tmp_path):
    """query_grouped counts/ranks ALIVE docs only: deleting every turn
    of the winning conversation removes the group, and partial deletes
    shrink n_hits."""
    import tempfile

    from antidb_spark.operators.build import IndexBuilder
    from antidb_spark.synth import synth_transcripts

    t = synth_transcripts(spark, n_convs=10, seed=3).cache()
    t.count()
    b = IndexBuilder(spark, str(tmp_path / "gidx"))
    b.build(t)
    g0 = b.query_grouped("the", ["conv_id"], k=5).toPandas()
    top = g0["conv_id"].iloc[0]
    b.delete_docs(t.filter(t.conv_id == top).select("conv_id", "turn_idx"))
    g1 = b.query_grouped("the", ["conv_id"], k=5).toPandas()
    assert top not in set(g1["conv_id"])
    # a partial delete shrinks the group's hit count, never grows it
    nxt = g1["conv_id"].iloc[0]
    before = int(g1.set_index("conv_id").loc[nxt, "n_hits"])
    one = t.filter(t.conv_id == nxt).select("conv_id", "turn_idx").limit(1)
    b.delete_docs(one)
    g2 = b.query_grouped("the", ["conv_id"], k=5).toPandas()
    after = g2.set_index("conv_id")["n_hits"].get(nxt, 0)
    assert after == before - 1
    t.unpersist()


def test_grouped_over_docmeta_column(spark, tmp_path):
    """query_grouped groups by a docmeta attribute (the group_top_hits
    resolution rule), matching the ad-hoc rollup."""
    import pytest as _pt
    from pyspark.sql import functions as F

    from antidb_spark.operators.build import IndexBuilder
    from antidb_spark.operators.topk import bm25_grouped_topk
    from antidb_spark.synth import synth_transcripts

    t = synth_transcripts(spark, n_convs=10, seed=5).cache()
    t.count()
    b = IndexBuilder(spark, str(tmp_path / "gmeta"))
    b.build(t)
    b.build_doc_meta(t, ["role"])
    got = b.query_grouped("the", ["role"], k=5).toPandas()
    want = bm25_grouped_topk(t, "the", "role", k=5).toPandas()
    assert got.values.tolist() == want.values.tolist()
    with _pt.raises(ValueError, match="docmeta"):
        b.query_grouped("the", ["nope"], k=5)
    t.unpersist()
