"""Federated multi-segment search: query-time fan-out with global
statistics over N committed segments, no physical merge.

The invariant under test mirrors merge_index's, minus the merge:
``federated_topk(segments, q)`` is value-identical (ties included) to
``query_pinned`` on one index built over the union corpus — and the
equivalence must survive per-segment tombstones and upserts, whose
stale-stats contracts sum across segments exactly like a single
index's."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from antidb_spark.operators.build import IndexBuilder
from antidb_spark.operators.federate import (
    federated_dfs,
    federated_stats,
    federated_topk,
)
from antidb_spark.synth import synth_transcripts, vocabulary

_V = vocabulary(2000)
QUERIES = [
    f"the {_V[200]} {_V[1000]}",   # mixed selectivity
    "the a of",                    # stopword-only
    _V[900],                       # rare single term
    f"{_V[50]} {_V[51]} {_V[52]} zzzmiss",  # partial miss
]


@pytest.fixture(scope="module")
def segments(spark, tmp_path_factory):
    """Corpus split into 3 id-disjoint segments + the union index."""
    corpus = synth_transcripts(spark, n_convs=18, seed=15).cache()
    corpus.count()
    root = tmp_path_factory.mktemp("fed")
    cuts = ["conv_00000006", "conv_00000012"]
    parts = [
        corpus.filter(F.col("conv_id") < cuts[0]),
        corpus.filter(
            (F.col("conv_id") >= cuts[0]) & (F.col("conv_id") < cuts[1])
        ),
        corpus.filter(F.col("conv_id") >= cuts[1]),
    ]
    builders = []
    for i, p in enumerate(parts):
        b = IndexBuilder(spark, str(root / f"seg{i}"))
        b.build(p, n_partitions=4)
        builders.append(b)
    union = IndexBuilder(spark, str(root / "union"))
    union.build(corpus, n_partitions=4)
    yield builders, union, corpus
    corpus.unpersist()


def test_federated_matches_union_build(spark, segments):
    builders, union, _ = segments
    for q in QUERIES:
        for k in (10, 1_000_000):
            fed = federated_topk(spark, builders, q, k=k).toPandas()
            want = union.query_pinned(q, k=k).toPandas()
            assert fed.values.tolist() == want.values.tolist(), (q, k)


def test_federated_stats_equal_union_stats(spark, segments):
    builders, union, _ = segments
    n, avg = federated_stats(builders)
    un, uavg = union._corpus_stats()
    assert n == un
    assert abs(avg - uavg) < 1e-9
    terms = sorted(set(QUERIES[0].split()))
    assert federated_dfs(builders, terms) == union._term_dfs(terms)


def test_federated_single_segment_degenerates(spark, segments):
    builders, _, _ = segments
    one = federated_topk(spark, [builders[0]], QUERIES[0], k=10).toPandas()
    want = builders[0].query_pinned(QUERIES[0], k=10).toPandas()
    assert one.values.tolist() == want.values.tolist()


def test_federated_validation(spark, segments):
    builders, _, _ = segments
    with pytest.raises(ValueError, match="at least one"):
        federated_topk(spark, [], "x")
    odd = IndexBuilder(spark, "/tmp/_nonexistent_fed",
                       id_cols=("conv_id",))
    with pytest.raises(ValueError, match="id_cols"):
        federated_topk(spark, [builders[0], odd], "x")
    # no-term / all-miss queries → empty, never an error
    assert federated_topk(spark, builders, "", k=5).count() == 0
    assert federated_topk(spark, builders, "zzznope", k=5).count() == 0


def test_federated_with_segment_tombstones(spark, tmp_path):
    """A delete in one segment = the same delete on the union index:
    instant exclusion, stats stale identically on both sides."""
    corpus = synth_transcripts(spark, n_convs=10, seed=25).cache()
    corpus.count()
    mid = "conv_00000005"
    a = IndexBuilder(spark, str(tmp_path / "ta"))
    a.build(corpus.filter(F.col("conv_id") < mid), n_partitions=4)
    b = IndexBuilder(spark, str(tmp_path / "tb"))
    b.build(corpus.filter(F.col("conv_id") >= mid), n_partitions=4)
    union = IndexBuilder(spark, str(tmp_path / "tu"))
    union.build(corpus, n_partitions=4)
    doomed = a.query_pinned(QUERIES[0], k=1).toPandas()
    gone = (doomed.iloc[0]["conv_id"], int(doomed.iloc[0]["turn_idx"]))
    assert a.delete_docs([gone]) == 1
    assert union.delete_docs([gone]) == 1
    for q in QUERIES[:2]:
        fed = federated_topk(spark, [a, b], q, k=10).toPandas()
        want = union.query_pinned(q, k=10).toPandas()
        assert fed.values.tolist() == want.values.tolist(), q
        assert gone not in set(
            map(tuple, fed[["conv_id", "turn_idx"]].values.tolist())
        )
    corpus.unpersist()


def test_federated_with_segment_upsert(spark, tmp_path):
    """An upsert in one segment = the same upsert on the union index
    (dead generations weigh on global stats identically until purge)."""
    corpus = synth_transcripts(spark, n_convs=10, seed=27).cache()
    corpus.count()
    mid = "conv_00000005"
    a = IndexBuilder(spark, str(tmp_path / "ua"))
    a.build(corpus.filter(F.col("conv_id") < mid), n_partitions=4)
    b = IndexBuilder(spark, str(tmp_path / "ub"))
    b.build(corpus.filter(F.col("conv_id") >= mid), n_partitions=4)
    union = IndexBuilder(spark, str(tmp_path / "uu"))
    union.build(corpus, n_partitions=4)
    vic = a.query_pinned(QUERIES[0], k=1).toPandas()
    rows = [{"conv_id": str(vic.iloc[0]["conv_id"]),
             "turn_idx": int(vic.iloc[0]["turn_idx"]),
             "text": f"the {_V[200]} rewritten generation"}]
    ups = spark.createDataFrame(pd.DataFrame(rows))
    assert a.upsert_docs(ups, n_partitions=4)["n_replaced"] == 1
    assert union.upsert_docs(ups, n_partitions=4)["n_replaced"] == 1
    for q in QUERIES[:2]:
        fed = federated_topk(spark, [a, b], q, k=10).toPandas()
        want = union.query_pinned(q, k=10).toPandas()
        assert fed.values.tolist() == want.values.tolist(), q
    corpus.unpersist()
