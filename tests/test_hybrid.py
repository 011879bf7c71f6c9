"""Hybrid retrieval (operators/hybrid.py) and group-rollup ranking
(topk.bm25_grouped_topk / IndexBuilder.query_grouped).

Pins: RRF math (rank truncation, absent-list zero contribution, fixed
fusion order), grouped ranking vs a pandas brute force, and the
index-served grouped path being value-identical to the ad-hoc one on
the same corpus (the cross-engine oracle for both lives in
__spark_entry__.py: grouped_topk / hybrid_topk)."""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import functions as F

from antidb_spark.functions.analyze import py_tokens
from antidb_spark.operators.build import IndexBuilder
from antidb_spark.operators.hybrid import hybrid_topk, rrf_fuse
from antidb_spark.operators.topk import (
    bm25_grouped_topk,
    bm25_scores_pinned,
)
from antidb_spark.synth import synth_transcripts, vocabulary

_V = vocabulary(2000)
QUERY = f"the {_V[200]} {_V[1000]}"


def test_rrf_fuse_math(spark):
    """Hand-checkable fusion: ranks from (score desc, id asc), docs
    missing from a list contribute 0, contributions are 1/(c+rank)."""
    a = spark.createDataFrame(
        [(1, 9.0), (2, 5.0), (3, 5.0)], "doc_id int, score double"
    )
    b = spark.createDataFrame(
        [(3, 0.9), (4, 0.8)], "doc_id int, score double"
    )
    got = rrf_fuse([a, b], ["doc_id"], k=10, c=60).toPandas()
    want = {
        1: 1 / 61,             # rank 1 in a only
        2: 1 / 62,             # rank 2 in a (score tie broken by id)
        3: 1 / 63 + 1 / 61,    # rank 3 in a, rank 1 in b
        4: 1 / 62,             # rank 2 in b only
    }
    got_map = dict(zip(got["doc_id"], got["rrf"]))
    assert set(got_map) == set(want)
    for d, v in want.items():
        assert abs(got_map[d] - round(v, 6)) < 1e-9, d
    # ordering: rrf desc, doc_id asc — doc 2 and 4 tie at 1/62
    assert got["doc_id"].tolist() == [3, 1, 2, 4]


def test_rrf_depth_truncates_before_ranking(spark):
    """A doc below the depth cut of every list never surfaces."""
    rows = [(i, float(100 - i)) for i in range(10)]
    a = spark.createDataFrame(rows, "doc_id int, score double")
    got = rrf_fuse([a], ["doc_id"], k=10, depth=3).toPandas()
    assert got["doc_id"].tolist() == [0, 1, 2]


def test_grouped_topk_vs_bruteforce(spark):
    corpus = synth_transcripts(spark, n_convs=12, seed=7).cache()
    ids = ("conv_id", "turn_idx")
    got = bm25_grouped_topk(
        corpus, QUERY, "conv_id", k=5, id_cols=ids
    ).toPandas()

    scores = bm25_scores_pinned(corpus, QUERY, id_cols=ids).toPandas()
    want = (
        scores.groupby("conv_id")
        .agg(n_hits=("score", "size"), best_score=("score", "max"))
        .reset_index()
        .sort_values(["best_score", "conv_id"], ascending=[False, True])
        .head(5)
        .reset_index(drop=True)
    )
    assert got["conv_id"].tolist() == want["conv_id"].tolist()
    assert got["n_hits"].tolist() == want["n_hits"].tolist()
    assert np.allclose(got["best_score"], want["best_score"])
    corpus.unpersist()


def test_grouped_non_id_group_col(spark):
    """Group attribute off the doc row (role) — exercises the join
    branch; every group's n_hits sums to the matching-doc count."""
    corpus = synth_transcripts(spark, n_convs=8, seed=11).cache()
    ids = ("conv_id", "turn_idx")
    got = bm25_grouped_topk(
        corpus, QUERY, "role", k=10, id_cols=ids
    ).toPandas()
    n_match = bm25_scores_pinned(corpus, QUERY, id_cols=ids).count()
    assert int(got["n_hits"].sum()) == n_match
    assert got["best_score"].is_monotonic_decreasing
    corpus.unpersist()


def test_index_grouped_matches_adhoc(spark, tmp_path):
    """query_grouped (committed index) ≡ bm25_grouped_topk (ad-hoc)
    on the same corpus — same stats, same rounding, same rollup."""
    corpus = synth_transcripts(spark, n_convs=12, seed=7).cache()
    b = IndexBuilder(spark, str(tmp_path / "grp_idx"))
    b.build(corpus, n_partitions=4)
    got = b.query_grouped(QUERY, ["conv_id"], k=5).toPandas()
    want = bm25_grouped_topk(
        corpus, QUERY, "conv_id", k=5, id_cols=("conv_id", "turn_idx")
    ).toPandas()
    assert got.values.tolist() == want.values.tolist()
    # empty query → empty frame with the right schema, never an error
    empty = b.query_grouped("...", ["conv_id"], k=5)
    assert empty.count() == 0
    assert empty.columns == ["conv_id", "n_hits", "best_score"]
    corpus.unpersist()


def test_hybrid_topk_blends_both_sides(spark):
    """Fusing BM25 with cosine: a doc ranked mid-list by BOTH sides
    must beat a doc present in only one list at similar rank, and the
    fused ids must come from the union of the two candidate lists."""
    n, dim = 60, 8
    rng = np.random.default_rng(3)
    words = [f"{_V[i]} {_V[i + 1]}" for i in range(n)]
    docs = spark.createDataFrame(
        pd.DataFrame({
            "doc_id": range(n),
            "text": [f"{_V[200]} {w}" if i % 2 == 0 else w
                     for i, w in enumerate(words)],
        })
    )
    vecs_pdf = pd.DataFrame({
        "vec_id": range(n),
        "embedding": [rng.standard_normal(dim).astype("float32").tolist()
                      for _ in range(n)],
    })
    vecs = spark.createDataFrame(vecs_pdf)
    probe = vecs_pdf["embedding"][5]
    out = hybrid_topk(
        docs, vecs, _V[200], probe, k=10, depth=20
    ).toPandas()
    assert len(out) == 10
    assert out["rrf"].is_monotonic_decreasing
    # the probe's own vector is cosine rank 1; if doc 5 also matched
    # the sparse side it must be fused on top (sanity of both sides)
    sparse_ids = set(
        bm25_scores_pinned(docs, _V[200], id_cols=("doc_id",))
        .toPandas()["doc_id"]
    )
    if 5 in sparse_ids:
        assert out["doc_id"].iloc[0] == 5
    assert py_tokens(_V[200]) == [_V[200]]  # analyzer sanity


def test_hybrid_warm_matches_spark_served(spark, sf_dir, tmp_path):
    """hybrid_warm (query_warm × topk_local, fused in pandas — zero
    Spark jobs at query time) == the same fusion over the Spark-served
    sources (query_pinned × LshIndex.topk): identical depth cut, rank
    definition, fusion order, rounding."""
    from antidb_spark.operators.ann import AnnIndexStore
    from antidb_spark.operators.hybrid import hybrid_warm

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    vecs = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    probe = [
        float(v)
        for v in vecs.filter(F.col("vec_id") == 0).first()["embedding"]
    ]
    b = IndexBuilder(spark, str(tmp_path / "hyb_idx"), id_cols=("doc_id",))
    b.build(docs, n_partitions=4)
    store = AnnIndexStore(spark, str(tmp_path / "hyb_ann"))
    ann = store.build_lsh("vecs", vecs, n_partitions=4)

    q = "spark query join performance"
    got = hybrid_warm(b, ann, q, probe, k=10, depth=25)
    want = rrf_fuse(
        [
            b.query_pinned(q, k=25),
            ann.topk(probe, k=25).select(
                F.col("vec_id").alias("doc_id"), F.col("cos").alias("score")
            ),
        ],
        ["doc_id"], k=10, depth=25,
    ).toPandas()
    assert got.values.tolist() == want.values.tolist()
