"""Distributed k-means (operators/cluster.py) against an independent
numpy reference implementing the same exact-integer Lloyd contract:
md5-ranked init, int64 squared-L2 argmin with ties to the smallest
cell, floor(sum/count) centroid updates, empty cells keeping their
previous centroid. The driver's `kmeans_clusters` DuckDB oracle pins
the same algorithm in SQL; these tests pin it against a third,
Spark-free implementation and the operator's invariants."""

from __future__ import annotations

import hashlib
import math

import numpy as np
import pytest

from antidb_spark.operators.cluster import cluster_sizes, kmeans_assign

DIM = 8


def _ref_kmeans(X: np.ndarray, ids: list[int], k: int, iters: int,
                scale: int = 1_000_000):
    """Reference Lloyd with the exact contract; returns (labels,
    saw_empty_cell)."""
    q = np.floor(X.astype(np.float64) * scale).astype(np.int64)
    order = sorted(
        range(len(ids)),
        key=lambda i: (hashlib.md5(str(ids[i]).encode()).hexdigest(),
                       ids[i]),
    )
    cents = [q[i].copy() for i in order[:k]]
    saw_empty = False

    def assign():
        d = ((q[:, None, :].astype(object) - np.array(cents)[None, :, :])
             ** 2).sum(-1)
        return np.array([int(np.argmin(row)) for row in d])

    for _ in range(iters):
        a = assign()
        for c in range(k):
            members = q[a == c]
            if len(members) == 0:
                saw_empty = True
                continue
            s = members.sum(axis=0, dtype=np.int64)
            cents[c] = np.array(
                [int(math.floor(si / len(members))) for si in s],
                dtype=np.int64,
            )
    return assign(), saw_empty


def _vectors(spark, X: np.ndarray):
    rows = [(i, [float(v) for v in X[i].astype(np.float32)])
            for i in range(len(X))]
    return spark.createDataFrame(
        rows, "vec_id bigint, embedding array<float>"
    )


def test_kmeans_matches_numpy_reference(spark):
    rng = np.random.RandomState(11)
    X = rng.uniform(-0.5, 0.5, size=(60, DIM)).astype(np.float32)
    df = _vectors(spark, X)
    got = kmeans_assign(df, k=5, iters=3).toPandas()
    want, _ = _ref_kmeans(X, list(range(60)), k=5, iters=3)
    assert got["vec_id"].tolist() == list(range(60))
    assert got["cluster"].tolist() == want.tolist()
    sizes = cluster_sizes(kmeans_assign(df, k=5, iters=3)).toPandas()
    assert sizes["n_vecs"].sum() == 60


def test_kmeans_empty_cell_keeps_centroid(spark):
    """Exactly-duplicated points with k > #distinct values: several
    init centroids are identical, the smallest-cell tie rule drains
    the higher duplicates to zero members in iteration 1 — the
    empty-cell rule must keep (not crash on) those centroids."""
    rng = np.random.RandomState(3)
    clumps = rng.uniform(-0.5, 0.5, size=(3, DIM))
    X = np.vstack([clumps[i % 3] for i in range(36)]).astype(np.float32)
    want, saw_empty = _ref_kmeans(X, list(range(36)), k=8, iters=2)
    assert saw_empty, "fixture must exercise the empty-cell rule"
    got = kmeans_assign(_vectors(spark, X), k=8, iters=2).toPandas()
    assert got["cluster"].tolist() == want.tolist()


def test_kmeans_partitioning_invariant(spark):
    """Labels are independent of the input's physical partitioning
    (the integer-sum order-freeness claim)."""
    rng = np.random.RandomState(7)
    X = rng.uniform(-0.5, 0.5, size=(40, DIM)).astype(np.float32)
    df = _vectors(spark, X)
    a = kmeans_assign(df, k=4, iters=2).toPandas()
    b = kmeans_assign(df.repartition(13), k=4, iters=2).toPandas()
    assert a.values.tolist() == b.values.tolist()


def test_kmeans_validates(spark):
    rng = np.random.RandomState(5)
    X = rng.uniform(-0.5, 0.5, size=(4, DIM)).astype(np.float32)
    df = _vectors(spark, X)
    with pytest.raises(ValueError, match="k >= 1"):
        kmeans_assign(df, k=0)
    with pytest.raises(ValueError, match="exceeds"):
        kmeans_assign(df, k=10)
    # iters=0: every vector labeled by the init centroids, no update
    got = kmeans_assign(df, k=2, iters=0).toPandas()
    want, _ = _ref_kmeans(X, list(range(4)), k=2, iters=0)
    assert got["cluster"].tolist() == want.tolist()


def test_cluster_mix_composition(spark):
    """kmeans → temperature_mix composes: every kept row carries its
    cluster label, and flattening upweights the smallest cluster's
    keep-rate relative to the largest."""
    from antidb_spark.operators.datasets import temperature_mix

    rng = np.random.RandomState(19)
    X = rng.uniform(-0.5, 0.5, size=(90, DIM)).astype(np.float32)
    df = _vectors(spark, X)
    labels = kmeans_assign(df, k=3, iters=2)
    mixed = temperature_mix(
        labels, "cluster", tau=0.5, target_frac=0.5, id_col="vec_id",
        salt="cm",
    ).toPandas()
    sizes = labels.toPandas().groupby("cluster").size()
    assert len(mixed) > 0
    kept = mixed.groupby("cluster").size().reindex(sizes.index).fillna(0)
    rates = kept / sizes
    if sizes.max() > sizes.min():
        assert rates[sizes.idxmin()] >= rates[sizes.idxmax()]
