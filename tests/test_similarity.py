"""Similarity search: brute-force cosine (exact), LSH, IVF, dup pairs.

The brute-force path is pinned against numpy; the approximate paths are
validated for (a) exact scores on whatever candidates they return and
(b) recall vs brute force on the driver's embeddings table.
"""

from __future__ import annotations

import numpy as np
import pytest

from antidb_spark.operators.similarity import (
    cosine_dup_pairs,
    cosine_topk,
    hyperplane_lsh_topk,
    ivf_topk,
)


@pytest.fixture(scope="module")
def vecs(spark, sf_dir):
    df = spark.read.parquet(f"{sf_dir}/embeddings.parquet").cache()
    df.count()
    return df


@pytest.fixture(scope="module")
def np_vecs(vecs):
    rows = vecs.orderBy("vec_id").collect()
    ids = np.array([r["vec_id"] for r in rows])
    mat = np.array([r["embedding"] for r in rows], dtype=np.float64)
    return ids, mat


@pytest.fixture(scope="module")
def probe(np_vecs):
    ids, mat = np_vecs
    return mat[0].tolist()


def _np_topk(ids, mat, probe, k):
    p = np.asarray(probe)
    cos = (mat @ p) / (np.linalg.norm(mat, axis=1) * np.linalg.norm(p))
    order = np.lexsort((ids, -np.round(cos, 6)))[:k]
    return [(int(ids[i]), round(float(cos[i]), 6)) for i in order]


def test_bruteforce_matches_numpy(vecs, np_vecs, probe):
    ids, mat = np_vecs
    want = _np_topk(ids, mat, probe, 10)
    got = [(r["vec_id"], r["cos"]) for r in cosine_topk(vecs, probe, 10).collect()]
    assert [g[0] for g in got] == [w[0] for w in want]
    assert all(abs(g[1] - w[1]) < 1e-5 for g, w in zip(got, want))
    assert got[0][0] == 0 and abs(got[0][1] - 1.0) < 1e-6  # self is top-1


def test_lsh_recall_and_exact_scores(vecs, np_vecs, probe):
    ids, mat = np_vecs
    exact = {v for v, _ in _np_topk(ids, mat, probe, 10)}
    got = cosine_topk(vecs, probe, 10).collect()
    lsh = hyperplane_lsh_topk(vecs, probe, 10).collect()
    lsh_ids = {r["vec_id"] for r in lsh}
    assert len(lsh_ids & exact) >= 5  # multiprobe recall on real data
    # every returned score is the exact cosine
    exact_scores = {r["vec_id"]: r["cos"] for r in got}
    for r in lsh:
        if r["vec_id"] in exact_scores:
            assert abs(r["cos"] - exact_scores[r["vec_id"]]) < 1e-9


def test_ivf_recall(vecs, np_vecs, probe):
    ids, mat = np_vecs
    exact = [v for v, _ in _np_topk(ids, mat, probe, 10)]
    ivf = [r["vec_id"] for r in ivf_topk(vecs, probe, 10, n_cells=8, n_probe=4).collect()]
    assert len(set(ivf) & set(exact)) >= 5
    assert ivf[0] == 0  # the probe's own vector always lands in a probed cell


def test_cosine_dup_pairs_verified(spark):
    """Engineered near-identical vectors must be found and verified."""
    base = np.array([1.0, 2.0, 3.0, 4.0], dtype=np.float64)
    rows = [
        (0, (base).tolist(), 0),
        (1, (base * 2.0).tolist(), 0),          # cos = 1.0 with 0
        (2, (base + np.array([0.0, 0.0, 0.0, 0.05])).tolist(), 0),
        (3, [-4.0, 3.0, -2.0, 1.0], 1),          # orthogonal-ish
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")
    pairs = {
        (r["id_a"], r["id_b"]): r["cos"]
        for r in cosine_dup_pairs(df, threshold=0.99, n_planes=4).collect()
    }
    assert (0, 1) in pairs and abs(pairs[(0, 1)] - 1.0) < 1e-6
    assert (0, 2) in pairs
    assert not any(3 in p for p in pairs)


def test_cosine_dup_pairs_multi_table_recall(spark):
    """Multi-table banding: candidates are the UNION over independent
    tables, so recall against brute force is monotone in n_tables; each
    qualifying pair is reported once with its exact cosine."""
    rng = np.random.default_rng(7)
    base = rng.standard_normal((40, 16))
    rows = [(i, base[i].tolist(), 0) for i in range(40)]
    # planted near-dups: small perturbations of existing vectors
    for j in range(10):
        rows.append((100 + j, (base[j] * 1.01 + 0.001 * j).tolist(), 1))
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )

    def pairs(n_tables):
        out = cosine_dup_pairs(
            df, threshold=0.98, n_planes=6, n_tables=n_tables
        ).collect()
        got = [(r["id_a"], r["id_b"]) for r in out]
        assert len(got) == len(set(got))  # each pair exactly once
        return set(got)

    p1, p2 = pairs(1), pairs(2)
    assert p1 <= p2  # union of tables can only add candidates
    # brute-force truth for the planted perturbation pairs
    def cos(a, b):
        a, b = np.asarray(a, np.float64), np.asarray(b, np.float64)
        return a @ b / (np.linalg.norm(a) * np.linalg.norm(b))

    truth = {
        (j, 100 + j)
        for j in range(10)
        if cos(base[j], base[j] * 1.01 + 0.001 * j) >= 0.98
    }
    assert truth  # non-vacuous
    assert truth <= p2  # exact copies-with-noise share buckets in ≥1 table
