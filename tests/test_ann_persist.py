"""Persisted ANN indexes (AnnIndexStore): parity with the in-memory
tiers, reopen-from-manifest, and observable file pruning.

The in-memory LSH/IVF tiers in operators/similarity.py define the
candidate-set semantics (and are recall-pinned in test_similarity); the
persisted indexes must return IDENTICAL rows while reading only
manifest-pruned bucket/cell files.
"""

from __future__ import annotations

import pytest

from antidb_spark.operators.ann import AnnIndexStore, seq_cos, seq_dot
from antidb_spark.operators.similarity import hyperplane_lsh_topk, ivf_topk


@pytest.fixture(scope="module")
def vecs(spark, sf_dir):
    df = spark.read.parquet(f"{sf_dir}/embeddings.parquet").cache()
    df.count()
    return df


@pytest.fixture(scope="module")
def probe(vecs):
    row = vecs.filter(vecs.vec_id == 0).first()
    return [float(v) for v in row["embedding"]]


@pytest.fixture(scope="module")
def store(spark, vecs, tmp_path_factory):
    st = AnnIndexStore(spark, str(tmp_path_factory.mktemp("ann_store")))
    st.build_lsh("lsh", vecs, n_partitions=8)
    st.build_ivf("ivf", vecs, n_partitions=8)
    return st


def test_lsh_persisted_matches_inmemory(spark, store, vecs, probe):
    idx = AnnIndexStore(spark, store.catalog.root).open_lsh("lsh")  # reopen
    got = idx.topk(probe, k=10).collect()
    want = hyperplane_lsh_topk(vecs, probe, k=10).collect()
    assert [(r["vec_id"], r["cos"]) for r in got] == [
        (r["vec_id"], r["cos"]) for r in want
    ]


def test_ivf_persisted_matches_inmemory(spark, store, vecs, probe):
    idx = AnnIndexStore(spark, store.catalog.root).open_ivf("ivf")
    got = idx.topk(probe, k=10, n_probe=4).collect()
    want = ivf_topk(vecs, probe, k=10, n_probe=4).collect()
    assert [(r["vec_id"], r["cos"]) for r in got] == [
        (r["vec_id"], r["cos"]) for r in want
    ]


def test_lsh_probe_prunes_files(store, probe):
    idx = store.open_lsh("lsh")
    man = store.catalog.manifest("lsh")
    # single-probe keys (4 buckets, one per table) must hit a strict
    # subset of files; multiprobe scatters ~36 keys and may touch all
    # files at this tiny scale
    keys = idx.probe_keys(probe, multiprobe=False)
    pruned = store.catalog.pruned_file_paths("lsh", "bkey", values=keys)
    assert pruned is not None
    assert 0 < len(pruned) < len(man["files"])


def test_ivf_probe_prunes_files(store, probe):
    idx = store.open_ivf("ivf")
    man = store.catalog.manifest("ivf")
    cells = idx.probe_cells(probe, n_probe=2)
    pruned = store.catalog.pruned_file_paths("ivf", "cell", values=cells)
    assert pruned is not None
    assert 0 < len(pruned) < len(man["files"])


def test_ivf_cells_cover_all_vectors(store, vecs):
    n = store.catalog.read("ivf").count()
    assert n == vecs.count()
    cents = store.open_ivf("ivf").centroids()
    assert len(cents) == 16
    assert [c for c, _ in cents] == list(range(16))


def test_seq_fold_math():
    assert seq_dot([1.0, 2.0], [3.0, 4.0]) == 11.0
    assert abs(seq_cos([1.0, 0.0], [1.0, 0.0]) - 1.0) < 1e-12
    assert abs(seq_cos([1.0, 0.0], [0.0, 1.0])) < 1e-12


def test_lsh_topk_local_matches_spark(store, probe):
    """Warm pyarrow probe == Spark-served probe, value-identical
    (same buckets; the dim-major sequential fold reproduces the
    engine's F.aggregate fold bit-exactly before the 6dp rounding)."""
    idx = store.open_lsh("lsh")
    got = idx.topk_local(probe, k=10)
    want = idx.topk(probe, k=10).toPandas()
    assert got.values.tolist() == want.values.tolist()


def test_ivf_topk_local_matches_spark(store, probe):
    idx = store.open_ivf("ivf")
    got = idx.topk_local(probe, k=10, n_probe=4)
    want = idx.topk(probe, k=10, n_probe=4).toPandas()
    assert got.values.tolist() == want.values.tolist()


def _files_bytes(store, name):
    import os

    tdir = store.catalog.table_dir(name)
    out = {}
    for e in store.catalog.manifest(name)["files"]:
        p = e["path"]
        full = p if os.path.isabs(p) else os.path.join(tdir, p)
        out[p] = os.path.getsize(full)
    return out


def test_lsh_append_matches_full_build(spark, vecs, probe, tmp_path):
    st = AnnIndexStore(spark, str(tmp_path / "ann_app"))
    first = vecs.filter(vecs.vec_id % 2 == 0)
    rest = vecs.filter(vecs.vec_id % 2 == 1)
    st.build_lsh("lsh", first, n_partitions=4)
    before = _files_bytes(st, "lsh")
    idx = st.append_lsh("lsh", rest, n_partitions=4)
    after = _files_bytes(st, "lsh")
    # committed files byte-untouched; new files appended
    assert all(after[p] == sz for p, sz in before.items())
    assert len(after) > len(before)
    # results identical to a from-scratch build over the union
    st.build_lsh("lsh_full", vecs, n_partitions=4)
    want = st.open_lsh("lsh_full").topk(probe, k=10).collect()
    got = idx.topk(probe, k=10).collect()
    assert [(r["vec_id"], r["cos"]) for r in got] == [
        (r["vec_id"], r["cos"]) for r in want
    ]
    # warm tier sees the appended run too
    warm = idx.topk_local(probe, k=10)
    assert [(r["vec_id"], r["cos"]) for r in got] == [
        tuple(row) for row in warm.values.tolist()
    ]


def test_ivf_append_assigns_to_committed_centroids(spark, vecs, probe, tmp_path):
    st = AnnIndexStore(spark, str(tmp_path / "ann_app2"))
    first = vecs.filter(vecs.vec_id % 2 == 0)
    rest = vecs.filter(vecs.vec_id % 2 == 1)
    st.build_ivf("ivf", first, n_partitions=4)
    cents_before = st.open_ivf("ivf").centroids()
    before = _files_bytes(st, "ivf")
    idx = st.append_ivf("ivf", rest, n_partitions=4)
    assert idx.centroids() == cents_before  # geometry stable
    after = _files_bytes(st, "ivf")
    assert all(after[p] == sz for p, sz in before.items())
    assert len(after) > len(before)
    # every vector is findable: union of cells covers all ids
    n_total = vecs.count()
    assert st.catalog.read("ivf").count() == n_total
    # probe results equal an exhaustive same-centroid reference: assign
    # ALL vectors to the committed centroids and rank the probe cells
    from antidb_spark.operators.similarity import ivf_assign
    from pyspark.sql import functions as F

    cells = idx.probe_cells(probe, n_probe=4)
    ref = ivf_assign(vecs, [c for _, c in cents_before])
    ref_ids = {
        r["vec_id"]
        for r in ref.filter(F.col("cell").isin(cells)).collect()
    }
    got = idx.topk(probe, k=10, n_probe=4).collect()
    assert all(r["vec_id"] in ref_ids for r in got)
    warm = idx.topk_local(probe, k=10, n_probe=4)
    assert [(r["vec_id"], r["cos"]) for r in got] == [
        tuple(row) for row in warm.values.tolist()
    ]


def test_ann_recall_entry_matches_set_intersection(spark):
    """The ann_recall entry's (k, n_hits, recall) must equal the plain
    set intersection of its two component queries, and recall of the
    exact list against itself is 1.0 (metric sanity)."""
    import __spark_entry__ as ent

    sf = "/root/testdata/sf0.001"
    a = {r["vec_id"] for r in ent._q_ann_lsh_topk(spark, sf).collect()}
    e = {r["vec_id"] for r in ent._q_ann_cosine_topk(spark, sf).collect()}
    row = ent._q_ann_recall(spark, sf).collect()[0]
    assert row["k"] == 10
    assert row["n_hits"] == len(a & e)
    assert row["recall"] == len(a & e) / 10.0
    assert 0.0 <= row["recall"] <= 1.0
    # identity recall: exact ∩ exact == k
    assert len(e) == 10
