"""Product quantization (operators/pq.py): the ADC invariants, the
warm tier, reopen-by-name, and partitioning determinism. The full
pipeline (per-subspace Lloyd codebooks → codes → ADC ranking) is
hash-pinned against the DuckDB oracle by the driver's `pq_topk`
entry; these tests pin the operator-level contracts."""

from __future__ import annotations

import numpy as np
import pytest

from antidb_spark.operators.pq import build_pq, open_pq

DIM = 16


def _vectors(spark, X: np.ndarray, ids=None):
    ids = ids if ids is not None else range(len(X))
    rows = [(int(i), [float(v) for v in x.astype(np.float32)])
            for i, x in zip(ids, X)]
    return spark.createDataFrame(
        rows, "vec_id bigint, embedding array<float>"
    )


@pytest.fixture(scope="module")
def built(spark, tmp_path_factory):
    rng = np.random.RandomState(23)
    X = rng.uniform(-0.5, 0.5, size=(80, DIM)).astype(np.float32)
    X[64] = X[0]  # exact duplicate of the probe vector
    df = _vectors(spark, X)
    root = str(tmp_path_factory.mktemp("pqidx"))
    idx = build_pq(spark, root, "pq", df, m=4, k=8, iters=2)
    return idx, X, root


def test_pq_duplicate_attains_minimum(built):
    """An exact duplicate of the probe gets the probe's own per-slice
    argmin codewords, hence the MINIMUM possible ADC distance — both
    copies must head the ranking (id-asc tie)."""
    idx, X, _ = built
    probe = [float(v) for v in X[0]]
    top = idx.topk(probe, k=5).toPandas()
    assert top["vec_id"].tolist()[:2] == [0, 64]
    assert top["qdist"].iloc[0] == top["qdist"].iloc[1]
    assert (top["qdist"].iloc[2:] >= top["qdist"].iloc[0]).all()


def test_pq_local_matches_spark(built):
    idx, X, _ = built
    for pid in (0, 7, 33):
        probe = [float(v) for v in X[pid]]
        spark_top = [
            (int(a), int(b))
            for a, b in idx.topk(probe, k=10).toPandas().values.tolist()
        ]
        assert idx.topk_local(probe, k=10) == spark_top


def test_pq_reopen_by_name(spark, built):
    idx, X, root = built
    probe = [float(v) for v in X[3]]
    re = open_pq(spark, root, "pq")
    assert re.topk_local(probe, k=10) == idx.topk_local(probe, k=10)


def test_pq_partitioning_invariant(spark, tmp_path):
    """Committed codes (and therefore every ranking) are independent
    of the input's physical partitioning."""
    rng = np.random.RandomState(31)
    X = rng.uniform(-0.5, 0.5, size=(50, DIM)).astype(np.float32)
    a = build_pq(spark, str(tmp_path / "a"), "pq",
                 _vectors(spark, X), m=4, k=8, iters=1)
    b = build_pq(spark, str(tmp_path / "b"), "pq",
                 _vectors(spark, X).repartition(11), m=4, k=8, iters=1)
    ca = a.catalog.read("pq").orderBy("vec_id").toPandas()
    cb = b.catalog.read("pq").orderBy("vec_id").toPandas()
    assert ca["codes"].apply(list).tolist() == \
        cb["codes"].apply(list).tolist()


def test_pq_validates_subspaces(spark):
    rng = np.random.RandomState(5)
    X = rng.uniform(-0.5, 0.5, size=(10, DIM)).astype(np.float32)
    df = _vectors(spark, X)
    with pytest.raises(ValueError, match="divisible"):
        build_pq(spark, "/tmp/never", "pq", df, m=5)


def test_pq_codes_are_narrow(built):
    """The committed codes relation is (id, m small ints) — the
    compression that makes the 100 TB ADC scan feasible."""
    idx, _, _ = built
    codes = idx.catalog.read("pq")
    assert codes.columns == ["vec_id", "codes"]
    row = codes.first()
    assert len(row["codes"]) == 4
    assert all(0 <= c < 8 for c in row["codes"])


# ---------------------------------------------------------------- IVF-PQ


@pytest.fixture(scope="module")
def built_ivfpq(spark, tmp_path_factory):
    from antidb_spark.operators.pq import build_ivfpq

    rng = np.random.RandomState(41)
    X = rng.uniform(-0.5, 0.5, size=(80, DIM)).astype(np.float32)
    X[64] = X[0]  # exact duplicate of the probe vector
    df = _vectors(spark, X)
    root = str(tmp_path_factory.mktemp("ivfpq"))
    idx = build_ivfpq(spark, root, "ivfpq", df, n_cells=4,
                      coarse_iters=1, m=4, k=8, iters=1)
    return idx, X, root


def test_ivfpq_duplicate_heads_ranking(built_ivfpq):
    """An exact duplicate shares the probe's coarse cell AND its
    residual codes, so both copies head the probed-cell ranking with
    equal minimal ADC distance."""
    idx, X, _ = built_ivfpq
    probe = [float(v) for v in X[0]]
    top = idx.topk(probe, k=5, n_probe=1).toPandas()
    assert top["vec_id"].tolist()[:2] == [0, 64]
    assert top["qdist"].iloc[0] == top["qdist"].iloc[1]


def test_ivfpq_local_matches_spark(built_ivfpq):
    idx, X, _ = built_ivfpq
    for pid, np_ in ((0, 1), (9, 2), (33, 4)):
        probe = [float(v) for v in X[pid]]
        spark_top = [
            (int(a), int(b))
            for a, b in idx.topk(probe, k=10, n_probe=np_)
            .toPandas().values.tolist()
        ]
        assert idx.topk_local(probe, k=10, n_probe=np_) == spark_top


def test_ivfpq_probe_reads_only_probed_cells(built_ivfpq):
    """n_probe=1 results come exclusively from the probe's nearest
    coarse cell (the IVF pruning contract)."""
    idx, X, _ = built_ivfpq
    probe = [float(v) for v in X[7]]
    cells = idx.probe_cells(probe, 1)
    got = idx.topk(probe, k=50, n_probe=1).toPandas()
    member = idx.catalog.read("ivfpq").toPandas()
    cell_of = dict(zip(member["vec_id"], member["cell"]))
    assert all(cell_of[v] == cells[0] for v in got["vec_id"])
    # widening n_probe can only ADD candidates
    wide = idx.topk(probe, k=50, n_probe=4).toPandas()
    assert len(wide) >= len(got)


def test_ivfpq_reopen_by_name(spark, built_ivfpq):
    from antidb_spark.operators.pq import open_ivfpq

    idx, X, root = built_ivfpq
    probe = [float(v) for v in X[5]]
    re = open_ivfpq(spark, root, "ivfpq")
    assert re.topk_local(probe, k=10, n_probe=2) == \
        idx.topk_local(probe, k=10, n_probe=2)


# ------------------------------------------------------- O(delta) appends


def _files_bytes(catalog, name):
    import os

    tdir = catalog.table_dir(name)
    out = {}
    for e in catalog.manifest(name)["files"]:
        p = e["path"]
        full = p if os.path.isabs(p) else os.path.join(tdir, p)
        out[p] = os.path.getsize(full)
    return out


def test_pq_append_under_committed_codebooks(spark, tmp_path):
    """Appended vectors encode under the COMMITTED codebooks (never
    retrained): committed files stay byte-untouched, appended codes
    equal a from-scratch encode of the union under the same books,
    and both probe tiers see the delta."""
    from antidb_spark.operators.pq import append_pq, build_pq

    rng = np.random.RandomState(53)
    X = rng.uniform(-0.5, 0.5, size=(60, DIM)).astype(np.float32)
    first = _vectors(spark, X[:40], ids=range(40))
    rest = _vectors(spark, X[40:], ids=range(40, 60))
    idx = build_pq(spark, str(tmp_path / "pq"), "pq", first,
                   m=4, k=8, iters=1)
    books_before = idx.books
    before = _files_bytes(idx.catalog, "pq")
    idx2 = append_pq(idx, rest)
    after = _files_bytes(idx2.catalog, "pq")
    assert all(after[p] == sz for p, sz in before.items())
    assert len(after) > len(before)
    assert idx2.books == books_before  # never retrained
    # probe: an appended vector's own duplicate-minimum invariant
    probe = [float(v) for v in X[47]]
    top = idx2.topk(probe, k=3).toPandas()
    assert top["vec_id"].iloc[0] == 47
    assert idx2.topk_local(probe, k=3) == [
        (int(a), int(b)) for a, b in top.values.tolist()
    ]
    # codes of the delta == argmin under the committed books
    got = {
        int(r["vec_id"]): list(r["codes"])
        for r in idx2.catalog.read("pq").collect()
        if r["vec_id"] >= 40
    }
    import math

    q = np.floor(X[40:].astype(np.float64) * 1_000_000).astype(np.int64)
    for i, qv in enumerate(q):
        want = []
        for j in range(4):
            sl = qv[j * 4:(j + 1) * 4]
            dists = [
                int(((sl - np.array(books_before[j][c])) ** 2).sum())
                for c in range(8)
            ]
            want.append(int(np.argmin(dists)))
        assert got[40 + i] == want, (i, math.nan)


def test_ivfpq_append_under_committed_geometry(spark, tmp_path):
    """IVF-PQ appends assign to the committed centroids and encode
    residuals under the committed codebooks; old files byte-untouched,
    probes prune across old + new files alike."""
    from antidb_spark.operators.pq import append_ivfpq, build_ivfpq

    rng = np.random.RandomState(59)
    X = rng.uniform(-0.5, 0.5, size=(60, DIM)).astype(np.float32)
    first = _vectors(spark, X[:40], ids=range(40))
    rest = _vectors(spark, X[40:], ids=range(40, 60))
    idx = build_ivfpq(spark, str(tmp_path / "ivfpq"), "ivfpq", first,
                      n_cells=3, coarse_iters=1, m=4, k=8, iters=1)
    cents_before = idx.centroids
    before = _files_bytes(idx.catalog, "ivfpq")
    idx2 = append_ivfpq(idx, rest)
    after = _files_bytes(idx2.catalog, "ivfpq")
    assert all(after[p] == sz for p, sz in before.items())
    assert len(after) > len(before)
    assert idx2.centroids == cents_before
    probe = [float(v) for v in X[51]]
    top = idx2.topk(probe, k=3, n_probe=1).toPandas()
    assert top["vec_id"].iloc[0] == 51
    assert idx2.topk_local(probe, k=3, n_probe=1) == [
        (int(a), int(b)) for a, b in top.values.tolist()
    ]
    # pruning contract still holds over the multi-run table
    cells = idx2.probe_cells(probe, 1)
    member = idx2.catalog.read("ivfpq").toPandas()
    cell_of = dict(zip(member["vec_id"], member["cell"]))
    got50 = idx2.topk(probe, k=50, n_probe=1).toPandas()
    assert all(cell_of[v] == cells[0] for v in got50["vec_id"])


# ---------------------------------------------------------------- recall


def test_pq_refined_recovers_exact_topk(spark, tmp_path):
    """The deployed two-stage shape on clusterable data (the regime PQ
    exists for): the ADC shortlist captures the exact top-10 in full
    (shortlist-50 recall 1.0 on 10 tight clusters), and the exact-int
    refine then reproduces the TRUE quantized ranking verbatim. Raw
    ADC@10 alone sits ~0.6-0.7 here because near-identical cluster
    members share codes (ties break by id) — which is exactly why the
    refine stage exists."""
    from antidb_spark.operators.pq import build_pq

    rng = np.random.RandomState(61)
    centers = rng.uniform(-0.5, 0.5, size=(10, DIM))
    X = np.vstack([
        centers[i % 10] + rng.normal(0, 0.02, size=DIM)
        for i in range(200)
    ]).astype(np.float32)
    df = _vectors(spark, X)
    idx = build_pq(spark, str(tmp_path / "pqr"), "pq", df,
                   m=4, k=16, iters=3)
    q = np.floor(X.astype(np.float64) * 1_000_000).astype(np.int64)
    for pid in (0, 3, 7):
        probe = [float(v) for v in X[pid]]
        d = ((q - q[pid]) ** 2).sum(axis=1)
        order = np.lexsort((np.arange(len(d)), d))[:10]
        want = [(int(i), int(d[i])) for i in order]
        got = [
            (int(a), int(b))
            for a, b in idx.topk_refined(probe, df, k=10, shortlist=50)
            .toPandas().values.tolist()
        ]
        assert got == want


# ------------------------------------------------ streaming ingestion


def test_ivfpq_streaming_ingestion_exactly_once(spark, tmp_path):
    """Vector micro-batches stream into a committed IVF-PQ index via
    foreachBatch(append_ivfpq(batch_tag=...)): every streamed vector
    becomes probeable, committed files stay byte-untouched per append,
    and a re-delivered tag is a no-op (the exactly-once contract —
    the tag commits atomically with the files)."""
    from antidb_spark.operators.pq import append_ivfpq, build_ivfpq, open_ivfpq

    rng = np.random.RandomState(67)
    X = rng.uniform(-0.5, 0.5, size=(60, DIM)).astype(np.float32)
    base = _vectors(spark, X[:30], ids=range(30))
    root = str(tmp_path / "ivfpq_stream")
    build_ivfpq(spark, root, "ivfpq", base, n_cells=3,
                coarse_iters=1, m=4, k=8, iters=1)

    src = str(tmp_path / "vec_src")
    for i, lo in enumerate((30, 45)):
        _vectors(spark, X[lo:lo + 15], ids=range(lo, lo + 15)) \
            .coalesce(1).write.mode("append").parquet(src)
    stream = (
        spark.readStream
        .schema("vec_id bigint, embedding array<float>")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )

    def sink(df, bid):
        append_ivfpq(open_ivfpq(spark, root, "ivfpq"), df,
                     batch_tag=str(bid))

    q = (
        stream.writeStream.foreachBatch(sink)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    idx = open_ivfpq(spark, root, "ivfpq")
    assert idx.catalog.read("ivfpq").count() == 60
    tags = idx.catalog.manifest("ivfpq")["props"]["ingested"]
    assert len(tags) == len(set(tags)) >= 2
    # a streamed vector is probeable through both tiers
    probe = [float(v) for v in X[50]]
    top = idx.topk(probe, k=3, n_probe=3).toPandas()
    assert top["vec_id"].iloc[0] == 50
    assert idx.topk_local(probe, k=3, n_probe=3) == [
        (int(a), int(b)) for a, b in top.values.tolist()
    ]
    # re-delivering an already-committed tag is a byte-level no-op
    before = _files_bytes(idx.catalog, "ivfpq")
    again = append_ivfpq(idx, _vectors(spark, X[30:45], ids=range(30, 45)),
                         batch_tag=tags[0])
    assert _files_bytes(again.catalog, "ivfpq") == before
    assert again.catalog.read("ivfpq").count() == 60


def test_ivfpq_refined_matches_exact_over_shortlist(built_ivfpq, spark):
    """IVF-PQ two-stage refine: exact int64 re-rank of the cell-pruned
    ADC shortlist — within the probed cells' shortlist the refined
    top-k equals the true quantized ranking restricted to those ids."""
    idx, X, _ = built_ivfpq
    df = _vectors(spark, X)
    q = np.floor(X.astype(np.float64) * 1_000_000).astype(np.int64)
    for pid in (0, 9):
        probe = [float(v) for v in X[pid]]
        short = [v for v, _ in idx.topk_local(probe, k=20, n_probe=2)]
        d = ((q - q[pid]) ** 2).sum(axis=1)
        want = sorted(((int(d[i]), int(i)) for i in short))[:5]
        got = [
            (int(b), int(a))
            for a, b in idx.topk_refined(
                probe, df, k=5, shortlist=20, n_probe=2
            ).toPandas().values.tolist()
        ]
        assert got == want


def test_optimize_pq_restores_single_run(spark, tmp_path):
    """After several appends, optimize_pq rewrites the codes into one
    fresh sorted generation: fewer files, identical rankings (codes
    never recompute), codebooks/centroids/props preserved."""
    from antidb_spark.operators.pq import (
        append_ivfpq,
        build_ivfpq,
        open_ivfpq,
        optimize_pq,
    )

    rng = np.random.RandomState(71)
    X = rng.uniform(-0.5, 0.5, size=(60, DIM)).astype(np.float32)
    root = str(tmp_path / "opt")
    idx = build_ivfpq(spark, root, "ivfpq",
                      _vectors(spark, X[:30], ids=range(30)),
                      n_cells=3, coarse_iters=1, m=4, k=8, iters=1)
    for lo in (30, 40, 50):
        idx = append_ivfpq(
            idx, _vectors(spark, X[lo:lo + 10], ids=range(lo, lo + 10))
        )
    probe = [float(v) for v in X[44]]
    before_top = idx.topk_local(probe, k=10, n_probe=3)
    n_files_before = len(idx.catalog.manifest("ivfpq")["files"])
    opt = optimize_pq(idx)
    n_files_after = len(opt.catalog.manifest("ivfpq")["files"])
    assert n_files_after < n_files_before
    assert opt.topk_local(probe, k=10, n_probe=3) == before_top
    assert opt.topk(probe, k=10, n_probe=3).toPandas().values.tolist() \
        == [[a, b] for a, b in before_top]
    assert opt.centroids == idx.centroids and opt.books == idx.books
    assert opt.catalog.read("ivfpq").count() == 60
    # reopen-from-disk sees the optimized generation
    re = open_ivfpq(spark, root, "ivfpq")
    assert re.topk_local(probe, k=10, n_probe=3) == before_top
