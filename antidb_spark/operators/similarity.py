"""Similarity search over embedding columns (array<float>).

Three tiers, all over the driver's ``embeddings`` table
(vec_id, embedding: array<float>, label):

- ``cosine_topk`` — brute-force exact top-k for a probe vector. The
  dot product is a JVM-side ``F.zip_with``+``F.aggregate`` (codegen, no
  Python); the top-k is TakeOrderedAndProject. This is the baseline and
  the oracle-checkable path: a full scan that parallelizes perfectly
  (no shuffle at all before the final top-k).
- ``hyperplane_lsh_topk`` — random-hyperplane LSH bucketing: vectors are
  signed against H seeded hyperplanes → sign bitmask bucket; the query
  probes only its own bucket (+ optional multiprobe neighbors at
  Hamming distance 1). The scale path: candidate set ≈ N / 2^H.
- ``ivf_topk`` — IVF-style coarse quantization: seeded sample of
  vectors as centroids, each vector assigned to its nearest centroid
  (one broadcast of C centroids, map-only), query probes the top
  ``n_probe`` centroids. Candidate set ≈ N · n_probe / C.

Both approximate tiers return exact cosine scores for their candidates,
so recall (vs ``cosine_topk``) is the only approximation — pinned by
tests, not by the DuckDB oracle (probabilistic ops get rows-only
checks; SURVEY §2.6 gap analysis).

Embedding near-dup (the dedup tie-in): ``cosine_dup_pairs`` finds pairs
with cosine ≥ threshold via the same LSH buckets, verified exactly.
"""

from __future__ import annotations

from collections.abc import Sequence

import numpy as np
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    """Σ aᵢ·bᵢ as a codegen'd expression (no UDF)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def l2norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (l2norm(a) * l2norm(b))


def _probe_lit(probe: Sequence[float]) -> Column:
    return F.array(*[F.lit(float(v)) for v in probe])


def cosine_topk(
    vectors: DataFrame,
    probe: Sequence[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact brute-force top-k by cosine: (id, cos) rounded 6dp,
    ties broken by id ascending."""
    p = _probe_lit(probe)
    return (
        vectors.select(
            F.col(id_col), F.round(cosine(F.col(vec_col), p), 6).alias("cos")
        )
        .orderBy(F.desc("cos"), F.asc(id_col))
        .limit(k)
    )


# --- random-hyperplane LSH ----------------------------------------------


def _hyperplanes(dim: int, n_planes: int, seed: int) -> np.ndarray:
    rng = np.random.default_rng(seed)
    return rng.standard_normal((n_planes, dim))


def _bucket_col(vec: Column, planes: np.ndarray) -> Column:
    """Sign-bitmask bucket id from ``n_planes`` dot-product signs —
    still pure column math (one fixed-size literal array per plane)."""
    bits = [
        F.when(dot(vec, _probe_lit(p)) >= 0, F.lit(1 << i)).otherwise(F.lit(0))
        for i, p in enumerate(planes)
    ]
    out = bits[0]
    for b in bits[1:]:
        out = out + b
    return out.cast("long")


def hyperplane_lsh_topk(
    vectors: DataFrame,
    probe: Sequence[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int = 8,
    n_tables: int = 4,
    seed: int = 42,
    multiprobe: bool = True,
) -> DataFrame:
    """Approximate top-k: score only vectors sharing an LSH bucket with
    the probe in ANY of ``n_tables`` independent hash tables (plus
    Hamming-1 neighbor buckets per table when ``multiprobe``). Recall
    follows 1-(1-p^H)^L; 4 tables × 8 planes ≈ 0.7 top-10 recall on the
    driver's embeddings at ~14% of vectors scored."""
    pv = np.asarray(probe, dtype=np.float64)
    table_filter = None
    for t in range(n_tables):
        planes = _hyperplanes(len(probe), n_planes, seed + 1000 * t)
        pbucket = int(sum(1 << i for i, pl in enumerate(planes) if pl @ pv >= 0))
        buckets = [pbucket]
        if multiprobe:
            buckets += [pbucket ^ (1 << i) for i in range(n_planes)]
        cond = _bucket_col(F.col(vec_col), planes).isin(
            [int(b) for b in buckets]
        )
        table_filter = cond if table_filter is None else (table_filter | cond)
    cand = vectors.filter(table_filter)
    return cosine_topk(cand, probe, k, id_col, vec_col)


def cosine_dup_pairs(
    vectors: DataFrame,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int = 8,
    n_tables: int = 2,
    seed: int = 42,
) -> DataFrame:
    """Embedding near-dup pairs: LSH-bucket candidates from
    ``n_tables`` INDEPENDENT hash tables of ``n_planes`` hyperplanes
    each, verified by exact cosine ≥ threshold. Output (id_a, id_b,
    cos) rounded 6dp, each pair once.

    Sizing at scale (the parameters are the scale knobs, not fixed
    magic): expected bucket occupancy is N / 2^n_planes per table, so
    pick ``n_planes ≈ log2(N / B)`` for a target per-bucket candidate
    set B (e.g. 10^10 vectors with B=10^4 → 20 planes); per-table
    recall for a pair at cosine θ is (1 - acos(θ)/π)^n_planes, and
    ``n_tables`` tables recover 1-(1-p)^L of it (0.95-cosine pairs at
    20 planes: p≈0.51, L=4 → 0.94). The shuffle key is (table, bucket)
    — candidate generation never goes all-pairs.
    """
    dim = vectors.select(F.size(vec_col)).first()[0]
    bucket_cols = [
        _bucket_col(F.col(vec_col), _hyperplanes(dim, n_planes, seed + 1000 * t))
        .alias(f"_b{t}")
        for t in range(n_tables)
    ]
    bucketed = vectors.select(
        F.col(id_col).alias("_id"), F.col(vec_col).alias("_v"), *bucket_cols
    )
    # one row per (table, bucket) membership → equi-join on the composite
    # (table, bucket) key: hash-partitioned, no OR-join, no all-pairs
    exploded = bucketed.select(
        "_id",
        F.explode(
            F.array(*[
                F.struct(F.lit(t).alias("t"), F.col(f"_b{t}").alias("b"))
                for t in range(n_tables)
            ])
        ).alias("tb"),
    ).select("_id", "tb.t", "tb.b")
    cand = (
        exploded.alias("x")
        .join(
            exploded.alias("y"),
            (F.col("x.t") == F.col("y.t"))
            & (F.col("x.b") == F.col("y.b"))
            & (F.col("x._id") < F.col("y._id")),
        )
        .select(F.col("x._id").alias("id_a"), F.col("y._id").alias("id_b"))
        .distinct()
    )
    vecs = bucketed.select("_id", "_v")
    return (
        cand.join(vecs.withColumnsRenamed({"_id": "id_a", "_v": "va"}), "id_a")
        .join(vecs.withColumnsRenamed({"_id": "id_b", "_v": "vb"}), "id_b")
        .select(
            "id_a",
            "id_b",
            F.round(cosine(F.col("va"), F.col("vb")), 6).alias("cos"),
        )
        .filter(F.col("cos") >= threshold)
    )


# --- IVF ----------------------------------------------------------------


def ivf_assign(
    vectors: DataFrame,
    centroids: np.ndarray,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, embedding, cell): nearest-centroid assignment — the
    centroid matrix rides a Spark BROADCAST into an Arrow-batched
    argmax-cosine kernel (functions/veccarrier.cos_assign), so the
    pass stays map-only/zero-shuffle with O(1) plan size at any C·dim
    (literal centroid expressions grew the plan by k·dim doubles — at
    production IVF shapes, 10⁴ cells × 10³ dims, that's 10⁷ literals).
    The kernel replays the F.aggregate left-fold association order
    component-by-component, so every cosine double — and therefore
    every assignment and the DuckDB oracle hash — is bit-identical to
    the literal-expression carrier it replaces; ties still break to
    the smallest cell (numpy argmax = first maximum)."""
    from antidb_spark.functions.veccarrier import cos_assign

    v = F.col(vec_col)
    cell_of = cos_assign(vectors.sparkSession, np.asarray(centroids))
    return vectors.select(
        F.col(id_col), v.alias(vec_col), cell_of(v).alias("cell")
    )


def sample_centroids(
    vectors: DataFrame, n_cells: int, vec_col: str = "embedding",
    id_col: str = "vec_id", seed: int = 42,
) -> np.ndarray:
    """Deterministic centroid pick: the n_cells lowest-md5(id·seed)
    vectors AMONG the ~1/16 slice whose md5 starts with '0' — the hash
    filter bounds the TakeOrdered input so no corpus-wide ordered scan
    ever carries full vectors. The underfilled-slice fallback (only
    reachable when the corpus is within a small factor of n_cells —
    P[slice < n_cells] is negligible once N ≳ 64·n_cells) is capped the
    same way: it TakeOrders the NARROW (hash, id) projection corpus-wide
    and fetches only the n_cells winners' vectors via a broadcast
    semi-join, so full vectors never ride an ordered exchange on either
    path. Stable across partitioning, and reproducible in ANSI SQL
    (md5 of id || seed)."""
    h = F.md5(F.concat(F.col(id_col).cast("string"), F.lit(str(seed))))
    rows = (
        vectors.filter(F.substring(h, 1, 1) == "0")
        .select(id_col, vec_col)
        .orderBy(h, F.col(id_col))
        .limit(n_cells)
        .collect()
    )
    if len(rows) < n_cells:
        ids = [
            r[0]
            for r in vectors.select(id_col)
            .orderBy(h, F.col(id_col))
            .limit(n_cells)
            .collect()
        ]
        picked = vectors.filter(F.col(id_col).isin(ids)) \
            .select(id_col, vec_col).collect()
        by_id = {r[0]: r for r in picked}
        rows = [by_id[i] for i in ids]
    return np.array([r[vec_col] for r in rows], dtype=np.float64)


def ivf_topk(
    vectors: DataFrame,
    probe: Sequence[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_cells: int = 16,
    n_probe: int = 4,
    seed: int = 42,
) -> DataFrame:
    """IVF approximate top-k: score only vectors in the ``n_probe``
    cells whose centroids are most cosine-similar to the probe."""
    from antidb_spark.operators.ann import seq_cos

    cents = sample_centroids(vectors, n_cells, vec_col, id_col, seed)
    # sequential-fold cosine (not numpy BLAS): same association order as
    # the Spark aggregate fold / DuckDB list_sum, so all engines pick
    # the same probe cells; ties → lower cell
    sims = sorted(
        ((c, seq_cos(v, probe)) for c, v in enumerate(cents)),
        key=lambda cv: (-cv[1], cv[0]),
    )
    probe_cells = [c for c, _ in sims[:n_probe]]
    assigned = ivf_assign(vectors, cents, id_col, vec_col)
    cand = assigned.filter(F.col("cell").isin(probe_cells))
    return cosine_topk(cand, probe, k, id_col, vec_col)
