"""Distributed k-means over embedding columns — the topic-clustering /
domain-mixing primitive of a training-data pipeline (cluster the corpus,
then sample per cluster to rebalance domains).

Cross-engine exactness is the design constraint (the driver hash-checks
results against a DuckDB re-computation), and floating-point k-means is
order-sensitive in exactly the places Spark is non-deterministic
(per-cell component sums accumulate in shuffle order). The standard fix
is applied here: **quantize once, then do all accumulation in exact
integer arithmetic**.

- Quantize: ``q_i = floor(v_i · scale)`` as int64 (``floor`` avoids
  round-half ties; float→double widening and the double multiply are
  IEEE-identical across engines).
- Distance: squared L2 over int64 components — exact in any order.
- Update: per-(cell, component) int64 sums (map-side combinable,
  order-free) then one ``floor(sum / count)`` double division per
  component. Exact while ``|sum| < 2^53`` — with unit-norm-ish
  embeddings that bound is ~9e9 members per cell at scale=1e6; shard
  the mean or lower ``scale`` beyond that.
- Init: the ``k`` vectors smallest by ``md5(cast(id as string))`` (the
  repo's deterministic-sample idiom, similarity.py sample_centroids) —
  a seedless pseudo-random draw both engines reproduce.
- Ties: nearest-centroid ties break to the smallest cell id via a
  lexicographic ``min(struct(dist, cell))`` — a map-combinable aggregate,
  NOT a per-vector window sort.

Scale shape per iteration: centroids broadcast into a ZERO-SHUFFLE
Arrow-batched argmin kernel (functions/veccarrier.py — plan size O(1)
at any k·dim, never Catalyst literals), then one map-combinable sum
keyed by (cell, component) — k·dim rows collected to the driver
(bounded: centroids are driver-sized by definition, exactly like IVF's
committed centroid table, ann.py:166-205). ``iters+1`` passes over the
source — cache upstream if it is not a cheap columnar scan.

Reference analog: the reference has no clustering; this extends the
pipeline axis the way `similarity.py`/`ann.py` do (README's ANN app,
from_readme_ann.py:16-109, stops at retrieval).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SCALE = 1_000_000


def _quantized(
    vectors: DataFrame, id_col: str, vec_col: str, scale: int
) -> DataFrame:
    return vectors.select(
        id_col,
        F.transform(
            vec_col,
            lambda x: F.floor(x.cast("double") * F.lit(float(scale))),
        ).alias("qv"),
    )


def _assign(q: DataFrame, cents: list[list[int]]) -> DataFrame:
    """(id, qv) → (id, cell) by exact int64 squared-L2 argmin, ties to
    the smallest cell. Centroids ride a broadcast into an Arrow-batched
    numpy kernel (functions/veccarrier.py): ZERO shuffle (the previous
    crossJoin+groupBy carrier re-shuffled all N rows per Lloyd round)
    and O(1) plan size at any k·dim. int64 math is order-free, so cell
    labels are bit-identical to the relational carrier."""
    from antidb_spark.functions.veccarrier import assign_min_cell

    id_col = q.columns[0]
    cell_of = assign_min_cell(q.sparkSession, cents)
    return q.select(id_col, cell_of(F.col("qv")).alias("cell"))


def _cdf(spark, cents: list[list[int]]) -> DataFrame:
    return spark.createDataFrame(
        [(i, c) for i, c in enumerate(cents)],
        "cell int, cv array<long>",
    )


def lloyd_centroids(
    q: DataFrame, id_col: str, k: int, iters: int
) -> list[list[int]]:
    """The Lloyd core over an already-quantized ``(id_col, qv:
    array<long>)`` relation: md5-ranked init, ``iters`` assign/update
    rounds, empty cells keeping their previous centroid. Returns the
    final centroids (cell i = i-th by (md5(id), id)). Shared by
    `kmeans_assign` (full vectors) and `pq.build_pq` (per-subspace
    slices — the product-quantization codebooks)."""
    if k < 1 or iters < 0:
        raise ValueError("k >= 1 and iters >= 0 required")
    init = (
        q.withColumn("h", F.md5(F.col(id_col).cast("string")))
        .orderBy("h", id_col)
        .limit(k)
        .select("qv")
        .collect()
    )
    if len(init) < k:
        raise ValueError(f"k={k} exceeds the {len(init)} input vectors")
    cents = [list(r.qv) for r in init]
    for _ in range(iters):
        a = _assign(q, cents)
        sums = (
            a.join(q, id_col)
            .select("cell", F.posexplode("qv").alias("idx", "v"))
            .groupBy("cell", "idx")
            .agg(F.sum("v").alias("s"), F.count(F.lit(1)).alias("cnt"))
            .collect()  # bounded: k·dim rows (the centroid relation)
        )
        by_cell: dict[int, list] = {}
        for r in sums:
            by_cell.setdefault(r.cell, []).append((r.idx, r.s, r.cnt))
        for cell, comps in by_cell.items():
            comps.sort()
            # floor over an exact-int double division — deterministic
            cents[cell] = [
                int(math.floor(s / cnt)) for _, s, cnt in comps
            ]
    return cents


def kmeans_assign(
    vectors: DataFrame,
    k: int = 10,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    scale: int = SCALE,
) -> DataFrame:
    """Lloyd k-means over ``vectors(id_col, vec_col: array<float>)``:
    ``iters`` assign/update rounds from the md5-ranked deterministic
    init, then the final assignment against the last centroids.
    Returns (id_col, cluster int) — every input vector labeled. A cell
    that loses all members keeps its previous centroid (the standard
    empty-cluster rule). Exact integer arithmetic end-to-end (module
    docstring), so any SQL engine unrolling the same rounds reproduces
    every label bit-for-bit."""
    q = _quantized(vectors, id_col, vec_col, scale)
    cents = lloyd_centroids(q, id_col, k, iters)
    return (
        _assign(q, cents)
        .select(id_col, F.col("cell").alias("cluster"))
        .orderBy(id_col)
    )


def cluster_sizes(assigned: DataFrame) -> DataFrame:
    """(cluster, n_vecs) rollup of a ``kmeans_assign`` result —
    the domain-mix report."""
    return (
        assigned.groupBy("cluster")
        .agg(F.count(F.lit(1)).alias("n_vecs"))
        .orderBy("cluster")
    )
