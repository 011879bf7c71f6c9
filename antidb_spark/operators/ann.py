"""Persisted ANN indexes: LSH bucket tables and IVF cell tables.

The in-memory tiers in ``operators/similarity.py`` recompute bucket/cell
membership per query over a FULL scan of the vectors — fine as reference
semantics, not an index. This module materializes the same structures
through the Catalog so a query touches only manifest-pruned files:

- **LSH** (``build_lsh``/``LshIndex``): each vector appears once per
  hash table under a combined sort key ``bkey = table * 2^n_planes +
  bucket`` (bucket = sign bitmask of seeded-hyperplane dot products).
  The table is range-partitioned and committed with min/max stats on
  ``bkey``; a probe reads only files overlapping its ~(1 + n_planes) ×
  n_tables probe keys → candidate set ≈ N · n_tables / 2^n_planes,
  independent of total file count.
- **IVF** (``build_ivf``/``IvfIndex``): a tiny committed centroids
  table (deterministic md5-sliced sample — no corpus-wide TakeOrdered)
  plus an assignment table keyed/stats'd by ``cell``; a probe reads the
  files of its top ``n_probe`` cells only.

Both return exact cosine scores over their candidates, so recall vs the
brute-force tier is the only approximation (pinned by tests); the
candidate-set definitions are deterministic expressions over md5 /
literal hyperplanes, which is what lets the driver's DuckDB oracle
reproduce them exactly (``__spark_entry__``).

Float discipline: every probe-side scalar (probe bucket signs, probe →
centroid similarities) is computed with a SEQUENTIAL left fold
(``seq_dot``) — the same association order as the Spark ``F.aggregate``
fold and DuckDB's ``list_sum`` — so all three engines rank identically.

Reference tie-in: same shape as the keyed index (SURVEY S7/Q2) — build
once into committed stats-pruned tables, reopen by name, query without
scanning the base.
"""

from __future__ import annotations

import math
from collections.abc import Sequence

import numpy as np
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from antidb_spark.operators.similarity import (
    _bucket_col,
    _hyperplanes,
    cosine_topk,
)
from antidb_spark.sources.catalog import Catalog


def seq_dot(a: Sequence[float], b: Sequence[float]) -> float:
    """Left-fold dot product: 0.0 + a0*b0 + a1*b1 + … — bit-identical to
    the Spark aggregate fold and DuckDB list_sum over the same values."""
    acc = 0.0
    for x, y in zip(a, b):
        acc = acc + float(x) * float(y)
    return acc


def seq_cos(a: Sequence[float], b: Sequence[float]) -> float:
    return seq_dot(a, b) / (
        math.sqrt(seq_dot(a, a)) * math.sqrt(seq_dot(b, b))
    )


class AnnIndexStore:
    """Named persisted ANN indexes rooted at one Catalog directory."""

    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.catalog = Catalog(spark, root)

    # -- LSH --------------------------------------------------------------

    def build_lsh(
        self,
        name: str,
        vectors: DataFrame,
        id_col: str = "vec_id",
        vec_col: str = "embedding",
        n_planes: int = 8,
        n_tables: int = 4,
        seed: int = 42,
        n_partitions: int | None = None,
    ) -> "LshIndex":
        dim = vectors.select(F.size(vec_col)).first()[0]
        rows = []
        for t in range(n_tables):
            planes = _hyperplanes(dim, n_planes, seed + 1000 * t)
            bkey = (
                F.lit(t * (1 << n_planes))
                + _bucket_col(F.col(vec_col), planes)
            ).cast("long")
            rows.append(
                vectors.select(
                    bkey.alias("bkey"), F.col(id_col), F.col(vec_col)
                )
            )
        all_rows = rows[0]
        for r in rows[1:]:
            all_rows = all_rows.unionByName(r)
        n_part = n_partitions or self.spark.sparkContext.defaultParallelism
        sorted_df = all_rows.repartitionByRange(
            n_part, "bkey", id_col
        ).sortWithinPartitions("bkey", id_col)
        self.catalog.write(
            sorted_df,
            name,
            stats_cols=["bkey"],
            props={
                "kind": "lsh",
                "id_col": id_col,
                "vec_col": vec_col,
                "n_planes": n_planes,
                "n_tables": n_tables,
                "seed": seed,
                "dim": int(dim),
            },
        )
        return self.open_lsh(name)

    def open_lsh(self, name: str) -> "LshIndex":
        return LshIndex(self.spark, self.catalog, name)

    def append_lsh(
        self, name: str, vectors: DataFrame,
        n_partitions: int | None = None,
    ) -> "LshIndex":
        """O(delta) vector append to a committed LSH index: new rows
        bucket under the SAME committed hyperplane family (seed/planes
        from the manifest props — never resampled, so old and new rows
        share one bucket geometry) and land as fresh ``bkey``-stats'd
        files; committed files stay byte-untouched and probes prune
        across both runs through the same per-file manifest stats.
        Contract (as ``upsert.append_run``): incoming ids must be NEW."""
        idx = self.open_lsh(name)
        rows = []
        for t in range(idx.n_tables):
            planes = _hyperplanes(idx.dim, idx.n_planes,
                                  idx.seed + 1000 * t)
            bkey = (
                F.lit(t * (1 << idx.n_planes))
                + _bucket_col(F.col(idx.vec_col), planes)
            ).cast("long")
            rows.append(
                vectors.select(
                    bkey.alias("bkey"), F.col(idx.id_col),
                    F.col(idx.vec_col),
                )
            )
        all_rows = rows[0]
        for r in rows[1:]:
            all_rows = all_rows.unionByName(r)
        n_part = n_partitions or self.spark.sparkContext.defaultParallelism
        sorted_df = all_rows.repartitionByRange(
            n_part, "bkey", idx.id_col
        ).sortWithinPartitions("bkey", idx.id_col)
        self.catalog.write(sorted_df, name, stats_cols=["bkey"],
                           mode="append")
        return self.open_lsh(name)

    # -- IVF --------------------------------------------------------------

    def build_ivf(
        self,
        name: str,
        vectors: DataFrame,
        id_col: str = "vec_id",
        vec_col: str = "embedding",
        n_cells: int = 16,
        seed: int = 42,
        n_partitions: int | None = None,
    ) -> "IvfIndex":
        from antidb_spark.operators.similarity import ivf_assign, sample_centroids

        cents = sample_centroids(vectors, n_cells, vec_col, id_col, seed)
        cent_rows = [
            (i, [float(v) for v in c]) for i, c in enumerate(cents)
        ]
        cent_df = self.spark.createDataFrame(
            cent_rows, f"cell int, centroid array<double>"
        )
        self.catalog.write(cent_df.coalesce(1), f"{name}_centroids")
        assigned = ivf_assign(vectors, cents, id_col, vec_col)
        n_part = n_partitions or self.spark.sparkContext.defaultParallelism
        sorted_df = assigned.select(
            "cell", F.col(id_col), F.col(vec_col)
        ).repartitionByRange(n_part, "cell", id_col).sortWithinPartitions(
            "cell", id_col
        )
        self.catalog.write(
            sorted_df,
            name,
            stats_cols=["cell"],
            props={
                "kind": "ivf",
                "id_col": id_col,
                "vec_col": vec_col,
                "n_cells": n_cells,
                "seed": seed,
            },
        )
        return self.open_ivf(name)

    def open_ivf(self, name: str) -> "IvfIndex":
        return IvfIndex(self.spark, self.catalog, name)

    def append_ivf(
        self, name: str, vectors: DataFrame,
        n_partitions: int | None = None,
    ) -> "IvfIndex":
        """O(delta) vector append to a committed IVF index: new rows
        assign to the COMMITTED centroids (read from the tiny centroids
        table — never re-estimated, so cell geometry is stable) and
        append as fresh ``cell``-stats'd files. Re-clustering after
        heavy drift is a rebuild, the documented maintenance split
        (same as the text index's append-vs-optimize contract)."""
        from antidb_spark.operators.similarity import ivf_assign

        idx = self.open_ivf(name)
        cents = [c for _, c in idx.centroids()]
        assigned = ivf_assign(vectors, cents, idx.id_col, idx.vec_col)
        n_part = n_partitions or self.spark.sparkContext.defaultParallelism
        sorted_df = assigned.select(
            "cell", F.col(idx.id_col), F.col(idx.vec_col)
        ).repartitionByRange(n_part, "cell", idx.id_col).sortWithinPartitions(
            "cell", idx.id_col
        )
        self.catalog.write(sorted_df, name, stats_cols=["cell"],
                           mode="append")
        return self.open_ivf(name)


class LshIndex:
    def __init__(self, spark: SparkSession, catalog: Catalog, name: str):
        self.spark = spark
        self.catalog = catalog
        self.name = name
        p = catalog.manifest(name)["props"]
        self.id_col, self.vec_col = p["id_col"], p["vec_col"]
        self.n_planes, self.n_tables = p["n_planes"], p["n_tables"]
        self.seed, self.dim = p["seed"], p["dim"]

    def probe_keys(self, probe: Sequence[float], multiprobe: bool = True) -> list[int]:
        """bkeys of the probe's bucket per table (+ Hamming-1 neighbor
        buckets when multiprobe) — pure driver-side math."""
        keys = []
        for t in range(self.n_tables):
            planes = _hyperplanes(self.dim, self.n_planes, self.seed + 1000 * t)
            pb = sum(
                1 << i
                for i, pl in enumerate(planes)
                if seq_dot(pl, probe) >= 0
            )
            buckets = [pb]
            if multiprobe:
                buckets += [pb ^ (1 << i) for i in range(self.n_planes)]
            base = t * (1 << self.n_planes)
            keys += [base + b for b in buckets]
        return sorted(set(keys))

    def topk(
        self, probe: Sequence[float], k: int = 10, multiprobe: bool = True
    ) -> DataFrame:
        keys = self.probe_keys(probe, multiprobe)
        cand = (
            self.catalog.read_pruned(self.name, "bkey", values=keys)
            .filter(F.col("bkey").isin(keys))
            .dropDuplicates([self.id_col])  # a vector can hit several tables
        )
        return cosine_topk(cand, probe, k, self.id_col, self.vec_col)

    def topk_local(
        self, probe: Sequence[float], k: int = 10, multiprobe: bool = True
    ) -> "pd.DataFrame":
        """Warm interactive probe, NO Spark job: manifest-pruned pyarrow
        read of the probe's bucket rows + driver numpy cosine. Value-
        identical to ``topk`` (same buckets, ``_local_cosine_topk``'s
        sequential per-dimension fold reproduces the engine fold
        bit-exactly before the shared 6dp rounding)."""
        keys = self.probe_keys(probe, multiprobe)
        pdf = self.catalog.read_pruned_arrow(
            self.name, "bkey", values=keys,
            columns=["bkey", self.id_col, self.vec_col],
        ).to_pandas()
        pdf = pdf[pdf["bkey"].isin(set(keys))].drop_duplicates(
            subset=[self.id_col]
        )
        return _local_cosine_topk(pdf, probe, k, self.id_col, self.vec_col)


class IvfIndex:
    def __init__(self, spark: SparkSession, catalog: Catalog, name: str):
        self.spark = spark
        self.catalog = catalog
        self.name = name
        p = catalog.manifest(name)["props"]
        self.id_col, self.vec_col = p["id_col"], p["vec_col"]
        self.n_cells = p["n_cells"]

    def centroids(self) -> list[tuple[int, list[float]]]:
        t = self.catalog.read_arrow(f"{self.name}_centroids")
        pairs = sorted(
            zip(t.column("cell").to_pylist(), t.column("centroid").to_pylist())
        )
        return [(c, v) for c, v in pairs]

    def probe_cells(self, probe: Sequence[float], n_probe: int = 4) -> list[int]:
        """Top-n_probe cells by centroid↔probe cosine (sequential-fold
        math; ties → lower cell), driver-side from the tiny committed
        centroids table."""
        sims = [(c, seq_cos(v, probe)) for c, v in self.centroids()]
        sims.sort(key=lambda cv: (-cv[1], cv[0]))
        return [c for c, _ in sims[:n_probe]]

    def topk(
        self, probe: Sequence[float], k: int = 10, n_probe: int = 4
    ) -> DataFrame:
        cells = self.probe_cells(probe, n_probe)
        cand = self.catalog.read_pruned(self.name, "cell", values=cells).filter(
            F.col("cell").isin(cells)
        )
        return cosine_topk(cand, probe, k, self.id_col, self.vec_col)

    def topk_local(
        self, probe: Sequence[float], k: int = 10, n_probe: int = 4
    ) -> "pd.DataFrame":
        """Warm interactive probe, NO Spark job (see LshIndex.topk_local)."""
        cells = self.probe_cells(probe, n_probe)
        pdf = self.catalog.read_pruned_arrow(
            self.name, "cell", values=cells,
            columns=["cell", self.id_col, self.vec_col],
        ).to_pandas()
        pdf = pdf[pdf["cell"].isin(set(cells))]
        return _local_cosine_topk(pdf, probe, k, self.id_col, self.vec_col)


def _local_cosine_topk(
    pdf: "pd.DataFrame", probe: Sequence[float], k: int,
    id_col: str, vec_col: str,
) -> "pd.DataFrame":
    """Driver cosine top-k over candidate rows → (id, cos) pandas frame.

    The dot products and norms accumulate per DIMENSION left-to-right
    (one vectorized pass across candidates per dimension), i.e. the
    SAME sequential fold order as the engine/oracle expressions
    (``F.aggregate`` / DuckDB ``list_sum``) — bit-identical doubles
    before the shared 6dp rounding, so warm == Spark-served exactly,
    not just almost-always."""
    import numpy as np
    import pandas as pd

    if not len(pdf):
        return pd.DataFrame({id_col: pd.Series([], dtype="int64"),
                             "cos": pd.Series([], dtype="float64")})
    mat = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
    p = np.asarray(probe, dtype=np.float64)
    n = mat.shape[0]
    dot = np.zeros(n)
    nrm = np.zeros(n)
    pn = 0.0
    for i in range(mat.shape[1]):  # dim-major: the sequential fold
        col = mat[:, i]
        dot += col * p[i]
        nrm += col * col
        pn += p[i] * p[i]
    cos = np.round(dot / (np.sqrt(nrm) * np.sqrt(pn)), 6)
    out = pd.DataFrame({id_col: pdf[id_col].to_numpy(), "cos": cos})
    return (
        out.sort_values(["cos", id_col], ascending=[False, True])
        .head(k)
        .reset_index(drop=True)
    )
