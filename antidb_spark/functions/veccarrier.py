"""Broadcast-carrier kernels for the vector family (PQ / k-means / IVF).

Catalyst-literal codebooks are fine at test sizes, but at production PQ
shape (m=64, k=256, dsub=16 → ~260k literal ints) the generated plan
blows past JVM 64 KB codegen method limits and every query pays the
plan-serialization cost of the whole codebook (round-4 verdict). The
scale-correct carrier is a Spark broadcast of the numpy array evaluated
inside an Arrow-batched ``pandas_udf``: plan size is O(1) regardless of
codebook shape, the array ships to each executor once (TorrentBroadcast),
and the kernel is vectorized numpy — never per-row Python.

The MATH is carried over unchanged, so every oracle hash is preserved:

- the quantized family (PQ codes, ADC scores, k-means cells) is exact
  int64 — results are independent of evaluation order by construction;
- the float cosine path (`cos_assign`) replays the exact association
  order of the Spark ``F.aggregate`` left-fold (acc = ((0 + x₀c₀) + x₁c₁)
  + …) component-by-component across the batch, so every double is
  IEEE-identical to the literal-expression evaluation it replaces.

Overflow bound for the expansion form ``|x−c|² = |x|² + |c|² − 2x·c``:
quantized components are ≤ scale·max|v| (≈2²⁰ for unit-ish embeddings at
scale=1e6), so x·c ≤ dim·2⁴⁰ ≈ 2⁵⁰ ≪ 2⁶³ — exact in int64, and equal to
the direct Σ(x−c)² the oracle computes.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import SparkSession
from pyspark.sql import functions as F


def _stack_int64(s: pd.Series) -> np.ndarray:
    return np.stack(s.to_numpy()).astype(np.int64, copy=False)


def int_sqdist_matrix(X: np.ndarray, C: np.ndarray) -> np.ndarray:
    """(n, dim) × (k, dim) int64 → (n, k) exact squared L2. The
    expansion form keeps peak memory at (n, k) instead of (n, k, dim);
    algebraically identical to Σ(x−c)² and exact in int64 (module
    docstring bound)."""
    xx = np.einsum("nd,nd->n", X, X)
    cc = np.einsum("kd,kd->k", C, C)
    return xx[:, None] + cc[None, :] - 2 * (X @ C.T)


def assign_min_cell(spark: SparkSession, cents: list[list[int]]):
    """Column fn: ``qv: array<long>`` → nearest-centroid cell (int),
    ties to the smallest cell (numpy argmin returns the first minimum —
    the same rule as ``min(struct(dist, cell))`` / ``array_position``)."""
    bc = spark.sparkContext.broadcast(np.asarray(cents, dtype=np.int64))

    @F.pandas_udf("int")
    def cell_of(qv: pd.Series) -> pd.Series:
        if len(qv) == 0:
            return pd.Series([], dtype="int32")
        d = int_sqdist_matrix(_stack_int64(qv), bc.value)
        return pd.Series(d.argmin(axis=1).astype(np.int32))

    return cell_of


def pq_encode(spark: SparkSession, books: list[list[list[int]]]):
    """Column fn: ``qv: array<long>`` → all-subspace PQ codes
    (array<int>, length m). ``books[j][c]`` is subspace j's codeword c;
    per-subspace argmin ties to the smallest code."""
    B = np.asarray(books, dtype=np.int64)  # (m, k, dsub)
    m, _k, dsub = B.shape
    bc = spark.sparkContext.broadcast(B)

    @F.pandas_udf("array<int>")
    def codes_of(qv: pd.Series) -> pd.Series:
        if len(qv) == 0:
            return pd.Series([], dtype="object")
        Bv = bc.value
        X = _stack_int64(qv)
        n = X.shape[0]
        Xs = X.reshape(n, m, dsub)
        out = np.empty((n, m), dtype=np.int32)
        for j in range(m):
            out[:, j] = int_sqdist_matrix(Xs[:, j, :], Bv[j]).argmin(axis=1)
        return pd.Series(list(out))

    return codes_of


def adc_score(spark: SparkSession, tables: list[list[int]]):
    """Column fn: ``codes: array<int>`` → ADC distance (long): the sum
    of the probe's precomputed per-subspace distance-table entries —
    exact int64, identical to the element_at-literal sum it replaces."""
    T = np.asarray(tables, dtype=np.int64)  # (m, k)
    m = T.shape[0]
    bc = spark.sparkContext.broadcast(T)

    @F.pandas_udf("long")
    def score_of(codes: pd.Series) -> pd.Series:
        if len(codes) == 0:
            return pd.Series([], dtype="int64")
        Cd = np.stack(codes.to_numpy()).astype(np.int64, copy=False)
        qd = bc.value[np.arange(m)[None, :], Cd].sum(axis=1)
        return pd.Series(qd)

    return score_of


def cos_assign(spark: SparkSession, centroids: np.ndarray):
    """Column fn: ``v: array<float>`` → argmax-cosine cell (int), ties
    to the smallest cell (argmax returns the first maximum — the
    ``array_position(scores, array_max(scores))`` rule).

    Float path: every accumulation replays the Spark ``F.aggregate``
    left-fold order per component (acc = acc + xᵢ·cᵢ after the
    float→double cast), then cos = dot / (√Σxᵢ² · √Σcᵢ²) — each double
    op IEEE-identical to the literal-centroid expressions this
    replaces, so assignments (and the oracle hash) are bit-equal."""
    C = np.asarray(centroids, dtype=np.float64)  # (k, dim)
    k, dim = C.shape
    bc = spark.sparkContext.broadcast(C)

    @F.pandas_udf("int")
    def cell_of(v: pd.Series) -> pd.Series:
        if len(v) == 0:
            return pd.Series([], dtype="int32")
        Cv = bc.value
        X = np.stack(v.to_numpy()).astype(np.float64)
        n = X.shape[0]
        dots = np.zeros((n, k))
        xn = np.zeros(n)
        for i in range(dim):  # left-fold per component: order-preserving
            dots += X[:, i:i + 1] * Cv[None, :, i]
            xn += X[:, i] * X[:, i]
        cn = np.zeros(k)
        for i in range(dim):
            cn += Cv[:, i] * Cv[:, i]
        scores = dots / (np.sqrt(xn)[:, None] * np.sqrt(cn)[None, :])
        return pd.Series(scores.argmax(axis=1).astype(np.int32))

    return cell_of
