"""Broadcast-carrier kernels (functions/veccarrier.py) vs the literal-
expression carrier they replaced (round-4 verdict item: production PQ
shapes blow JVM codegen limits as Catalyst literals).

The contract is BIT-EQUALITY: moving the codebook/centroid constants
from plan literals to a broadcast numpy array must not change a single
assignment, code, or score — int64 math is order-free, and the float
cosine kernel replays the F.aggregate left-fold association order. Each
test re-derives the old literal-expression result inline and compares
exactly.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from antidb_spark.functions.veccarrier import (
    adc_score,
    assign_min_cell,
    cos_assign,
    int_sqdist_matrix,
    pq_encode,
)


def _sqdist_expr(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )


def _vecs(spark, n=120, dim=8, seed=7, scale=1000):
    rng = np.random.default_rng(seed)
    X = (rng.standard_normal((n, dim)) * scale).astype(np.int64)
    pdf = pd.DataFrame({"vec_id": range(n), "qv": list(X)})
    return spark.createDataFrame(pdf, "vec_id long, qv array<long>"), X


def test_int_sqdist_matrix_exact():
    rng = np.random.default_rng(0)
    X = rng.integers(-(10**6), 10**6, size=(50, 16)).astype(np.int64)
    C = rng.integers(-(10**6), 10**6, size=(9, 16)).astype(np.int64)
    direct = ((X[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
    assert (int_sqdist_matrix(X, C) == direct).all()


def test_assign_min_cell_matches_literal_argmin(spark):
    df, X = _vecs(spark)
    rng = np.random.default_rng(1)
    cents = rng.integers(-1000, 1000, size=(5, 8)).astype(np.int64)
    got = (
        df.select("vec_id", assign_min_cell(spark, cents.tolist())(
            F.col("qv")).alias("cell"))
        .orderBy("vec_id").toPandas()
    )
    # literal-expression carrier (the old _code_expr shape)
    cws = F.array(*[
        F.array(*[F.lit(int(x)).cast("long") for x in c]) for c in cents
    ])
    d = F.transform(cws, lambda cw: _sqdist_expr(F.col("qv"), cw))
    lit_cell = (F.array_position(d, F.array_min(d)) - 1).cast("int")
    ref = df.select("vec_id", lit_cell.alias("cell")) \
        .orderBy("vec_id").toPandas()
    pd.testing.assert_frame_equal(got, ref)


def test_pq_encode_matches_literal_and_adc_score(spark):
    df, X = _vecs(spark, dim=8)
    m, k, dsub = 4, 6, 2
    rng = np.random.default_rng(2)
    books = rng.integers(-1000, 1000, size=(m, k, dsub)).astype(np.int64)
    enc = pq_encode(spark, books.tolist())
    got = df.select("vec_id", enc(F.col("qv")).alias("codes")) \
        .orderBy("vec_id").toPandas()
    # literal carrier per subspace
    lit_codes = []
    for j in range(m):
        cws = F.array(*[
            F.array(*[F.lit(int(x)).cast("long") for x in cw])
            for cw in books[j]
        ])
        sl = F.slice("qv", j * dsub + 1, dsub)
        d = F.transform(cws, lambda cw: _sqdist_expr(sl, cw))
        lit_codes.append(
            (F.array_position(d, F.array_min(d)) - 1).cast("int"))
    ref = df.select("vec_id", F.array(*lit_codes).alias("codes")) \
        .orderBy("vec_id").toPandas()
    assert [list(c) for c in got.codes] == [list(c) for c in ref.codes]

    # ADC scoring: broadcast tables vs literal element_at sum
    tables = rng.integers(0, 10**6, size=(m, k)).astype(np.int64)
    cdf = df.select("vec_id", enc(F.col("qv")).alias("codes"))
    s_got = cdf.select(
        "vec_id", adc_score(spark, tables.tolist())(
            F.col("codes")).alias("qdist")
    ).orderBy("vec_id").toPandas()
    score = None
    for j in range(m):
        lit = F.array(*[F.lit(int(v)).cast("long") for v in tables[j]])
        term = F.element_at(lit, F.element_at("codes", j + 1) + 1)
        score = term if score is None else score + term
    s_ref = cdf.select("vec_id", score.alias("qdist")) \
        .orderBy("vec_id").toPandas()
    pd.testing.assert_frame_equal(s_got, s_ref)


def test_cos_assign_bit_identical_to_literal_cosine(spark):
    """The float path: the numpy left-fold kernel must reproduce the
    literal-centroid cosine argmax DOUBLE-for-double (not just close)."""
    from antidb_spark.operators.similarity import _probe_lit, cosine

    rng = np.random.default_rng(3)
    n, dim, k = 200, 16, 7
    X = rng.standard_normal((n, dim)).astype(np.float32)
    pdf = pd.DataFrame({"vec_id": range(n), "embedding": list(X)})
    df = spark.createDataFrame(pdf, "vec_id long, embedding array<float>")
    cents = rng.standard_normal((k, dim))
    got = df.select(
        "vec_id", cos_assign(spark, cents)(F.col("embedding")).alias("cell")
    ).orderBy("vec_id").toPandas()
    v = F.col("embedding")
    scores = F.array(*[cosine(v, _probe_lit(c)) for c in cents])
    lit = (F.array_position(scores, F.array_max(scores)) - 1).cast("int")
    ref = df.select("vec_id", lit.alias("cell")).orderBy("vec_id").toPandas()
    pd.testing.assert_frame_equal(got, ref)


def test_sample_centroids_underfill_boundary(spark):
    """When the md5 slice can't fill n_cells (tiny corpus), the capped
    fallback must return exactly the n_cells lowest-(md5, id) vectors —
    same semantics as the old corpus-wide ordered scan, without full
    vectors riding a TakeOrdered."""
    from antidb_spark.operators.similarity import sample_centroids

    n, dim, n_cells, seed = 20, 4, 8, 42
    rng = np.random.default_rng(4)
    X = rng.standard_normal((n, dim)).astype(np.float32)
    pdf = pd.DataFrame({"vec_id": range(n), "embedding": list(X)})
    df = spark.createDataFrame(pdf, "vec_id long, embedding array<float>")
    got = sample_centroids(df, n_cells, seed=seed)
    order = sorted(
        range(n),
        key=lambda i: (hashlib.md5(f"{i}{seed}".encode()).hexdigest(), i),
    )[:n_cells]
    want = np.array([X[i] for i in order], dtype=np.float64)
    assert np.array_equal(got, want)
    # sanity: the slice path (big enough corpus) still returns n_cells
    big = spark.createDataFrame(
        pd.DataFrame({
            "vec_id": range(600),
            "embedding": list(
                rng.standard_normal((600, dim)).astype(np.float32)),
        }),
        "vec_id long, embedding array<float>",
    )
    assert sample_centroids(big, n_cells, seed=seed).shape == (n_cells, dim)
