"""Sketch family: HLL / Count-Min / Bloom.

Three pins per sketch: (1) the Spark registers/counters/bits equal an
independent pure-Python hashlib re-derivation (hash-definition pin),
(2) the sketch's accuracy invariant holds (HLL error small, CMS never
underestimates, Bloom never false-negative), (3) the DuckDB oracle twin
produces the identical relation (cross-engine pin — the same property
the driver gate checks, but unit-scoped so drift is caught at the
function that moved)."""

from __future__ import annotations

import hashlib

import duckdb
import pytest
from pyspark.sql import functions as F

from antidb_spark.operators.sketches import (
    BLOOM_BITS,
    BLOOM_K,
    CMS_WIDTH,
    HLL_M,
    HLL_MAX_RHO,
    HLL_P,
    bloom_bits,
    bloom_check,
    cms_estimate,
    cms_sketch,
    hll_estimate,
    hll_registers,
    sql_h48,
    sql_hll_rho,
)


def _py_h48(value: str, salt: str) -> int:
    return int(hashlib.md5(f"{salt}:{value}".encode()).hexdigest()[:12], 16)


def _py_hll_registers(values, salt="hll1"):
    regs: dict[int, int] = {}
    for v in values:
        h = _py_h48(v, salt)
        bucket, w = h % HLL_M, h >> HLL_P
        rho = HLL_MAX_RHO if w == 0 else HLL_MAX_RHO - w.bit_length()
        regs[bucket] = max(regs.get(bucket, 0), rho)
    return regs


@pytest.fixture(scope="module")
def words(spark):
    # 5000 distinct values, each appearing 1-3 times (duplicates must not
    # move any register)
    rows = [(f"w{i:05d}",) for i in range(5000) for _ in range(1 + i % 3)]
    return spark.createDataFrame(rows, ["term"])


def test_hll_registers_match_python(spark, words):
    got = {r["bucket"]: r["rho"] for r in hll_registers(words).collect()}
    want = _py_hll_registers([f"w{i:05d}" for i in range(5000)])
    assert got == want


def test_hll_registers_match_duckdb(spark, words):
    pdf = words.toPandas()
    con = duckdb.connect()
    con.register("t", pdf)
    h = sql_h48("term", "hll1")
    oracle = con.sql(
        f"SELECT ({h}) % {HLL_M} AS bucket,"
        f" max({sql_hll_rho(f'({h}) >> {HLL_P}')}) AS rho"
        " FROM t GROUP BY 1"
    ).fetchall()
    got = {r["bucket"]: r["rho"] for r in hll_registers(words).collect()}
    assert got == dict(oracle)


def test_hll_estimate_accuracy_and_shape(spark, words):
    row = hll_estimate(words).collect()[0]
    assert row["exact_distinct"] == 5000
    # raw HLL with m=256: relative std error ~1.04/sqrt(256) = 6.5%
    assert abs(row["rel_err"]) < 0.2
    assert row["n_registers"] <= HLL_M
    assert abs(row["est_distinct"] / 5000 - 1 - row["rel_err"]) < 1e-3


def test_cms_never_underestimates(spark, words):
    sk = cms_sketch(words)
    assert sk.count() <= 4 * CMS_WIDTH
    assert sk.agg(F.max("cell")).collect()[0][0] < CMS_WIDTH
    probes = spark.createDataFrame(
        [(f"w{i:05d}",) for i in range(0, 5000, 500)] + [("absent",)],
        ["term"],
    )
    est = {r["term"]: r["est"] for r in cms_estimate(sk, probes).collect()}
    exact = {
        r["term"]: r["n"]
        for r in words.groupBy("term").agg(F.count("*").alias("n")).collect()
    }
    for t, e in est.items():
        assert e >= exact.get(t, 0)
    # the absent probe's estimate is bounded by collision mass, not huge
    assert est["absent"] <= max(exact.values()) * 4


def test_bloom_no_false_negatives(spark, words):
    bits = bloom_bits(words)
    n_bits = bits.count()
    assert n_bits <= min(BLOOM_BITS, 5000 * BLOOM_K)
    present = [f"w{i:05d}" for i in range(0, 5000, 250)]
    absent = [f"zz{i}" for i in range(20)]
    probes = spark.createDataFrame([(t,) for t in present + absent], ["term"])
    got = {r["term"]: r["bloom_hit"] for r in bloom_check(bits, probes).collect()}
    assert all(got[t] for t in present)  # NEVER a false negative
    # at 5000 keys * 3 hashes in 16384 bits the fill is ~60%; a false
    # positive needs all 3 bits set (~22%) — all 20 absent probes hitting
    # would be astronomically unlikely
    assert sum(got[t] for t in absent) < len(absent)


def test_bloom_bits_match_duckdb(spark, words):
    pdf = words.toPandas()
    con = duckdb.connect()
    con.register("t", pdf)
    hashes = ", ".join(
        f"({sql_h48('term', f'blm{i}')}) % {BLOOM_BITS}" for i in range(BLOOM_K)
    )
    oracle = {
        r[0]
        for r in con.sql(
            f"SELECT DISTINCT b.bit FROM t, unnest([{hashes}]) AS b(bit)"
        ).fetchall()
    }
    got = {r["bit"] for r in bloom_bits(words).collect()}
    assert got == oracle


def test_hll_registers_merge_associatively(spark, words):
    """The docstring's scale claim: registers over shards, merged by
    elementwise max, equal the whole-corpus registers — i.e. the sketch
    is a proper commutative monoid and partial aggregation is lossless."""
    from pyspark.sql import functions as F

    whole = {r["bucket"]: r["rho"] for r in hll_registers(words).collect()}
    shard_a = words.filter(F.crc32(F.col("term")) % 2 == 0)
    shard_b = words.filter(F.crc32(F.col("term")) % 2 == 1)
    merged = {
        r["bucket"]: r["rho"]
        for r in (
            hll_registers(shard_a)
            .unionByName(hll_registers(shard_b))
            .groupBy("bucket")
            .agg(F.max("rho").alias("rho"))
        ).collect()
    }
    assert merged == whole
