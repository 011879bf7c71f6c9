"""Fixed-state probabilistic sketches: HyperLogLog, Count-Min, Bloom.

The reference engine keeps exact global state (its whole index is a
sorted key list, idx.py:141-160); at 100 TB the aggregates that matter —
"how many distinct terms", "roughly how often does this term occur",
"could this term possibly be in that segment" — must instead run in
BOUNDED state. Every sketch here is a map-combinable aggregate whose
final relation has a fixed, data-independent size:

- HyperLogLog registers: 2^p rows (p=8 → 256) no matter how many input
  rows; merge = elementwise max, so Spark's partial aggregation collapses
  each partition to ≤256 rows before the one shuffle.
- Count-Min: a d×w counter grid (4×1024 = 4096 cells); merge = cellwise
  sum, again partial-aggregated map-side.
- Bloom: ≤ nbits distinct set-bit rows; merge = set union (distinct).
  The bits relation is small enough to BROADCAST, which is the point:
  a bloom built over one table's join keys pre-filters the other side's
  scan without shuffling either.

Cross-engine determinism (the oracle contract): all hash arithmetic is
md5-derived 48-bit integers via the same engine-portable trick as
``datasets.split_bucket`` — Spark ``conv(substr(md5(x),1,12),16,10)``,
DuckDB ``('0x' || substr(md5(x),1,12))::BIGINT`` — and the HLL
rank (leading-zero count) is derived from ``length(bin(w))``, a pure
integer/string operation both engines define identically. The HLL
estimate stays exact across engines because every addend 2^-rho is a
dyadic rational with exponent ≥ -(HLL_MAX_RHO) and the 256-term sum
needs ≤ 50 significand bits — the double sum is EXACT in any order.
No libm transcendentals anywhere (the classic linear-counting
correction needs ln(), which is not bit-reproducible across engines,
so this module exposes the RAW HLL estimator and documents that choice).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

HLL_P = 8
HLL_M = 1 << HLL_P  # 256 registers
# 40 value bits after the bucket byte; rho ∈ [1, 41]
HLL_VALUE_BITS = 48 - HLL_P
HLL_MAX_RHO = HLL_VALUE_BITS + 1
# alpha_m for m=256: 0.7213 / (1 + 1.079/m). Embedded as a literal so the
# DuckDB oracle can spell the identical double.
HLL_ALPHA = 0.7213 / (1.0 + 1.079 / 256.0)

CMS_DEPTH = 4
CMS_WIDTH = 1024

BLOOM_BITS = 16384
BLOOM_K = 3


def h48(col: Column | str, salt: str) -> Column:
    """48-bit salted md5 hash as a non-negative long (Spark side of the
    shared portable hash; DuckDB twin:
    ``('0x' || substr(md5('<salt>:' || x), 1, 12))::BIGINT``)."""
    c = F.col(col) if isinstance(col, str) else col
    h = F.md5(F.concat(F.lit(salt + ":"), c.cast("string")))
    return F.conv(F.substring(h, 1, 12), 16, 10).cast("long")


# --------------------------------------------------------------------------
# HyperLogLog
# --------------------------------------------------------------------------

def hll_rho(w: Column) -> Column:
    """Leading-zero rank of a HLL_VALUE_BITS-bit value: position of the
    highest set bit counted from the top, i.e. (bits - bitlength(w)) + 1,
    with the all-zeros word mapping to bits+1. ``length(bin(w))`` is the
    integer bit length in both engines (bin() prints no leading zeros)."""
    return (
        F.when(w == 0, F.lit(HLL_MAX_RHO))
        .otherwise(F.lit(HLL_MAX_RHO) - F.length(F.bin(w)))
        .cast("int")
    )


def hll_registers(
    df: DataFrame, col: str = "term", salt: str = "hll1"
) -> DataFrame:
    """(bucket, rho): the 2^p HyperLogLog registers of ``col``'s value
    stream. Duplicates need no pre-distinct — max() absorbs them — so
    this is ONE map-combinable aggregate over the raw stream: each
    partition reduces to ≤ HLL_M rows before the single exchange, and the
    result is ≤ HLL_M rows regardless of input size. That bounded-state
    merge (elementwise max) is exactly what lets the same plan aggregate
    10^12 rows on 1000 executors."""
    h = h48(col, salt)
    bucket = (h % HLL_M).alias("bucket")
    w = F.shiftright(h, HLL_P)
    return (
        df.select(bucket, hll_rho(w).alias("r"))
        .groupBy("bucket")
        .agg(F.max("r").alias("rho"))
    )


def hll_estimate(
    df: DataFrame, col: str = "term", salt: str = "hll1"
) -> DataFrame:
    """One row (n_registers, est_distinct, exact_distinct, rel_err): the
    RAW HLL estimator alpha_m * m^2 / sum_j 2^-rho_j (absent buckets
    contribute 2^0), side by side with the exact distinct count so the
    sketch's accuracy is part of the checked contract. 2^-rho is computed
    as 1.0 / (1 << rho) — integer shift then division by a power of two,
    both exact — and the 256-term sum is exactly representable (see
    module docstring), so the estimate is bit-identical across engines.

    exact_distinct is the one full-width aggregate here; it exists to
    GRADE the sketch at test scale, not to ship in the 100 TB plan
    (there the registers stand alone)."""
    regs = hll_registers(df, col, salt)
    agg = regs.agg(
        F.count(F.lit(1)).alias("n_present"),
        # 2^-rho as 1.0 / (1L << rho): integer shift then division by a
        # power of two — exact; SQL form because the Python shiftleft
        # binding only takes literal shift amounts
        F.sum(
            F.expr("1.0 / cast(shiftleft(cast(1 as bigint), rho) as double)")
        ).alias("s_present"),
    )
    exact = df.agg(F.countDistinct(col).alias("exact_distinct"))
    est = F.lit(HLL_ALPHA * HLL_M * HLL_M) / (
        F.lit(float(HLL_M)) - F.col("n_present") + F.col("s_present")
    )
    return (
        agg.crossJoin(exact)  # two single-row relations
        .select(
            F.col("n_present").alias("n_registers"),
            F.round(est, 4).alias("est_distinct"),
            F.col("exact_distinct"),
            F.round(
                (est - F.col("exact_distinct")) / F.col("exact_distinct"), 4
            ).alias("rel_err"),
        )
    )


# --------------------------------------------------------------------------
# Count-Min
# --------------------------------------------------------------------------

def _cms_cell(col: Column | str, i: int, salt: str) -> Column:
    return h48(col, f"{salt}{i}") % CMS_WIDTH


def cms_sketch(
    df: DataFrame, col: str = "term", weight: Column | None = None,
    salt: str = "cms", depth: int = CMS_DEPTH,
) -> DataFrame:
    """(row, cell, cnt): the d×w Count-Min counter grid over ``col``'s
    occurrence stream (optionally ``weight``-weighted, e.g. tf). One
    explode (×d) and one map-combinable sum: every partition collapses to
    ≤ d·w cells before the single exchange, so the shuffle and the result
    are both O(d·w) — 4096 rows — at any corpus size."""
    w = F.lit(1).cast("long") if weight is None else weight.cast("long")
    pairs = F.array(*[
        F.struct(
            F.lit(i).alias("row"), _cms_cell(col, i, salt).alias("cell")
        )
        for i in range(depth)
    ])
    return (
        df.select(F.explode(pairs).alias("p"), w.alias("w"))
        .groupBy(F.col("p.row").alias("row"), F.col("p.cell").alias("cell"))
        .agg(F.sum("w").alias("cnt"))
    )


def cms_estimate(
    sketch: DataFrame, probes: DataFrame, col: str = "term",
    salt: str = "cms", depth: int = CMS_DEPTH,
) -> DataFrame:
    """(term, est): point-frequency upper bounds — min over the d cells a
    probe hashes to. The ≤4096-row sketch BROADCASTS into the probe
    side's |probes|·d (row, cell) pairs; missing cells read as 0.
    CMS never underestimates, so est ≥ true count is a checkable
    invariant (pinned in tests and in the driver entry, which emits the
    exact count beside the estimate)."""
    cells = probes.select(
        F.col(col),
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(i).alias("row"),
                    _cms_cell(col, i, salt).alias("cell"),
                )
                for i in range(depth)
            ])
        ).alias("p"),
    ).select(col, F.col("p.row").alias("row"), F.col("p.cell").alias("cell"))
    # the d×w sketch is the broadcast side (a LEFT outer join can only
    # build/broadcast its right side); it is ≤4096 rows by construction
    joined = cells.join(F.broadcast(sketch), ["row", "cell"], "left")
    return (
        joined.groupBy(col)
        .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0).cast("long"))).alias("est"))
    )


# --------------------------------------------------------------------------
# Bloom
# --------------------------------------------------------------------------

def _bloom_positions(col: Column | str, salt: str, k: int) -> list[Column]:
    return [h48(col, f"{salt}{i}") % BLOOM_BITS for i in range(k)]


def bloom_bits(
    df: DataFrame, col: str = "term", salt: str = "blm", k: int = BLOOM_K,
) -> DataFrame:
    """(bit,): the distinct set-bit positions of a k-hash Bloom filter
    over ``col``. ≤ BLOOM_BITS rows by construction — small enough to
    broadcast — built by one map-combinable distinct (partial dedup per
    partition caps every shuffle write at BLOOM_BITS rows). At scale this
    is the join pre-filter: build over the small side's keys once,
    broadcast, and drop non-members before the big side ever shuffles."""
    pos = F.array(*_bloom_positions(col, salt, k))
    return df.select(F.explode(pos).alias("bit")).distinct()


def bloom_check(
    bits: DataFrame, probes: DataFrame, col: str = "term",
    salt: str = "blm", k: int = BLOOM_K,
) -> DataFrame:
    """(term, bloom_hit): membership verdicts — hit iff ALL k probe bits
    are set. Probe side explodes to |probes|·k rows; the ≤BLOOM_BITS-row
    bits relation broadcasts in; no false negatives is the pinned
    invariant."""
    cells = probes.select(
        F.col(col),
        F.posexplode(F.array(*_bloom_positions(col, salt, k))).alias(
            "i", "bit"
        ),
    )
    # bits (≤BLOOM_BITS rows) is the broadcast side — a LEFT outer join
    # can only build/broadcast its right side
    joined = cells.join(
        F.broadcast(bits.withColumn("_set", F.lit(1))), ["bit"], "left"
    )
    return joined.groupBy(col).agg(
        (F.min(F.coalesce(F.col("_set"), F.lit(0))) == 1).alias("bloom_hit")
    )


# --------------------------------------------------------------------------
# Shared DuckDB oracle fragments (kept beside the Spark definitions so a
# hash change can never drift one side silently)
# --------------------------------------------------------------------------

def sql_h48(expr: str, salt: str) -> str:
    """DuckDB twin of ``h48``."""
    return f"('0x' || substr(md5('{salt}:' || {expr}), 1, 12))::BIGINT"


def sql_hll_rho(w_expr: str) -> str:
    """DuckDB twin of ``hll_rho``."""
    return (
        f"(CASE WHEN {w_expr} = 0 THEN {HLL_MAX_RHO} "
        f"ELSE {HLL_MAX_RHO} - length(bin({w_expr})) END)::INT"
    )
