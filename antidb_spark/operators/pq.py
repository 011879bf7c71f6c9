"""Product quantization (PQ) — the compressed-vector ANN tier for the
100 TB design point.

LSH/IVF (operators/ann.py) prune WHICH vectors a probe reads but still
store full float vectors; at 10^11 × 64-float scale the vectors
themselves are the storage/bandwidth wall. PQ is the standard answer
(the IVF-PQ architecture of large-scale ANN systems): split each vector
into ``m`` subspaces, train a tiny per-subspace codebook (k codewords),
and store each vector as ``m`` small codes — here 64 floats (256 B)
become 8 int8-range codes. A probe scans only the narrow codes table
and ranks by asymmetric distance (ADC): the probe stays exact, each
database vector is represented by its per-subspace codewords.

Cross-engine exactness, inherited from `operators/cluster.py`: vectors
quantize once to int64 (floor(v·1e6)); codebooks come from the SAME
exact-integer Lloyd core (`lloyd_centroids`) run per subspace slice;
code assignment is an int64 squared-L2 argmin (ties → smallest cell);
the ADC score is a SUM of int64 codeword distances. No float enters the
pipeline after quantization, so the driver's DuckDB oracle re-derives
codebooks, codes, AND rankings bit-for-bit, and results are independent
of partitioning/accumulation order.

Key invariant (pinned by tests): an exact duplicate of the probe
attains the MINIMUM possible ADC distance — the probe's own per-slice
codeword argmins — so planted duplicates always rank first.

Scale shape: training = m bounded Lloyd runs (broadcast centroids,
map-combinable argmin/sums — cluster.py docstring); code assignment is
ONE zero-shuffle projection (all m codebooks are literal arrays in the
plan, the argmin is array_position(array_min) over codegen'd int
expressions); the committed codes table is ``n × (id + m ints)`` —
~50× narrower than the vectors; a probe is a zero-join scan of that
table with the m distance TABLES (k·m ints, driver-computed from the
committed codebooks) embedded as literals, cut by TakeOrdered.

Reference tie-in: extends the ANN axis beyond the README app
(from_readme_ann.py:16-109) the same way ann.py does — build committed
artifacts once, reopen by name, query without the base table.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from antidb_spark.operators.cluster import SCALE, _quantized
from antidb_spark.sources.catalog import Catalog


def _sqdist_expr(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )


def _code_expr(slice_col, codebook: list[list[int]]):
    """argmin codeword index for one subspace, ties to the smallest
    index (array_position returns the FIRST match)."""
    cws = F.array(*[
        F.array(*[F.lit(int(x)).cast("long") for x in cw])
        for cw in codebook
    ])
    d = F.transform(cws, lambda cw: _sqdist_expr(slice_col, cw))
    return (F.array_position(d, F.array_min(d)) - 1).cast("int")


def _train_books(
    q: DataFrame, id_col: str, m: int, dsub: int, k: int, iters: int,
) -> list[list[list[int]]]:
    """All m subspace codebooks trained TOGETHER, one Spark job per
    Lloyd round (not per subspace): the init collects the k md5-ranked
    vectors once (every subspace's init centroids are slices of the
    same vectors — exactly what per-subspace `lloyd_centroids` would
    pick, since the ranking ignores the values); each round evaluates
    every subspace's argmin as literal-codebook expressions in ONE
    pass and folds all (subspace, cell, component) integer sums in ONE
    map-combinable aggregate (m·k·dsub driver rows). Identical math —
    and therefore bit-identical codebooks — to m independent runs; m×
    fewer jobs and m× fewer data passes."""
    import math

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
    books = [
        [list(r.qv[j * dsub:(j + 1) * dsub]) for r in init]
        for j in range(m)
    ]
    for _ in range(iters):
        entries = F.array(*[
            F.struct(
                F.lit(j).alias("j"),
                _code_expr(
                    F.slice("qv", j * dsub + 1, dsub), books[j]
                ).alias("cell"),
                F.slice("qv", j * dsub + 1, dsub).alias("sv"),
            )
            for j in range(m)
        ])
        sums = (
            q.select(F.explode(entries).alias("e"))
            .select("e.j", "e.cell", F.posexplode("e.sv").alias("idx", "v"))
            .groupBy("j", "cell", "idx")
            .agg(F.sum("v").alias("s"), F.count(F.lit(1)).alias("cnt"))
            .collect()  # bounded: m·k·dsub rows (the codebook relation)
        )
        by_jc: dict[tuple, list] = {}
        for r in sums:
            by_jc.setdefault((r.j, r.cell), []).append((r.idx, r.s, r.cnt))
        for (j, cell), comps in by_jc.items():
            comps.sort()
            books[j][cell] = [
                int(math.floor(s / cnt)) for _, s, cnt in comps
            ]
    return books


def build_pq(
    spark: SparkSession,
    root: str,
    name: str,
    vectors: DataFrame,
    m: int = 8,
    k: int = 16,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    scale: int = SCALE,
) -> "PqIndex":
    """Train per-subspace codebooks and commit the PQ artifacts:
    ``{name}_codebooks`` (subspace, cell, cv) and ``{name}`` (id,
    codes array<int>). ``dim`` must divide evenly into ``m``
    subspaces."""
    dim = int(vectors.select(F.size(vec_col)).first()[0])
    if dim % m != 0:
        raise ValueError(f"dim {dim} not divisible by m={m} subspaces")
    dsub = dim // m
    q = _quantized(vectors, id_col, vec_col, scale)
    books = _train_books(q, id_col, m, dsub, k, iters)
    catalog = Catalog(spark, root)
    cb_rows = [
        (j, c, cw)
        for j, book in enumerate(books)
        for c, cw in enumerate(book)
    ]
    catalog.write(
        spark.createDataFrame(
            cb_rows, "subspace int, cell int, cv array<long>"
        ).coalesce(1),
        f"{name}_codebooks",
    )
    codes = F.array(*[
        _code_expr(F.slice("qv", j * dsub + 1, dsub), books[j])
        for j in range(m)
    ])
    catalog.write(
        q.select(id_col, codes.alias("codes")),
        name,
        props={
            "kind": "pq", "id_col": id_col, "vec_col": vec_col,
            "m": m, "k": k, "dsub": dsub, "dim": dim, "scale": scale,
        },
    )
    return PqIndex(spark, catalog, name)


class PqIndex:
    """Reopen-by-name probe interface over the committed PQ tables."""

    def __init__(self, spark: SparkSession, catalog: Catalog, name: str):
        self.spark = spark
        self.catalog = catalog
        self.name = name
        p = catalog.manifest(name)["props"]
        self.id_col = p["id_col"]
        self.m, self.k = p["m"], p["k"]
        self.dsub, self.scale = p["dsub"], p["scale"]
        cb = catalog.read(f"{name}_codebooks").collect()
        self.books = {}
        for r in cb:
            self.books.setdefault(r.subspace, {})[r.cell] = list(r.cv)

    def _tables(self, probe: Sequence[float]) -> list[list[int]]:
        """ADC distance tables: table[j][c] = int64 squared L2 between
        the quantized probe's j-th slice and codeword c — exact driver
        integers, k·m values total."""
        import math

        qp = [int(math.floor(float(v) * float(self.scale))) for v in probe]
        tables = []
        for j in range(self.m):
            sl = qp[j * self.dsub:(j + 1) * self.dsub]
            book = self.books[j]
            tables.append([
                sum((a - b) * (a - b) for a, b in zip(sl, book[c]))
                for c in range(self.k)
            ])
        return tables

    def topk(self, probe: Sequence[float], k: int = 10) -> DataFrame:
        """(id, qdist) top-k by ascending ADC distance, ties id-asc —
        a zero-join scan of the codes table with the distance tables
        as literal arrays, cut by TakeOrdered."""
        tables = self._tables(probe)
        score = None
        for j, tbl in enumerate(tables):
            lit = F.array(*[F.lit(int(v)).cast("long") for v in tbl])
            term = F.element_at(lit, F.element_at("codes", j + 1) + 1)
            score = term if score is None else score + term
        return (
            self.catalog.read(self.name)
            .select(self.id_col, score.alias("qdist"))
            .orderBy(F.asc("qdist"), F.asc(self.id_col))
            .limit(k)
        )

    def topk_local(self, probe: Sequence[float], k: int = 10):
        """Warm tier, no Spark job: pyarrow read of the narrow codes
        table + numpy table lookup; value-identical to ``topk`` (all
        arithmetic is exact int64)."""
        import numpy as np

        tables = self._tables(probe)
        tbl = self.catalog.read_arrow(self.name)
        ids = tbl.column(self.id_col).to_numpy()
        codes = np.stack(tbl.column("codes").to_numpy(zero_copy_only=False))
        t = np.array(tables, dtype=np.int64)  # (m, k)
        qd = t[np.arange(self.m)[None, :], codes].sum(axis=1)
        order = np.lexsort((ids, qd))[:k]
        return [(int(ids[i]), int(qd[i])) for i in order]


def open_pq(spark: SparkSession, root: str, name: str) -> PqIndex:
    return PqIndex(spark, Catalog(spark, root), name)
