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
ONE zero-shuffle projection — all m codebooks ride a Spark BROADCAST
into an Arrow-batched numpy argmin kernel (functions/veccarrier.py),
so plan size is O(1) at any (m, k, dsub): production PQ shapes (m=64,
k=256 → ~260k codebook ints) would blow JVM 64 KB codegen limits as
Catalyst literals. The committed codes table is ``n × (id + m ints)``
— ~50× narrower than the vectors; a probe is a zero-join scan of that
table scored by the m distance TABLES (k·m ints, driver-computed from
the committed codebooks, broadcast the same way), cut by TakeOrdered.

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


def _train_books(
    q: DataFrame, id_col: str, m: int, dsub: int, k: int, iters: int,
) -> list[list[list[int]]]:
    """All m subspace codebooks trained TOGETHER, one Spark job per
    Lloyd round (not per subspace): the init collects the k md5-ranked
    vectors once (every subspace's init centroids are slices of the
    same vectors — exactly what per-subspace `lloyd_centroids` would
    pick, since the ranking ignores the values); each round evaluates
    every subspace's argmin in ONE pass through the broadcast-codebook
    Arrow kernel (veccarrier.pq_encode — plan size O(1) at any
    m·k·dsub) and folds all (subspace, cell, component) integer sums in
    ONE map-combinable aggregate (m·k·dsub driver rows). Identical math
    — and therefore bit-identical codebooks — to m independent runs; m×
    fewer jobs and m× fewer data passes."""
    import math

    from antidb_spark.functions.veccarrier import pq_encode

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
        enc = pq_encode(q.sparkSession, books)
        entries = F.array(*[
            F.struct(
                F.lit(j).alias("j"),
                F.element_at("codes", j + 1).alias("cell"),
                F.slice("qv", j * dsub + 1, dsub).alias("sv"),
            )
            for j in range(m)
        ])
        sums = (
            q.withColumn("codes", enc(F.col("qv")))
            .select(F.explode(entries).alias("e"))
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
    from antidb_spark.functions.veccarrier import pq_encode

    enc = pq_encode(spark, books)
    catalog.write(
        q.select(id_col, enc(F.col("qv")).alias("codes")),
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
        self.id_col, self.vec_col = p["id_col"], p["vec_col"]
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
        a zero-join scan of the codes table scored by the broadcast
        distance tables (veccarrier.adc_score — plan size O(1) at any
        m·k), cut by TakeOrdered."""
        from antidb_spark.functions.veccarrier import adc_score

        score_of = adc_score(self.spark, self._tables(probe))
        return (
            self.catalog.read(self.name)
            .select(self.id_col, score_of(F.col("codes")).alias("qdist"))
            .orderBy(F.asc("qdist"), F.asc(self.id_col))
            .limit(k)
        )

    def topk_refined(
        self,
        probe: Sequence[float],
        vectors: DataFrame,
        k: int = 10,
        shortlist: int = 50,
    ) -> DataFrame:
        """The deployed two-stage shape: the ADC scan produces a
        ``shortlist`` of candidates from the codes table alone, then
        ONLY those ids re-rank by exact quantized distance against the
        base vectors — (id, qdist) where qdist is now the EXACT int64
        squared L2. The shortlist ids broadcast into the vectors scan
        (a k-row semi-join, never a full re-rank), so the refine cost
        is O(shortlist), and recall@k equals shortlist recall (pinned
        by tests at 1.0 on clusterable data)."""
        short = self.topk(probe, k=int(shortlist)).select(self.id_col)
        import math

        qp = F.array(*[
            F.lit(int(math.floor(float(v) * float(self.scale))))
            .cast("long")
            for v in probe
        ])
        q = _quantized(vectors, self.id_col, self.vec_col, self.scale)
        exact = _sqdist_expr(F.col("qv"), qp)
        return (
            q.join(F.broadcast(short), self.id_col)
            .select(self.id_col, exact.alias("qdist"))
            .orderBy(F.asc("qdist"), F.asc(self.id_col))
            .limit(int(k))
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


def build_ivfpq(
    spark: SparkSession,
    root: str,
    name: str,
    vectors: DataFrame,
    n_cells: int = 8,
    coarse_iters: int = 2,
    m: int = 8,
    k: int = 16,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    scale: int = SCALE,
) -> "IvfPqIndex":
    """IVF-PQ: the coarse quantizer (exact-integer Lloyd over the full
    vectors) partitions the corpus into ``n_cells`` cells; each
    vector's RESIDUAL (qv − its cell centroid — still exact int64) is
    PQ-encoded; the codes table is range-partitioned and min/max-
    stats'd on ``cell`` so a probe reads ONLY its ``n_probe`` nearest
    cells' files (manifest pruning) and ranks them by residual-space
    ADC. This is the canonical large-scale ANN layout: IVF makes the
    probe sublinear in N, PQ makes what it reads ~50× narrower, and
    residual encoding keeps the codebooks tight around each cell.

    Everything stays in exact int64 after the one quantization —
    coarse assignment, residuals, codebooks, codes, probe-side cell
    ranking and distance tables — so the driver's DuckDB oracle
    re-derives the ENTIRE structure and every ranking bit-for-bit.

    Committed artifacts: ``{name}`` (cell, id, codes) sorted/stats'd
    on cell, ``{name}_centroids`` (cell, cv), ``{name}_codebooks``
    (subspace, cell, cv)."""
    from antidb_spark.operators.cluster import _assign, _cdf, lloyd_centroids

    dim = int(vectors.select(F.size(vec_col)).first()[0])
    if dim % m != 0:
        raise ValueError(f"dim {dim} not divisible by m={m} subspaces")
    dsub = dim // m
    q = _quantized(vectors, id_col, vec_col, scale)
    coarse = lloyd_centroids(q, id_col, n_cells, coarse_iters)
    cdf = _cdf(spark, coarse)
    assigned = _assign(q, coarse)  # (id, cell)
    resid = (
        q.join(assigned, id_col)
        .join(F.broadcast(cdf), "cell")
        .select(
            id_col, "cell",
            F.zip_with("qv", "cv", lambda x, y: x - y).alias("qv"),
        )
    )
    from antidb_spark.functions.veccarrier import pq_encode

    books = _train_books(
        resid.select(id_col, "qv"), id_col, m, dsub, k, iters
    )
    catalog = Catalog(spark, root)
    catalog.write(
        spark.createDataFrame(
            [(c, cw) for c, cw in enumerate(coarse)],
            "cell int, cv array<long>",
        ).coalesce(1),
        f"{name}_centroids",
    )
    catalog.write(
        spark.createDataFrame(
            [(j, c, cw) for j, bk in enumerate(books)
             for c, cw in enumerate(bk)],
            "subspace int, cell int, cv array<long>",
        ).coalesce(1),
        f"{name}_codebooks",
    )
    enc = pq_encode(spark, books)
    n_part = min(n_cells, spark.sparkContext.defaultParallelism)
    catalog.write(
        resid.select("cell", id_col, enc(F.col("qv")).alias("codes"))
        .repartitionByRange(n_part, "cell", id_col)
        .sortWithinPartitions("cell", id_col),
        name,
        stats_cols=["cell"],
        props={
            "kind": "ivfpq", "id_col": id_col, "vec_col": vec_col,
            "n_cells": n_cells, "m": m, "k": k, "dsub": dsub,
            "dim": dim, "scale": scale,
        },
    )
    return IvfPqIndex(spark, catalog, name)


class IvfPqIndex:
    """Reopen-by-name probe interface over committed IVF-PQ tables."""

    def __init__(self, spark: SparkSession, catalog: Catalog, name: str):
        self.spark = spark
        self.catalog = catalog
        self.name = name
        p = catalog.manifest(name)["props"]
        self.id_col, self.vec_col = p["id_col"], p["vec_col"]
        self.n_cells, self.m, self.k = p["n_cells"], p["m"], p["k"]
        self.dsub, self.scale = p["dsub"], p["scale"]
        self.centroids = {
            r.cell: list(r.cv)
            for r in catalog.read(f"{name}_centroids").collect()
        }
        self.books = {}
        for r in catalog.read(f"{name}_codebooks").collect():
            self.books.setdefault(r.subspace, {})[r.cell] = list(r.cv)

    def _quantize_probe(self, probe: Sequence[float]) -> list[int]:
        import math

        return [
            int(math.floor(float(v) * float(self.scale))) for v in probe
        ]

    def probe_cells(
        self, probe: Sequence[float], n_probe: int
    ) -> list[int]:
        """The n_probe nearest coarse cells by exact int64 squared L2
        (ties → smallest cell) — pure driver math over the tiny
        committed centroid relation."""
        qp = self._quantize_probe(probe)
        d = sorted(
            (sum((a - b) * (a - b) for a, b in zip(qp, cv)), c)
            for c, cv in self.centroids.items()
        )
        return [c for _, c in d[:n_probe]]

    def _cell_tables(
        self, probe: Sequence[float], cell: int
    ) -> list[list[int]]:
        """Residual-space ADC tables for one probed cell: the probe's
        residual vs THAT cell's centroid, against the shared
        codebooks — exact int64."""
        qp = self._quantize_probe(probe)
        cv = self.centroids[cell]
        rp = [a - b for a, b in zip(qp, cv)]
        tables = []
        for j in range(self.m):
            sl = rp[j * self.dsub:(j + 1) * self.dsub]
            book = self.books[j]
            tables.append([
                sum((a - b) * (a - b) for a, b in zip(sl, book[c]))
                for c in range(self.k)
            ])
        return tables

    def topk(
        self, probe: Sequence[float], k: int = 10, n_probe: int = 2
    ) -> DataFrame:
        """(id, qdist) over the probed cells only: each cell's scan is
        manifest-pruned to its files and scored by that cell's broadcast
        residual distance tables (veccarrier.adc_score — O(1) plan size
        at any m·k), the union is cut by TakeOrdered."""
        from antidb_spark.functions.veccarrier import adc_score

        parts = []
        for cell in self.probe_cells(probe, n_probe):
            score_of = adc_score(self.spark, self._cell_tables(probe, cell))
            parts.append(
                self.catalog.read_pruned(self.name, "cell", values=[cell])
                .filter(F.col("cell") == cell)
                .select(self.id_col, score_of(F.col("codes")).alias("qdist"))
            )
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        return out.orderBy(F.asc("qdist"), F.asc(self.id_col)).limit(k)

    def topk_refined(
        self,
        probe: Sequence[float],
        vectors: DataFrame,
        k: int = 10,
        shortlist: int = 50,
        n_probe: int = 2,
    ) -> DataFrame:
        """Two-stage IVF-PQ (the full deployed shape): the cell-pruned
        residual ADC scan produces a ``shortlist``, then ONLY those
        ids re-rank by exact int64 squared L2 against the base
        vectors (broadcast semi-join, O(shortlist) refine) — same
        contract as ``PqIndex.topk_refined`` with the IVF pruning in
        front."""
        import math

        short = self.topk(probe, k=int(shortlist), n_probe=n_probe) \
            .select(self.id_col)
        qp = F.array(*[
            F.lit(int(math.floor(float(v) * float(self.scale))))
            .cast("long")
            for v in probe
        ])
        q = _quantized(vectors, self.id_col, self.vec_col, self.scale)
        exact = _sqdist_expr(F.col("qv"), qp)
        return (
            q.join(F.broadcast(short), self.id_col)
            .select(self.id_col, exact.alias("qdist"))
            .orderBy(F.asc("qdist"), F.asc(self.id_col))
            .limit(int(k))
        )

    def topk_local(
        self, probe: Sequence[float], k: int = 10, n_probe: int = 2
    ):
        """Warm tier, no Spark job: pruned pyarrow reads of the probed
        cells' code rows + numpy table lookups; value-identical to
        ``topk``."""
        import numpy as np

        rows = []
        for cell in self.probe_cells(probe, n_probe):
            t = np.array(self._cell_tables(probe, cell), dtype=np.int64)
            tbl = self.catalog.read_pruned_arrow(
                self.name, "cell", values=[cell],
                columns=["cell", self.id_col, "codes"],
            )
            mask = np.asarray(tbl.column("cell")) == cell
            if not mask.any():
                continue
            ids = tbl.column(self.id_col).to_numpy()[mask]
            codes = np.stack(
                tbl.column("codes").to_numpy(zero_copy_only=False)[mask]
            )
            qd = t[np.arange(self.m)[None, :], codes].sum(axis=1)
            rows += [(int(i), int(d)) for i, d in zip(ids, qd)]
        rows.sort(key=lambda r: (r[1], r[0]))
        return rows[:k]


def open_ivfpq(spark: SparkSession, root: str, name: str) -> IvfPqIndex:
    return IvfPqIndex(spark, Catalog(spark, root), name)


def optimize_pq(idx) -> "PqIndex | IvfPqIndex":
    """Force-merge for PQ/IVF-PQ codes tables (the vector-side analog
    of the text index's ``optimize``): O(delta) appends accumulate
    one small file run per batch — correct (probes read every
    manifest file) but scattering the cell locality the IVF pruning
    wants. This rewrites the codes into ONE freshly-sorted generation
    via the crash-atomic ``Catalog.replace`` (old snapshot intact
    until the swap), preserving codebooks/centroids/props verbatim —
    codes never recompute, so every ranking is byte-identical before
    and after. Out-of-band maintenance, never required for
    correctness."""
    is_ivf = isinstance(idx, IvfPqIndex)
    df = idx.catalog.read(idx.name)
    props = dict(idx.catalog.manifest(idx.name)["props"])
    if is_ivf:
        n_part = min(
            idx.n_cells, idx.spark.sparkContext.defaultParallelism
        )
        df = df.repartitionByRange(
            n_part, "cell", idx.id_col
        ).sortWithinPartitions("cell", idx.id_col)
        idx.catalog.replace(df, idx.name, stats_cols=["cell"],
                            props=props)
        return IvfPqIndex(idx.spark, idx.catalog, idx.name)
    idx.catalog.replace(
        df.repartitionByRange(
            idx.spark.sparkContext.defaultParallelism, idx.id_col
        ).sortWithinPartitions(idx.id_col),
        idx.name, props=props,
    )
    return PqIndex(idx.spark, idx.catalog, idx.name)


def _books_as_lists(idx) -> list[list[list[int]]]:
    return [
        [idx.books[j][c] for c in range(idx.k)] for j in range(idx.m)
    ]


INGEST_TAG_TAIL = 1000


def _ingest_props(idx, batch_tag: str | None):
    """(skip, props) for an exactly-once tagged append: the tag list
    rides the SAME manifest swap as the new files, so a re-delivered
    micro-batch (foreachBatch recovery) either sees its tag and skips,
    or re-appends cleanly — files from a crashed attempt stay
    uncommitted-invisible (the catalog append contract). The list is
    trimmed to the last ``INGEST_TAG_TAIL`` tags — re-delivery only
    ever concerns the batches in flight at a crash, never ancient
    ones, so a bounded tail keeps the manifest O(1) over an unbounded
    stream."""
    props = dict(idx.catalog.manifest(idx.name)["props"])
    if batch_tag is None:
        return False, props
    seen = list(props.get("ingested", []))
    if batch_tag in seen:
        return True, props
    props["ingested"] = (seen + [batch_tag])[-INGEST_TAG_TAIL:]
    return False, props


def append_pq(
    idx: PqIndex, vectors: DataFrame, batch_tag: str | None = None
) -> PqIndex:
    """O(delta) vector append to a committed PQ index: new vectors
    encode under the COMMITTED codebooks (never retrained — the
    standard PQ append contract; re-train after heavy drift is a
    rebuild, the same append-vs-optimize maintenance split as the text
    index and LSH/IVF, ann.py:127-160). Committed files stay
    byte-untouched; the delta lands as fresh files visible at the
    manifest swap. ``batch_tag`` makes the append EXACTLY-ONCE per tag
    (the streaming foreachBatch contract): the tag commits atomically
    with the files, a re-delivery skips."""
    from antidb_spark.functions.veccarrier import pq_encode

    skip, props = _ingest_props(idx, batch_tag)
    if skip:
        return idx
    enc = pq_encode(idx.spark, _books_as_lists(idx))
    q = _quantized(vectors, idx.id_col, idx.vec_col, idx.scale)
    idx.catalog.write(
        q.select(idx.id_col, enc(F.col("qv")).alias("codes")),
        idx.name, mode="append", props=props,
    )
    return PqIndex(idx.spark, idx.catalog, idx.name)


def append_ivfpq(
    idx: IvfPqIndex, vectors: DataFrame, batch_tag: str | None = None
) -> IvfPqIndex:
    """O(delta) append to a committed IVF-PQ index: new vectors assign
    to the COMMITTED coarse centroids, their residuals encode under
    the COMMITTED codebooks, and the delta lands as fresh
    ``cell``-stats'd files — probes keep pruning to their cells across
    old and new files alike; committed files stay byte-untouched.
    ``batch_tag`` gives exactly-once tagged appends (see `append_pq`)
    — the streaming vector-ingestion sink:
    ``stream.writeStream.foreachBatch(lambda df, bid:
    append_ivfpq(open_ivfpq(...), df, batch_tag=str(bid)))``."""
    from antidb_spark.functions.veccarrier import pq_encode
    from antidb_spark.operators.cluster import _assign, _cdf

    skip, props = _ingest_props(idx, batch_tag)
    if skip:
        return idx
    spark = idx.spark
    cents = [idx.centroids[c] for c in range(idx.n_cells)]
    cdf = _cdf(spark, cents)
    q = _quantized(vectors, idx.id_col, idx.vec_col, idx.scale)
    resid = (
        q.join(_assign(q, cents), idx.id_col)
        .join(F.broadcast(cdf), "cell")
        .select(
            idx.id_col, "cell",
            F.zip_with("qv", "cv", lambda x, y: x - y).alias("qv"),
        )
    )
    enc = pq_encode(spark, _books_as_lists(idx))
    n_part = min(idx.n_cells, spark.sparkContext.defaultParallelism)
    idx.catalog.write(
        resid.select("cell", idx.id_col, enc(F.col("qv")).alias("codes"))
        .repartitionByRange(n_part, "cell", idx.id_col)
        .sortWithinPartitions("cell", idx.id_col),
        idx.name, stats_cols=["cell"], mode="append", props=props,
    )
    return IvfPqIndex(spark, idx.catalog, idx.name)
