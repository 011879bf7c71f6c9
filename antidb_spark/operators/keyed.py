"""Persisted, named, coexisting secondary indexes over arbitrary keys.

The reference builds one ``.adb`` archive per (db file, key function)
and ``Prs`` reopens it to answer ``eq``/``rng`` WITHOUT rescanning the
source (idx.py:41-92, prs.py:27-38); multiple differently-keyed indexes
coexist by name (idx.py:56-61). ``KeyedIndexStore`` is that surface on
the Catalog:

- ``build``: extract + normalize keys (any Column expression, optional
  SortRule, tuple fan-out via ``multi``), range-partition and sort by
  key, and commit a COVERING index table — ``_key`` plus the full base
  row, the analog of the reference storing whole source lines in its
  leaves — with manifest min/max stats on ``_key``.
- ``open``: reopen by name from the committed manifest (the rule name,
  id columns, and key representation travel in table props); no base
  DataFrame needed, exactly like ``Prs(adb_path)``.
- ``eq``/``rng``: manifest-pruned reads (tree-descent analog) + row-group
  predicate pushdown; never a base-table scan.
- ``eq_local``/``rng_local``: the WARM interactive path — driver-side
  pyarrow reads of the pruned files, no Spark job at all, matching the
  reference's 0.015 s warm point-query class (README.md:43). Returns
  pandas; row-identical to the Spark path (pinned by tests).

Key representation: orderable scalar key types are stored natively
(parquet/manifest stats and Catalyst pushdown work as-is); complex keys
— SortRule encodings, struct composites — are stored as the
memcomparable hex string of the normalized key (functions/keycodec.py),
whose string order equals the normalized-key order. Queries apply the
SAME normalization + encoding driver-side (the idx.py:143-148 ↔
prs.py:46-49 parity invariant).

Scale shape: the index is range-partitioned on ``_key`` so point/range
queries prune to a handful of files out of arbitrarily many; the query
side is always tiny and broadcast. Writes are one repartitionByRange
shuffle of the covering rows — the same cost class as the reference's
spill-sort, distributed.
"""

from __future__ import annotations

import datetime as _dt
from collections.abc import Iterator, Sequence

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from antidb_spark.err import QueryStartGtEndError
from antidb_spark.functions.keycodec import hex_i64_batch, hex_key
from antidb_spark.functions.sortkeys import LETTS_NUMS, NATUR, SortRule

RULES: dict[str, SortRule] = {"natur": NATUR, "letts_nums": LETTS_NUMS}

# key dataTypes storable natively with working parquet/manifest stats
_NATIVE_TYPES = (
    T.StringType,
    T.LongType,
    T.IntegerType,
    T.ShortType,
    T.ByteType,
    T.DoubleType,
    T.FloatType,
    T.BooleanType,
)

# leaf dataTypes the memcomparable codec can encode (hex-key path)
_ENCODABLE_LEAVES = _NATIVE_TYPES + (
    T.DateType,
    T.TimestampType,
    T.TimestampNTZType,
    T.BinaryType,
)


def _check_encodable(dt: T.DataType, path: str = "key") -> None:
    """Fail a build with a clear message BEFORE launching the job when
    the key type has an unencodable leaf (e.g. DecimalType) — the
    alternative is a generic TypeError deep inside an executor UDF."""
    if isinstance(dt, T.ArrayType):
        _check_encodable(dt.elementType, path + "[]")
    elif isinstance(dt, T.StructType):
        for f in dt.fields:
            _check_encodable(f.dataType, f"{path}.{f.name}")
    elif not isinstance(dt, _ENCODABLE_LEAVES):
        raise TypeError(
            f"key element {path} has unsupported type {dt.simpleString()}; "
            "encodable leaves: string/int/float/bool/date/timestamp/binary "
            "and arrays/structs of those"
        )


def _hex_encoder(rule: SortRule | None):
    """Raw-key → memcomparable-hex pandas_udf (normalize with the
    rule's py_fn — identical to the query side — then encode).

    Rule-less scalar batches that the codec stores as tag-02 integers
    (timestamps → epoch micros, dates → ordinals) encode with ONE numpy
    pass per Arrow batch (`hex_i64_batch`, byte-identical to the
    per-row codec); rules, structs/arrays, and binary keep the per-row
    fallback (normalization and \\x00-escaping are value-shaped)."""
    norm = rule.py_fn if rule else (lambda v: v)

    def _i64_series(s: pd.Series, vals, mask) -> pd.Series:
        out = hex_i64_batch(vals)
        if mask.any():
            return pd.Series(
                [None if m else o for m, o in zip(mask, out)],
                index=s.index, dtype=object,
            )
        return pd.Series(out, index=s.index, dtype=object)

    # (annotated Series-iterator for pandas_udf's hint check; struct
    # inputs actually arrive as sub-DataFrames at runtime)
    def enc(it: Iterator[pd.Series]) -> Iterator[pd.Series]:
        import numpy as np

        for s in it:
            if isinstance(s, pd.DataFrame):
                # struct keys arrive as a sub-DataFrame (one column per
                # field, field order preserved) → row dicts
                yield pd.Series(
                    [hex_key(norm(rec)) for rec in s.to_dict("records")],
                    index=s.index,
                )
            elif rule is None and pd.api.types.is_datetime64_any_dtype(
                s.dtype
            ):
                # Spark hands TimestampType as session-tz-naive
                # datetime64[ns]; floor-div to micros == the codec's
                # exact-timedelta micros on the same naive values
                mask = s.isna().to_numpy()
                vals = s.to_numpy("datetime64[ns]").view(np.int64) // 1000
                yield _i64_series(s, vals, mask)
            elif (
                rule is None
                and s.dtype == object
                and len(s)
                and isinstance(
                    next((v for v in s if v is not None), None), _dt.date
                )
                and not isinstance(
                    next(v for v in s if v is not None), _dt.datetime
                )
            ):
                # DateType arrives as python date objects; ordinal =
                # epoch days + date(1970,1,1).toordinal()
                mask = s.isna().to_numpy()
                vals = (
                    pd.to_datetime(s).to_numpy("datetime64[D]")
                    .view(np.int64) + 719163
                )
                yield _i64_series(s, vals, mask)
            else:
                yield s.map(lambda v: None if v is None else hex_key(norm(v)))

    return F.pandas_udf(enc, T.StringType())


class PersistedKeyedIndex:
    """Query handle over one committed index table (the ``Prs`` analog)."""

    def __init__(self, spark: SparkSession, catalog, name: str):
        self.spark = spark
        self.catalog = catalog
        self.name = name
        props = catalog.manifest(name)["props"]
        self.id_cols: list[str] = props["id_cols"]
        self.base_cols: list[str] = props["base_cols"]
        self.rule = RULES[props["rule"]] if props["rule"] else None
        self.kind: str = props["key_kind"]  # "native" | "hex"
        self.key_type: str = props["key_type"]  # simpleString

    # -- query-side normalization (prs.py:46-49 parity) ------------------

    def _norm_q(self, value):
        n = self.rule.py_fn(value) if self.rule else value
        return hex_key(n) if self.kind == "hex" else n

    def _py_gt(self, a, b) -> bool:
        try:
            return a > b
        except TypeError:
            return list(a) > list(b)

    # -- Spark path -------------------------------------------------------

    def eq(self, *queries) -> DataFrame:
        """Batch point lookup: (query_ord, *base_cols), per-query groups
        in argument order, ties in (*id_cols) order; miss → empty."""
        qk = [self._norm_q(q) for q in queries]
        ents = self.catalog.read_pruned(self.name, "_key", values=list(set(qk)))
        qdf = self.spark.createDataFrame(
            [(i, v) for i, v in enumerate(qk)],
            T.StructType(
                [
                    T.StructField("query_ord", T.IntegerType(), False),
                    T.StructField(
                        "_qkey",
                        ents.schema["_key"].dataType,
                        True,
                    ),
                ]
            ),
        )
        return (
            ents.join(F.broadcast(qdf), F.col("_key") == F.col("_qkey"))
            .select("query_ord", *self.base_cols)
            .orderBy("query_ord", *self.id_cols)
        )

    def rng(self, start, end) -> DataFrame:
        """Inclusive range scan: (*base_cols) ordered (key, *id_cols);
        start > end raises (prs.py:50-52)."""
        lo, hi = self._norm_q(start), self._norm_q(end)
        if self._py_gt(lo, hi):
            raise QueryStartGtEndError(start, end)
        ents = self.catalog.read_pruned(self.name, "_key", lo=lo, hi=hi)
        return (
            ents.filter((F.col("_key") >= F.lit(lo)) & (F.col("_key") <= F.lit(hi)))
            .orderBy("_key", *self.id_cols)
            .select(*self.base_cols)
        )

    # -- warm driver-side path (no Spark job) ----------------------------

    def eq_local(self, *queries) -> pd.DataFrame:
        """Warm point lookup: manifest pruning + pyarrow row-group reads,
        zero Spark jobs. Same rows/order as ``eq`` (pinned by tests).
        Batch-friendly: one pruned read + one vectorized merge serves any
        number of probes (a per-probe filter loop was O(rows·probes))."""
        qk = [self._norm_q(q) for q in queries]
        tbl = self.catalog.read_pruned_arrow(
            self.name, "_key", values=list(set(qk))
        ).to_pandas()
        if not len(tbl):
            return pd.DataFrame(columns=["query_ord", *self.base_cols])
        qdf = pd.DataFrame(
            {"query_ord": range(len(qk)), "_key": qk}
        )
        out = tbl.merge(qdf, on="_key").sort_values(
            ["query_ord", *self.id_cols]
        )
        return out[["query_ord", *self.base_cols]].reset_index(drop=True)

    def rng_local(self, start, end) -> pd.DataFrame:
        lo, hi = self._norm_q(start), self._norm_q(end)
        if self._py_gt(lo, hi):
            raise QueryStartGtEndError(start, end)
        tbl = self.catalog.read_pruned_arrow(
            self.name, "_key", lo=lo, hi=hi
        ).to_pandas()
        if not len(tbl):  # pruned-to-nothing / empty table: canonical miss
            return pd.DataFrame(columns=self.base_cols)
        hit = tbl[(tbl["_key"] >= lo) & (tbl["_key"] <= hi)]
        hit = hit.sort_values(["_key", *self.id_cols])
        return hit[self.base_cols].reset_index(drop=True)


class KeyedIndexStore:
    """Named index registry rooted at one Catalog directory (the ``Idx``
    build surface + multi-index coexistence, idx.py:41-92)."""

    def __init__(self, spark: SparkSession, root: str):
        from antidb_spark.sources.catalog import Catalog

        self.spark = spark
        self.catalog = Catalog(spark, root)

    def exists(self, name: str) -> bool:
        return self.catalog.exists(name)

    def open(self, name: str) -> PersistedKeyedIndex:
        return PersistedKeyedIndex(self.spark, self.catalog, name)

    def build(
        self,
        name: str,
        base: DataFrame,
        key,
        id_cols: Sequence[str],
        rule: SortRule | None = None,
        multi: bool = False,
        n_partitions: int | None = None,
    ) -> PersistedKeyedIndex:
        """Build + commit the covering index table, then reopen it.

        ``key``: any Column expression over ``base`` (db_line_prs analog);
        with ``multi=True`` it must be an array — one entry per element.
        Null keys drop the row (the reference's phantom filter).
        """
        if rule is not None and rule.name not in RULES:
            raise ValueError(f"unregistered sort rule: {rule.name}")
        assert "_key" not in base.columns, "base may not contain _key"
        raw = F.explode(key) if multi else key
        sel = base.select(*base.columns, raw.alias("_raw")).filter(
            F.col("_raw").isNotNull()
        )
        raw_type = sel.schema["_raw"].dataType
        native = rule is None and isinstance(raw_type, _NATIVE_TYPES)
        if native:
            keyed = sel.withColumn("_key", F.col("_raw"))
        else:
            if rule is None:
                # rule py_fns reshape values before encoding; only the
                # rule-less hex path encodes raw column values directly
                _check_encodable(raw_type)
            keyed = sel.withColumn("_key", _hex_encoder(rule)(F.col("_raw")))
        keyed = keyed.drop("_raw")
        n_part = n_partitions or self.spark.sparkContext.defaultParallelism
        sorted_df = keyed.repartitionByRange(
            n_part, "_key", *id_cols
        ).sortWithinPartitions("_key", *id_cols)
        from antidb_spark.sources.catalog import LEAF_ROW_GROUP_BYTES

        self.catalog.write(
            sorted_df,
            name,
            stats_cols=["_key"],
            row_group_bytes=LEAF_ROW_GROUP_BYTES,
            props={
                "id_cols": list(id_cols),
                "base_cols": list(base.columns),
                "rule": rule.name if rule else None,
                "key_kind": "native" if native else "hex",
                "key_type": (
                    raw_type.simpleString() if native else "string"
                ),
                "multi": bool(multi),
            },
        )
        return self.open(name)
