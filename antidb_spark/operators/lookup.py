"""antidb-parity query operators: KeyedIndex eq/rng + app-level joins.

Reproduces the reference's query semantics (SURVEY §2.4, probe-verified):
- multiset: duplicate keys yield every matching row;
- ordering: by normalized key, ties in original row order — the file
  byte-offset analog is explicit ordering columns (``id_cols``);
- miss → empty, never an error;
- batch ``eq(*qs)``: per-query result groups in argument order;
- ``rng`` inclusive on both ends; start > end → QueryStartGtEndError.

Scale shape: the query side is always tiny → broadcast; the index-entries
relation is the big side and is scanned with the key predicate pushed
down (Catalyst partition pruning + row-group stats replace the
reference's B+tree descent, prs.py:57-77). The fetch of original rows is
an index→base join on the id columns (prs.py:101-105's seek+readline).
"""

from __future__ import annotations

from collections.abc import Sequence
from typing import Any

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from antidb_spark.err import QueryStartGtEndError
from antidb_spark.functions.sortkeys import SortRule


class KeyedIndex:
    """A key → rows secondary index over any DataFrame (the engine's
    generalization of ``Idx``+``Prs``: key extraction = any Column expr
    (db_line_prs analog, idx.py:44,137-145), normalization = SortRule).

    ``key``: raw-key Column expression; with ``multi=True`` it must be an
    array — one index entry per element (tuple fan-out, idx.py:141-145).
    Null/empty raw keys drop the row: the reference's phantom filter /
    partial index (idx.py:139-140).
    """

    def __init__(
        self,
        base: DataFrame,
        key: Column,
        id_cols: Sequence[str],
        rule: SortRule | None = None,
        multi: bool = False,
    ):
        self.base = base
        self.id_cols = list(id_cols)
        self.rule = rule
        raw = F.explode(key) if multi else key
        sel = base.select(*self.id_cols, raw.alias("_raw"))
        sel = sel.filter(F.col("_raw").isNotNull())
        keyc = rule.spark_fn(F.col("_raw")) if rule else F.col("_raw")
        self.entries = sel.select(*self.id_cols, keyc.alias("_key"))
        self.key_type = self.entries.schema["_key"].dataType
        self._spark = base.sparkSession

    # -- query-side normalization (prs.py:46-49 parity) ------------------

    def _norm(self, value: Any) -> Any:
        return self.rule.py_fn(value) if self.rule else value

    def _query_df(self, normed: list[Any], with_ord: bool = True) -> DataFrame:
        fields = [T.StructField("_qkey", self.key_type, True)]
        rows = [(v,) for v in normed]
        if with_ord:
            fields.insert(0, T.StructField("query_ord", T.IntegerType(), False))
            rows = [(i, v) for i, (v,) in enumerate(rows)]
        return self._spark.createDataFrame(rows, T.StructType(fields))

    # -- operators --------------------------------------------------------

    def eq(self, *queries: Any) -> DataFrame:
        """Point lookups (prs.py:86-105). Output: query_ord + base columns,
        ordered (query_ord, *id_cols) — per-query groups in argument
        order, ties in row order."""
        qdf = self._query_df([self._norm(q) for q in queries])
        hits = self.entries.join(
            F.broadcast(qdf), F.col("_key") == F.col("_qkey")
        ).select("query_ord", *self.id_cols)
        return (
            hits.join(self.base, self.id_cols)
            .select("query_ord", *self.base.columns)
            .orderBy("query_ord", *self.id_cols)
        )

    def rng(self, start: Any, end: Any) -> DataFrame:
        """Inclusive range scan (prs.py:107-131). Output: base columns,
        ordered (key, *id_cols).

        Scalar-keyed bounds are LITERALS: a crossJoined 1-row bounds
        relation defeats parquet predicate pushdown on file-sourced
        bases (the filter must be a literal comparison to reach
        ``PushedFilters``). Complex keys (SortRule array<struct>
        encodings) aren't literal-expressible, so they keep the
        broadcast-bounds plan — the persisted path covers them with
        manifest pruning over memcomparable hex."""
        s, e = self._norm(start), self._norm(end)
        if _py_gt(s, e):
            raise QueryStartGtEndError(start, end)
        if isinstance(self.key_type, (T.ArrayType, T.StructType, T.MapType)):
            bounds = self._spark.createDataFrame(
                [(s, e)],
                T.StructType(
                    [
                        T.StructField("_lo", self.key_type, False),
                        T.StructField("_hi", self.key_type, False),
                    ]
                ),
            )
            hits = (
                self.entries.crossJoin(F.broadcast(bounds))
                .filter(
                    (F.col("_key") >= F.col("_lo"))
                    & (F.col("_key") <= F.col("_hi"))
                )
                .select("_key", *self.id_cols)
            )
        else:
            hits = self.entries.filter(
                (F.col("_key") >= F.lit(s)) & (F.col("_key") <= F.lit(e))
            ).select("_key", *self.id_cols)
        return (
            hits.join(self.base, self.id_cols)
            .orderBy("_key", *self.id_cols)
            .select(*self.base.columns)
        )


def _py_gt(a: Any, b: Any) -> bool:
    """start > end on normalized keys; mirrors Python comparison of the
    reference's normalized query bounds (prs.py:50-52)."""
    try:
        return a > b
    except TypeError:
        return list(a) > list(b)


# --- app-level composites (SURVEY §2.5, from_readme_ann.py) -------------


def lookup_with_fallback(
    probes: DataFrame,
    probe_key: str,
    index: KeyedIndex,
    synonyms: DataFrame,
    syn_from: str = "syn_from",
    syn_to: str = "syn_to",
) -> DataFrame:
    """A1 (from_readme_ann.py:31-39): per probe, look up ``probe_key`` in
    the index; on miss, expand through the synonym table and re-probe.
    The reference returns the FIRST hit on either path (`for line in
    eq(...): return line`): direct hits beat synonym hits; within a path,
    synonym order then row order decides.

    Output: probe columns + index id columns (null when no hit anywhere).
    Scale shape: probes/synonyms are the small sides → broadcast joins;
    the entries relation stays un-shuffled.
    """
    ents = index.entries
    syn_t = synonyms.schema[syn_to].dataType.simpleString()
    direct = (
        F.broadcast(probes)
        .join(ents, probes[probe_key] == ents["_key"])
        .select(
            probe_key,
            *index.id_cols,
            F.lit(0).alias("_path"),
            F.lit(None).cast(syn_t).alias("_syn"),
        )
    )
    via_syn = (
        F.broadcast(probes)
        .join(synonyms, probes[probe_key] == synonyms[syn_from])
        .join(ents, F.col(syn_to) == ents["_key"])
        .select(probe_key, *index.id_cols,
                F.lit(1).alias("_path"), F.col(syn_to).alias("_syn"))
    )
    w = Window.partitionBy(probe_key).orderBy(
        "_path", F.asc_nulls_first("_syn"),
        *[F.asc(c) for c in index.id_cols],
    )
    first_hit = (
        direct.unionByName(via_syn)
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn", "_path", "_syn")
    )
    return probes.join(first_hit, probe_key, "left")


def annotate(
    probes: DataFrame, probe_key: str, index: KeyedIndex
) -> tuple[DataFrame, DataFrame]:
    """A2 (from_readme_ann.py:42-66): split probes into (annotated rows =
    probe ⧺ matched base row, dump = probes with no match)."""
    idx_flat = index.entries.join(index.base, index.id_cols)
    ann = probes.join(idx_flat, probes[probe_key] == idx_flat["_key"]).drop("_key")
    dump = probes.join(
        idx_flat.select(F.col("_key").alias(probe_key)), probe_key, "left_anti"
    )
    return ann, dump
