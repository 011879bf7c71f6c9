"""Persisted arbitrary-key indexes (KeyedIndexStore / PersistedKeyedIndex).

Parity bar: every golden the in-memory KeyedIndex path pins
(test_parity_bed) must hold against the PERSISTED index — built once,
REOPENED from disk without the base DataFrame — and the warm driver-side
(pyarrow, no-Spark-job) path must be row-identical to the Spark path.
Reference: build-once / reopen / query of .adb archives (idx.py:41-92,
prs.py:27-38).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from antidb_spark.err import QueryStartGtEndError
from antidb_spark.functions.sortkeys import NATUR
from antidb_spark.operators.keyed import KeyedIndexStore

from tests.test_parity_bed import BED16, RNG_GOLDENS


@pytest.fixture(scope="module")
def bed(spark):
    rows = [(*r, i) for i, r in enumerate(BED16)]
    df = spark.createDataFrame(
        rows, "chrom string, start long, end long, rsid string, row_ord long"
    )
    df.cache().count()
    return df


@pytest.fixture(scope="module")
def store(spark, bed, tmp_path_factory):
    """One store, FOUR coexisting named indexes over the same base —
    the reference's multi-index surface (idx.py:56-61)."""
    st = KeyedIndexStore(spark, str(tmp_path_factory.mktemp("keyed_store")))
    st.build("rsid_natur", bed, F.col("rsid"), id_cols=["row_ord"], rule=NATUR)
    st.build(
        "coords",
        bed,
        F.struct(
            F.concat(F.lit("chr"), F.col("chrom")).alias("c"),
            F.col("start").alias("s"),
            F.col("end").alias("e"),
        ),
        id_cols=["row_ord"],
    )
    st.build(
        "rsid_len", bed, F.length("rsid").cast("int"), id_cols=["row_ord"]
    )
    st.build("rsid_plain", bed, F.col("rsid"), id_cols=["row_ord"])
    return st


@pytest.fixture(scope="module")
def reopened(spark, store):
    """Fresh store instance over the same root: open() must need only
    the committed manifests, never the base DataFrame."""
    return KeyedIndexStore(spark, store.catalog.root)


def rows_of(df):
    return [r["row_ord"] for r in df.collect()]


def test_eq_goldens_natur_persisted(reopened):
    idx = reopened.open("rsid_natur")
    golden = {
        "rs11804321": [5, 9, 15],
        "rs11581176": [8, 10],
        "rs12044852": [0],
        "rs1321172": [14],
    }
    for rsid, want in golden.items():
        assert rows_of(idx.eq(rsid)) == want, rsid
    assert rows_of(idx.eq("rs00000")) == []


def test_eq_batch_argument_order_persisted(reopened):
    out = reopened.open("rsid_natur").eq("rs11804321", "rs11581176", "hz12345")
    assert rows_of(out) == [5, 9, 15, 8, 10]
    assert [r["query_ord"] for r in out.collect()] == [0, 0, 0, 1, 1]


@pytest.mark.parametrize("bounds,want", RNG_GOLDENS)
def test_rng_goldens_natur_persisted(reopened, bounds, want):
    assert rows_of(reopened.open("rsid_natur").rng(*bounds)) == want


def test_rng_start_gt_end_raises_persisted(reopened):
    idx = reopened.open("rsid_natur")
    with pytest.raises(QueryStartGtEndError):
        idx.rng("rs11900000", "rs4000000")
    with pytest.raises(QueryStartGtEndError):
        idx.rng_local("rs11900000", "rs4000000")


def test_composite_struct_key_persisted(reopened):
    idx = reopened.open("coords")
    assert rows_of(idx.eq(("chr1", 24977084, 24977085))) == [7]
    assert rows_of(idx.eq(("chr1", 92543755, 92543756))) == [5, 9, 15]
    assert rows_of(
        idx.eq(("chr1", 237115473, 237115474), ("chr1", 241782991, 241782992))
    ) == [12, 1]
    assert rows_of(
        idx.rng(("chr1", 92516000, 92516001), ("chr1", 92543800, 92543801))
    ) == [8, 10, 5, 9, 15]


def test_phantom_int_key_persisted(reopened):
    idx = reopened.open("rsid_len")
    assert idx.kind == "native"  # scalar ints stay native, no hex detour
    assert rows_of(idx.eq(8)) == [1, 11, 13]
    assert rows_of(idx.eq(10)) == [0, 3, 4, 5, 6, 7, 8, 9, 10, 12, 15]
    assert rows_of(idx.rng(8, 9)) == [1, 11, 13, 2, 14]


def test_warm_local_path_matches_spark(reopened):
    """eq_local/rng_local (driver pyarrow, zero Spark jobs) must be
    row-identical to the Spark path."""
    for name, qs in [
        ("rsid_natur", ("rs11804321", "rs11581176", "hz12345")),
        ("rsid_plain", ("rs11804321", "rs952084")),
        ("rsid_len", (8, 10)),
    ]:
        idx = reopened.open(name)
        spark_pdf = idx.eq(*qs).toPandas()
        local_pdf = idx.eq_local(*qs)
        assert spark_pdf.values.tolist() == local_pdf.values.tolist(), name
    idx = reopened.open("rsid_natur")
    a = idx.rng("rs4000000", "rs11900000").toPandas()
    b = idx.rng_local("rs4000000", "rs11900000")
    assert a.values.tolist() == b.values.tolist()


def test_covering_index_never_reads_base(reopened):
    """The committed table carries the full base row: eq answers with all
    base columns and the plan touches only the index table files."""
    idx = reopened.open("rsid_natur")
    out = idx.eq("rs952084")
    assert out.columns == ["query_ord", "chrom", "start", "end", "rsid", "row_ord"]
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "rsid_natur" in plan  # scans the index table...
    assert plan.count("Scan parquet") == 1  # ...and nothing else


def test_manifest_pruning_skips_files(spark, bed, tmp_path):
    """Point lookups must touch a strict subset of the committed files
    (the B+tree-descent analog made observable)."""
    st = KeyedIndexStore(spark, str(tmp_path / "prune_store"))
    idx = st.build(
        "rsid", bed, F.col("rsid"), id_cols=["row_ord"], rule=NATUR,
        n_partitions=4,
    )
    man = st.catalog.manifest("rsid")
    n_files = len(man["files"])
    assert n_files >= 3
    qk = idx._norm_q("rs12044852")
    pruned = st.catalog.pruned_file_paths("rsid", "_key", values=[qk])
    assert pruned is not None and 0 < len(pruned) < n_files


def test_multi_key_tokens_persisted(spark, tmp_path):
    """multi=True fan-out (tuple keys, idx.py:141-145): token index over
    tiny docs, persisted, vs the in-memory KeyedIndex."""
    from antidb_spark.functions.analyze import distinct_tokens
    from antidb_spark.operators.lookup import KeyedIndex

    docs = spark.createDataFrame(
        [(0, "spark query engine"), (1, "query planner"), (2, "storage engine")],
        "doc_id long, text string",
    )
    st = KeyedIndexStore(spark, str(tmp_path / "tok_store"))
    idx = st.build(
        "tokens", docs, distinct_tokens("text"), id_cols=["doc_id"], multi=True
    )
    mem = KeyedIndex(docs, distinct_tokens("text"), id_cols=["doc_id"], multi=True)
    for qs in [("query",), ("engine", "zzz", "spark")]:
        a = idx.eq(*qs).select("query_ord", "doc_id", "text").toPandas()
        b = mem.eq(*qs).toPandas()[["query_ord", "doc_id", "text"]]
        assert a.values.tolist() == b.values.tolist(), qs
    a = idx.rng("planner", "query").select("doc_id").toPandas()
    b = mem.rng("planner", "query").toPandas()[["doc_id"]]
    assert a.values.tolist() == b.values.tolist()


def test_timestamp_key_persisted(spark, tmp_path):
    """TimestampType keys (ADVICE r02): hex-encoded micros order; eq/rng
    and the warm local paths answer correctly."""
    import datetime as dt

    rows = [
        (i, dt.datetime(2024, 1, 1) + dt.timedelta(seconds=i * 61, microseconds=i))
        for i in range(50)
    ]
    df = spark.createDataFrame(rows, "row_ord long, ts timestamp")
    st = KeyedIndexStore(spark, str(tmp_path / "ts_store"))
    idx = st.build("by_ts", df, F.col("ts"), id_cols=["row_ord"], n_partitions=4)
    probe = rows[7][1]
    assert [r["row_ord"] for r in idx.eq(probe).collect()] == [7]
    lo, hi = rows[3][1], rows[6][1]
    assert [r["row_ord"] for r in idx.rng(lo, hi).collect()] == [3, 4, 5, 6]
    assert idx.eq_local(probe)["row_ord"].tolist() == [7]
    assert idx.rng_local(lo, hi)["row_ord"].tolist() == [3, 4, 5, 6]


def test_date_key_vectorized_matches_scalar_codec(spark, tmp_path):
    """DateType keys ride the vectorized numpy encoder; the committed
    `_key` bytes must equal the per-row codec's (the query side encodes
    per-row, so eq/rng only hit if build and query bytes agree), and
    null keys must drop (phantom filter)."""
    import datetime as dt

    from antidb_spark.functions.keycodec import hex_key

    rows = [
        (i, dt.date(2023, 1, 1) + dt.timedelta(days=i * 37))
        for i in range(40)
    ] + [(99, None)]
    df = spark.createDataFrame(rows, "row_ord long, d date")
    st = KeyedIndexStore(spark, str(tmp_path / "date_store"))
    idx = st.build("by_d", df, F.col("d"), id_cols=["row_ord"],
                   n_partitions=4)
    committed = {
        r["row_ord"]: r["_key"]
        for r in st.catalog.read("by_d").select("row_ord", "_key").collect()
    }
    assert 99 not in committed  # null key dropped
    for i, d in rows[:40]:
        assert committed[i] == hex_key(d), i
    probe = rows[11][1]
    assert [r["row_ord"] for r in idx.eq(probe).collect()] == [11]
    lo, hi = rows[2][1], rows[5][1]
    assert [r["row_ord"] for r in idx.rng(lo, hi).collect()] == [2, 3, 4, 5]


def test_timestamp_key_null_batch(spark, tmp_path):
    """Timestamp batches containing NaT must encode non-null rows
    identically to the all-valid path and drop the nulls."""
    import datetime as dt

    rows = [(0, dt.datetime(2024, 3, 1, 10, 30, 0, 123456)),
            (1, None),
            (2, dt.datetime(2024, 3, 2, 0, 0, 1))]
    df = spark.createDataFrame(rows, "row_ord long, ts timestamp")
    st = KeyedIndexStore(spark, str(tmp_path / "tsnull_store"))
    idx = st.build("by_ts", df, F.col("ts"), id_cols=["row_ord"],
                   n_partitions=2)
    assert sorted(
        r["row_ord"] for r in st.catalog.read("by_ts").collect()
    ) == [0, 2]
    assert [r["row_ord"] for r in idx.eq(rows[0][1]).collect()] == [0]


def test_unencodable_key_raises_at_build_time(spark, tmp_path):
    """DecimalType key → clear TypeError BEFORE any job launches, not a
    generic executor failure (ADVICE r02)."""
    import pytest

    df = spark.createDataFrame([(1,)], "row_ord long").selectExpr(
        "row_ord", "cast(row_ord as decimal(10,2)) as d"
    )
    st = KeyedIndexStore(spark, str(tmp_path / "dec_store"))
    with pytest.raises(TypeError, match="decimal"):
        st.build(
            "by_dec", df, F.struct("d", "row_ord"), id_cols=["row_ord"]
        )


def test_empty_base_index_misses_cleanly(spark, tmp_path):
    """An index over an empty base commits an empty table; eq/rng and
    the warm local paths return empty, never raise (ADVICE r02)."""
    df = spark.createDataFrame([], "row_ord long, k string").filter("1=0")
    st = KeyedIndexStore(spark, str(tmp_path / "empty_store"))
    idx = st.build("by_k", df, F.col("k"), id_cols=["row_ord"], n_partitions=2)
    assert idx.eq("anything").count() == 0
    assert idx.rng("a", "b").count() == 0
    assert len(idx.eq_local("anything")) == 0
    assert len(idx.rng_local("a", "b")) == 0
