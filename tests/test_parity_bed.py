"""antidb-parity goldens over the bed16 fixture (reference BedTests,
tests.py:23-567): multiset eq, batch argument order, inclusive rng,
start>end error, composite keys, degenerate all-equal key (skew),
phantom computed key. Row identity: ``row_ord`` = file-offset analog.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from antidb_spark.err import QueryStartGtEndError
from antidb_spark.functions.sortkeys import NATUR
from antidb_spark.operators.lookup import KeyedIndex

BED16 = [
    ("1", 116545156, 116545157, "rs12044852"),
    ("1", 241782991, 241782992, "rs952084"),
    ("1", 154527612, 154527613, "rs4131514"),
    ("1", 201015351, 201015352, "rs12122721"),
    ("1", 92515681, 92515682, "rs17371561"),
    ("1", 92543755, 92543756, "rs11804321"),
    ("1", 92580419, 92580420, "rs17380378"),
    ("1", 24977084, 24977085, "rs10903122"),
    ("1", 92516860, 92516861, "rs11581176"),
    ("1", 92543755, 92543756, "rs11804321"),
    ("1", 92516860, 92516861, "rs11581176"),
    ("1", 86877126, 86877127, "rs581405"),
    ("1", 237115473, 237115474, "rs10925318"),
    ("1", 86876786, 86876787, "rs479341"),
    ("1", 66265029, 66265030, "rs1321172"),
    ("1", 92543755, 92543756, "rs11804321"),
]


@pytest.fixture(scope="module")
def bed(spark):
    rows = [(*r, i) for i, r in enumerate(BED16)]
    df = spark.createDataFrame(
        rows, "chrom string, start long, end long, rsid string, row_ord long"
    )
    df.cache().count()
    return df


@pytest.fixture(scope="module")
def rsid_idx(bed):
    """tests.py:52-60: db_line_prs = last column, adb_srt_rule = natur."""
    return KeyedIndex(bed, F.col("rsid"), id_cols=["row_ord"], rule=NATUR)


def rows_of(df):
    return [r["row_ord"] for r in df.collect()]


def test_eq_singles(rsid_idx):
    """tests.py:235-263 — incl. ×3 / ×2 duplicates in file order."""
    golden = {
        "rs12044852": [0], "rs952084": [1], "rs4131514": [2],
        "rs12122721": [3], "rs17371561": [4], "rs11804321": [5, 9, 15],
        "rs17380378": [6], "rs10903122": [7], "rs11581176": [8, 10],
        "rs581405": [11], "rs10925318": [12], "rs479341": [13],
        "rs1321172": [14],
    }
    for rsid, want in golden.items():
        assert rows_of(rsid_idx.eq(rsid)) == want, rsid


def test_eq_miss_empty(rsid_idx):
    """tests.py:264-265."""
    assert rows_of(rsid_idx.eq("rs00000")) == []


def test_eq_batch_argument_order(rsid_idx):
    """tests.py:266-273: per-query groups in argument order, misses skipped."""
    out = rsid_idx.eq("rs11804321", "rs11581176", "hz12345")
    assert rows_of(out) == [5, 9, 15, 8, 10]
    assert [r["query_ord"] for r in out.collect()] == [0, 0, 0, 1, 1]


RNG_GOLDENS = [
    (("rs479341", "rs952084"), [13, 11, 1]),
    (("rs4131514", "rs10903122"), [2, 7]),
    (("rs11804321", "rs11804321"), [5, 9, 15]),
    (("rs12122721", "rs17380378"), [3, 4, 6]),
    (("rs00000", "rs480000"), [13]),
    (("rs4000000", "rs11900000"), [2, 7, 12, 8, 10, 5, 9, 15]),
    (("rs17380000", "rs99999999"), [6]),
]


@pytest.mark.parametrize("bounds,want", RNG_GOLDENS)
def test_rng_inclusive_goldens(rsid_idx, bounds, want):
    """tests.py:274-308 — natural (numeric-part) ordering, inclusive."""
    assert rows_of(rsid_idx.rng(*bounds)) == want


def test_rng_start_gt_end_raises(rsid_idx):
    """tests.py:309-314."""
    with pytest.raises(QueryStartGtEndError):
        rsid_idx.rng("rs11900000", "rs4000000")


def test_coords_composite_key(bed, spark):
    """tests.py:319-430: identity rule over composite [chrom,start,end];
    struct ordering = Python list comparison."""
    key = F.struct(
        F.concat(F.lit("chr"), F.col("chrom")).alias("c"),
        F.col("start").alias("s"),
        F.col("end").alias("e"),
    )
    idx = KeyedIndex(bed, key, id_cols=["row_ord"])
    assert rows_of(idx.eq(("chr1", 24977084, 24977085))) == [7]
    assert rows_of(idx.eq(("chr1", 92543755, 92543756))) == [5, 9, 15]
    assert rows_of(
        idx.eq(("chr1", 237115473, 237115474), ("chr1", 241782991, 241782992))
    ) == [12, 1]
    assert rows_of(
        idx.rng(("chr1", 92516000, 92516001), ("chr1", 92543800, 92543801))
    ) == [8, 10, 5, 9, 15]


def test_homogen_degenerate_all_equal_key(bed):
    """tests.py:432-477: every row under ONE key (worst-case skew);
    eq returns the whole relation in row order."""
    idx = KeyedIndex(bed, F.lit("all"), id_cols=["row_ord"])
    assert rows_of(idx.eq("all")) == list(range(16))
    assert rows_of(idx.rng("all", "all")) == list(range(16))
    assert rows_of(idx.eq("other")) == []


def test_phantom_computed_key(bed):
    """tests.py:479-567: key = len(rsid), a value absent from the data
    (README.md:53 'phantom' keys)."""
    idx = KeyedIndex(bed, F.length("rsid").cast("int"), id_cols=["row_ord"])
    assert rows_of(idx.eq(8)) == [1, 11, 13]
    assert rows_of(idx.eq(9)) == [2, 14]
    assert rows_of(idx.eq(10)) == [0, 3, 4, 5, 6, 7, 8, 9, 10, 12, 15]
    assert rows_of(idx.rng(8, 9)) == [1, 11, 13, 2, 14]
