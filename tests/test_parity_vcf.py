"""antidb-parity goldens over the vcf20 fixture (reference VcfTests,
tests.py:571-725): the inverted-index test (token→postings, the graft's
seed shape) and the pseudo-tabix interval-expansion index."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from antidb_spark.functions.sortkeys import NATUR
from antidb_spark.operators.lookup import KeyedIndex

# The 20 data rows of the reference VCF fixture (headers pre-dropped,
# like idx.py:123-127): (chrom, pos, ref, info) — only columns the
# goldens touch.
VCF20 = [
    ("chr1", 126113, "C", "MTD=isaac_strelka,bwa_freebayes,bwa_platypus,bwa_gatk;KM=17.27;KFP=0;KFF=0"),
    ("chr1", 567239, "CG", "MTD=isaac_strelka,bwa_platypus,bwa_gatk;KM=11.15;KFP=0;KFF=0"),
    ("chr1", 724137, "TAATGG", "MTD=bwa_gatk;KM=26.29;KFP=0;KFF=0"),
    ("chr1", 725516, "A", "MTD=isaac_strelka;KM=13.37;KFP=0;KFF=0"),
    ("chr1", 753844, "CCT", "MTD=isaac_strelka,bwa_platypus;KM=4.21;KFP=0;KFF=0"),
    ("chr1", 761957, "A", "MTD=isaac_strelka,bwa_freebayes,bwa_platypus,bwa_gatk;KM=6.63;KFP=0;KFF=0"),
    ("chr1", 763769, "AT", "MTD=bwa_freebayes,bwa_platypus,bwa_gatk;KM=11.26;KFP=0;KFF=0"),
    ("chr1", 767780, "G", "MTD=cgi,bwa_freebayes,bwa_platypus,isaac_strelka,bwa_gatk;KM=11.12;KFP=0;KFF=0"),
    ("chr1", 768116, "AGTTTT", "MTD=bwa_freebayes,bwa_platypus,bwa_gatk;KM=18.37;KFP=0;KFF=0"),
    ("chr1", 769138, "CAT", "MTD=isaac_strelka,bwa_freebayes,bwa_platypus,bwa_gatk;KM=12.00;KFP=0;KFF=0"),
    ("chr14", 56412076, "G", "MTD=isaac_strelka,bwa_platypus,bwa_gatk;KM=28.62;KFP=0;KFF=0"),
    ("chr14", 56422021, "AAAAC", "MTD=isaac_strelka,bwa_freebayes,bwa_gatk;KM=9.43;KFP=0;KFF=0"),
    ("chr14", 56551760, "C", "MTD=bwa_gatk;KM=5.77;KFP=0;KFF=0"),
    ("chr14", 56564010, "AACACACACAC", "MTD=bwa_freebayes;KM=38.71;KFP=0;KFF=0"),
    ("chr14", 56664634, "GACACACAC", "MTD=bwa_freebayes,bwa_platypus,bwa_gatk;KM=6.83;KFP=0;KFF=0"),
    ("chr14", 56669715, "CA", "MTD=isaac_strelka,bwa_freebayes,bwa_platypus,bwa_gatk;KM=10.85;KFP=0;KFF=0"),
    ("chr14", 56783534, "T", "MTD=isaac_strelka,bwa_platypus,bwa_gatk;KM=8.95;KFP=0;KFF=0"),
    ("chr14", 56868236, "TA", "MTD=bwa_freebayes,bwa_platypus,bwa_gatk;KM=4.00;KFP=0;KFF=0"),
    ("chr14", 56898904, "TTTCC", "MTD=bwa_freebayes,bwa_gatk;KM=21.83;KFP=0;KFF=0"),
    ("chr14", 57002112, "AAGAG", "MTD=bwa_gatk;KM=15.71;KFP=0;KFF=0"),
]


@pytest.fixture(scope="module")
def vcf(spark):
    rows = [(*r, i) for i, r in enumerate(VCF20)]
    df = spark.createDataFrame(
        rows, "chrom string, pos long, ref string, info string, row_ord long"
    )
    df.cache().count()
    return df


def rows_of(df):
    return [r["row_ord"] for r in df.collect()]


@pytest.fixture(scope="module")
def mtd_idx(vcf):
    """tests.py:689-701: token set per line — THE inverted index.
    Extraction: MTD= value split on [,_], deduplicated; identity rule."""
    mtd_tokens = F.array_distinct(
        F.split(F.regexp_extract("info", r"MTD=([^;]+);", 1), "[,_]")
    )
    return KeyedIndex(vcf, mtd_tokens, id_cols=["row_ord"], multi=True)


def test_mtd_eq_cgi_exact_row(mtd_idx):
    """tests.py:706-709."""
    assert rows_of(mtd_idx.eq("cgi")) == [7]


@pytest.mark.parametrize(
    "term,n",
    [("isaac", 11), ("strelka", 11), ("bwa", 19), ("freebayes", 12),
     ("platypus", 13), ("gatk", 17)],
)
def test_mtd_posting_cardinalities(mtd_idx, term, n):
    """tests.py:710-715 — posting-list lengths per term."""
    assert mtd_idx.eq(term).count() == n


@pytest.mark.parametrize(
    "bounds,n",
    [(("bwa", "strelka"), 84), (("aaa", "zzzzzzz"), 84),
     (("freebayes", "gatk"), 29), (("isaac", "isaac"), 11)],
)
def test_mtd_rng_over_term_space(mtd_idx, bounds, n):
    """tests.py:716-719."""
    assert mtd_idx.rng(*bounds).count() == n


@pytest.fixture(scope="module")
def tabix_idx(vcf):
    """tests.py:613-628: one entry per REF base — interval expansion
    (P7): key cells [chrom, pos+i], natur rule."""
    intervals = F.transform(
        F.sequence(F.lit(0), F.length("ref") - 1),
        lambda i: F.array(F.col("chrom"), (F.col("pos") + i).cast("string")),
    )
    return KeyedIndex(vcf, intervals, id_cols=["row_ord"], rule=NATUR, multi=True)


def test_tabix_eq(tabix_idx):
    """tests.py:634-647 incl. duplicate returns for overlapped positions."""
    assert rows_of(
        tabix_idx.eq(["chr1", 126113], ["chr1", 567239], ["chr1", 567240])
    ) == [0, 1, 1]
    assert rows_of(tabix_idx.eq(["chr1", 567241])) == []
    assert rows_of(tabix_idx.eq(["chr1", 768116])) == [8]
    assert rows_of(tabix_idx.eq(["chr1", 768121])) == [8]


def test_tabix_rng(tabix_idx):
    """tests.py:648-675 incl. ×5 duplicates for a 5-base REF and
    cross-chromosome natural ordering (chr1 < chr14)."""
    assert rows_of(tabix_idx.rng(["chr1", 0], ["chr1", 126113])) == [0]
    assert rows_of(
        tabix_idx.rng(["chr14", 57002112], ["chr14", float("inf")])
    ) == [19] * 5
    assert rows_of(
        tabix_idx.rng(["chr14", 56669710], ["chr14", 56868240])
    ) == [15, 15, 16, 17, 17]
    assert rows_of(
        tabix_idx.rng(["chr1", 769138], ["chr14", 56412076])
    ) == [9, 9, 9, 10]
    assert rows_of(tabix_idx.rng(["chr1", 126110], ["chr1", 126112])) == []
    assert rows_of(tabix_idx.rng(["chr1", 57002113], ["chr1", 57002115])) == []
