"""natur / letts_nums sort-rule parity (reference srt.py:12-59, goldens
tests.py:728-829). Our encoding is order-preserving, not value-identical:
tests decode the encoding back to the reference's value shape and compare
(Python == treats 10 and 10.0 as equal, like the reference's own goldens).
"""

from __future__ import annotations

import pytest

from antidb_spark.functions.sortkeys import py_letts_nums, py_natur

INF = float("+inf")


def decode(enc):
    """Encoded triples → reference-shaped list of cells."""
    cells, cur = [], []
    for rank, num, s in enc:
        if rank == 0:
            cells.append(cur)
            cur = []
        elif rank == 1:
            cur.append(num)
        else:
            cur.append(s)
    return cells


NATUR_GOLDENS = [
    ("10", [[10]]),
    ("01", [[1]]),
    ("rs10", [[INF, "rs", 10]]),
    ("rs01", [[INF, "rs", 1]]),
    ("val1.5", [[INF, "val", 1.5]]),
    ("val1.05", [[INF, "val", 1.05]]),
    ("val1.05suff", [[INF, "val", 1.05, "suff"]]),
    ("val1,05", [[INF, "val", 1, ",", 5]]),
    ("val1,05suff", [[INF, "val", 1, ",", 5, "suff"]]),
    (
        "I2a2a1b2a2a2-ZS20",
        [[INF, "I", 2, "a", 2, "a", 1, "b", 2, "a", 2, "a", 2, "-ZS", 20]],
    ),
    ("10\t11", [[10, "\t", 11]]),
    ("rs10\t11", [[INF, "rs", 10, "\t", 11]]),
    ("10,11.1", [[10, ",", 11.1]]),
    ("10.1,11", [[10.1, ",", 11]]),
    ("+", [[INF, "+"]]),
    ("-", [[INF, "-"]]),
    ("1+1", [[1, "+", 1]]),
    ("-1-1", [[-1, -1]]),
    ("+001-001", [[INF, "+", 1, -1]]),
    ("-1.23e", [[-1.23, "e"]]),
    ("123E-3", [[0.123]]),
    ("123e-02", [[1.23]]),
    ("pref1.23e2suff", [[INF, "pref", 123.0, "suff"]]),
    ("e1.23e-1e", [[INF, "e", 0.123, "e"]]),
    ("-E1.23E+01-E", [[INF, "-E", 12.3, "-E"]]),
    ("-e-1.23e-1-e", [[INF, "-e", -0.123, "-e"]]),
    ("+1230E-1+1", [[INF, "+", 123.0, "+", 1]]),
    ("0.123ee+2", [[0.123, "ee+", 2]]),
    ("-12.3+EE-02", [[-12.3, "+EE", -2]]),
    ("-0e10", [[0]]),
    ("qwerty\t0.1E2", [[INF, "qwerty\t", 10.0]]),
]


@pytest.mark.parametrize("src,want", NATUR_GOLDENS)
def test_natur_goldens(src, want):
    assert decode(py_natur(src)) == want


def test_natur_comma_delimiter():
    assert decode(py_natur("10.1,11", dec_delimiter=",")) == [[10, ".", 1.11]]
    assert decode(py_natur("0,1e+2\tqwerty", dec_delimiter=",")) == [[10.0, "\tqwerty"]]
    assert decode(py_natur("1,1, -2,2, str", dec_delimiter=",")) == [
        [1.1, ", ", -2.2, ", str"]
    ]


def test_natur_iterable_and_nums_first():
    assert decode(py_natur(["1,1", "-2,2", "str"], dec_delimiter=",",
                           nums_first=False)) == [
        [1.1], [-2.2], [float("-inf"), "str"]
    ]
    assert decode(py_natur(["chr14", 1, 10])) == [[INF, "chr", 14], [1], [10]]


def test_natur_encoding_orders_like_reference():
    """Sorting by our encoding == sorting by the reference's comparable."""
    vals = ["rs10", "rs2", "rs010", "10", "2", "a2", "a10", "b1",
            "chr1", "chr14", "chr2", "x1.5", "x1.25", "-1-1", "1+1"]
    enc_sorted = sorted(vals, key=py_natur)
    # Reference comparable: nested lists with ±inf sentinels; rebuild it.
    ref_sorted = sorted(vals, key=lambda v: decode(py_natur(v)))
    assert enc_sorted == ref_sorted
    # numbers before strings; numeric ordering inside
    assert enc_sorted.index("2") < enc_sorted.index("10")
    assert enc_sorted.index("10") < enc_sorted.index("a2")
    assert enc_sorted.index("rs2") < enc_sorted.index("rs10")
    assert enc_sorted.index("chr2") < enc_sorted.index("chr14")


def test_letts_nums_goldens():
    assert py_letts_nums("rs1") == ("rs", 1)
    assert py_letts_nums("rs010") == ("rs", 10)
    assert py_letts_nums("ENSG000") == ("ENSG", 0)
    for bad in ["rs", "1dvatri", "123", "id1.1", "id-1"]:
        with pytest.raises(AttributeError):
            py_letts_nums(bad)
