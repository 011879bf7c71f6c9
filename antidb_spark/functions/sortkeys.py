"""Sort rules as order-preserving key encodings (SURVEY §2.3 O4/O5).

The reference's sort rules map raw keys to Python comparables —
``natur`` to ``list[float|int|str]`` with ±inf sentinels (srt.py:12-50),
``letts_nums`` to ``[letters, number]`` (srt.py:52-59) — applied
identically at build (idx.py:143-148) and query (prs.py:46-49) time.

Spark has no mixed-type lists, so each rule becomes an ORDER-PRESERVING
ENCODING into an orderable Spark type:

- ``natur`` → ``array<struct<rank:int, num:double, str:string>>`` where
  rank 0 = end-of-cell marker, 1 = numeric subcell, 2 = string subcell.
  Array/struct comparison in Spark is lexicographic, reproducing Python
  list comparison; the end marker makes shorter prefixes sort first; the
  reference's ``float('+inf')`` nums-first sentinel maps to a leading
  ``(1, +Infinity, '')``. Deviation (documented): comparing a numeric
  subcell with a string subcell at the same position is a TypeError in
  Python — here numbers simply sort before strings (rank 1 < 2).
- ``letts_nums`` → ``struct<letts:string, nums:long>``; non-conforming
  input raises AttributeError like the reference (tests.py:808-829).

Each rule carries a Python normalizer (query side + oracle side) and a
Spark normalizer (data side, vectorized pandas_udf — parity path only,
never the BM25 hot path).
"""

from __future__ import annotations

import re
from collections.abc import Iterable
from dataclasses import dataclass
from typing import Any, Callable

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

_NATUR_NUM = {
    ".": re.compile(r"(-?\d+(?:\.\d*)?(?:[Ee][+-]?\d+)?)"),
    ",": re.compile(r"(-?\d+(?:,\d*)?(?:[Ee][+-]?\d+)?)"),
}

NATUR_KEY_TYPE = T.ArrayType(
    T.StructType(
        [
            T.StructField("rank", T.IntegerType(), False),
            T.StructField("num", T.DoubleType(), False),
            T.StructField("str", T.StringType(), False),
        ]
    )
)

LETTS_NUMS_KEY_TYPE = T.StructType(
    [
        T.StructField("letts", T.StringType(), False),
        T.StructField("nums", T.LongType(), False),
    ]
)

_END = (0, 0.0, "")


def py_natur(
    value: str | Iterable, dec_delimiter: str = ".", nums_first: bool = True
) -> list[tuple[int, float, str]]:
    """Encoded natural-sort key. Semantics match srt.py:12-50: split each
    cell into numeric/string subcells, numbers compare numerically,
    a cell starting with a string subcell gets a ±inf numeric sentinel."""
    num_re = _NATUR_NUM[dec_delimiter]
    cells = [value] if isinstance(value, str) else [str(v) for v in value]
    sentinel = float("+inf") if nums_first else float("-inf")
    out: list[tuple[int, float, str]] = []
    for cell in cells:
        enc: list[tuple[int, float, str]] = []
        for sub in filter(None, num_re.split(cell)):
            if num_re.fullmatch(sub):
                enc.append((1, float(sub.replace(",", ".")), ""))
            else:
                enc.append((2, 0.0, sub))
        if enc and enc[0][0] == 2:
            enc.insert(0, (1, sentinel, ""))
        out.extend(enc)
        out.append(_END)
    return out


def py_letts_nums(value: str) -> tuple[str, int]:
    """'rs123' → ('rs', 123); AttributeError on non-conforming input,
    matching srt.py:52-59."""
    letts = re.search(r"^[a-zA-Z]+", value).group()  # AttributeError if none
    nums = int(re.search(f"(?<=^{letts})\\d+$", value).group())
    return (letts, nums)


def _natur_pandas(s: pd.Series) -> pd.Series:
    return s.map(lambda v: None if v is None else py_natur(v))


def _letts_nums_pandas(s: pd.Series) -> pd.Series:
    return s.map(lambda v: None if v is None else py_letts_nums(v))


def natur_spark(col: Column) -> Column:
    return F.pandas_udf(_natur_pandas, NATUR_KEY_TYPE)(col)


def letts_nums_spark(col: Column) -> Column:
    return F.pandas_udf(_letts_nums_pandas, LETTS_NUMS_KEY_TYPE)(col)


@dataclass(frozen=True)
class SortRule:
    """A key normalization applied identically to data (Spark column)
    and queries (Python constant) — the idx.py:143-148 ↔ prs.py:46-49
    parity invariant."""

    name: str
    spark_fn: Callable[[Column], Column]
    py_fn: Callable[[Any], Any]
    key_type: T.DataType


NATUR = SortRule("natur", natur_spark, py_natur, NATUR_KEY_TYPE)
LETTS_NUMS = SortRule(
    "letts_nums", letts_nums_spark, py_letts_nums, LETTS_NUMS_KEY_TYPE
)
