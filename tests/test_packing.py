"""Varint/delta codec: goldens + hypothesis roundtrip properties."""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from antidb_spark.functions.packing import (
    pack_postings,
    unpack_postings,
    varint_decode,
    varint_encode,
)


def test_varint_goldens():
    assert varint_encode(np.array([], dtype=np.uint64)) == b""
    assert varint_encode(np.array([0], dtype=np.uint64)) == b"\x00"
    assert varint_encode(np.array([1], dtype=np.uint64)) == b"\x01"
    assert varint_encode(np.array([127], dtype=np.uint64)) == b"\x7f"
    assert varint_encode(np.array([128], dtype=np.uint64)) == b"\x80\x01"
    assert varint_encode(np.array([300], dtype=np.uint64)) == b"\xac\x02"
    assert list(varint_decode(b"\xac\x02\x7f\x00")) == [300, 127, 0]


@settings(max_examples=200, deadline=None)
@given(st.lists(st.integers(min_value=0, max_value=2**64 - 1), max_size=300))
def test_varint_roundtrip(vals):
    arr = np.array(vals, dtype=np.uint64)
    assert list(varint_decode(varint_encode(arr))) == vals


@settings(max_examples=100, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=2**40),
            st.integers(min_value=1, max_value=10_000),
        ),
        max_size=200,
        unique_by=lambda t: t[0],
    )
)
def test_pack_roundtrip(pairs):
    pairs.sort()
    ords = np.array([p[0] for p in pairs], dtype=np.uint64)
    tfs = np.array([p[1] for p in pairs], dtype=np.uint64)
    d, t = pack_postings(ords, tfs)
    got_ords, got_tfs = unpack_postings(d, t)
    assert list(got_ords) == list(ords)
    assert list(got_tfs) == list(tfs)


def test_pack_compresses_dense_runs():
    """Dense ordinal runs (stopword postings) must pack near 1 byte/doc."""
    ords = np.arange(100_000, dtype=np.uint64)
    tfs = np.ones(100_000, dtype=np.uint64)
    d, t = pack_postings(ords, tfs)
    assert len(d) < 100_000 + 10
    assert len(t) == 100_000
