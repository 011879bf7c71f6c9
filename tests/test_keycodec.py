"""Memcomparable codec: bytewise/hex order must equal Python key order.

This is the invariant the persisted-index manifest pruning and parquet
row-group stats rely on (keys only prune correctly if encoded order ==
semantic order). Property-based over the key shapes the engine persists:
natur-normalized strings, letts_nums pairs, composite scalar tuples.
"""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from antidb_spark.functions.keycodec import encode_key, hex_key
from antidb_spark.functions.sortkeys import py_letts_nums, py_natur

# no Spark needed here
pytest_plugins: list[str] = []


def _ordered_like_python(keys):
    enc = [(hex_key(k), i) for i, k in enumerate(keys)]
    by_py = sorted(range(len(keys)), key=lambda i: keys[i])
    by_hex = sorted(range(len(keys)), key=lambda i: enc[i][0])
    assert by_py == by_hex


natur_text = st.text(
    alphabet=st.sampled_from("abcrs0123456789.-"), min_size=0, max_size=12
)


@settings(max_examples=200, deadline=None)
@given(st.lists(natur_text, min_size=2, max_size=8))
def test_natur_hex_order(vals):
    _ordered_like_python([py_natur(v) for v in vals])


@settings(max_examples=200, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.text(alphabet="abcz", min_size=0, max_size=4),
            st.integers(min_value=-(2**62), max_value=2**62),
            st.floats(allow_nan=False, width=64),
        ),
        min_size=2,
        max_size=8,
    )
)
def test_composite_tuple_hex_order(vals):
    _ordered_like_python(vals)


def test_letts_nums_hex_order():
    vals = ["rs1", "rs10", "rs2", "ab999", "ab1000", "zz0", "rs00012"]
    _ordered_like_python([py_letts_nums(v) for v in vals])


def test_equal_keys_equal_encodings():
    assert encode_key((-0.0,)) == encode_key((0.0,))
    # natural sort: leading zeros in the numeric subcell compare equal
    # (float("007") == 7.0), so the encodings must collide too
    assert encode_key(py_natur("rs007")) == encode_key(py_natur("rs7"))
    # prefix list sorts first, like Python
    assert hex_key(("a",)) < hex_key(("a", 0))
    # embedded NULs in strings stay ordered
    assert hex_key(("a\x00b",)) < hex_key(("ab",))
    assert hex_key(("a",)) < hex_key(("a\x00",))


@settings(max_examples=200, deadline=None)
@given(
    st.lists(
        st.datetimes(
            min_value=__import__("datetime").datetime(1, 1, 2),
            max_value=__import__("datetime").datetime(9999, 12, 30),
        ),
        min_size=2,
        max_size=8,
    )
)
def test_datetime_hex_order(vals):
    """TimestampType keys (ADVICE r02): exact epoch-micros encoding —
    hex order == datetime order, sub-millisecond included."""
    _ordered_like_python(vals)


def test_numpy_scalars_match_python_twins():
    """pandas hands the encoder numpy scalars; encodings must be
    identical to the Python-native values'."""
    import numpy as np

    assert encode_key(np.int64(-7)) == encode_key(-7)
    assert encode_key(np.float64(2.5)) == encode_key(2.5)
    assert encode_key(np.bool_(True)) == encode_key(True)
    assert encode_key(np.array([1, 2, 3])) == encode_key([1, 2, 3])


def test_bytes_keys_ordered():
    vals = [b"", b"\x00", b"\x00\x01", b"a", b"a\x00", b"ab"]
    _ordered_like_python(vals)


def test_aware_datetimes_encode_by_instant():
    """Two timestamps denoting the same instant in different zones must
    encode identically (ADVICE r03): the encoding is instant-based for
    aware values, naive-field-based for naive ones."""
    import datetime as dt

    utc = dt.timezone.utc
    plus2 = dt.timezone(dt.timedelta(hours=2))
    a = dt.datetime(2024, 5, 1, 12, 0, 0, tzinfo=utc)
    b = a.astimezone(plus2)  # same instant, different zone
    assert encode_key(a) == encode_key(b)
    # ordering across mixed zones follows instants
    c = dt.datetime(2024, 5, 1, 13, 59, 0, tzinfo=plus2)  # 11:59 UTC
    assert hex_key(c) < hex_key(a)
    # naive values still encode by their own fields (unchanged branch)
    assert encode_key(dt.datetime(2024, 5, 1, 12)) == encode_key(
        a.replace(tzinfo=None)
    )


@settings(max_examples=100, deadline=None)
@given(
    st.lists(
        st.integers(min_value=-(2**63), max_value=2**63 - 1),
        min_size=1,
        max_size=64,
    )
)
def test_hex_i64_batch_matches_scalar_codec(vals):
    """The numpy batch encoder must be byte-identical to the per-row
    tag-02 branch over the full int64 range."""
    import numpy as np

    from antidb_spark.functions.keycodec import encode_value, hex_i64_batch

    got = hex_i64_batch(np.array(vals, dtype=np.int64))
    assert got == [encode_value(int(v)).hex() for v in vals]
