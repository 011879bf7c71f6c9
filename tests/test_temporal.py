"""As-of and banded range joins vs brute-force oracles + plan shape."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from antidb_spark.operators.temporal import asof_join, banded_range_join

T0 = dt.datetime(2024, 1, 1)


def _ts(sec: float) -> dt.datetime:
    return T0 + dt.timedelta(seconds=sec)


def _mk(spark, rows):
    return spark.createDataFrame(
        rows, "event_id bigint, ts timestamp_ntz, user_id bigint, value double"
    )


def test_asof_matches_bruteforce(spark):
    # user 1: rights at 10, 20, 20 (tie!), 30; lefts probe around them
    rights = _mk(spark, [
        (100, _ts(10), 1, 1.0),
        (101, _ts(20), 1, 2.0),
        (102, _ts(20), 1, 3.0),   # tie with 101 → max id wins
        (103, _ts(30), 1, 4.0),
        (200, _ts(50), 2, 5.0),
    ])
    lefts = _mk(spark, [
        (1, _ts(5), 1, 0.0),      # before any right → NULL
        (2, _ts(10), 1, 0.0),     # equal ts → matches (≤)
        (3, _ts(20), 1, 0.0),     # tie group → 102
        (4, _ts(25), 1, 0.0),
        (5, _ts(99), 1, 0.0),
        (6, _ts(49), 2, 0.0),     # before user-2's only right → NULL
        (7, _ts(50), 3, 0.0),     # key with no rights at all → NULL
    ])
    got = {
        r["left_id"]: (r["right_id"], r["gap_us"], r["r_value"])
        for r in asof_join(
            lefts, rights, key="user_id", right_cols=("value",)
        ).collect()
    }
    assert got == {
        1: (None, None, None),
        2: (100, 0, 1.0),
        3: (102, 0, 3.0),
        4: (102, 5_000_000, 3.0),
        5: (103, 69_000_000, 4.0),
        6: (None, None, None),
        7: (None, None, None),
    }


def test_asof_plan_single_key_exchange(spark):
    rights = _mk(spark, [(100, _ts(10), 1, 1.0)])
    lefts = _mk(spark, [(1, _ts(15), 1, 0.0)])
    plan = (
        asof_join(lefts, rights, key="user_id")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert plan.count("hashpartitioning(user_id") == 1
    assert "Join" not in plan  # it's a window composition, not a join


def test_banded_range_join_bruteforce(spark):
    import itertools

    lefts = _mk(spark, [
        (i, _ts(i * 7.0), i % 3, 0.0) for i in range(40)
    ])
    rights = _mk(spark, [
        (100 + i, _ts(3 + i * 11.0), i % 3, 0.0) for i in range(30)
    ])
    band = 20
    got = {
        (r["left_id"], r["right_id"], r["delta_us"])
        for r in banded_range_join(
            lefts, rights, key="user_id", band_seconds=band
        ).collect()
    }
    want = set()
    for (i, j) in itertools.product(range(40), range(30)):
        if i % 3 != j % 3:
            continue
        lt, rt = i * 7.0, 3 + j * 11.0
        if abs(rt - lt) <= band:  # boundary inclusive
            want.add((i, 100 + j, int(round((rt - lt) * 1e6))))
    assert got == want and len(want) > 10


def test_banded_range_join_boundary_inclusive(spark):
    lefts = _mk(spark, [(1, _ts(100), 1, 0.0)])
    rights = _mk(spark, [
        (10, _ts(100 - 20), 1, 0.0),   # exactly -band
        (11, _ts(100 + 20), 1, 0.0),   # exactly +band
        (12, _ts(100 + 20.000001), 1, 0.0),  # one microsecond past
    ])
    got = sorted(
        r["right_id"]
        for r in banded_range_join(
            lefts, rights, key="user_id", band_seconds=20
        ).collect()
    )
    assert got == [10, 11]
