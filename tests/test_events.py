"""Event-stream operators (operators/events.py): gap sessionization
and tumbling rollups, pinned against a pandas brute force (the
cross-engine DuckDB oracle lives in __spark_entry__.py:
sessionize / tumbling_counts)."""

from __future__ import annotations

import datetime as dt

import pandas as pd
from pyspark.sql import functions as F

from antidb_spark.operators.events import sessionize, tumbling_counts

T0 = dt.datetime(2024, 1, 1, 0, 0, 0)


def _ev(spark, rows):
    pdf = pd.DataFrame(
        rows, columns=["event_id", "ts", "user_id", "event_type", "value"]
    )
    return spark.createDataFrame(pdf)


def test_sessionize_gap_semantics(spark):
    """Hand-built stream: gaps > 30 min split, == 30 min does NOT
    (strict >), per-user independence, 1-based session indexes."""
    m = dt.timedelta(minutes=1)
    rows = [
        # user 1: 3 events in one session, then a 31-min gap → session 2
        (0, T0, 1, "a", 1.0),
        (1, T0 + 10 * m, 1, "a", 1.0),
        (2, T0 + 40 * m, 1, "a", 1.0),      # exactly 30 min → SAME session
        (3, T0 + 71 * m, 1, "a", 1.0),      # 31 min → new session
        # user 2: single event
        (4, T0 + 5 * m, 2, "b", 1.0),
    ]
    got = (
        sessionize(_ev(spark, rows), gap_minutes=30)
        .orderBy("user_id", "session_idx")
        .toPandas()
    )
    assert got[["user_id", "session_idx", "n_events"]].values.tolist() == [
        [1, 1, 3], [1, 2, 1], [2, 1, 1],
    ]
    s11 = got.iloc[0]
    assert s11["duration_us"] == 40 * 60_000_000
    assert s11["last_us"] - s11["first_us"] == s11["duration_us"]


def test_sessionize_ties_break_on_event_id(spark):
    """Equal timestamps order by event_id — the lag chain is
    deterministic even on ts collisions."""
    rows = [
        (10, T0, 1, "a", 1.0),
        (11, T0, 1, "a", 1.0),  # same ts, higher id → same session
        (12, T0 + dt.timedelta(hours=2), 1, "a", 1.0),
    ]
    got = sessionize(_ev(spark, rows), gap_minutes=30).orderBy(
        "session_idx"
    ).toPandas()
    assert got["n_events"].tolist() == [2, 1]


def test_sessionize_matches_bruteforce(spark, sf_dir):
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    got = (
        sessionize(ev, gap_minutes=30)
        .orderBy("user_id", "session_idx")
        .toPandas()
    )
    pdf = ev.toPandas().sort_values(["user_id", "ts", "event_id"])
    pdf["us"] = pdf["ts"].astype("int64") // 1000
    out = []
    for uid, g in pdf.groupby("user_id"):
        sess, n, first = 0, 0, None
        prev = None
        for _, r in g.iterrows():
            if prev is None or r["us"] - prev > 30 * 60_000_000:
                if n:
                    out.append((uid, sess, n, first, prev))
                sess, n, first = sess + 1, 0, r["us"]
            n += 1
            prev = r["us"]
        out.append((uid, sess, n, first, prev))
    want = pd.DataFrame(
        out, columns=["user_id", "session_idx", "n_events", "first_us",
                      "last_us"]
    )
    assert got[want.columns.tolist()].values.tolist() == \
        want.values.tolist()


def test_tumbling_counts_exact_cents(spark):
    rows = [
        (0, T0 + dt.timedelta(minutes=5), 1, "a", 0.1),
        (1, T0 + dt.timedelta(minutes=55), 2, "a", 0.2),
        (2, T0 + dt.timedelta(minutes=65), 1, "b", 10.01),
        (3, T0 + dt.timedelta(minutes=60), 1, "a", 1.0),  # boundary → w2
    ]
    got = (
        tumbling_counts(_ev(spark, rows), width_minutes=60)
        .orderBy("win_start_us", "event_type")
        .toPandas()
    )
    w0 = int(T0.timestamp()) * 1_000_000
    w1 = w0 + 3_600_000_000
    assert got.values.tolist() == [
        [w0, "a", 2, 30],          # 0.1 + 0.2 → 30 cents exactly
        [w1, "a", 1, 100],
        [w1, "b", 1, 1001],
    ]


def test_sliding_counts_fanout_and_alignment(spark):
    """Hand-built stream, width 60 / slide 15: every event lands in
    EXACTLY width/slide = 4 windows, window starts are slide-aligned,
    and the newest window containing an event starts at its own
    aligned slot (us - us % slide)."""
    from antidb_spark.operators.events import sliding_counts

    rows = [(0, T0 + dt.timedelta(minutes=20), 1, "a", 1.0)]
    got = (
        sliding_counts(_ev(spark, rows), width_minutes=60, slide_minutes=15)
        .orderBy("win_start_us")
        .toPandas()
    )
    t0us = int(T0.timestamp()) * 1_000_000
    slide = 15 * 60_000_000
    # event at +20 min → aligned slot +15 min; windows start at
    # -30, -15, 0, +15 minutes (all contain +20 within their 60 min)
    assert got["win_start_us"].tolist() == [
        t0us - 2 * slide, t0us - slide, t0us, t0us + slide
    ]
    assert got["n_events"].tolist() == [1, 1, 1, 1]
    assert got["sum_cents"].tolist() == [100] * 4


def test_sliding_counts_degrades_to_tumbling(spark, sf_dir):
    """slide == width is a tumbling window: bit-identical rollup."""
    from antidb_spark.operators.events import sliding_counts

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    slid = (
        sliding_counts(ev, width_minutes=60, slide_minutes=60)
        .orderBy("win_start_us", "event_type")
        .toPandas()
    )
    tumb = (
        tumbling_counts(ev, width_minutes=60)
        .orderBy("win_start_us", "event_type")
        .toPandas()
    )
    pd.testing.assert_frame_equal(slid, tumb)


def test_sliding_counts_conservation_and_validation(spark, sf_dir):
    """Σ n_events over all windows == |events| · width/slide (every
    event in exactly that many windows); non-divisible slide rejected."""
    import pytest

    from antidb_spark.operators.events import sliding_counts

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    agg = sliding_counts(ev, 60, 15).agg(
        F.sum("n_events").alias("s")
    ).collect()[0]
    assert agg["s"] == ev.count() * 4
    with pytest.raises(ValueError, match="multiple"):
        sliding_counts(ev, 60, 25)
    with pytest.raises(ValueError, match="multiple"):
        sliding_counts(ev, 60, 0)
