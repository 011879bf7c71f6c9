"""Stateful streaming sessionization (streaming/sessions.py,
applyInPandasWithState): batch-identical gap semantics across
micro-batch boundaries, watermark-timeout session closure, and full
parity with operators/events.sessionize over the synth events table.
The cross-engine DuckDB oracle lives in __spark_entry__.py
(stream_sessions entry, same SQL as the batch sessionize entry)."""

from __future__ import annotations

import datetime as dt

import pandas as pd
import pytest

from antidb_spark.operators.events import sessionize
from antidb_spark.streaming.sessions import run_sessionize_stream

T0 = dt.datetime(2024, 1, 1, 0, 0, 0)
FLUSH_USER = 999_999_999


def _write_file(spark, dirpath, rows, name):
    """One parquet file (one micro-batch at maxFilesPerTrigger=1)."""
    pdf = pd.DataFrame(rows, columns=["event_id", "ts", "user_id"])
    df = spark.createDataFrame(pdf, "event_id long, ts timestamp, user_id long")
    tmp = str(dirpath / f"_stage_{name}")
    df.coalesce(1).write.mode("overwrite").parquet(tmp)
    import glob
    import shutil

    part = glob.glob(f"{tmp}/part-*.parquet")[0]
    shutil.move(part, str(dirpath / f"{name}.parquet"))
    shutil.rmtree(tmp)


def _run(spark, tmp_path, watermark_delay="30 minutes", one_file_batches=True,
         name="s"):
    return run_sessionize_stream(
        spark,
        str(tmp_path / "src"),
        str(tmp_path / "ckpt"),
        table_name=f"stream_sessions_{name}",
        gap_minutes=30,
        watermark_delay=watermark_delay,
        max_files_per_trigger=1 if one_file_batches else None,
    )


def test_sessions_cross_batch_continuity_and_timeout_flush(spark, tmp_path):
    """A session whose events SPAN micro-batches is one session (state
    carries across batches); open sessions flush when the watermark
    passes last+gap (the flusher batch advances it), with correct
    1-based numbering."""
    m = dt.timedelta(minutes=1)
    src = tmp_path / "src"
    src.mkdir()
    _write_file(spark, src, [
        (0, T0, 1),
        (1, T0 + 5 * m, 1),
        (2, T0, 2),
    ], "001")
    _write_file(spark, src, [
        (3, T0 + 10 * m, 1),          # same session as batch 1's events
        (4, T0 + 60 * m, 1),          # > 30 min after +10 → session 2
    ], "002")
    _write_file(spark, src, [
        (5, T0 + dt.timedelta(days=3650), FLUSH_USER),
    ], "003")
    got = (
        _run(spark, tmp_path, name="cont")
        .filter(f"user_id != {FLUSH_USER}")
        .orderBy("user_id", "session_idx")
        .collect()
    )
    t0us = int(T0.timestamp()) * 1_000_000
    mus = 60_000_000
    assert [tuple(r) for r in got] == [
        (1, 1, 3, t0us, t0us + 10 * mus, 10 * mus),
        (1, 2, 1, t0us + 60 * mus, t0us + 60 * mus, 0),
        (2, 1, 1, t0us, t0us, 0),
    ]


def test_sessions_strict_gap_boundary(spark, tmp_path):
    """== gap does NOT split (strict >), gap+1us does — the batch
    operator's boundary contract, preserved where Spark's built-in
    session_window (exclusive end) would differ."""
    src = tmp_path / "src"
    src.mkdir()
    gap = dt.timedelta(minutes=30)
    eps = dt.timedelta(microseconds=1)
    _write_file(spark, src, [
        (0, T0, 7),
        (1, T0 + gap, 7),              # exactly gap → SAME session
        (2, T0 + gap + gap + eps, 7),  # gap + 1us → NEW session
    ], "001")
    _write_file(spark, src, [
        (3, T0 + dt.timedelta(days=3650), FLUSH_USER),
    ], "002")
    got = (
        _run(spark, tmp_path, name="bound")
        .filter(f"user_id != {FLUSH_USER}")
        .orderBy("session_idx")
        .collect()
    )
    assert [(r["session_idx"], r["n_events"]) for r in got] == [(1, 2), (2, 1)]


def test_sessions_idx_continues_after_timeout_flush(spark, tmp_path):
    """A user who returns AFTER their open session was timeout-flushed
    continues the per-user numbering (the closed counter survives)."""
    src = tmp_path / "src"
    src.mkdir()
    d = dt.timedelta
    _write_file(spark, src, [(0, T0, 5)], "001")
    _write_file(spark, src, [(1, T0 + d(days=100), FLUSH_USER)], "002")
    _write_file(spark, src, [(2, T0 + d(days=200), 5)], "003")
    _write_file(spark, src, [(3, T0 + d(days=300), FLUSH_USER)], "004")
    got = (
        _run(spark, tmp_path, name="ret")
        .filter(f"user_id != {FLUSH_USER}")
        .orderBy("session_idx")
        .collect()
    )
    assert [(r["session_idx"], r["n_events"]) for r in got] == [(1, 1), (2, 1)]


def test_sessions_parity_with_batch(spark, tmp_path, sf_dir):
    """Full parity: the streaming sessionizer over the synth events
    table (split across 3 files → several micro-batches) emits exactly
    the batch operator's rows. Watermark delay spans the whole corpus
    so arbitrary file splits can't make rows late; the flusher's far
    future timestamp closes every real session."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "event_id", "ts", "user_id"
    )
    src = tmp_path / "src"
    src.mkdir()
    pdf = ev.toPandas()
    for i in range(3):
        part = pdf[pdf["event_id"] % 3 == i]
        _write_file(
            spark, src,
            list(part.itertuples(index=False, name=None)), f"00{i}"
        )
    max_ts = pdf["ts"].max()
    _write_file(spark, src, [
        (10**12, max_ts + pd.Timedelta(days=8000), FLUSH_USER)
    ], "009")
    got = (
        _run(spark, tmp_path, watermark_delay="3650 days",
             one_file_batches=True, name="par")
        .filter(f"user_id != {FLUSH_USER}")
        .orderBy("user_id", "session_idx")
        .toPandas()
    )
    want = (
        sessionize(ev, gap_minutes=30)
        .orderBy("user_id", "session_idx")
        .toPandas()
    )
    pd.testing.assert_frame_equal(
        got.reset_index(drop=True), want.reset_index(drop=True),
        check_dtype=False,
    )


# --- pure-fold property test (no JVM) ------------------------------------


def _batch_sessions_reference(events, gap_us):
    """The batch operator's semantics in plain python: globally sorted
    (us, id), strict-gap split, 1-based idx."""
    out, first, last, n, idx = [], None, None, 0, 0
    for us, _ in sorted(events):
        if first is None:
            first, last, n = us, us, 1
        elif us - last > gap_us:
            idx += 1
            out.append((idx, n, first, last))
            first, last, n = us, us, 1
        else:
            last, n = max(last, us), n + 1
    if first is not None:
        idx += 1
        out.append((idx, n, first, last))
    return out


def test_fold_core_property_matches_batch_reference():
    """For ANY arrival order and watermark schedule consistent with the
    watermark contract (arrivals carry ts >= current watermark,
    watermark non-decreasing), the concatenated fold_core emissions
    equal the batch reference. Hypothesis drives event times, batch
    splits, and advance/hold watermark choices."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from antidb_spark.streaming.sessions import fold_core

    gap_us = 100

    @settings(max_examples=300, deadline=None)
    @given(
        times=st.lists(
            st.integers(min_value=0, max_value=2_000), min_size=0,
            max_size=40,
        ),
        splits=st.data(),
    )
    def run(times, splits):
        events = [(us, i) for i, us in enumerate(times)]
        # arrival schedule: repeatedly deliver a random subset of the
        # not-yet-delivered events whose ts >= current watermark; the
        # watermark may advance up to min(undelivered ts) before each
        # batch (the contract: nothing late ever arrives)
        undelivered = sorted(events)
        wm, state = 0, (0, -1, -1, 0, [])
        emitted = []
        while undelivered:
            advance = splits.draw(st.booleans())
            if advance:
                wm = max(wm, undelivered[0][0] + splits.draw(
                    st.integers(min_value=0, max_value=1)
                ))
            deliverable = [e for e in undelivered if e[0] >= wm]
            if not deliverable:
                # everything below watermark already delivered — the
                # remaining events would be late; deliver them anyway?
                # no: the contract says they can't exist. Flush instead.
                break
            take = splits.draw(
                st.integers(min_value=1, max_value=len(deliverable))
            )
            batch = splits.draw(st.permutations(deliverable))[:take]
            for e in batch:
                undelivered.remove(e)
            n_closed, first, last, n, buf = state
            closed, n_closed, first, last, n, buf = fold_core(
                n_closed, first, last, n, buf + batch, wm, gap_us
            )
            emitted.extend(closed)
            state = (n_closed, first, last, n, buf)
        delivered = [e for e in events if e not in undelivered]
        # final flush: watermark passes everything
        n_closed, first, last, n, buf = state
        closed, *_rest = fold_core(
            n_closed, first, last, n, buf,
            max([u for u, _ in delivered], default=0) + gap_us + 1,
            gap_us,
        )
        emitted.extend(closed)
        assert emitted == _batch_sessions_reference(delivered, gap_us)

    run()
