"""Event-stream batch operators over the ``events`` table
(event_id, ts, user_id, event_type, value, props) — the
agent-telemetry / clickstream shapes a transcript pipeline sits next
to: gap-based sessionization and tumbling-window rollups.

Scale shapes:
- ``sessionize``: one hash shuffle on user_id, per-user timestamp sort
  inside the window — work per user is O(events_of_user log), never
  cross-user; skewed power users are bounded by the per-user event
  count, not the corpus. (The same semantics stream as
  ``session_window`` in Structured Streaming; this is the batch/
  backfill form over committed history.)
- ``tumbling_counts``: a single map-side-combinable groupBy on
  (bucket, event_type) — the classic pre-aggregation; bucket count is
  time-range/width, independent of |events|.

Cross-engine determinism: timestamps compare as exact epoch
MICROSECONDS (unix_micros ↔ DuckDB epoch_us — integer math, no float
seconds), the session order key is (ts, event_id) so equal timestamps
can't reorder, and money-like doubles aggregate as exact integer
cents (each per-row round is on identical doubles; the SUM is then
associative), so DuckDB reproduces every value bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _epoch_us(ts_col: str):
    """Exact epoch microseconds. Parquet TIMESTAMP_NTZ casts to
    TIMESTAMP in the session zone (pinned UTC in session.py), so the
    wall-clock value IS the instant — matching DuckDB's epoch_us over
    the same naive column."""
    return F.unix_micros(F.col(ts_col).cast("timestamp"))


def sessionize(
    events: DataFrame,
    gap_minutes: int = 30,
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
) -> DataFrame:
    """Gap-based sessions per user: a new session starts when the gap
    to the previous event exceeds ``gap_minutes``. Output one row per
    session: (user, session_idx [1-based per user in time order],
    n_events, first_us, last_us, duration_us) — epoch-microsecond
    longs for exact cross-engine comparison."""
    gap_us = int(gap_minutes) * 60_000_000
    us = _epoch_us(ts_col)
    w = Window.partitionBy(user_col).orderBy("_us", id_col)
    # two window stages (lag, then running sum) — a window function
    # can't nest inside another window's aggregate
    flagged = events.select(
        F.col(user_col).alias("user_id"),
        F.col(id_col).alias("_id"),
        us.alias("_us"),
    ).withColumn(
        "_prev", F.lag("_us").over(
            Window.partitionBy("user_id").orderBy("_us", "_id")
        )
    ).withColumn(
        "_ns",
        F.when(
            F.col("_prev").isNull()
            | ((F.col("_us") - F.col("_prev")) > F.lit(gap_us)),
            1,
        ).otherwise(0),
    )
    sess_idx = F.sum("_ns").over(
        Window.partitionBy("user_id")
        .orderBy("_us", "_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        flagged.select(
            "user_id", "_us", sess_idx.alias("session_idx")
        )
        .groupBy("user_id", "session_idx")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min("_us").alias("first_us"),
            F.max("_us").alias("last_us"),
        )
        .withColumn("duration_us", F.col("last_us") - F.col("first_us"))
    )


def tumbling_counts(
    events: DataFrame,
    width_minutes: int = 60,
    ts_col: str = "ts",
    type_col: str = "event_type",
    value_col: str = "value",
) -> DataFrame:
    """Tumbling-window rollup: (win_start_us, event_type, n_events,
    sum_cents) per aligned ``width_minutes`` bucket. ``sum_cents`` is
    the exact integer-cents sum (per-row round of value·100 on
    identical doubles, then associative integer SUM)."""
    width_us = int(width_minutes) * 60_000_000
    us = _epoch_us(ts_col)
    bucket = (us - (us % F.lit(width_us))).alias("win_start_us")
    cents = F.round(F.col(value_col) * 100, 0).cast("long")
    return (
        events.select(bucket, F.col(type_col).alias("event_type"),
                      cents.alias("_cents"))
        .groupBy("win_start_us", "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("_cents").alias("sum_cents"),
        )
    )


def sliding_counts(
    events: DataFrame,
    width_minutes: int = 60,
    slide_minutes: int = 15,
    ts_col: str = "ts",
    type_col: str = "event_type",
    value_col: str = "value",
) -> DataFrame:
    """Hopping (sliding) window rollup: (win_start_us, event_type,
    n_events, sum_cents) per ``width_minutes`` window advancing every
    ``slide_minutes`` (``width`` must be a multiple of ``slide``;
    ``slide == width`` degrades to :func:`tumbling_counts`). The batch
    form of Structured Streaming's ``window(ts, width, slide)``.

    Scale shape: each event fans out to EXACTLY ``width/slide`` window
    rows via a codegen ``sequence``/``explode`` (an event at ``us``
    belongs to every aligned start in ``(us - width, us]`` — all
    ``width/slide`` of them, so no post-filter), then ONE map-side-
    combinable groupBy. Output row count is bounded by windows ×
    types (time-range/slide), never by |events|; the shuffle carries
    the pre-aggregated partials, not the fan-out.

    Exactness: epoch-microsecond integer window math and integer-cents
    sums, same as :func:`tumbling_counts` — DuckDB reproduces every
    value bit-for-bit."""
    width_us = int(width_minutes) * 60_000_000
    slide_us = int(slide_minutes) * 60_000_000
    if slide_us <= 0 or width_us % slide_us:
        raise ValueError(
            f"width_minutes ({width_minutes}) must be a positive "
            f"multiple of slide_minutes ({slide_minutes})"
        )
    nwin = width_us // slide_us
    us = _epoch_us(ts_col)
    aligned = us - (us % F.lit(slide_us))
    cents = F.round(F.col(value_col) * 100, 0).cast("long")
    return (
        events.select(
            aligned.alias("_aligned"),
            F.col(type_col).alias("event_type"),
            cents.alias("_cents"),
        )
        .select(
            "_aligned", "event_type", "_cents",
            F.explode(F.sequence(F.lit(0), F.lit(nwin - 1))).alias("_i"),
        )
        .select(
            (
                F.col("_aligned") - F.col("_i").cast("long") * slide_us
            ).alias("win_start_us"),
            "event_type",
            "_cents",
        )
        .groupBy("win_start_us", "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("_cents").alias("sum_cents"),
        )
    )
