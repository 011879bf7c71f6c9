"""Incremental index maintenance over Structured Streaming.

The reference is single-shot batch (SURVEY §1.4); this module is the
engine's forward extension (§7.6) for transcript streams: new turns
arrive continuously, postings deltas are appended exactly-once, and a
periodic compaction folds deltas into the packed block index.

Design (idiomatic Structured Streaming):

- ``stream_postings``: the SAME tokenize→explode→(term, id, tf) plan as
  batch — stateless narrow ops, so it runs unchanged on a streaming
  DataFrame (shared-analyzer invariant extends to streams).
- ``PostingsDeltaSink``: a ``foreachBatch`` sink appending per-batch
  postings to a ``postings_delta`` catalog table, partitioned by
  ``batch_id``. Exactly-once: ``foreachBatch`` can re-deliver a batch
  after recovery, so the sink skips batch_ids already recorded in the
  checkpoint ledger (idempotent sink + replayable source = the
  streaming analog of the build's resume protocol).
- ``compact``: merges main postings + all deltas, re-aggregates tf
  (a doc's turns may span batches — tf sums associatively), and runs
  the ordinary ``IndexBuilder`` over the merged relation into a fresh
  index root. At scale this is the classic LSM shape: cheap appends,
  periodic leveled rebuild; queries read the last compacted snapshot.
- ``turn_rates``: watermarked tumbling-window aggregate (turns/min per
  role) — late data beyond the watermark is dropped, demonstrating the
  engine's event-time handling on the ``ts`` column.

Scale notes: delta append is a map-only job per micro-batch (one
shuffle for the per-batch tf groupBy, bounded by batch size, never by
corpus size); compaction cost is proportional to total postings and
runs out-of-band. No driver-side state beyond the batch ledger.
"""

from __future__ import annotations

import json
import os
from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from antidb_spark.functions.analyze import tokens
from antidb_spark.schema import DOC_ID_COLS


def stream_postings(
    stream: DataFrame, id_cols=DOC_ID_COLS, text_col: str = "text"
) -> DataFrame:
    """Streaming (term, *id_cols, tf) — same plan as the batch builder."""
    return (
        stream.select(*id_cols, F.explode(tokens(text_col)).alias("term"))
        .groupBy("term", *id_cols)
        .agg(F.count(F.lit(1)).alias("tf"))
    )


class PostingsDeltaSink:
    """Exactly-once foreachBatch sink for postings deltas."""

    def __init__(self, root: str, id_cols=DOC_ID_COLS, text_col: str = "text"):
        self.root = root
        self.id_cols = list(id_cols)
        self.text_col = text_col
        self.delta_dir = os.path.join(root, "postings_delta")
        self.ledger = os.path.join(root, "_delta_ledger.json")
        os.makedirs(self.delta_dir, exist_ok=True)

    def committed_batches(self) -> set[int]:
        if not os.path.exists(self.ledger):
            return set()
        with open(self.ledger) as f:
            return set(json.load(f)["batches"])

    def _record(self, batch_id: int, rows: int) -> None:
        done = self.committed_batches()
        done.add(batch_id)
        tmp = self.ledger + ".tmp"
        with open(tmp, "w") as f:
            json.dump({"batches": sorted(done), "last_rows": rows}, f)
        os.replace(tmp, self.ledger)  # atomic commit, data written first

    def __call__(self, batch_df: DataFrame, batch_id: int) -> None:
        if batch_id in self.committed_batches():
            return  # re-delivered after recovery → idempotent skip
        post = (
            batch_df.select(
                *self.id_cols, F.explode(tokens(self.text_col)).alias("term")
            )
            .groupBy("term", *self.id_cols)
            .agg(F.count(F.lit(1)).alias("tf"))
        )
        out = os.path.join(self.delta_dir, f"batch_id={batch_id}")
        post.write.mode("overwrite").option("compression", "zstd").parquet(out)
        self._record(batch_id, -1)

    def deltas(self, spark: SparkSession) -> DataFrame | None:
        dirs = [
            os.path.join(self.delta_dir, d)
            for d in sorted(os.listdir(self.delta_dir))
            if d.startswith("batch_id=")
        ]
        if not dirs:
            return None
        return spark.read.parquet(*dirs).select(
            "term", *self.id_cols, "tf"
        )


def run_ingestion(
    stream: DataFrame,
    sink: PostingsDeltaSink,
    checkpoint_dir: str,
) -> Any:
    """Start the ingestion query (availableNow for bounded test runs;
    a production stream drops that trigger)."""
    return (
        stream.writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def compact(
    spark: SparkSession,
    sink: PostingsDeltaSink,
    index_root: str,
    base_postings: DataFrame | None = None,
):
    """Fold all deltas (+ optional existing postings) into a fresh packed
    index at ``index_root``; returns the IndexBuilder over it."""
    from antidb_spark.operators.build import IndexBuilder

    parts = [d for d in (base_postings, sink.deltas(spark)) if d is not None]
    if not parts:
        raise ValueError("nothing to compact")
    merged = parts[0]
    for p in parts[1:]:
        merged = merged.unionByName(p)
    postings = merged.groupBy("term", *sink.id_cols).agg(
        F.sum("tf").alias("tf")
    )
    b = IndexBuilder(spark, index_root, id_cols=sink.id_cols)
    # hand the builder pre-tokenized postings: write stage 0 directly,
    # then let the normal resumable pipeline derive the rest
    if not b.ckpt.is_done("postings"):
        man = b.catalog.write(postings, "postings")
        b.ckpt.mark_done(
            "postings", rows=sum(e["rows"] for e in man["files"]),
            snapshot=man["snapshot_id"], seconds=0.0,
        )
    b.build(corpus=None)
    return b


def turn_rates(
    stream: DataFrame,
    watermark: str = "10 minutes",
    window: str = "1 minute",
) -> DataFrame:
    """Watermarked tumbling-window turns-per-window per role; late rows
    beyond the watermark are dropped (event time = ``ts``)."""
    return (
        stream.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "role")
        .agg(F.count(F.lit(1)).alias("n_turns"))
        .select(
            F.col("w.start").alias("window_start"),
            "role",
            "n_turns",
        )
    )
