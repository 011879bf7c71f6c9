"""Typed schemas for the engine's tables.

The reference is schema-less (structure imposed per-index by user lambdas,
``idx.py:44,137-138``); here every table is a fixed StructType per
BASELINE.json ``input_hint``.

``doc`` identity: the reference identifies a row by the byte offset of its
line (``idx.py:124,131``). We use explicit key columns — for transcripts a
``struct<conv_id:string, turn_idx:int>`` (struct ordering in Spark is
lexicographic by field, which reproduces the reference's
key-then-file-offset result order, ``prs.py:86-105``).
"""

from __future__ import annotations

from pyspark.sql import types as T

TRANSCRIPTS_SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType(), False),
        T.StructField("turn_idx", T.IntegerType(), False),
        T.StructField("role", T.StringType(), False),
        T.StructField("text", T.StringType(), False),
        T.StructField("tool", T.StringType(), True),
        T.StructField("ts", T.TimestampType(), False),
    ]
)

# Postings: one row per (term, doc) with term frequency — the distributed
# analog of the reference's `[sort_key, lstart]` index entry (idx.py:143-149).
POSTINGS_SCHEMA = T.StructType(
    [
        T.StructField("term", T.StringType(), False),
        T.StructField("conv_id", T.StringType(), False),
        T.StructField("turn_idx", T.IntegerType(), False),
        T.StructField("tf", T.LongType(), False),
    ]
)

# Packed posting blocks: delta+varint docID gaps + tfs + doc lengths in
# binary cells. Block-max pruning metadata is the block's (tf, dl)
# PARETO FRONT, not a precomputed score: the exact block-max BM25
# contribution idf(df)·max-over-front tfw is derived at query time from
# CURRENT corpus stats (tfw is monotone ↑tf, ↓dl, so the max over all
# postings is achieved on the front), which keeps pruning lossless and
# exact after incremental appends change df/avgdl/N.
# Analog of the reference's zstd-pickled columnar leaves (idx.py:160-173),
# with block metadata playing the role of node first-keys (idx.py:225).
BLOCKS_SCHEMA = T.StructType(
    [
        T.StructField("term", T.StringType(), False),
        T.StructField("block_id", T.LongType(), False),
        T.StructField("n_docs", T.IntegerType(), False),
        T.StructField("min_ord", T.LongType(), False),
        T.StructField("max_ord", T.LongType(), False),
        T.StructField("tfs_front", T.ArrayType(T.LongType()), False),
        T.StructField("dls_front", T.ArrayType(T.LongType()), False),
        T.StructField("docs_packed", T.BinaryType(), False),
        T.StructField("tfs_packed", T.BinaryType(), False),
        T.StructField("dls_packed", T.BinaryType(), False),
    ]
)

DOC_ID_COLS = ("conv_id", "turn_idx")
