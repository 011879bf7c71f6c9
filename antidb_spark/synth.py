"""Deterministic synthetic transcript corpus (BASELINE.json input_hint).

Generates the `transcripts` base relation — multi-turn conversation/agent
transcripts — entirely inside Spark (``spark.range`` → ``mapInPandas``),
so the same generator scales from 20-turn unit fixtures to bench corpora
without driver-side materialization. Determinism: every conversation is
generated from an RNG seeded by ``(seed, conv_id)`` only, so the output
is identical regardless of partitioning or parallelism — this is what
makes the local[8]-vs-local[32] scaling comparison apples-to-apples.

Vocabulary is Zipfian with explicit high-frequency stopwords, creating the
genuine term skew the reference's degenerate all-equal-key index pins
(tests.py:432-477; term 'bwa' in 19/20 lines, tests.py:712).
"""

from __future__ import annotations

import datetime as dt
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from antidb_spark.schema import TRANSCRIPTS_SCHEMA

# 32 real stopwords (rank 1..32 of the Zipf distribution) + generated tail.
STOPWORDS = (
    "the a of to and in is it for on with as at by an be this that from or "
    "are was not have has had but all can will"
).split()
VOCAB_SIZE = 5000
ZIPF_S = 1.07

# Deterministic pseudo-words for the vocabulary tail: CV-syllable words so
# queries read naturally; index i maps to a unique word.
_CONS = "bcdfghjklmnpqrstvwz"
_VOW = "aeiou"


def _word(i: int) -> str:
    syls = []
    n = i
    for _ in range(3):
        syls.append(_CONS[n % len(_CONS)] + _VOW[(n // len(_CONS)) % len(_VOW)])
        n //= len(_CONS) * len(_VOW)
    return "".join(syls) + str(i % 7)


def vocabulary(size: int = VOCAB_SIZE) -> list[str]:
    vocab = list(STOPWORDS)
    i = 0
    while len(vocab) < size:
        w = _word(i)
        i += 1
        if w not in vocab:
            vocab.append(w)
    return vocab


def zipf_probs(size: int = VOCAB_SIZE, s: float = ZIPF_S) -> np.ndarray:
    ranks = np.arange(1, size + 1, dtype=np.float64)
    p = 1.0 / ranks**s
    return p / p.sum()


ROLES = ["user", "assistant", "assistant", "user", "tool"]
TOOLS = ["search", "python", "browser", "calculator"]
_EPOCH = dt.datetime(2025, 1, 1, tzinfo=dt.timezone.utc)


def _gen_conversation(
    conv_num: int, seed: int, vocab: np.ndarray, probs: np.ndarray,
    mean_turns: int, mean_tokens: int,
) -> pd.DataFrame:
    rng = np.random.default_rng(np.random.SeedSequence([seed, conv_num]))
    n_turns = int(rng.integers(2, 2 * mean_turns))
    conv_id = f"conv_{conv_num:08d}"
    rows = []
    for t in range(n_turns):
        role = ROLES[int(rng.integers(0, len(ROLES)))]
        n_tok = max(1, int(rng.normal(mean_tokens, mean_tokens / 3)))
        words = rng.choice(vocab, size=n_tok, p=probs)
        rows.append(
            {
                "conv_id": conv_id,
                "turn_idx": np.int32(t),
                "role": role,
                "text": " ".join(words.tolist()),
                "tool": TOOLS[int(rng.integers(0, len(TOOLS)))] if role == "tool" else None,
                "ts": _EPOCH + dt.timedelta(hours=conv_num % 8760, seconds=30 * t),
            }
        )
    return pd.DataFrame(rows)


def synth_transcripts(
    spark: SparkSession,
    n_convs: int = 100,
    mean_turns: int = 8,
    mean_tokens: int = 40,
    seed: int = 42,
    partitions: int | None = None,
) -> DataFrame:
    """Distributed deterministic transcript generator.

    Output is bit-identical for any ``partitions``/parallelism — the RNG
    depends only on (seed, conv_id).
    """
    vocab = np.array(vocabulary(), dtype=object)
    probs = zipf_probs()
    mt, mk, sd = mean_turns, mean_tokens, seed

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            for conv_num in batch["id"]:
                yield _gen_conversation(int(conv_num), sd, vocab, probs, mt, mk)

    n_part = partitions or max(1, min(n_convs, spark.sparkContext.defaultParallelism))
    return (
        spark.range(n_convs, numPartitions=n_part)
        .mapInPandas(gen, schema=TRANSCRIPTS_SCHEMA)
    )


def query_set(n_queries: int = 50, seed: int = 42) -> list[str]:
    """Fixed seeded BM25 query set mixing rare / mid / stopword terms
    (FIXTURES.md §4 — 'the reference query set' for rank-identity)."""
    vocab = vocabulary()
    rng = np.random.default_rng(np.random.SeedSequence([seed, 7_777]))
    queries = []
    for _ in range(n_queries):
        n_terms = int(rng.integers(1, 5))
        terms = []
        for _ in range(n_terms):
            bucket = rng.random()
            if bucket < 0.2:  # stopword
                terms.append(vocab[int(rng.integers(0, 32))])
            elif bucket < 0.7:  # mid-frequency
                terms.append(vocab[int(rng.integers(32, 500))])
            else:  # rare tail
                terms.append(vocab[int(rng.integers(500, len(vocab)))])
        queries.append(" ".join(terms))
    return queries
