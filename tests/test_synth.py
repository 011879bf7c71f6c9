"""Synthetic corpus determinism — per-turn text equality under stable
(conv_id, turn_idx) ordering regardless of parallelism (input_hint's
per-row invariant)."""

from __future__ import annotations

from antidb_spark.synth import query_set, synth_transcripts, vocabulary


def test_deterministic_across_partitionings(spark):
    a = synth_transcripts(spark, n_convs=12, seed=42, partitions=1)
    b = synth_transcripts(spark, n_convs=12, seed=42, partitions=8)
    pa = a.orderBy("conv_id", "turn_idx").toPandas()
    pb = b.orderBy("conv_id", "turn_idx").toPandas()
    assert pa.equals(pb)
    assert len(pa) > 12
    assert pa["text"].map(len).min() > 0


def test_schema_and_invariants(spark):
    df = synth_transcripts(spark, n_convs=5, seed=7)
    assert [f.name for f in df.schema.fields] == [
        "conv_id", "turn_idx", "role", "text", "tool", "ts",
    ]
    pdf = df.toPandas()
    # tool non-null iff role == 'tool'
    assert (pdf["tool"].notna() == (pdf["role"] == "tool")).all()
    # turn_idx dense from 0 within each conversation
    for _, grp in pdf.groupby("conv_id"):
        assert sorted(grp["turn_idx"]) == list(range(len(grp)))


def test_term_skew_exists(spark):
    """Stopwords must dominate (reference skew analog tests.py:712)."""
    pdf = synth_transcripts(spark, n_convs=50, seed=42).toPandas()
    all_tokens = " ".join(pdf["text"]).split()
    n_the = sum(1 for t in all_tokens if t == "the")
    assert n_the / len(all_tokens) > 0.03


def test_query_set_fixed():
    qs = query_set(50, seed=42)
    assert len(qs) == 50
    assert qs == query_set(50, seed=42)
    vocab = set(vocabulary())
    assert all(t in vocab for q in qs for t in q.split())
