"""Positional postings + phrase search vs a brute-force Python oracle."""

from __future__ import annotations

import pytest

from antidb_spark.functions.analyze import py_tokens
from antidb_spark.operators.phrase import phrase_search, positional_postings

DOCS = [
    (0, "spark runs fast and spark runs far"),
    (1, "runs spark runs fast runs fast"),
    (2, "fast spark! spark RUNS fast."),
    (3, "nothing to see here"),
    (4, "spark runs"),
    (5, "runs runs runs runs"),
    (6, "a b a b a"),
]


def _py_phrase(docs, phrase):
    terms = py_tokens(phrase)
    out = {}
    for i, text in docs:
        toks = py_tokens(text)
        n = sum(
            1
            for s in range(len(toks) - len(terms) + 1)
            if toks[s : s + len(terms)] == terms
        )
        if n:
            out[i] = n
    return out


@pytest.fixture(scope="module")
def docs_df(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string").cache()


@pytest.mark.parametrize(
    "phrase",
    [
        "spark runs",
        "spark runs fast",
        "runs fast",
        "runs runs",        # overlapping occurrences of a repeated term
        "a b a",            # repeated term at distance 2
        "spark",            # single term → tf semantics
        "fast spark spark runs",
        "zzz missing",      # miss → empty
    ],
)
def test_phrase_matches_bruteforce(docs_df, phrase):
    got = {
        r["doc_id"]: r["phrase_freq"]
        for r in phrase_search(docs_df, phrase, id_cols=("doc_id",)).collect()
    }
    assert got == _py_phrase(DOCS, phrase), phrase


def test_phrase_empty_and_ordering(docs_df):
    assert phrase_search(docs_df, "  ...  ", id_cols=("doc_id",)).count() == 0
    rows = phrase_search(docs_df, "runs fast", id_cols=("doc_id",)).collect()
    freqs = [r["phrase_freq"] for r in rows]
    assert freqs == sorted(freqs, reverse=True)  # ordered by freq desc


def test_positional_postings_roundtrip(docs_df):
    rows = positional_postings(docs_df, id_cols=("doc_id",)).collect()
    by_key = {(r["doc_id"], r["term"]): r for r in rows}
    toks0 = py_tokens(DOCS[0][1])
    want_spark = [i for i, t in enumerate(toks0) if t == "spark"]
    assert list(by_key[(0, "spark")]["positions"]) == want_spark
    assert by_key[(0, "spark")]["tf"] == len(want_spark)


# --- persisted positional-blocks index -----------------------------------


@pytest.fixture(scope="module")
def pos_builder(spark, docs_df, tmp_path_factory):
    """Base index + positional blocks over the tiny corpus."""
    from antidb_spark.operators.build import IndexBuilder
    from antidb_spark.operators.phrase import build_positional_index

    root = str(tmp_path_factory.mktemp("pos_idx"))
    b = IndexBuilder(spark, root, id_cols=("doc_id",))
    b.build(docs_df, n_partitions=4)
    build_positional_index(b, docs_df, n_partitions=4)
    return b


@pytest.mark.parametrize(
    "phrase",
    [
        "spark runs",
        "spark runs fast",
        "runs runs",
        "a b a",
        "spark",
        "zzz missing",
    ],
)
def test_phrase_query_matches_adhoc(pos_builder, docs_df, phrase):
    """Index-served phrase == ad-hoc corpus phrase (rows AND order)."""
    from antidb_spark.operators.phrase import phrase_query, phrase_search

    got = phrase_query(pos_builder, phrase).toPandas()
    want = phrase_search(docs_df, phrase, id_cols=("doc_id",)).toPandas()
    assert got.values.tolist() == want.values.tolist(), phrase


@pytest.mark.parametrize("phrase", ["spark runs", "runs runs", "a b a", "zzz"])
def test_phrase_warm_matches_query(pos_builder, phrase):
    """Warm (no-Spark-job) path row/value-identical to the distributed
    path."""
    from antidb_spark.operators.phrase import phrase_query, phrase_warm

    got = phrase_warm(pos_builder, phrase)
    want = phrase_query(pos_builder, phrase).toPandas()
    assert got.values.tolist() == want.values.tolist(), phrase


def test_phrase_query_empty_and_unbuilt(spark, pos_builder, docs_df, tmp_path):
    from antidb_spark.operators.build import IndexBuilder
    from antidb_spark.operators.phrase import phrase_query, phrase_warm

    assert phrase_query(pos_builder, " ... ").count() == 0
    assert len(phrase_warm(pos_builder, " ... ")) == 0
    b2 = IndexBuilder(spark, str(tmp_path / "nopos"), id_cols=("doc_id",))
    b2.build(docs_df, n_partitions=2)
    with pytest.raises(ValueError, match="positional index not built"):
        phrase_query(b2, "spark runs")


def test_phrase_blocks_span_block_and_partition_boundaries(spark, tmp_path):
    """>128 docs per term forces multiple blocks across multiple pack
    partitions; anchors must survive the block cuts."""
    from antidb_spark.operators.build import IndexBuilder
    from antidb_spark.operators.phrase import (
        build_positional_index,
        phrase_query,
        phrase_warm,
    )

    rows = [
        (i, ("filler%d " % i) + "alpha beta " * (1 + i % 3) + "gamma")
        for i in range(300)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    b = IndexBuilder(spark, str(tmp_path / "span_idx"), id_cols=("doc_id",))
    b.build(df, n_partitions=4)
    man = build_positional_index(b, df, n_partitions=4)
    # the alpha/beta posting lists must actually span >1 block row
    tbl = b.catalog.read_pruned_arrow(
        "pos_blocks", "term", ["alpha"], columns=["term", "n_docs"]
    ).to_pandas()
    tbl = tbl[tbl["term"] == "alpha"]
    assert len(tbl) >= 2 and tbl["n_docs"].sum() == 300
    got = phrase_query(b, "alpha beta").toPandas()
    assert len(got) == 300
    freqs = {r.doc_id: r.phrase_freq for r in got.itertuples()}
    assert all(freqs[i] == 1 + i % 3 for i in range(300))
    warm = phrase_warm(b, "alpha beta")
    assert warm.values.tolist() == got.values.tolist()
    assert man["files"]  # committed


def test_compaction_appends_positional_layer(spark, tmp_path):
    """Appending new docs via compact_incremental extends pos_blocks
    O(delta) (the sink persists position deltas): phrase queries stay
    live across the compaction and match a from-scratch positional
    build over the merged corpus."""
    from antidb_spark.operators.build import IndexBuilder
    from antidb_spark.operators.phrase import (
        build_positional_index,
        phrase_query,
    )
    from antidb_spark.streaming.incremental import (
        PostingsDeltaSink,
        compact_incremental,
    )
    from antidb_spark.synth import synth_transcripts

    corpus = synth_transcripts(spark, n_convs=10, seed=7)
    b = IndexBuilder(spark, str(tmp_path / "cidx"))
    b.build(corpus, n_partitions=4)
    build_positional_index(b, corpus, n_partitions=4)
    assert phrase_query(b, "the").count() > 0

    new = synth_transcripts(spark, n_convs=12, seed=7).filter(
        "conv_id > 'conv_00000009'"
    )
    sink = PostingsDeltaSink(str(tmp_path / "csink"))
    sink(new, batch_id=0)
    m = compact_incremental(spark, sink, b, n_partitions=4)
    assert m["mode"] == "append" and m["pos_mode"] == "append"
    # no rebuild needed: the appended layer equals a from-scratch
    # positional build over the merged corpus
    merged = corpus.unionByName(new)
    b2 = IndexBuilder(spark, str(tmp_path / "cidx_full"))
    b2.build(merged, n_partitions=4)
    build_positional_index(b2, merged, n_partitions=4)
    for phrase in ["the", "the kemuba0", "data of"]:
        got = phrase_query(b, phrase).toPandas()
        want = phrase_query(b2, phrase).toPandas()
        assert got.values.tolist() == want.values.tolist(), phrase


def _py_phrase_prefix(docs, phrase, expansions):
    """Brute force: last token matches any of ``expansions``."""
    terms = py_tokens(phrase)
    head = terms[:-1]
    out = {}
    for i, text in docs:
        toks = py_tokens(text)
        n = sum(
            1
            for s in range(len(toks) - len(terms) + 1)
            if toks[s:s + len(head)] == head
            and toks[s + len(head)] in expansions
        )
        if n:
            out[i] = n
    return out


@pytest.mark.parametrize("phrase", ["spark ru", "runs fa", "a b", "spark zz"])
def test_phrase_prefix_matches_bruteforce(pos_builder, phrase):
    """match_phrase_prefix == brute force over the dictionary-expanded
    last token; ordering contract (freq desc, id asc) holds."""
    from antidb_spark.operators.phrase import phrase_prefix_query

    pref = phrase.split()[-1]
    exps = set(pos_builder.expand_prefix(pref))
    want = _py_phrase_prefix(DOCS, phrase, exps)
    got = phrase_prefix_query(pos_builder, phrase).toPandas()
    assert {int(r["doc_id"]): int(r["phrase_freq"])
            for _, r in got.iterrows()} == want, phrase
    freqs = got["phrase_freq"].tolist()
    assert freqs == sorted(freqs, reverse=True)


def test_phrase_prefix_cap_and_edges(pos_builder):
    """max_expansions takes the lexicographically-first terms (the ES
    contract); empty phrase / unknown prefix → empty, not an error."""
    from antidb_spark.operators.phrase import phrase_prefix_query

    # 'f' expands to {fast, far}; cap=1 keeps only 'far' (lex-first),
    # dropping every 'spark runs fast' hit that 'fast' completed
    full = phrase_prefix_query(pos_builder, "runs f").toPandas()
    capped = phrase_prefix_query(
        pos_builder, "runs f", max_expansions=1
    ).toPandas()
    assert set(pos_builder.expand_prefix("f", 1)) == {"far"}
    assert capped["phrase_freq"].sum() < full["phrase_freq"].sum()
    assert phrase_prefix_query(pos_builder, "").count() == 0
    assert phrase_prefix_query(pos_builder, "spark zzz").count() == 0


@pytest.mark.parametrize("phrase", ["spark ru", "runs fa", "a b", "spark zz"])
def test_phrase_prefix_warm_matches_query(pos_builder, phrase):
    """Warm (no-Spark-job) prefix path value-identical to the
    distributed one."""
    from antidb_spark.operators.phrase import (
        phrase_prefix_query,
        phrase_prefix_warm,
    )

    got = phrase_prefix_warm(pos_builder, phrase)
    want = phrase_prefix_query(pos_builder, phrase).toPandas()
    assert got.values.tolist() == want.values.tolist(), phrase
    capped = phrase_prefix_warm(pos_builder, phrase, max_expansions=1)
    capped_want = phrase_prefix_query(
        pos_builder, phrase, max_expansions=1
    ).toPandas()
    assert capped.values.tolist() == capped_want.values.tolist(), phrase
