"""Training-pipeline additions: repetition stats (Gopher rules),
PII redaction, benchmark decontamination."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from antidb_spark.functions.analyze import py_tokens
from antidb_spark.operators.dedup import decontaminate
from antidb_spark.operators.textstats import redact_pii, repetition_stats

DOCS = [
    (0, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
    (1, "spam spam spam spam spam spam spam spam spam spam"),
    (2, "one two one two one two one two one two one two"),
    (3, "short"),
    (4, ""),
]


@pytest.fixture(scope="module")
def docs_df(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


def _py_rep(text: str) -> dict:
    toks = py_tokens(text)
    n = len(toks)
    g5 = (
        [" ".join(toks[i : i + 5]) for i in range(n - 4)]
        if n >= 5
        else ([" ".join(toks)] if n else [])
    )
    g2 = (
        [" ".join(toks[i : i + 2]) for i in range(n - 1)]
        if n >= 2
        else ([" ".join(toks)] if n else [])
    )
    g2 = [g for g in g2 if g]
    cov = max((g2.count(g) * len(g) for g in set(g2)), default=0)
    return {
        "n_tokens": n,
        "dup_token_frac": round(1 - len(set(toks)) / n, 6) if n else 0.0,
        "dup_5gram_frac": round(1 - len(set(g5)) / len(g5), 6) if n else 0.0,
        "top_2gram_frac": round(cov / max(len(text), 1), 6),
    }


def test_repetition_matches_python_oracle(docs_df):
    got = {r["doc_id"]: r.asDict() for r in repetition_stats(docs_df).collect()}
    for i, text in DOCS:
        want = _py_rep(text)
        for k, v in want.items():
            assert abs(got[i][k] - v) < 1e-9, (i, k, got[i][k], v)


def test_repetition_orders_docs_sensibly(docs_df):
    got = {r["doc_id"]: r.asDict() for r in repetition_stats(docs_df).collect()}
    assert got[0]["dup_token_frac"] == 0.0
    assert got[1]["dup_token_frac"] == 0.9  # 10x 'spam'
    assert got[1]["dup_5gram_frac"] > 0.8
    assert got[2]["top_2gram_frac"] > got[0]["top_2gram_frac"]


def test_redact_pii(spark):
    df = spark.createDataFrame(
        [
            (0, "mail bob.smith@corp.example.org or call 555-1234 now"),
            (1, "digits 123-45 do not match and neither does plain text"),
            (2, "two mails a@b.io c.d@e.co and 999-0000"),
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r.asDict() for r in redact_pii(df).collect()}
    assert got[0]["redacted"] == "mail <EMAIL> or call <PHONE> now"
    assert (got[0]["n_emails"], got[0]["n_phones"]) == (1, 1)
    assert got[1]["redacted"] == df.collect()[1]["text"]  # untouched
    assert (got[1]["n_emails"], got[1]["n_phones"]) == (0, 0)
    assert (got[2]["n_emails"], got[2]["n_phones"]) == (2, 1)
    assert "<EMAIL> <EMAIL>" in got[2]["redacted"]


def test_decontaminate_flags_planted_overlap(spark):
    corpus = spark.createDataFrame(
        [
            (0, "aa bb cc dd ee ff gg hh ii jj"),
            (1, "zz yy xx ww vv uu tt ss rr qq"),
            (2, "aa bb cc dd ee unrelated tail words here now"),
        ],
        "doc_id long, text string",
    )
    bench = spark.createDataFrame(
        [(100, "aa bb cc dd ee ff")], "bench_id long, bench_text string"
    )
    got = {
        (r["doc_id"], r["bench_id"]): r["n_shared"]
        for r in decontaminate(corpus, bench, n=5, max_gram_df=None).collect()
    }
    # doc 0 shares both 5-grams of the snippet; doc 2 shares the first
    assert got[(0, 100)] == 2
    assert got[(2, 100)] == 1
    assert (1, 100) not in got


def test_decontaminate_hot_gram_cap(spark):
    # a gram present in every corpus doc is dropped from matching by the cap
    corpus = spark.createDataFrame(
        [(i, "common five gram shared everywhere") for i in range(5)],
        "doc_id long, text string",
    )
    bench = spark.createDataFrame(
        [(9, "common five gram shared everywhere")],
        "bench_id long, bench_text string",
    )
    capped = decontaminate(corpus, bench, n=5, max_gram_df=4).collect()
    assert capped == []
    exact = decontaminate(corpus, bench, n=5, max_gram_df=None).count()
    assert exact == 5


def test_dataset_split_deterministic_and_stable(spark):
    from antidb_spark.operators.datasets import dataset_split

    ids = spark.range(2000).withColumnRenamed("id", "doc_id")
    a = {r["doc_id"]: (r["bucket"], r["split"])
         for r in dataset_split(ids).collect()}
    b = {r["doc_id"]: (r["bucket"], r["split"])
         for r in dataset_split(ids).collect()}
    assert a == b  # deterministic
    # growth-stable: assignments of the first 1000 ids are unchanged
    small = {r["doc_id"]: r["split"]
             for r in dataset_split(
                 spark.range(1000).withColumnRenamed("id", "doc_id")
             ).collect()}
    assert all(a[i][1] == small[i] for i in range(1000))
    from collections import Counter

    frac = Counter(s for _, s in a.values())
    assert 0.74 < frac["train"] / 2000 < 0.86
    assert 0.06 < frac["val"] / 2000 < 0.14
    assert 0.06 < frac["test"] / 2000 < 0.14
    # fresh salt reshuffles
    resalted = {r["doc_id"]: r["split"]
                for r in dataset_split(ids, salt="v2").collect()}
    assert any(resalted[i] != a[i][1] for i in range(2000))


def test_dataset_split_validates_weights(spark):
    from antidb_spark.operators.datasets import dataset_split

    ids = spark.range(10).withColumnRenamed("id", "doc_id")
    with pytest.raises(ValueError):
        dataset_split(ids, splits=(("a", 0.5), ("b", 0.1)))


def test_resolve_exact_dups(spark):
    from antidb_spark.operators.dedup import resolve_exact_dups

    df = spark.createDataFrame(
        [
            (0, "same  text"),
            (1, "SAME TEXT"),   # normalizes to the same fingerprint
            (2, "unique text"),
            (3, "same text"),
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: (r["keep_id"], r["is_canonical"])
           for r in resolve_exact_dups(df).collect()}
    assert got == {0: (0, True), 1: (0, False), 2: (2, True), 3: (0, False)}


def test_top_terms_matches_python_oracle(spark):
    import math

    from antidb_spark.operators.textstats import top_terms

    rows = [
        (0, "apple apple banana cherry"),
        (1, "banana banana banana date"),
        (2, "cherry date elderberry fig"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    n = len(rows)
    tf: dict[tuple[int, str], int] = {}
    for i, text in rows:
        for t in py_tokens(text):
            tf[(i, t)] = tf.get((i, t), 0) + 1
    dfreq: dict[str, int] = {}
    for (_, t) in {(i, t) for (i, t) in tf}:
        dfreq[t] = dfreq.get(t, 0) + 1
    want = {}
    for i, _ in rows:
        scored = sorted(
            ((-round(c * math.log(1 + n / dfreq[t]), 6), t)
             for (j, t), c in tf.items() if j == i),
        )
        want[i] = [(t, -s, r + 1) for r, (s, t) in enumerate(scored[:2])]
    got = top_terms(df, m=2).collect()
    got_by_doc: dict[int, list] = {}
    for r in sorted(got, key=lambda r: (r["doc_id"], r["rank"])):
        got_by_doc.setdefault(r["doc_id"], []).append(
            (r["term"], r["score"], r["rank"])
        )
    for i in want:
        assert [(t, r) for t, _, r in got_by_doc[i]] == [
            (t, r) for t, _, r in want[i]
        ]
        for (gt, gs, _), (wt, ws, _) in zip(got_by_doc[i], want[i]):
            assert abs(gs - ws) < 1e-9, (i, gt, gs, ws)


def test_curate_funnel(spark):
    from antidb_spark.operators.datasets import curate

    good = ("the cat and the dog are not with it for this was that "
            "it is that they have not was this are for with")  # en, high q
    docs = [
        (0, good),
        (1, good),                                   # exact dup of 0
        (2, "der hund ist nicht auf der matte und die katze auch nicht "
            "werden wir mit von auf sich auch ein eine das und der die"),
        (3, "xy"),                                   # too short: low quality
        (4, good + " extra tail words here"),        # en survivor, unique
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {r["doc_id"]: r.asDict() for r in curate(df).collect()}
    assert set(got) == {0, 4}          # dup 1 dropped, de 2 dropped, short 3 dropped
    assert all(v["pred_lang"] == "en" for v in got.values())
    assert all(v["quality"] >= 0.6 for v in got.values())
    assert all(v["split"] in ("train", "val", "test") for v in got.values())


def test_curate_dedups_after_filter(spark):
    from antidb_spark.operators.datasets import curate

    good = ("the cat and the dog are not with it for this was that "
            "it is that they have not was this are for with")
    # doc 0 would be the min-id canonical, but it FAILS the quality
    # gate (id 0 text is junk) — the survivor must be chosen among
    # docs that passed, so 1 survives, not "nothing"
    df = spark.createDataFrame(
        [(0, "zz"), (1, good), (2, good)], "doc_id long, text string"
    )
    got = sorted(r["doc_id"] for r in curate(df).collect())
    assert got == [1]


# ---------------------------------------------------------------- packing


def _brute_pack(rows, budget):
    """(pack_id, id, doc_offset, pack_offset, slice_len) by sequential
    concat-and-chunk over (id asc) — the independent python oracle."""
    out = []
    pos = 0
    for doc_id, text in sorted(rows):
        n = len(py_tokens(text))
        if n == 0:
            continue
        start, rem = pos, n
        while rem > 0:
            pack = start // budget
            take = min((pack + 1) * budget - start, rem)
            out.append((pack, doc_id, start - pos, start - pack * budget, take))
            start += take
            rem -= take
        pos += n
    return sorted(out)


def test_pack_sequences_matches_bruteforce(spark, docs_df):
    from antidb_spark.operators.datasets import pack_sequences

    got = sorted(
        tuple(r) for r in pack_sequences(docs_df, budget=7).collect()
    )
    assert got == _brute_pack(DOCS, 7)
    # doc 4 is empty -> dropped entirely
    assert not any(r[1] == 4 for r in got)
    # conservation: per-doc slice lengths sum to the doc's token count
    by_doc = {}
    for pack, doc, _, _, ln in got:
        by_doc[doc] = by_doc.get(doc, 0) + ln
    assert by_doc == {
        d: len(py_tokens(t)) for d, t in DOCS if py_tokens(t)
    }
    # every pack except the last is exactly full
    by_pack = {}
    for pack, _, _, _, ln in got:
        by_pack[pack] = by_pack.get(pack, 0) + ln
    last = max(by_pack)
    assert all(v == 7 for p, v in by_pack.items() if p != last)
    # pack ids are dense from 0
    assert sorted(by_pack) == list(range(last + 1))


def test_pack_sequences_straddles_long_docs(spark):
    from antidb_spark.operators.datasets import pack_sequences

    rows = [(0, " ".join(f"t{i}" for i in range(25))), (1, "a b c")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = sorted(tuple(r) for r in pack_sequences(df, budget=10).collect())
    # doc 0 (25 tokens) spans packs 0,1,2; doc 1 fills pack 2 then 3... no:
    # 25 toks -> slices (0,10),(10,10),(20,5); doc 1 starts at 25 -> pack 2
    assert got == [
        (0, 0, 0, 0, 10),
        (1, 0, 10, 0, 10),
        (2, 0, 20, 0, 5),
        (2, 1, 0, 5, 3),
    ]


def test_pack_sequences_partition_invariant(spark, docs_df):
    from antidb_spark.operators.datasets import pack_sequences

    a = sorted(
        tuple(r)
        for r in pack_sequences(docs_df, budget=7, n_partitions=1).collect()
    )
    b = sorted(
        tuple(r)
        for r in pack_sequences(
            docs_df.repartition(5), budget=7, n_partitions=4
        ).collect()
    )
    assert a == b


def test_pack_sequences_validates_budget(spark, docs_df):
    from antidb_spark.operators.datasets import pack_sequences

    with pytest.raises(ValueError, match="budget"):
        pack_sequences(docs_df, budget=0)


# ---------------------------------------------------------- stratified


def test_stratified_sample_rates_and_nesting(spark):
    from antidb_spark.operators.datasets import stratified_sample

    rows = [(i, "en" if i % 2 else "de") for i in range(2000)]
    df = spark.createDataFrame(rows, "doc_id long, lang string")
    full = stratified_sample(df, {"en": 1.0, "de": 1.0}, "lang")
    assert full.count() == 2000  # rate 1.0 keeps everything
    none = stratified_sample(df, {"en": 0.0}, "lang", default_rate=0.0)
    assert none.count() == 0
    half = {r["doc_id"] for r in
            stratified_sample(df, {"en": 0.5}, "lang").collect()}
    fifth = {r["doc_id"] for r in
             stratified_sample(df, {"en": 0.2}, "lang").collect()}
    # only en survives (default 0), at roughly the asked rates
    assert 0.4 < len(half) / 1000 < 0.6
    assert 0.12 < len(fifth) / 1000 < 0.28
    # nesting: the 0.2 keep set is a subset of the 0.5 keep set
    assert fifth <= half
    # determinism + growth stability: adding rows never flips old ones
    grown = spark.createDataFrame(
        rows + [(i, "en") for i in range(2000, 3000)],
        "doc_id long, lang string",
    )
    half2 = {r["doc_id"] for r in
             stratified_sample(grown, {"en": 0.5}, "lang").collect()}
    assert {i for i in half2 if i < 2000} == half


def test_stratified_sample_validates_rates(spark):
    from antidb_spark.operators.datasets import stratified_sample

    df = spark.createDataFrame([(1, "en")], "doc_id long, lang string")
    with pytest.raises(ValueError, match="rate"):
        stratified_sample(df, {"en": 1.5}, "lang")
    with pytest.raises(ValueError, match="default_rate"):
        stratified_sample(df, {"en": 0.5}, "lang", default_rate=-0.1)


# ---------------------------------------------------------- quantiles


def test_exact_quantiles_matches_sorted_ranks(spark):
    from antidb_spark.operators.stats import exact_quantiles

    vals = [7, 3, 3, 9, 1, 5, 5, 5, 2, 8, 0]  # dups + n=11
    df = spark.createDataFrame([(v,) for v in vals], "x long")
    qs = (0.0, 0.1, 0.5, 0.77, 1.0)
    got = {r["q"]: r["value"] for r in exact_quantiles(df, "x", qs).collect()}
    s = sorted(vals)
    import math

    assert got == {q: s[math.floor(q * (len(s) - 1))] for q in qs}


def test_exact_quantiles_partition_invariant_and_empty(spark):
    from antidb_spark.operators.stats import exact_quantiles

    df = spark.range(0, 1000).select((F.col("id") * 17 % 997).alias("x"))
    a = sorted(
        tuple(r)
        for r in exact_quantiles(df, "x", (0.25, 0.5), n_partitions=1).collect()
    )
    b = sorted(
        tuple(r)
        for r in exact_quantiles(
            df.repartition(7), "x", (0.25, 0.5), n_partitions=5
        ).collect()
    )
    assert a == b
    empty = exact_quantiles(df.filter("x < 0"), "x", (0.5,))
    assert empty.count() == 0
    assert empty.columns == ["q", "value"]
    with pytest.raises(ValueError, match="quantile"):
        exact_quantiles(df, "x", (1.5,))


# ---------------------------------------------------------- epoch mixing


def test_mix_epochs_counts_and_determinism(spark):
    from antidb_spark.operators.datasets import mix_epochs, split_bucket

    rows = [(i, "en" if i % 2 else "de") for i in range(2000)]
    df = spark.createDataFrame(rows, "doc_id long, lang string")
    out = mix_epochs(df, {"en": 2.5, "de": 0.0}, "lang").collect()
    # de (weight 0) vanishes entirely
    assert not any(r["lang"] == "de" for r in out)
    by_id = {}
    for r in out:
        by_id.setdefault(r["doc_id"], []).append(r["epoch"])
    # every en row appears 2 or 3 times, epochs dense from 0
    assert set(by_id) == {i for i in range(2000) if i % 2}
    for epochs in by_id.values():
        assert sorted(epochs) == list(range(len(epochs)))
        assert len(epochs) in (2, 3)
    # ~half get the extra epoch, and exactly the ones below the bucket
    # threshold (the documented frac(w) contract)
    extra = {i for i, e in by_id.items() if len(e) == 3}
    assert 0.4 < len(extra) / 1000 < 0.6
    thr = {
        r["doc_id"]
        for r in df.filter("lang = 'en'")
        .select("doc_id", split_bucket("doc_id", "m1").alias("b"))
        .filter("b < 5000")
        .collect()
    }
    assert extra == thr
    # integer weight = exact repetition, no hash dependence
    twice = mix_epochs(df, {"en": 2.0, "de": 2.0}, "lang").count()
    assert twice == 4000


def test_mix_epochs_default_weight_and_validation(spark):
    from antidb_spark.operators.datasets import mix_epochs

    df = spark.createDataFrame(
        [(i, "zz") for i in range(1000)], "doc_id long, lang string"
    )
    # unknown stratum takes default_weight
    kept = mix_epochs(df, {"en": 1.0}, "lang", default_weight=0.3).count()
    assert 200 < kept < 400
    assert mix_epochs(df, {"en": 1.0}, "lang", default_weight=0.0).count() == 0
    with pytest.raises(ValueError, match="weight"):
        mix_epochs(df, {"en": -0.5}, "lang")
    with pytest.raises(ValueError, match="default_weight"):
        mix_epochs(df, {"en": 1.0}, "lang", default_weight=-1.0)


# -------------------------------------------------- assembly + shuffle


def test_assemble_packs_orders_and_conserves(spark, docs_df):
    from antidb_spark.operators.datasets import assemble_packs, pack_sequences

    packs = assemble_packs(pack_sequences(docs_df, budget=7)).collect()
    brute = _brute_pack(DOCS, 7)
    by_pack = {}
    for pack, doc, doff, poff, ln in brute:
        by_pack.setdefault(pack, []).append((poff, doc, doff, ln))
    assert len(packs) == len(by_pack)
    last = max(by_pack)
    for r in packs:
        want = sorted(by_pack[r["pack_id"]])
        got = [
            (p["pack_offset"], p["doc_id"], p["doc_offset"], p["slice_len"])
            for p in r["parts"]
        ]
        assert got == want  # parts in pack_offset order
        assert r["n_docs"] == len(want)
        assert r["pack_len"] == sum(w[3] for w in want)
        if r["pack_id"] != last:
            assert r["pack_len"] == 7  # full examples
        # contiguity: each slice starts where the previous ended
        pos = got[0][0]
        for poff, _, _, ln in got:
            assert poff == pos
            pos += ln


def test_shuffle_order_dense_deterministic_resaltable(spark):
    from antidb_spark.operators.datasets import shuffle_order

    df = spark.range(0, 500).select(F.col("id").alias("doc_id"))
    a = {r["doc_id"]: r["shuffle_pos"] for r in shuffle_order(df).collect()}
    b = {r["doc_id"]: r["shuffle_pos"]
         for r in shuffle_order(df.repartition(7), n_partitions=3).collect()}
    assert a == b  # partition-invariant
    assert sorted(a.values()) == list(range(500))  # dense permutation
    assert a != {i: i for i in range(500)}  # actually shuffled
    c = {r["doc_id"]: r["shuffle_pos"]
         for r in shuffle_order(df, salt="sh2").collect()}
    assert sorted(c.values()) == list(range(500))
    assert c != a  # a fresh salt is a fresh permutation
    # matches an explicit md5 sort (the cross-engine contract)
    import hashlib

    want = sorted(
        range(500), key=lambda i: (hashlib.md5(f"sh1:{i}".encode()).hexdigest(), i)
    )
    assert [d for d, _ in sorted(a.items(), key=lambda kv: kv[1])] == want


# ---------------------------------------------------------- temperature


def test_temperature_mix_matches_bruteforce(spark):
    """Kept set == pandas recompute of the rate derivation (sqrt
    weights, sorted-stratum fold, floor thresholds, split_bucket)."""
    import hashlib
    import math

    from antidb_spark.operators.datasets import temperature_mix

    # skewed strata: en 600, de 150, fr 50 (+ nulls, excluded)
    rows = [(i, "en") for i in range(600)]
    rows += [(600 + i, "de") for i in range(150)]
    rows += [(750 + i, "fr") for i in range(50)]
    rows += [(800 + i, None) for i in range(20)]
    df = spark.createDataFrame(rows, "doc_id long, lang string")
    tau, frac, salt = 0.5, 0.5, "tx"
    got = temperature_mix(
        df, "lang", tau=tau, target_frac=frac, salt=salt
    ).toPandas()

    counts = {"de": 150, "en": 600, "fr": 50}
    tot = 800
    z = 0.0
    for st in sorted(counts):
        z += math.sqrt(float(counts[st]))
    thr = {
        st: int(math.floor(
            min(1.0, frac * tot * math.sqrt(float(n)) / z / n) * 10000
        ))
        for st, n in counts.items()
    }

    def bucket(i):
        h = hashlib.md5(f"{salt}:{i}".encode()).hexdigest()
        return int(h[:8], 16) % 10_000

    want = sorted(
        (i, st) for i, st in rows
        if st is not None and bucket(i) < thr[st]
    )
    assert sorted(zip(got["doc_id"], got["lang"])) == want
    assert len(got) > 0
    # temperature upweights the minority: fr keep-RATE > en keep-rate
    kept = got.groupby("lang").size()
    assert kept["fr"] / 50 > kept["en"] / 600
    # nulls excluded entirely
    assert got["lang"].notna().all()


def test_temperature_mix_tau1_is_proportional(spark):
    """tau=1 degrades to a uniform target_frac rate for every stratum
    (w=n cancels): thresholds equal, mix proportions preserved."""
    from antidb_spark.operators.datasets import (
        stratified_sample,
        temperature_mix,
    )

    rows = [(i, "en" if i % 3 else "de") for i in range(900)]
    df = spark.createDataFrame(rows, "doc_id long, lang string")
    got = temperature_mix(
        df, "lang", tau=1.0, target_frac=0.4, salt="ty"
    )
    flat = stratified_sample(
        df, {"en": 0.4, "de": 0.4}, "lang", salt="ty"
    )
    assert sorted(r["doc_id"] for r in got.collect()) == \
        sorted(r["doc_id"] for r in flat.collect())


def test_temperature_mix_validates(spark):
    from antidb_spark.operators.datasets import temperature_mix

    df = spark.createDataFrame([(1, "en")], "doc_id long, lang string")
    with pytest.raises(ValueError, match="tau"):
        temperature_mix(df, "lang", tau=0.0)
    with pytest.raises(ValueError, match="target_frac"):
        temperature_mix(df, "lang", target_frac=0.0)
    # all-null strata → empty result with a bucket column, no error
    dfn = spark.createDataFrame(
        [(1, None), (2, None)], "doc_id long, lang string"
    )
    out = temperature_mix(dfn, "lang")
    assert out.count() == 0
    assert "bucket" in out.columns


# --- chunk_docs (RAG-style per-doc overlap chunking) ---------------------


def _py_chunks(doc_id, text, chunk, overlap):
    toks = py_tokens(text)
    n = len(toks)
    if n == 0:
        return []
    stride = chunk - overlap
    out, i = [], 0
    while True:
        start = i * stride
        clen = min(chunk, n - start)
        out.append((doc_id, i, start, clen, " ".join(toks[start:start + clen])))
        if start + clen >= n:
            break
        i += 1
    return out


def test_chunk_docs_matches_bruteforce(spark, docs_df):
    from antidb_spark.operators.datasets import chunk_docs

    got = [
        tuple(r)
        for r in chunk_docs(docs_df, chunk_tokens=4, overlap=1)
        .orderBy("doc_id", "chunk_idx")
        .collect()
    ]
    want = [c for d, t in DOCS for c in _py_chunks(d, t, 4, 1)]
    assert got == want
    # empty doc 4 dropped, sub-chunk doc 3 yields one short chunk
    assert not any(r[0] == 4 for r in got)
    assert [r for r in got if r[0] == 3] == [(3, 0, 0, 1, "short")]


def test_chunk_docs_overlap_and_coverage_invariants(spark, sf_dir):
    """Every doc's chunks: starts advance by stride, consecutive chunks
    share exactly `overlap` tokens, the last chunk ends at the doc's
    last token, and only the last chunk may be short."""
    from antidb_spark.functions.analyze import tokens
    from antidb_spark.operators.datasets import chunk_docs

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    chunk, ov = 32, 8
    rows = (
        chunk_docs(docs, chunk, ov)
        .groupBy("doc_id")
        .agg(
            F.sort_array(
                F.collect_list(F.struct("chunk_idx", "start_tok", "n_toks"))
            ).alias("cs")
        )
        .join(
            docs.select("doc_id", F.size(tokens("text")).alias("n")), "doc_id"
        )
        .collect()
    )
    assert rows
    stride = chunk - ov
    for r in rows:
        cs, n = r["cs"], r["n"]
        for j, c in enumerate(cs):
            assert c["chunk_idx"] == j
            assert c["start_tok"] == j * stride
            if j < len(cs) - 1:
                assert c["n_toks"] == chunk
        last = cs[-1]
        assert last["start_tok"] + last["n_toks"] == n


def test_chunk_docs_no_overlap_partitions_tokens(spark, docs_df):
    """overlap=0: chunks tile the token stream exactly (Σ n_toks == n)."""
    from antidb_spark.functions.analyze import tokens
    from antidb_spark.operators.datasets import chunk_docs

    got = (
        chunk_docs(docs_df, chunk_tokens=3, overlap=0)
        .groupBy("doc_id").agg(F.sum("n_toks").alias("s"))
        .join(docs_df.select("doc_id", F.size(tokens("text")).alias("n")),
              "doc_id")
        .collect()
    )
    assert got and all(r["s"] == r["n"] for r in got)


def test_chunk_docs_validation(spark, docs_df):
    from antidb_spark.operators.datasets import chunk_docs

    with pytest.raises(ValueError, match="positive"):
        chunk_docs(docs_df, 0)
    with pytest.raises(ValueError, match="overlap"):
        chunk_docs(docs_df, 4, 4)
    with pytest.raises(ValueError, match="overlap"):
        chunk_docs(docs_df, 4, -1)
