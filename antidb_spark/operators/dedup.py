"""Deduplication operators for training-data pipelines.

Four families, each a first-class engine operator over a corpus with a
text column (``documents`` / ``transcripts``):

- **Exact** (`exact_dups`): hash-groupBy on a content fingerprint. One
  shuffle on the digest; group sizes are tiny so no skew handling needed
  beyond AQE.
- **N-gram Jaccard, exact** (`ngram_jaccard_pairs`): shingle inverted
  index → candidate pairs via shared shingles → exact Jaccard filter.
  EXACT for any threshold > 0 (a pair with Jaccard > 0 shares ≥ 1
  shingle, so the inverted-index join generates every qualifying pair) —
  this is the oracle-checkable baseline the probabilistic variants are
  validated against.
- **MinHash + LSH** (`minhash_signatures`, `minhash_near_dups`): per-doc
  minhash signature (64 JVM min-of-seeded-xxhash64 aggregates — no
  Python in the path), banded into buckets, candidate pairs from
  same-bucket joins, exact-Jaccard verify. The scale path: candidate
  generation touches only hash buckets, never all pairs.
- **SimHash** (`simhash64`, `simhash_near_dups`): 64-bit tf-weighted
  fingerprint from md5-derived per-term bits (JVM relational plan,
  SQL-oracle-computable); pairs within Hamming distance ≤ 3 found by
  pigeonhole banding (4 bands of 16 bits — distance ≤ 3 ⟹ at least one
  band equal, so banding is EXACT for d ≤ 3), verified by popcount.

Scale notes: every operator shuffles on a hash-distributed key (digest /
shingle / band bucket), so no range skew; stopword-only shingles are the
hot keys in the inverted-index join and are capped by `max_shingle_df`
(default 1000): a shingle present in more docs is dropped from CANDIDATE
GENERATION only — every candidate is then verified with true full-set
Jaccard, so results are exact whenever each qualifying pair shares at
least one sub-cap shingle (see `ngram_jaccard_pairs` for the boundary).

Reference tie-in: the reference's dedup-adjacent notion is multiset key
identity (duplicate keys in one index, tests.py:245-248); these
operators generalize it to content identity/similarity.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from antidb_spark.functions.analyze import tokens

# MinHash parameters: 64 permutations in 16 bands of 4 rows.
N_HASHES = 64
N_BANDS = 16
ROWS_PER_BAND = N_HASHES // N_BANDS

# Affine permutation family over the 28-bit md5-prefix base hash:
# h_i = (a_i·h + b_i) mod P with P = 2^31 - 1 (Mersenne prime). Every
# intermediate fits int64 (a < 2^31, h < 2^28 → a·h < 2^59), and the
# SAME literals are inlined into the DuckDB oracle — this is what makes
# minhash hash-checkable cross-engine (xxhash64 has no DuckDB twin).
# 28-bit base-hash collisions (~N_shingles/2^28) only perturb the
# signature estimate; candidates are always verified with TRUE Jaccard.
MINHASH_P = (1 << 31) - 1


def _minhash_coeffs(seed: int) -> tuple[list[int], list[int]]:
    import numpy as _np

    rng = _np.random.default_rng(seed)
    a = rng.integers(1, MINHASH_P, N_HASHES)
    b = rng.integers(0, MINHASH_P, N_HASHES)
    return [int(x) for x in a], [int(x) for x in b]


def norm_text(col: Column | str) -> Column:
    """Whitespace/case-normalized text — the exact-dedup canonical form."""
    c = F.col(col) if isinstance(col, str) else col
    return F.trim(F.regexp_replace(F.lower(c), r"\s+", " "))


def fingerprint(col: Column | str) -> Column:
    """Content digest of the canonical form (md5 → 32 hex chars)."""
    return F.md5(norm_text(col))


def exact_dups(
    corpus: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(fp, group_size, doc_ids[]) for every exact-duplicate group.

    One hash shuffle on the digest; ``doc_ids`` sorted for determinism.
    """
    return (
        corpus.select(F.col(id_col), fingerprint(text_col).alias("fp"))
        .groupBy("fp")
        .agg(
            F.count(F.lit(1)).alias("group_size"),
            F.sort_array(F.collect_list(id_col)).alias("doc_ids"),
        )
        .filter(F.col("group_size") > 1)
    )


def shingles(toks: Column, n: int = 3) -> Column:
    """array<string> of word n-gram shingles — a MULTISET (consumers
    either dedupe relationally or are duplicate-insensitive:
    array_intersect/array_union and min-aggregates ignore duplicates).

    Construction is arrays_zip over n SHIFTED SLICES of the token array
    — NOT a transform over an index sequence with per-index slicing.
    The index-lambda form references ``toks`` inside the lambda, and
    CollapseProject inlines the tokenizer expression there, re-running
    it once PER INDEX: O(tokens²) per document (measured 10× on this
    explode at bench scale). The zip form references ``toks`` only n+2
    times per row regardless of length. Per-row ``array_distinct`` is
    avoided for the same quadratic reason (O(k²) comparisons per doc).
    """
    # slice length = size(toks): "rest of the array" without the
    # start+length int overflow a 2^31-1 literal length triggers
    cols = [toks.alias("g0")] + [
        F.slice(toks, i + 1, F.size(toks)).alias(f"g{i}") for i in range(1, n)
    ]
    z = F.arrays_zip(*cols)
    last = f"g{n - 1}"
    grams = F.filter(
        F.transform(
            z,
            # .getField, not [..]: item access on a lambda struct var
            # resolves as element_at and yields silent nulls
            lambda s: F.when(
                s.getField(last).isNotNull(),
                F.concat_ws(" ", *[s.getField(f"g{i}") for i in range(n)]),
            ),
        ),
        lambda g: g.isNotNull(),
    )
    # Shorter-than-n docs produce their full token join as one shingle.
    return F.when(F.size(toks) >= n, grams).otherwise(
        F.array(F.array_join(toks, " "))
    )


def shingle_arrays(
    corpus: DataFrame, id_col: str, text_col: str, n: int
) -> DataFrame:
    """(_id, shs: array<string>) shingle multisets, tokens materialized."""
    return corpus.select(
        F.col(id_col).alias("_id"), tokens(text_col).alias("_toks")
    ).select("_id", shingles(F.col("_toks"), n).alias("shs"))


def ngram_jaccard_pairs(
    corpus: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    threshold: float = 0.7,
    max_shingle_df: int | None = 1000,
) -> DataFrame:
    """Near-dup pairs by n-gram Jaccard ≥ threshold.

    Plan: doc→shingles (exploded inverted index, shingles with document
    frequency > ``max_shingle_df`` dropped from CANDIDATE GENERATION
    only) → distinct candidate pairs via shared shingles → exact
    full-set Jaccard verify (``array_intersect``/``array_union`` over
    the uncapped shingle arrays) → filter. Output: (id_a, id_b,
    jaccard) with id_a < id_b, rounded 6dp.

    Exactness boundary: the verify step always computes TRUE Jaccard, so
    the result is exact whenever every qualifying pair shares at least
    one shingle with df ≤ ``max_shingle_df``; a pair whose ONLY shared
    shingles are corpus-frequency hot keys is missed. The cap is what
    keeps the inverted-index self-join from going quadratic on hot
    shingles (df² candidate rows per shingle) — ``max_shingle_df=None``
    is the explicit opt-in to fully-exact (and scale-unsafe) candidate
    generation.
    """
    sh_arr = shingle_arrays(corpus, id_col, text_col, n)
    # relation-level dedupe restores SET semantics for df counts and
    # candidate generation (cheaper than per-row array_distinct)
    ex = sh_arr.select("_id", F.explode("shs").alias("sh")).distinct()
    if max_shingle_df is not None:
        hot = (
            ex.groupBy("sh")
            .agg(F.count(F.lit(1)).alias("sdf"))
            .filter(F.col("sdf") > max_shingle_df)
            .select("sh")
        )
        ex = ex.join(F.broadcast(hot), "sh", "left_anti")
    cand = (
        ex.select(F.col("_id").alias("id_a"), "sh")
        .join(ex.select(F.col("_id").alias("id_b"), "sh"), "sh")
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )
    return (
        cand.join(sh_arr.withColumnsRenamed({"_id": "id_a", "shs": "sa"}), "id_a")
        .join(sh_arr.withColumnsRenamed({"_id": "id_b", "shs": "sb"}), "id_b")
        .withColumn(
            "jaccard",
            F.round(
                F.size(F.array_intersect("sa", "sb"))
                / F.size(F.array_union("sa", "sb")).cast("double"),
                6,
            ),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


# --- MinHash ------------------------------------------------------------


def minhash_signatures(
    corpus: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    seed: int = 42,
) -> DataFrame:
    """(id, sig: array<long>[N_HASHES]) — fully JVM-side.

    Each doc shingle is hashed ONCE (28-bit md5-prefix base hash); the
    64 permutations are affine maps of that value under the seeded
    ``_minhash_coeffs`` family (pure long arithmetic — far cheaper
    than 64 string hashes per shingle, and expressible verbatim in
    ANSI SQL, so ``minhash_dups`` is fully DuckDB-oracled). Explode →
    64 min-aggregates (map-side partial agg, one shuffle keyed on the
    doc id — no skew: hot shingles are values here, not keys;
    duplicates are irrelevant under min). min-of-universal-hash is the
    standard minhash family, so the equal-component fraction still
    estimates Jaccard.
    """
    sh = shingle_arrays(corpus, id_col, text_col, n).select(
        F.col("_id").alias(id_col), F.explode("shs").alias("sh")
    )
    hashed = sh.select(
        id_col,
        F.conv(F.substring(F.md5(F.col("sh")), 1, 7), 16, 10)
        .cast("long")
        .alias("h"),
    )
    a, b = _minhash_coeffs(seed)
    aggs = [
        F.min(
            (F.lit(a[i]) * F.col("h") + F.lit(b[i])) % F.lit(MINHASH_P)
        ).alias(f"h{i}")
        for i in range(N_HASHES)
    ]
    return (
        hashed.groupBy(id_col)
        .agg(*aggs)
        .select(
            id_col,
            F.array(*[F.col(f"h{i}") for i in range(N_HASHES)]).alias("sig"),
        )
    )


def minhash_near_dups(
    corpus: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    threshold: float = 0.7,
    seed: int = 42,
) -> DataFrame:
    """LSH-banded candidate pairs, verified by exact n-gram Jaccard.

    Scale path: pairs are generated per LSH bucket (shuffle key =
    (band_idx, band signature hash)), never all-pairs. Output:
    (id_a, id_b, jaccard) — a subset of `ngram_jaccard_pairs` with
    recall governed by the (bands, rows) S-curve (16×4 at t=0.7 ⇒
    recall ≈ 1 - (1 - 0.7⁴)¹⁶ ≈ 0.986 per qualifying pair).
    """
    sig = minhash_signatures(corpus, id_col, text_col, n, seed)
    # bucket key = the band's VALUE TUPLE itself (array<long> equi-join),
    # not its hash: hash-collision candidates would diverge from the
    # tuple-equality oracle (they'd still be Jaccard-verified, but the
    # candidate SETS must match the SQL definition exactly)
    bands = sig.select(
        F.col(id_col).alias("_id"),
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.lit(N_BANDS - 1)),
                lambda i: F.struct(
                    i.alias("band"),
                    F.slice(
                        F.col("sig"), i * ROWS_PER_BAND + 1, ROWS_PER_BAND
                    ).alias("bh"),
                ),
            )
        ).alias("b"),
    ).select("_id", "b.band", "b.bh")
    cand = (
        bands.alias("x")
        .join(
            bands.alias("y"),
            (F.col("x.band") == F.col("y.band"))
            & (F.col("x.bh") == F.col("y.bh"))
            & (F.col("x._id") < F.col("y._id")),
        )
        .select(
            F.col("x._id").alias("id_a"), F.col("y._id").alias("id_b")
        )
        .distinct()
    )
    # exact verify: recompute Jaccard only for candidates
    # (array_intersect/array_union dedupe, so multiset shingles are fine)
    sh = shingle_arrays(corpus, id_col, text_col, n)
    return (
        cand.join(sh.withColumnsRenamed({"_id": "id_a", "shs": "sa"}), "id_a")
        .join(sh.withColumnsRenamed({"_id": "id_b", "shs": "sb"}), "id_b")
        .withColumn(
            "jaccard",
            F.round(
                F.size(F.array_intersect("sa", "sb"))
                / F.size(F.array_union("sa", "sb")).cast("double"),
                6,
            ),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


# --- SimHash ------------------------------------------------------------

SIMHASH_BITS = 64
SIM_BANDS = 4
_BITS_PER_BAND = SIMHASH_BITS // SIM_BANDS


def term_bit(h_digits: list, b: int):
    """Bit ``b`` (0..63) of a term's 64-bit hash, defined over the first
    16 hex digits of md5: bit (b % 4) of hex-digit value at position
    b // 4. Pure integer ops on single digits — the SAME definition is
    expressible in ANSI SQL, which is what makes simhash DuckDB-oracled."""
    return F.shiftright(h_digits[b // 4], b % 4).bitwiseAND(F.lit(1))


def simhash64(
    corpus: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(id, simhash: long) — tf-weighted 64-bit simhash, fully JVM-side.

    Relational plan: tokenize → (id, term, tf) → per-term md5-derived
    bits (``term_bit``) → 64 signed tf-weighted sums per doc (one
    groupBy, map-side combined) → sign bits packed into a long (bit 63
    wraps into the sign, i.e. two's-complement). Tokenless docs get
    simhash 0. Replaces a per-document Python loop AND pins the hash to
    an oracle-computable definition.
    """
    import operator as _op
    from functools import reduce

    tok = (
        corpus.select(
            F.col(id_col).alias("_id"), F.explode(tokens(text_col)).alias("term")
        )
        .groupBy("_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    h = F.md5(F.col("term"))
    digits = [
        F.conv(F.substring(h, i + 1, 1), 16, 10).cast("int") for i in range(16)
    ]
    vsums = [
        F.sum(
            F.when(term_bit(digits, b) == 1, F.col("tf")).otherwise(-F.col("tf"))
        ).alias(f"v{b}")
        for b in range(SIMHASH_BITS)
    ]
    per_doc = tok.groupBy("_id").agg(*vsums)
    packed = reduce(
        _op.add,
        [
            F.when(
                F.col(f"v{b}") > 0, F.shiftleft(F.lit(1).cast("long"), b)
            ).otherwise(F.lit(0).cast("long"))
            for b in range(SIMHASH_BITS)
        ],
    )
    hashed = per_doc.select(F.col("_id").alias(id_col), packed.alias("simhash"))
    return (
        corpus.select(id_col)
        .join(hashed, id_col, "left")
        .select(id_col, F.coalesce("simhash", F.lit(0).cast("long")).alias("simhash"))
    )




def simhash_near_dups(
    corpus: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_distance: int = 3,
) -> DataFrame:
    """Pairs with simhash Hamming distance ≤ max_distance (≤ 3 for
    exactness: 4-band pigeonhole guarantees any pair within distance 3
    shares a band). Output: (id_a, id_b, hamming).

    simhash-0 docs (tokenless, or the measure-zero all-negative-bit
    case) are EXCLUDED from pairing: they all land in one bucket and
    pair quadratically — at corpus scale a few million empty docs would
    be the whole job — and "two empty docs are near-duplicates" is not
    a useful signal (filter empties upstream with quality_scores)."""
    sig = (
        simhash64(corpus, id_col, text_col)
        .filter(F.col("simhash") != 0)
        .select(F.col(id_col).alias("_id"), "simhash")
    )
    band_structs = [
        F.struct(
            F.lit(i).alias("band"),
            F.shiftrightunsigned(
                F.shiftleft(F.col("simhash"), (SIM_BANDS - 1 - i) * _BITS_PER_BAND),
                (SIM_BANDS - 1) * _BITS_PER_BAND,
            ).alias("bh"),
        )
        for i in range(SIM_BANDS)
    ]
    bands = sig.select(
        "_id", "simhash", F.explode(F.array(*band_structs)).alias("b")
    ).select("_id", "simhash", "b.band", "b.bh")
    pairs = (
        bands.alias("x")
        .join(
            bands.alias("y"),
            (F.col("x.band") == F.col("y.band"))
            & (F.col("x.bh") == F.col("y.bh"))
            & (F.col("x._id") < F.col("y._id")),
        )
        .select(
            F.col("x._id").alias("id_a"),
            F.col("y._id").alias("id_b"),
            F.col("x.simhash").alias("ha"),
            F.col("y.simhash").alias("hb"),
        )
        .distinct()
    )
    return (
        pairs.withColumn("hamming", F.bit_count(F.col("ha").bitwiseXOR(F.col("hb"))))
        .filter(F.col("hamming") <= max_distance)
        .select("id_a", "id_b", "hamming")
    )


# --- decontamination ------------------------------------------------------


def decontaminate(
    corpus: DataFrame,
    benchmark: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    bench_id_col: str = "bench_id",
    bench_text_col: str = "bench_text",
    n: int = 5,
    max_gram_df: int | None = 10_000,
) -> DataFrame:
    """Benchmark decontamination: flag corpus docs sharing any token
    ``n``-gram with a benchmark/eval item (the standard train-set
    contamination check). Output (doc_id, bench_id, n_shared) where
    ``n_shared`` counts DISTINCT shared n-grams, one row per
    contaminated (doc, bench item) pair.

    Plan: both sides explode to distinct (id, gram) rows; the join is a
    gram equi-join with the benchmark side broadcast (eval suites are
    tiny next to a 100 TB corpus). Corpus grams with document frequency
    > ``max_gram_df`` (boilerplate shared by everything) are dropped
    from matching — at n=5 such grams carry no contamination signal and
    capping them bounds the join fan-out, the same hot-key discipline
    as ``ngram_jaccard_pairs``; ``None`` disables the cap.
    """
    cg = (
        corpus.select(
            F.col(id_col), F.explode(shingles(tokens(text_col), n)).alias("g")
        )
        .filter(F.length("g") > 0)
        .distinct()
    )
    if max_gram_df is not None:
        hot = (
            cg.groupBy("g")
            .agg(F.count(F.lit(1)).alias("gdf"))
            .filter(F.col("gdf") > max_gram_df)
            .select("g")
        )
        cg = cg.join(F.broadcast(hot), "g", "left_anti")
    bg = (
        benchmark.select(
            F.col(bench_id_col),
            F.explode(shingles(tokens(bench_text_col), n)).alias("g"),
        )
        .filter(F.length("g") > 0)
        .distinct()
    )
    return (
        cg.join(F.broadcast(bg), "g")
        .groupBy(id_col, bench_id_col)
        .agg(F.count_distinct("g").alias("n_shared"))
    )


def resolve_exact_dups(
    corpus: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Dedup RESOLUTION: (id, keep_id, is_canonical) where ``keep_id``
    is the smallest id in the row's exact-duplicate fingerprint group —
    the deterministic survivor. Filtering ``is_canonical`` yields the
    deduplicated corpus; the full mapping supports redirect tables.
    One digest-keyed shuffle (window min over the fingerprint)."""
    from pyspark.sql import Window

    fps = corpus.select(F.col(id_col), fingerprint(text_col).alias("fp"))
    keep = F.min(id_col).over(Window.partitionBy("fp"))
    return fps.select(
        id_col,
        keep.alias("keep_id"),
        (F.col(id_col) == keep).alias("is_canonical"),
    )


def connected_dup_groups(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    out_id_col: str = "id",
    max_iter: int = 25,
) -> DataFrame:
    """Connected components of the near-dup pair graph: (id, group_id)
    with ``group_id`` = the smallest id reachable through any chain of
    pair edges — turning pairwise near-dup VERDICTS (minhash / simhash /
    jaccard pairs) into dedup GROUPS whose min-id member is the
    canonical survivor. Only ids appearing in ``pairs`` are returned
    (singletons have no group to join).

    Iterative min-label propagation: each round, every node takes the
    min of its own label and its neighbors' labels — one shuffle join
    per round, converging in O(component diameter) rounds (near-dup
    clusters are small and dense; diameters beyond ``max_iter`` raise
    rather than return a partial grouping). ``localCheckpoint`` breaks
    the growing lineage each round — the standard Spark discipline for
    iterative algorithms.
    """
    e = (
        pairs.select(F.col(id_a).alias("a"), F.col(id_b).alias("b"))
        .union(pairs.select(F.col(id_b).alias("a"), F.col(id_a).alias("b")))
        .distinct()
        .localCheckpoint()
    )
    labels = e.select(F.col("a").alias("id")).distinct().withColumn(
        "label", F.col("id")
    ).localCheckpoint()
    for _ in range(max_iter):
        prop = (
            e.join(labels, e.a == labels.id)
            .groupBy(F.col("b").alias("id"))
            .agg(F.min("label").alias("nlabel"))
        )
        merged = (
            labels.join(prop, "id", "left")
            .select(
                "id",
                F.least(
                    F.col("label"), F.coalesce("nlabel", "label")
                ).alias("label"),
                (F.coalesce("nlabel", "label") < F.col("label")).alias("_chg"),
            )
        ).localCheckpoint()
        changed = merged.filter(F.col("_chg")).count()
        labels = merged.select("id", "label")
        if changed == 0:
            return labels.select(
                F.col("id").alias(out_id_col), F.col("label").alias("group_id")
            )
    raise RuntimeError(
        f"component diameter exceeds max_iter={max_iter}; raise it"
    )
