"""Text-analysis operators: language ID, quality scoring, token counts,
document fingerprints (training-pipeline layer).

Everything — winnowing included — is pure JVM-side column arithmetic /
window aggregation (whole-stage codegen, no Python in the hot path);
each op has a matching ANSI-SQL oracle in ``__spark_entry__`` so
cross-engine hashes agree.

Reference tie-in: these are P1/P4 "computed key" projections
(idx.py:44,137-138; phantom keys README.md:53) promoted to typed,
vectorized operators.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from antidb_spark.functions.analyze import tokens

# Stopword-hit language ID: tiny per-language function-word lists.
# Deterministic argmax with ties broken by language code ascending.
LANG_STOPWORDS: dict[str, tuple[str, ...]] = {
    "de": ("der", "die", "das", "und", "ist", "nicht", "ein", "eine", "mit",
           "von", "auf", "sich", "auch", "werden", "wir"),
    "en": ("the", "and", "of", "to", "is", "that", "it", "for", "with", "was",
           "this", "are", "not", "have", "they"),
    "es": ("el", "la", "los", "las", "es", "una", "por", "para", "como",
           "pero", "sus", "este", "esta", "ser", "hay"),
    "fr": ("le", "les", "des", "est", "une", "dans", "pour", "que", "qui",
           "pas", "sur", "avec", "sont", "mais", "nous"),
}


def token_count(col: Column | str) -> Column:
    return F.size(tokens(col))


def lang_hits(col: Column | str, lang: str) -> Column:
    """Count of tokens belonging to ``lang``'s stopword list."""
    toks = tokens(col)
    words = LANG_STOPWORDS[lang]
    return F.size(
        F.filter(toks, lambda t: t.isin(*[F.lit(w) for w in words]))
    )


def lang_id(corpus: DataFrame, id_col: str = "doc_id",
            text_col: str = "text") -> DataFrame:
    """(id, pred_lang, hits): argmax of stopword hits; ties → language
    code ascending (deterministic); zero hits everywhere → 'und'."""
    langs = sorted(LANG_STOPWORDS)
    hit_cols = [lang_hits(text_col, lg).alias(f"h_{lg}") for lg in langs]
    scored = corpus.select(F.col(id_col), *hit_cols)
    best = F.greatest(*[F.col(f"h_{lg}") for lg in langs])
    pred = F.lit("und")
    # reverse order + when-chains ⇒ first (ascending) language wins ties
    for lg in reversed(langs):
        pred = F.when((best > 0) & (F.col(f"h_{lg}") == best), lg).otherwise(pred)
    return scored.select(
        id_col, pred.alias("pred_lang"), best.cast("long").alias("hits")
    )


def quality_scores(
    corpus: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Per-doc quality features + composite score, all codegen'd exprs.

    Features: n_tokens, mean token length, alpha ratio (letters / chars),
    stopword ratio (English function words), and a [0,1] composite:
    penalize too-short docs, non-alpha noise, and stopword-free or
    stopword-only extremes. Output floats rounded 6dp (oracle parity).
    """
    toks = tokens(text_col)
    n_tok = F.size(toks)
    text = F.col(text_col)
    n_chars = F.length(text)
    n_alpha = F.length(F.regexp_replace(F.lower(text), "[^a-z]", ""))
    sw = LANG_STOPWORDS["en"]
    n_stop = F.size(F.filter(toks, lambda t: t.isin(*[F.lit(w) for w in sw])))
    alpha_ratio = F.when(n_chars > 0, n_alpha / n_chars.cast("double")).otherwise(0.0)
    stop_ratio = F.when(n_tok > 0, n_stop / n_tok.cast("double")).otherwise(0.0)
    mean_len = F.when(
        n_tok > 0,
        F.aggregate(toks, F.lit(0).cast("long"),
                    lambda acc, t: acc + F.length(t).cast("long")).cast("double")
        / n_tok,
    ).otherwise(0.0)
    length_term = F.least(n_tok.cast("double") / 20.0, F.lit(1.0))
    stop_term = F.lit(1.0) - F.abs(stop_ratio - F.lit(0.4)) / F.lit(0.4)
    composite = F.greatest(
        F.lit(0.0),
        F.least(
            F.lit(1.0),
            0.4 * length_term + 0.3 * alpha_ratio + 0.3 * F.greatest(
                stop_term, F.lit(0.0)
            ),
        ),
    )
    return corpus.select(
        F.col(id_col),
        n_tok.cast("long").alias("n_tokens"),
        F.round(mean_len, 6).alias("mean_tok_len"),
        F.round(alpha_ratio, 6).alias("alpha_ratio"),
        F.round(stop_ratio, 6).alias("stopword_ratio"),
        F.round(composite, 6).alias("quality"),
    )


# --- repetition stats (Gopher-style quality rules) ----------------------


def repetition_stats(
    corpus: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Per-doc repetition features (the Gopher/MassiveText repetition
    rules, adapted to token granularity):

    - ``dup_token_frac``  — 1 - distinct_tokens / tokens,
    - ``dup_5gram_frac``  — 1 - distinct_5grams / 5grams (token 5-gram
      multiset; shorter-than-5 docs contribute one whole-doc gram),
    - ``top_2gram_frac``  — max over 2-grams of
      (occurrences × gram_chars) / text_chars: the character share of
      the highest-coverage repeated 2-gram (deterministic: max of a
      product, no most-frequent-gram tie to break).

    Plan shape: the two duplicate fractions are pure per-row array
    expressions (no shuffle); ``top_2gram_frac`` needs a per-doc gram
    mode, computed scalably as explode → groupBy(doc, gram) →
    groupBy(doc) max — one shuffle keyed on the doc id, the same cost
    class as the postings build (never a per-row O(tokens²) transform).
    Floats rounded 6dp for oracle parity.

    Reference tie-in: P4 computed keys (README.md:53) extended to the
    training-pipeline quality layer (SURVEY §2.6).
    """
    from antidb_spark.operators.dedup import shingles

    toks = tokens(text_col)
    n_tok = F.size(toks)
    g5 = shingles(toks, 5)
    dup_tok = F.when(
        n_tok > 0,
        F.lit(1.0) - F.size(F.array_distinct(toks)) / n_tok.cast("double"),
    ).otherwise(0.0)
    dup_g5 = F.when(
        n_tok > 0,
        F.lit(1.0) - F.size(F.array_distinct(g5)) / F.size(g5).cast("double"),
    ).otherwise(0.0)
    per_row = corpus.select(
        F.col(id_col),
        n_tok.cast("long").alias("n_tokens"),
        F.round(dup_tok, 6).alias("dup_token_frac"),
        F.round(dup_g5, 6).alias("dup_5gram_frac"),
        F.length(F.col(text_col)).cast("double").alias("_chars"),
    )
    g2 = corpus.select(
        F.col(id_col).alias("_id"),
        F.explode(shingles(tokens(text_col), 2)).alias("g"),
    ).filter(F.length("g") > 0)
    top2 = (
        g2.groupBy("_id", "g")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .groupBy("_id")
        .agg(F.max(F.col("cnt") * F.length("g")).alias("_cov"))
    )
    return (
        per_row.join(top2.withColumnRenamed("_id", id_col), id_col, "left")
        .select(
            id_col,
            "n_tokens",
            "dup_token_frac",
            "dup_5gram_frac",
            F.round(
                F.coalesce(F.col("_cov") / F.greatest("_chars", F.lit(1.0)),
                           F.lit(0.0)),
                6,
            ).alias("top_2gram_frac"),
        )
    )


# --- PII redaction -------------------------------------------------------

# Patterns restricted to syntax Java regex and RE2 (DuckDB) interpret
# identically: char classes, bounded repeats, \b ASCII word boundaries.
EMAIL_RE = r"[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}"
PHONE_RE = r"\b[0-9]{3}-[0-9]{4}\b"


def redact_pii(
    corpus: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(id, redacted, n_emails, n_phones): scrub email addresses and
    NNN-NNNN phone numbers, keeping match counts. Pure codegen
    (regexp_extract_all / regexp_replace — Spark replaces globally,
    matching DuckDB's 'g' flag); emails redact before phones so a
    digit-bearing email never double-counts as a phone."""
    text = F.col(text_col)
    n_em = F.size(F.regexp_extract_all(text, F.lit(EMAIL_RE), F.lit(0)))
    no_em = F.regexp_replace(text, EMAIL_RE, "<EMAIL>")
    n_ph = F.size(F.regexp_extract_all(no_em, F.lit(PHONE_RE), F.lit(0)))
    return corpus.select(
        F.col(id_col),
        F.regexp_replace(no_em, PHONE_RE, "<PHONE>").alias("redacted"),
        n_em.cast("long").alias("n_emails"),
        n_ph.cast("long").alias("n_phones"),
    )


# --- TF-IDF keyword extraction -------------------------------------------


def top_terms(
    corpus: DataFrame, id_col: str = "doc_id", text_col: str = "text",
    m: int = 5,
) -> DataFrame:
    """(id, term, score, rank): the ``m`` most characteristic terms per
    doc by tf·idf (idf = ln(1 + n_docs/df), smooth and positive).

    Determinism: rank orders by (round(score, 6) desc, term asc) — the
    rounding happens BEFORE ranking so sub-ULP ln() differences between
    engines can never flip an order, and the term tiebreak settles
    equal scores. Plan: tf groupBy (one shuffle); the (term, df) side
    is NOT force-broadcast — small vocabularies broadcast via AQE, a
    100 TB-scale vocabulary falls back to a term-keyed shuffle join —
    then one doc-keyed window for the per-doc cut. The distributed form
    of ``IndexBuilder.more_like_this``'s driver-side term selection,
    for all docs at once."""
    from pyspark.sql import Window

    post = (
        corpus.select(F.col(id_col).alias("_id"),
                      F.explode(tokens(text_col)).alias("term"))
        .groupBy("_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    dfs = post.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    n_docs = corpus.select(F.count(F.lit(1)).alias("n"))
    score = F.round(
        F.col("tf") * F.log(F.lit(1.0) + F.col("n") / F.col("df")), 6
    )
    w = Window.partitionBy("_id").orderBy(
        F.col("score").desc(), F.col("term").asc()
    )
    return (
        post.join(dfs, "term")
        .crossJoin(F.broadcast(n_docs))
        .withColumn("score", score)
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= m)
        .select(F.col("_id").alias(id_col), "term", "score",
                F.col("rank").cast("long").alias("rank"))
    )


# --- winnowing fingerprints (rolling hash) ------------------------------

WINNOW_K = 5   # k-gram length (in tokens)
WINNOW_W = 4   # window of consecutive k-gram hashes; min per window kept


def _py_winnow(text: str, k: int = WINNOW_K, w: int = WINNOW_W) -> list[int]:
    """Winnowing (Schleimer et al. 2003): stable hash per token k-gram,
    keep the min hash of each sliding window, deduplicated, sorted.
    (The classic rightmost-on-ties pick selects a POSITION; the kept
    VALUE is the window min either way, and this operator keeps value
    sets.) Gram hash = first 15 hex digits of md5 (60 bits, positive
    int64) — computable identically in Spark (conv) and DuckDB (hex
    cast), which is what makes clone detection SQL-oracle-checkable.
    Pure-python oracle for the relational implementation below."""
    import hashlib

    from antidb_spark.functions.analyze import py_tokens

    toks = py_tokens(text)
    if not toks:
        return []
    grams = (
        [" ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)]
        if len(toks) >= k
        else [" ".join(toks)]
    )
    hs = [int(hashlib.md5(g.encode()).hexdigest()[:15], 16) for g in grams]
    picks = {min(hs[s : s + w]) for s in range(max(1, len(hs) - w + 1))}
    return sorted(picks)


def gram_hash(col: Column) -> Column:
    """60-bit positive gram hash: conv(md5[:15], 16, 10) — the Spark
    twin of the DuckDB ('0x' || substr(md5(g), 1, 15))::BIGINT."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


def _winnow_flat(
    corpus: DataFrame, id_col: str, text_col: str
) -> DataFrame:
    """(id, fp) distinct winnow fingerprints — fully relational: k-gram
    explode → gram hash → per-doc rolling window min (ROWS BETWEEN
    CURRENT AND w-1 FOLLOWING, valid window starts only) → distinct.
    One shuffle keyed on the doc id; no Python in the path."""
    from pyspark.sql import Window

    # zip-of-shifted-slices k-grams (see dedup.shingles for why the
    # index-lambda form is O(tokens²) after projection collapse)
    from antidb_spark.operators.dedup import shingles

    grams = shingles(tokens(text_col), WINNOW_K)
    g = (
        corpus.select(F.col(id_col).alias("_id"),
                      F.posexplode(grams).alias("gi", "g"))
        .filter(F.length("g") > 0)  # tokenless docs have no fingerprints
    )
    w_roll = (
        Window.partitionBy("_id").orderBy("gi").rowsBetween(0, WINNOW_W - 1)
    )
    w_all = Window.partitionBy("_id")
    rolled = g.select(
        "_id",
        "gi",
        F.min(gram_hash(F.col("g"))).over(w_roll).alias("fp"),
        F.count(F.lit(1)).over(w_all).alias("_ng"),
    )
    return (
        rolled.filter(
            F.col("gi") <= F.greatest(F.col("_ng") - WINNOW_W, F.lit(0))
        )
        .select("_id", "fp")
        .distinct()
    )


def winnow_fingerprints(
    corpus: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(id, fps: array<long>) winnowed fingerprint set per doc, sorted
    (two docs sharing any fingerprint are clone-suspects)."""
    flat = _winnow_flat(corpus, id_col, text_col)
    fps = flat.groupBy("_id").agg(
        F.sort_array(F.collect_set("fp")).alias("fps")
    )
    # keep tokenless docs with an empty fps array (oracle parity)
    return (
        corpus.select(F.col(id_col))
        .join(fps.withColumnRenamed("_id", id_col), id_col, "left")
        .select(
            id_col,
            F.coalesce(F.col("fps"), F.array().cast("array<long>")).alias("fps"),
        )
    )


def clone_candidates(
    corpus: DataFrame, id_col: str = "doc_id", text_col: str = "text",
    min_shared: int = 2, max_fp_df: int | None = 1000,
) -> DataFrame:
    """Pairs sharing ≥ min_shared winnow fingerprints (inverted-index
    join on fingerprint — the scalable clone-detection path).

    Fingerprints with document frequency > ``max_fp_df`` (boilerplate —
    a license header's window min lands in thousands of docs) are
    dropped from CANDIDATE GENERATION only, capping the fp⋈fp self-join
    at df² per sub-cap fingerprint; ``shared_fps`` is then VERIFIED
    exactly from the full per-doc fingerprint sets
    (``array_intersect``), so results are exact whenever each
    qualifying pair shares at least one sub-cap fingerprint — the same
    exactness boundary as ``dedup.ngram_jaccard_pairs``;
    ``max_fp_df=None`` opts into fully-exact (scale-unsafe) generation.
    """
    fp = _winnow_flat(corpus, id_col, text_col)
    gen = fp
    if max_fp_df is not None:
        hot = (
            fp.groupBy("fp")
            .agg(F.count(F.lit(1)).alias("fdf"))
            .filter(F.col("fdf") > max_fp_df)
            .select("fp")
        )
        gen = fp.join(F.broadcast(hot), "fp", "left_anti")
    cand = (
        gen.alias("x")
        .join(
            gen.alias("y"),
            (F.col("x.fp") == F.col("y.fp")) & (F.col("x._id") < F.col("y._id")),
        )
        .select(F.col("x._id").alias("id_a"), F.col("y._id").alias("id_b"))
        .distinct()
    )
    arrs = fp.groupBy("_id").agg(F.sort_array(F.collect_set("fp")).alias("fps"))
    return (
        cand.join(arrs.withColumnsRenamed({"_id": "id_a", "fps": "fa"}), "id_a")
        .join(arrs.withColumnsRenamed({"_id": "id_b", "fps": "fb"}), "id_b")
        .withColumn(
            "shared_fps",
            F.size(F.array_intersect("fa", "fb")).cast("long"),
        )
        .filter(F.col("shared_fps") >= min_shared)
        .select("id_a", "id_b", "shared_fps")
    )


# --- token counting: whitespace + BPE-ish pretokenizer ------------------

# GPT-2-style pretokenizer, restricted to constructs Java regex (Spark)
# and RE2 (DuckDB) interpret identically: contractions first, then
# optionally-space-prefixed letter / digit / punctuation runs, then
# whitespace runs. No lookarounds (RE2 has none) and ASCII classes only
# (so \p{L} table-version skew between the engines can't move a count).
# \s is spelled as an explicit class: Java's \s includes \x0B
# (vertical tab), RE2's does not — the explicit class removes the one
# dialect divergence this pattern could hit.
_WS = r"[ \t\n\r\f\x0B]"
BPE_SPLIT_RE = (
    r"'(?:s|t|re|ve|m|ll|d)| ?[a-zA-Z]+| ?[0-9]+"
    r"| ?[^a-zA-Z0-9 \t\n\r\f\x0B]+" + f"|{_WS}+"
)


def token_count_stats(
    corpus: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Per-doc token counts under both tokenizer families a training
    pipeline budgets with: the engine's analyzer (whitespace-ish, the
    same ``tokens()`` every index build uses) and a BPE-ish pretokenizer
    (the unit LLM token budgets are denominated in). Output
    (doc_id, n_ws_tokens, n_bpe_tokens, chars_per_bpe) — pure codegen'd
    string expressions, zero exchanges, so the plan is a scan→project
    at any corpus size. chars_per_bpe ≈ 4-5 on English text is the
    sanity band; floats rounded 6dp at the boundary (oracle parity)."""
    n_ws = F.size(tokens(text_col))
    n_bpe = F.size(
        F.regexp_extract_all(F.col(text_col), F.lit(BPE_SPLIT_RE), 0)
    )
    n_chars = F.length(F.col(text_col))
    return corpus.select(
        F.col(id_col),
        n_ws.cast("long").alias("n_ws_tokens"),
        n_bpe.cast("long").alias("n_bpe_tokens"),
        F.round(
            F.when(n_bpe > 0, n_chars / n_bpe.cast("double")).otherwise(0.0),
            6,
        ).alias("chars_per_bpe"),
    )
