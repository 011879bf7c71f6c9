"""Text-analysis operators: language ID, quality scoring, token counts,
document fingerprints (training-pipeline layer).

Everything except winnowing is pure JVM-side column arithmetic
(whole-stage codegen, no Python in the hot path); each op has a matching
ANSI-SQL oracle in ``__spark_entry__`` so cross-engine hashes agree.

Reference tie-in: these are P1/P4 "computed key" projections
(idx.py:44,137-138; phantom keys README.md:53) promoted to typed,
vectorized operators.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

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


# --- winnowing fingerprints (rolling hash) ------------------------------

WINNOW_K = 5   # k-gram length (in tokens)
WINNOW_W = 4   # window of consecutive k-gram hashes; min per window kept


def _py_winnow(text: str, k: int = WINNOW_K, w: int = WINNOW_W) -> list[int]:
    """Winnowing (Schleimer et al. 2003): stable hash per token k-gram,
    keep the min hash of each sliding window (rightmost on ties),
    deduplicated, sorted. Pure-python oracle = the one implementation."""
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
    hs = [
        int.from_bytes(
            hashlib.blake2b(g.encode(), digest_size=8).digest(), "little"
        ) >> 1  # fit int64
        for g in grams
    ]
    picks = set()
    for s in range(max(1, len(hs) - w + 1)):
        window = hs[s : s + w]
        m = min(window)
        # rightmost min in window
        picks.add(window[len(window) - 1 - window[::-1].index(m)])
    return sorted(picks)


def winnow_fingerprints(
    corpus: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(id, fps: array<long>) winnowed fingerprint set per doc
    (mapInPandas; two docs sharing any fingerprint are clone-suspects)."""
    id_field = corpus.schema[id_col]
    out_schema = T.StructType(
        [
            T.StructField(id_col, id_field.dataType, True),
            T.StructField("fps", T.ArrayType(T.LongType()), False),
        ]
    )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            yield pd.DataFrame(
                {
                    id_col: batch[id_col],
                    "fps": [
                        np.array(_py_winnow(t), dtype=np.int64)
                        for t in batch[text_col]
                    ],
                }
            )

    return corpus.select(id_col, text_col).mapInPandas(gen, schema=out_schema)


def clone_candidates(
    corpus: DataFrame, id_col: str = "doc_id", text_col: str = "text",
    min_shared: int = 2,
) -> DataFrame:
    """Pairs sharing ≥ min_shared winnow fingerprints (inverted-index
    join on fingerprint — the scalable clone-detection path)."""
    fp = winnow_fingerprints(corpus, id_col, text_col).select(
        F.col(id_col).alias("_id"), F.explode("fps").alias("fp")
    )
    return (
        fp.alias("x")
        .join(
            fp.alias("y"),
            (F.col("x.fp") == F.col("y.fp")) & (F.col("x._id") < F.col("y._id")),
        )
        .groupBy(
            F.col("x._id").alias("id_a"), F.col("y._id").alias("id_b")
        )
        .agg(F.count(F.lit(1)).alias("shared_fps"))
        .filter(F.col("shared_fps") >= min_shared)
    )
