"""Dataset partitioning for training pipelines: deterministic
train/val/test splits.

Assignment is a pure per-row hash of ``(salt, id)`` — no shuffle, no
global state — so it is reproducible across runs/engines, stable under
corpus growth (new docs never move old ones between splits), and
re-saltable for fresh folds. Reference tie-in: a P4 computed-key
projection (README.md:53) applied to corpus curation.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

SPLIT_BUCKETS = 10_000


def split_bucket(id_col: Column | str, salt: str = "v1") -> Column:
    """Deterministic bucket in [0, SPLIT_BUCKETS): first 8 md5 hex
    digits of 'salt:id' mod 10_000 — the DuckDB twin is
    ('0x' || substr(md5(...), 1, 8))::BIGINT % 10000."""
    c = F.col(id_col) if isinstance(id_col, str) else id_col
    h = F.md5(F.concat(F.lit(salt), F.lit(":"), c.cast("string")))
    return (
        F.conv(F.substring(h, 1, 8), 16, 10).cast("long") % SPLIT_BUCKETS
    )


def dataset_split(
    corpus: DataFrame,
    id_col: str = "doc_id",
    splits: tuple[tuple[str, float], ...] = (
        ("train", 0.8), ("val", 0.1), ("test", 0.1),
    ),
    salt: str = "v1",
) -> DataFrame:
    """(id, bucket, split): assign every row to a named split by
    cumulative bucket ranges (proportions exact in expectation; the
    bucket column is kept for auditability). Weights must sum to 1."""
    total = sum(w for _, w in splits)
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"split weights must sum to 1, got {total}")
    b = split_bucket(id_col, salt)
    hi = 0.0
    bounds = []
    for name, w in splits[:-1]:
        hi += w
        bounds.append((name, int(round(hi * SPLIT_BUCKETS))))
    # build the when-chain inside-out so the SMALLEST edge is tested
    # first: b < 8000 → train, elif b < 9000 → val, else test
    expr = F.lit(splits[-1][0])
    for name, edge in reversed(bounds):
        expr = F.when(b < edge, name).otherwise(expr)
    return corpus.select(
        F.col(id_col), b.alias("bucket"), expr.alias("split")
    )


def curate(
    corpus: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_quality: float = 0.6,
    langs: tuple[str, ...] = ("en",),
    splits: tuple[tuple[str, float], ...] = (
        ("train", 0.8), ("val", 0.1), ("test", 0.1),
    ),
    salt: str = "v1",
) -> DataFrame:
    """End-to-end curation composite — the standard training-data
    funnel as ONE declarative plan: quality gate (composite score ≥
    ``min_quality``) → language filter (``pred_lang ∈ langs``) →
    exact-dedup keeping the canonical min-id survivor → deterministic
    split assignment. Output (id, pred_lang, quality, split), one row
    per surviving doc.

    Plan shape: quality/lang/split are per-row projections; the only
    wide shuffle is the dedup fingerprint window, and it runs over the
    ALREADY-FILTERED survivors (filters first — at 100 TB the quality
    gate typically drops a large fraction before the shuffle pays for
    the rest). Dedup-after-filter also means the canonical survivor is
    chosen among docs that passed the gates, never a filtered-out copy.
    """
    from antidb_spark.operators.dedup import resolve_exact_dups
    from antidb_spark.operators.textstats import lang_id, quality_scores

    q = quality_scores(corpus, id_col, text_col).select(id_col, "quality")
    lid = lang_id(corpus, id_col, text_col).select(id_col, "pred_lang")
    ql = (
        q.join(lid, id_col)
        .filter(
            (F.col("quality") >= min_quality)
            & F.col("pred_lang").isin(*langs)
        )
    )
    survivors = corpus.join(ql.select(id_col), id_col, "left_semi")
    canon = resolve_exact_dups(survivors, id_col, text_col).filter(
        "is_canonical"
    )
    sp = dataset_split(corpus, id_col, splits, salt).select(id_col, "split")
    return (
        canon.select(id_col)
        .join(ql, id_col)
        .join(sp, id_col)
        .select(id_col, "pred_lang", "quality", "split")
    )
