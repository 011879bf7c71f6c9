"""Dataset partitioning for training pipelines: deterministic
train/val/test splits.

Assignment is a pure per-row hash of ``(salt, id)`` — no shuffle, no
global state — so it is reproducible across runs/engines, stable under
corpus growth (new docs never move old ones between splits), and
re-saltable for fresh folds. Reference tie-in: a P4 computed-key
projection (README.md:53) applied to corpus curation.
"""

from __future__ import annotations

import math

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


def stratified_sample(
    corpus: DataFrame,
    rates: dict[str, float],
    stratum_col: str,
    id_col: str = "doc_id",
    salt: str = "s1",
    default_rate: float = 0.0,
) -> DataFrame:
    """Deterministic per-stratum hash sampling — rebalance a corpus by
    keeping each stratum (language, source, quality band, ...) at its
    own rate. A row survives iff its ``split_bucket`` (md5 of salt:id,
    [0, 10000)) falls below ``round(rate × 10000)`` for its stratum;
    strata absent from ``rates`` use ``default_rate``.

    Zero shuffle (pure projection + filter, Catalyst pushes it into the
    scan), reproducible across engines (the DuckDB twin is the same md5
    arithmetic), growth-stable (new rows never flip old keep/drop
    decisions — the property the training-data pipeline needs when a
    crawl snapshot grows), and nested: because the keep set at rate r2
    < r1 is a SUBSET of the keep set at r1 under the same salt,
    down-scaling a stratum later only removes rows. Reference tie-in:
    a P2 phantom filter (README.md:47-50) driven by a computed key.

    Output: the input columns + ``bucket`` (for auditability).
    """
    for name, r in rates.items():
        if not (0.0 <= r <= 1.0):
            raise ValueError(f"rate for {name!r} must be in [0,1], got {r}")
    if not (0.0 <= default_rate <= 1.0):
        raise ValueError(f"default_rate must be in [0,1], got {default_rate}")
    b = split_bucket(id_col, salt)
    thr = F.lit(int(round(default_rate * SPLIT_BUCKETS)))
    for name, r in sorted(rates.items()):
        thr = F.when(
            F.col(stratum_col) == name, int(round(r * SPLIT_BUCKETS))
        ).otherwise(thr)
    return corpus.withColumn("bucket", b).filter(F.col("bucket") < thr)


def temperature_mix(
    corpus: DataFrame,
    stratum_col: str,
    tau: float = 0.5,
    target_frac: float = 0.5,
    id_col: str = "doc_id",
    salt: str = "t1",
) -> DataFrame:
    """Temperature-scaled mixture resampling (the data-mixture
    reweighting of multilingual/multi-domain training pipelines):
    derive each stratum's sampling rate from its OBSERVED size so the
    kept mix follows ``p_i ∝ n_i^tau`` at an overall ``target_frac``
    budget — ``tau=1`` is proportional (every stratum keeps exactly
    ``target_frac``), ``tau→0`` flattens toward uniform per-stratum
    counts, upweighting minority strata.

    ``rate_i = min(1, target_frac · N · n_i^tau / Z / n_i)`` with
    ``Z = Σ n_i^tau`` folded in sorted-stratum order (the float
    discipline), thresholded as ``floor(rate_i · 10000)`` over the
    same deterministic ``split_bucket`` as `dataset_split` — so the
    keep decision is growth-stable and nested exactly like
    `stratified_sample`, but the rates come from the data, not the
    caller. NULL strata are excluded (the terms-agg missing rule).
    For ``tau=0.5`` the weight is ``sqrt`` (IEEE-correctly-rounded →
    bit-reproducible cross-engine); other ``tau`` use ``pow``, whose
    last-ulp behavior is libm-specific — fine for training, not
    pinned by an oracle.

    Scale shape: ONE map-combinable count keyed by stratum (#strata
    driver rows — bounded like the centroid relation), then a pure
    broadcast-free projection+filter the scan absorbs; zero shuffles
    over the corpus. Output: the input columns + ``bucket``.
    Compose with `cluster.kmeans_assign` for topic-balanced mixes:
    cluster → join labels → temperature_mix(stratum_col="cluster").
    """
    if tau <= 0:
        raise ValueError(f"tau must be > 0, got {tau}")
    if not (0.0 < target_frac <= 1.0):
        raise ValueError(
            f"target_frac must be in (0,1], got {target_frac}"
        )
    rows = (
        corpus.filter(F.col(stratum_col).isNotNull())
        .groupBy(stratum_col)
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()  # bounded: one row per stratum
    )
    counts = sorted((r[stratum_col], int(r["n"])) for r in rows)
    if not counts:
        return corpus.filter(F.lit(False)).withColumn(
            "bucket", F.lit(0).cast("long")
        )
    tot = sum(n for _, n in counts)
    weights = [
        math.sqrt(float(n)) if tau == 0.5 else math.pow(float(n), tau)
        for _, n in counts
    ]
    z = 0.0
    for w in weights:  # fixed-order fold, sorted-stratum order
        z += w
    thr: dict = {}
    for (st, n), w in zip(counts, weights):
        rate = min(1.0, target_frac * tot * w / z / n)
        thr[st] = int(math.floor(rate * SPLIT_BUCKETS))
    b = split_bucket(id_col, salt)
    t = F.lit(-1)
    for st in sorted(thr):
        t = F.when(F.col(stratum_col) == st, thr[st]).otherwise(t)
    return (
        corpus.filter(F.col(stratum_col).isNotNull())
        .withColumn("bucket", b)
        .filter(F.col("bucket") < t)
    )


def pack_sequences(
    corpus: DataFrame,
    budget: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_partitions: int | None = None,
) -> DataFrame:
    """Concat-and-chunk sequence packing — the GPT-style training-data
    step that concatenates every document's tokens in a global
    deterministic order (``id_col`` ascending) and cuts the stream into
    fixed ``budget``-token training examples (packs). Each output row
    is one document SLICE inside one pack:

      (pack_id, id, doc_offset, pack_offset, slice_len)

    where ``doc_offset`` is where the slice starts within the document,
    ``pack_offset`` where it lands within the pack, and a document
    longer than the remaining pack space straddles into the following
    pack(s) — ``Σ slice_len`` per doc equals the doc's token count and
    every pack except the last is exactly full. Empty docs (0 tokens)
    are dropped.

    Plan shape (scale path): ONE range shuffle on ``id_col`` + a
    two-pass distributed prefix sum (per-partition token totals → one
    row per partition to the driver → Arrow-batched cumsum, the
    ``assign_doc_ords`` pattern — no single-partition global window),
    then a pure-codegen ``sequence``/``explode`` whose fan-out per doc
    is ≤ ceil(tokens/budget)+1 rows. Token offsets are exact int64
    end-to-end (SQL ``DIV``, never float division).

    Like ``assign_doc_ords``, the range-partitioned pass-1 frame stays
    persisted so pass 2 numbers the exact partition contents pass 1
    totalled; it is exposed as ``out._pack_source`` for callers that
    want to unpersist after materializing.
    """
    import numpy as np
    import pandas as pd  # noqa: F401  (mapInPandas batches)
    from pyspark.sql import types as T

    from antidb_spark.functions.analyze import tokens

    if budget <= 0:
        raise ValueError(f"budget must be positive, got {budget}")
    spark = corpus.sparkSession
    n_part = n_partitions or spark.sparkContext.defaultParallelism
    toks = corpus.select(
        F.col(id_col), F.size(tokens(text_col)).cast("long").alias("n_toks")
    ).filter(F.col("n_toks") > 0)
    sorted_df = (
        toks.repartitionByRange(n_part, id_col)
        .sortWithinPartitions(id_col)
        .withColumn("_pid", F.spark_partition_id())
        .persist()
    )
    totals = {
        r["_pid"]: r["s"]
        for r in sorted_df.groupBy("_pid").agg(F.sum("n_toks").alias("s")).collect()
    }
    offsets: dict[int, int] = {}
    acc = 0
    for pid in sorted(totals):
        offsets[pid] = acc
        acc += totals[pid]
    span_schema = T.StructType(
        [
            sorted_df.schema[id_col],
            T.StructField("n_toks", T.LongType(), False),
            T.StructField("start", T.LongType(), False),
        ]
    )

    def number(batches):
        pos = None
        for batch in batches:
            if len(batch) == 0:
                continue
            if pos is None:
                pos = offsets[int(batch["_pid"].iloc[0])]
            batch = batch.drop(columns=["_pid"])
            n = batch["n_toks"].to_numpy(dtype=np.int64)
            ends = n.cumsum()
            batch["start"] = pos + ends - n
            pos += int(ends[-1])
            yield batch

    spans = sorted_df.mapInPandas(number, schema=span_schema)
    B = int(budget)
    first = F.expr(f"start DIV {B}")
    last = F.expr(f"(start + n_toks - 1) DIV {B}")
    slice_start = F.greatest(F.col("pack_id") * B, F.col("start"))
    slice_end = F.least(
        (F.col("pack_id") + 1) * B, F.col("start") + F.col("n_toks")
    )
    out = (
        spans.select(
            F.col(id_col),
            "n_toks",
            "start",
            F.explode(F.sequence(first, last)).alias("pack_id"),
        )
        .select(
            F.col("pack_id"),
            F.col(id_col),
            (slice_start - F.col("start")).alias("doc_offset"),
            (slice_start - F.col("pack_id") * B).alias("pack_offset"),
            (slice_end - slice_start).alias("slice_len"),
        )
    )
    out._pack_source = sorted_df  # type: ignore[attr-defined]
    return out


def mix_epochs(
    corpus: DataFrame,
    weights: dict[str, float],
    stratum_col: str,
    id_col: str = "doc_id",
    salt: str = "m1",
    default_weight: float = 1.0,
) -> DataFrame:
    """Deterministic per-stratum epoch mixing — the training-mixture
    step that REPEATS high-value strata and thins low-value ones by a
    fractional epoch weight (the Pile/Chinchilla-style "epochs per
    source" knob). A row with stratum weight ``w`` appears
    ``floor(w)`` times, plus one extra time iff its ``split_bucket``
    (md5 of salt:id) falls below ``round(frac(w) × 10000)`` — so a
    weight of 2.5 gives every row 2 guaranteed epochs and a
    deterministic id-stable half of the stratum a 3rd.

    Zero shuffle (codegen when-chain + ``sequence``/``explode``; the
    fan-out per row is ``ceil(w)``), reproducible cross-engine,
    growth-stable, and consistent with ``stratified_sample``'s bucket
    arithmetic (weight w < 1 ≡ sampling at rate w). Output: the input
    columns + ``epoch`` (0-based).
    """
    for name, w in weights.items():
        if w < 0:
            raise ValueError(f"weight for {name!r} must be >= 0, got {w}")
    if default_weight < 0:
        raise ValueError(f"default_weight must be >= 0, got {default_weight}")

    def parts(w: float) -> tuple[int, int]:
        base = int(w)
        return base, int(round((w - base) * SPLIT_BUCKETS))

    d_base, d_thr = parts(default_weight)
    base_col, thr_col = F.lit(d_base), F.lit(d_thr)
    for name, w in sorted(weights.items()):
        b, t = parts(w)
        is_s = F.col(stratum_col) == name
        base_col = F.when(is_s, b).otherwise(base_col)
        thr_col = F.when(is_s, t).otherwise(thr_col)
    n_epochs = base_col + (split_bucket(id_col, salt) < thr_col).cast("int")
    return (
        corpus.withColumn("_n_epochs", n_epochs)
        .filter(F.col("_n_epochs") > 0)
        .withColumn(
            "epoch", F.explode(F.sequence(F.lit(0), F.col("_n_epochs") - 1))
        )
        .drop("_n_epochs")
    )


def assemble_packs(slices: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Materialize ``pack_sequences`` output into one row per training
    example: (pack_id, n_docs, pack_len, parts) where ``parts`` is the
    pack's slices ordered by ``pack_offset`` — each a
    struct(pack_offset, id, doc_offset, slice_len). The loader-side
    contract: concatenate ``parts`` in array order and the example is
    full (every pack but the last, by the packing invariant).

    One pack-keyed shuffle; slice structs are tiny (ids + 3 longs), so
    a pack row is bounded by budget/min-doc-tokens parts — never a
    collect_list over unbounded data. ``sort_array`` on the
    pack_offset-led struct keeps assembly deterministic without a
    per-group window.
    """
    part = F.struct(
        F.col("pack_offset"), F.col(id_col), F.col("doc_offset"),
        F.col("slice_len"),
    )
    return (
        slices.groupBy("pack_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("slice_len").alias("pack_len"),
            F.sort_array(F.collect_list(part)).alias("parts"),
        )
    )


def shuffle_order(
    corpus: DataFrame,
    id_col: str = "doc_id",
    salt: str = "sh1",
    n_partitions: int | None = None,
) -> DataFrame:
    """(id, shuffle_pos): a deterministic global training-order shuffle
    — dense 0-based positions in ``md5(salt:id)`` order (ties, i.e.
    md5 collisions, broken by id). Reproducible across engines and
    runs, re-saltable per epoch, and distributed: the ordering rides
    ``assign_doc_ords``'s two-pass range machinery (one range exchange
    + Arrow numbering), never a single-partition row_number window.
    """
    from antidb_spark.operators.build import assign_doc_ords

    h = F.md5(
        F.concat(F.lit(salt), F.lit(":"), F.col(id_col).cast("string"))
    )
    ords = assign_doc_ords(
        corpus.select(h.alias("_h"), F.col(id_col)),
        id_cols=["_h", id_col],
        n_partitions=n_partitions,
    )
    return ords.select(F.col(id_col), F.col("doc_ord").alias("shuffle_pos"))


def chunk_docs(
    corpus: DataFrame,
    chunk_tokens: int,
    overlap: int = 0,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """RAG-style per-document chunking: cut each document's token
    stream into ``chunk_tokens``-token windows advancing by
    ``chunk_tokens - overlap`` (so consecutive chunks share ``overlap``
    tokens — the retrieval-context contract). One output row per
    chunk:

      (id, chunk_idx, start_tok, n_toks, chunk_text)

    where ``chunk_text`` re-joins the analyzer tokens with single
    spaces (the canonical form both engines reproduce; byte offsets
    into the raw text are not token-addressable after the analyzer
    split). The final chunk is the only one allowed to be shorter than
    ``chunk_tokens``; it always reaches the document's last token, and
    a document of ``<= chunk_tokens`` tokens yields exactly one chunk.
    Empty documents (0 tokens) are dropped, like ``pack_sequences``.

    Unlike :func:`pack_sequences` (cross-document concat-and-chunk for
    training examples), chunks never straddle documents — this is the
    indexing/retrieval shape, not the packing shape.

    Scale shape: ZERO shuffle — a pure codegen scan→project whose
    fan-out per doc is ceil(n_toks/stride); tokenization, the
    ``sequence``/``explode`` chunk enumeration, and the ``slice`` +
    ``array_join`` rematerialization all run JVM-side. Int64 window
    math end-to-end (``DIV``), clamped so pathological overlap ratios
    can never produce a descending ``sequence``."""
    from antidb_spark.functions.analyze import tokens

    chunk = int(chunk_tokens)
    ov = int(overlap)
    if chunk <= 0:
        raise ValueError(f"chunk_tokens must be positive, got {chunk_tokens}")
    if not 0 <= ov < chunk:
        raise ValueError(
            f"overlap must satisfy 0 <= overlap < chunk_tokens, got {overlap}"
        )
    stride = chunk - ov
    toked = corpus.select(
        F.col(id_col), tokens(text_col).alias("_toks")
    ).select(
        id_col, "_toks", F.size("_toks").cast("long").alias("_n")
    ).filter(F.col("_n") > 0)
    # last chunk index: 0 when the doc fits in one chunk, else
    # ceil((n - chunk)/stride); greatest(0, ·) guards the n < chunk
    # branch where the DIV operand goes negative (floor/trunc disagree
    # on negatives across engines — clamping removes the case).
    last_idx = F.greatest(
        F.lit(0).cast("long"),
        F.expr(f"(_n - {chunk} + {stride - 1}) DIV {stride}"),
    )
    start = F.col("chunk_idx") * stride
    clen = F.least(F.lit(chunk).cast("long"), F.col("_n") - start)
    return (
        toked.select(
            id_col, "_toks", "_n",
            F.explode(F.sequence(F.lit(0).cast("long"), last_idx))
            .alias("chunk_idx"),
        )
        .select(
            F.col(id_col),
            F.col("chunk_idx"),
            start.alias("start_tok"),
            clen.alias("n_toks"),
            F.array_join(
                F.slice(F.col("_toks"), (start + 1).cast("int"),
                        clen.cast("int")),
                " ",
            ).alias("chunk_text"),
        )
    )
