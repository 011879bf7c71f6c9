"""Hybrid retrieval: reciprocal-rank fusion of heterogeneous rankers.

Fuses any number of (id, score) candidate lists — sparse BM25, dense
embedding cosine, phrase/proximity scores — into one ranking with
RRF(d) = Σ_i 1/(c + rank_i(d)), the standard fusion rule (Cormack et
al., SIGIR 2009; the same rule Elasticsearch/OpenSearch expose for
BM25+kNN hybrid search). The reference engine has no dense side at
all; this is the Spark-first capability that makes the ANN layer
(operators/ann.py, similarity.py) composable with the BM25 engine
(operators/build.py, topk.py) in one query.

Determinism (the DuckDB-oracle contract): each input list is truncated
to ``depth`` by (score DESC, ids ASC) — scores are already rounded at
their producers' output boundary — ranks are row_number() under the
same ordering, and the fused score adds the per-list 1/(c+rank)
contributions in FIXED list order via column addition (no groupBy-sum
float reassociation), rounded at the boundary.

Scale shape: each ranking is cut to ``depth`` rows with a
TakeOrderedAndProject BEFORE the single-partition rank window touches
it, so the window sorts ≤ depth rows regardless of corpus size; the
fusion join runs over ≤ n_lists·depth rows and broadcasts. Nothing
here scales with |corpus| — the heavy lifting happened inside the
rankers, which are index-served/pruned paths.
"""

from __future__ import annotations

import operator as _op
from collections.abc import Sequence
from functools import reduce

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def rrf_fuse(
    rankings: Sequence[DataFrame],
    id_cols: Sequence[str],
    k: int = 10,
    c: int = 60,
    depth: int = 50,
    score_col: str = "score",
) -> DataFrame:
    """Fuse candidate lists into (*id_cols, rrf) — top ``k`` by
    (rrf DESC, ids ASC). Each input must carry ``id_cols`` plus a
    higher-is-better ``score_col`` (rounded by its producer). A doc
    absent from a list contributes 0 for that list (the standard RRF
    convention), so coverage by MORE lists dominates — the property
    that makes RRF robust to incomparable score scales."""
    if not rankings:
        raise ValueError("rrf_fuse needs at least one ranking")
    ids = list(id_cols)
    asc = [F.asc(col) for col in ids]
    ranked = []
    for i, r in enumerate(rankings):
        cut = r.orderBy(F.desc(score_col), *asc).limit(depth)
        w = Window.orderBy(F.desc(score_col), *asc)
        ranked.append(
            cut.withColumn(f"_r{i}", F.row_number().over(w))
            .select(*ids, f"_r{i}")
        )
    fused = reduce(lambda a, b: a.join(b, ids, "full_outer"), ranked)
    contribs = [
        F.coalesce(
            F.lit(1.0) / (F.lit(float(c)) + F.col(f"_r{i}")), F.lit(0.0)
        )
        for i in range(len(rankings))
    ]
    return (
        fused.withColumn("rrf", F.round(reduce(_op.add, contribs), 6))
        .select(*ids, "rrf")
        .orderBy(F.desc("rrf"), *asc)
        .limit(k)
    )


def rrf_fuse_pandas(
    rankings,
    id_cols: Sequence[str],
    k: int = 10,
    c: int = 60,
    depth: int = 50,
    score_cols: Sequence[str] | None = None,
):
    """Driver-side RRF over pandas candidate lists — the warm-tier
    mirror of ``rrf_fuse`` (identical depth cut, rank definition, fixed
    fusion order, 6dp rounding), for fusing no-Spark-job rankers
    (``IndexBuilder.query_warm`` × ``LshIndex/IvfIndex.topk_local``)
    without launching a job."""
    import pandas as pd

    ids = list(id_cols)
    if score_cols is None:
        score_cols = ["score"] * len(rankings)
    ranked = []
    for i, (r, sc) in enumerate(zip(rankings, score_cols)):
        cut = (
            r.sort_values([sc, *ids], ascending=[False] + [True] * len(ids))
            .head(depth)
            .reset_index(drop=True)
        )
        cut[f"_r{i}"] = cut.index + 1
        ranked.append(cut[[*ids, f"_r{i}"]])
    fused = ranked[0]
    for nxt in ranked[1:]:
        fused = fused.merge(nxt, on=ids, how="outer")
    rrf = None
    for i in range(len(rankings)):
        contrib = (1.0 / (float(c) + fused[f"_r{i}"])).fillna(0.0)
        rrf = contrib if rrf is None else rrf + contrib
    fused["rrf"] = rrf.round(6)
    return (
        fused.sort_values(["rrf", *ids], ascending=[False] + [True] * len(ids))
        .head(k)[[*ids, "rrf"]]
        .reset_index(drop=True)
    )


def hybrid_warm(
    builder,
    ann_index,
    query: str,
    probe: Sequence[float],
    k: int = 10,
    c: int = 60,
    depth: int = 50,
) -> "pd.DataFrame":
    """Interactive hybrid query, NO Spark job end-to-end: the BM25
    side is the builder's warm posting-cache tier, the dense side is
    the persisted ANN index's warm pyarrow probe, fused driver-side.
    ``builder.id_cols`` must be the single column the ANN index is
    keyed by (aligned ids)."""
    (id_col,) = builder.id_cols
    sparse = builder.query_warm(query, k=depth)
    dense = ann_index.topk_local(probe, k=depth).rename(
        columns={ann_index.id_col: id_col, "cos": "score"}
    )
    return rrf_fuse_pandas([sparse, dense], [id_col], k=k, c=c, depth=depth)


def hybrid_topk(
    corpus: DataFrame,
    vectors: DataFrame,
    query: str,
    probe: Sequence[float],
    k: int = 10,
    id_cols: Sequence[str] = ("doc_id",),
    text_col: str = "text",
    vec_id_col: str = "vec_id",
    vec_col: str = "embedding",
    c: int = 60,
    depth: int = 50,
) -> DataFrame:
    """Sparse+dense hybrid search over a corpus with aligned embedding
    ids: BM25 list from ``bm25_scores_pinned`` fused with the exact
    cosine list from ``cosine_topk`` via RRF. Output (*id_cols, rrf).
    Swap ``cosine_topk`` for ``AnnIndexStore`` probes at scale — any
    (id, score) list fuses the same way."""
    from antidb_spark.operators.similarity import cosine_topk
    from antidb_spark.operators.topk import bm25_scores_pinned

    (id_col,) = id_cols  # dense side carries a single aligned id
    sparse = bm25_scores_pinned(
        corpus, query, id_cols=id_cols, text_col=text_col
    )
    dense = cosine_topk(
        vectors, probe, k=depth, id_col=vec_id_col, vec_col=vec_col
    ).select(F.col(vec_id_col).alias(id_col), F.col("cos").alias("score"))
    return rrf_fuse([sparse, dense], id_cols, k=k, c=c, depth=depth)
