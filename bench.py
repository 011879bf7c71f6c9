"""Per-round benchmark harness (driver contract).

Runs the engine's headline workloads at ``$SPARK_GRAFT_SF_DIR`` (default
``/root/testdata/sf0.1``) on ``local[$SPARK_GRAFT_CPUS]`` and prints ONE
JSON line::

    {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Headline workloads (BASELINE.json metric = index-build throughput +
top-k BM25 query latency):

- ``index_build``  — synth transcripts → postings/stats/blocks physical
  index written Iceberg-style (the reference's Idx.idx() analog at
  idx.py:85-92, distributed); also reports turns/sec.
- ``bm25_batch``   — 100-query seeded batch of top-k BM25 over the built
  index (driver-planned single-job path); also reports q/s.
- ``keyed_build`` / ``eq_warm`` — persisted covering token index build +
  warm driver-side point lookups (no Spark job; reports median ms).
- ``topk_docs``    — flagship single query over sf documents.parquet.
- ``eq_lookup`` / ``rng_lookup`` — antidb-parity point/range lookups
  (Prs.eq/rng analog, prs.py:86-131).
- ``dedup_minhash`` / ``text_quality`` — training-pipeline operators over
  documents.

Scaling evidence (local[8] vs local[32]) is produced separately by
``scripts/scaling_bench.py`` → ``BENCH/BASELINE.md``.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", str(os.cpu_count() or 8))
# Bench corpus: ~425k turns at default; override for scaling runs.
N_CONVS = int(os.environ.get("SPARK_GRAFT_BENCH_CONVS", "50000"))
N_QUERIES = int(os.environ.get("SPARK_GRAFT_BENCH_QUERIES", "100"))
# comma-list of phases to run ("all" = everything) — the scaling harness
# restricts to the scalable phases to keep interleaved repeats short
PHASES = (os.environ.get("SPARK_GRAFT_BENCH_PHASES") or "all").split(",")


def phase_on(name: str) -> bool:
    return "all" in PHASES or name in PHASES


def main() -> None:
    from antidb_spark.operators.build import IndexBuilder
    from antidb_spark.operators.lookup import KeyedIndex
    from antidb_spark.operators.topk import bm25_topk_pinned
    from antidb_spark.operators.dedup import minhash_near_dups
    from antidb_spark.operators.textstats import quality_scores
    from antidb_spark.functions.analyze import distinct_tokens
    from antidb_spark.session import get_spark
    from antidb_spark.synth import query_set, synth_transcripts, vocabulary

    spark = get_spark(master=f"local[{CPUS}]")
    sf = float(os.path.basename(SF_DIR.rstrip("/")).replace("sf", "") or 0.1)
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    docs.count()  # warm the scan / JVM

    timings: dict[str, float] = {}
    extras: dict[str, float] = {}
    work_root = tempfile.mkdtemp(
        prefix="antidb_bench_",
        dir=os.environ.get("SPARK_GRAFT_BENCH_WORKDIR") or None,
    )

    def timed(name: str, fn, repeats: int = 1):
        """Best-of-``repeats`` wall time (this host shows ±2× run-to-run
        noise; query phases are cheap enough to repeat, build phases
        are single-shot)."""
        out, best = None, float("inf")
        for _ in range(max(1, repeats)):
            t0 = time.perf_counter()
            out = fn()
            best = min(best, time.perf_counter() - t0)
        timings[name] = round(best, 3)
        return out

    QUERY_REPEATS = int(os.environ.get("SPARK_GRAFT_BENCH_REPEATS", "2"))

    # --- index build over synthetic transcripts (north-rule flagship) ---
    # bm25_batch depends on the committed index, so the build runs (but is
    # only TIMED/reported) according to its own phase gate.
    if phase_on("index_build") or phase_on("bm25_batch"):
        transcripts = synth_transcripts(spark, n_convs=N_CONVS).cache()
        n_turns = transcripts.count()  # materialize cache outside the timer
        builder = IndexBuilder(spark, os.path.join(work_root, "idx"))
        if phase_on("index_build"):
            metrics = timed("index_build", lambda: builder.build(transcripts))
            extras["turns_per_sec"] = round(n_turns / timings["index_build"], 1)
            extras["n_turns"] = n_turns
            extras["build_phases"] = {
                p["phase"]: round(p["seconds"], 2) for p in metrics["phases"]
            }
        else:
            builder.build(transcripts)
        # queries read the committed index tables, not the corpus — release
        # the cache so the query phases aren't GC-taxed by 10^6 held rows
        transcripts.unpersist()

    # --- BM25 query batch over the built index --------------------------
    if phase_on("bm25_batch"):
        queries = query_set(N_QUERIES)

        def run_batch():
            out = builder.query_batch(queries, k=10)
            return out.count()

        timed("bm25_batch", run_batch, QUERY_REPEATS)
        extras["queries_per_sec"] = round(N_QUERIES / timings["bm25_batch"], 2)

    # --- warm interactive BM25 (driver-side, no Spark job) --------------
    if phase_on("bm25_warm"):
        import statistics

        from antidb_spark.synth import vocabulary as _vocab

        warm_qs = [" ".join(_vocab(2000)[i::997][:2]) for i in range(10)]
        builder.query_warm(warm_qs[0])  # warm manifest/dataset metadata
        lat = []
        for q in warm_qs * 2:
            t0 = time.perf_counter()
            builder.query_warm(q, k=10)
            lat.append(time.perf_counter() - t0)
        timings["bm25_warm"] = round(statistics.median(lat), 4)
        extras["bm25_warm_ms"] = round(1000 * statistics.median(lat), 2)

    # --- persisted positional index: build + warm phrase queries --------
    if phase_on("pos_build") or phase_on("phrase_warm"):
        from antidb_spark.operators.phrase import (
            build_positional_index,
            phrase_warm,
        )

        if phase_on("pos_build"):
            timed("pos_build",
                  lambda: build_positional_index(builder, transcripts))
        else:
            build_positional_index(builder, transcripts)
        if phase_on("phrase_warm"):
            import statistics

            v = vocabulary(2000)
            # mid/rare-frequency pairs — the interactive warm regime
            # (stopword-heavy phrases fall back to the distributed path
            # via PHRASE_WARM_MAX_BLOCKS and would measure a Spark job)
            phrases = [f"{v[i]} {v[i + 37]}" for i in range(300, 310)] + [
                f"{v[i]} {v[i + 11]}" for i in range(900, 910)
            ]
            phrase_warm(builder, phrases[0])  # warm dataset metadata
            lat = []
            for p in phrases:
                t0 = time.perf_counter()
                phrase_warm(builder, p)
                lat.append(time.perf_counter() - t0)
            timings["phrase_warm"] = round(statistics.median(lat), 4)
            extras["phrase_warm_ms"] = round(
                1000 * statistics.median(lat), 2
            )

    # --- flagship documents query ---------------------------------------
    if phase_on("topk_docs"):
        timed(
            "topk_docs",
            lambda: bm25_topk_pinned(
                docs, "spark query join performance", k=10, id_cols=("doc_id",)
            ).collect(),
            QUERY_REPEATS,
        )

    # --- persisted keyed index: build + lookups served FROM THE INDEX ---
    # (the reference's workload shape: build the .adb once, then answer
    # every eq/rng from it — r02's bench ran the lookup phases on the
    # in-memory KeyedIndex, which rescans+re-tokenizes the base per call
    # and measured that rescan, not the engine's index path)
    lookup_phases = (
        "keyed_build", "eq_warm", "eq_lookup", "rng_lookup", "eq_batch",
        "eq_batch_mem",
    )
    if any(phase_on(p) for p in lookup_phases):
        from antidb_spark.operators.keyed import KeyedIndexStore

        store = KeyedIndexStore(spark, os.path.join(work_root, "keyed"))

        def build_keyed():
            return store.build(
                "doc_tokens", docs, distinct_tokens("text"),
                id_cols=["doc_id"], multi=True,
            )

        if phase_on("keyed_build"):
            timed("keyed_build", build_keyed)
        else:
            build_keyed()
        pidx = store.open("doc_tokens")
        if phase_on("eq_lookup"):
            timed("eq_lookup",
                  lambda: pidx.eq("spark", "zzzmiss", "data").count(),
                  QUERY_REPEATS)
        if phase_on("rng_lookup"):
            timed("rng_lookup", lambda: pidx.rng("query", "sort").count(),
                  QUERY_REPEATS)
        if phase_on("eq_batch"):
            # the reference's annotation workload shape: a large batch of
            # point lookups (README.md:180,209 — 2,842 probes, 114 q/s);
            # one Spark job over the covering index amortizes scheduling
            from antidb_spark.synth import vocabulary

            probes = vocabulary(1000)
            timed("eq_batch_1000", lambda: pidx.eq(*probes).count(),
                  QUERY_REPEATS)
            extras["point_lookups_per_sec_spark"] = round(
                1000 / timings["eq_batch_1000"], 1
            )
            # the same 1000 probes through the warm tier (one pruned
            # pyarrow read + one vectorized merge, zero Spark jobs) —
            # the apples-to-apples single-node shape vs the reference's
            # single-threaded annotation numbers
            pidx.eq_local(probes[0])  # warm dataset metadata
            timed("eq_batch_local", lambda: len(pidx.eq_local(*probes)),
                  QUERY_REPEATS)
            extras["point_lookups_per_sec"] = round(
                1000 / timings["eq_batch_local"], 1
            )
        if phase_on("eq_batch_mem"):
            # parity-semantics reference point: the index-free in-memory
            # KeyedIndex (rescans + re-tokenizes the base per call)
            from antidb_spark.synth import vocabulary

            midx = KeyedIndex(docs, distinct_tokens("text"),
                              id_cols=["doc_id"], multi=True)
            probes = vocabulary(1000)
            timed("eq_batch_mem", lambda: midx.eq(*probes).count(),
                  QUERY_REPEATS)
        if phase_on("eq_warm"):
            # the reference's warm point-query class (README.md:43,
            # 0.015 s): driver-side pyarrow reads of manifest-pruned
            # files — no Spark job. Median over mixed-frequency probes.
            import statistics

            idx = store.open("doc_tokens")
            idx.eq_local("spark")  # warm manifest + dataset metadata
            probes = (vocabulary(1000)[-8:] + ["data", "query"]) * 2
            lat = []
            for p in probes:
                t0 = time.perf_counter()
                idx.eq_local(p)
                lat.append(time.perf_counter() - t0)
            timings["eq_warm"] = round(statistics.median(lat), 4)
            extras["eq_warm_ms"] = round(1000 * statistics.median(lat), 2)

    # --- training-pipeline operators ------------------------------------
    if phase_on("dedup_minhash"):
        timed("dedup_minhash",
              lambda: minhash_near_dups(docs, id_col="doc_id").count(),
              QUERY_REPEATS)
    if phase_on("text_quality"):
        timed("text_quality", lambda: quality_scores(docs).count(), QUERY_REPEATS)

    shutil.rmtree(work_root, ignore_errors=True)
    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline-suite wall time (index build + BM25 batch "
                "+ lookups + pipeline ops)",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
                **extras,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
