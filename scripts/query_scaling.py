"""Controlled BM25 query-scaling measurement (N vs 4N cores).

Isolates QUERY scaling from build scaling and from cross-JVM state: one
JVM builds the packed index on tmpfs, then two fresh JVMs (local[4N],
local[N]) each run the identical 100-query batch against the SAME
index files, twice, reporting the per-level minimum. Efficiency =
(T_N / T_4N) / 4.

This is the fair shape for query-path evidence: the index bytes,
plans, and queries are identical — executor-thread count is the only
variable, and no build-phase GC debris pollutes the query JVMs.

Usage:  python scripts/query_scaling.py            # full experiment
        (child mode: --child build|query CPUS ROOT, used internally)
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

N_CORES = int(os.environ.get("SPARK_GRAFT_SCALING_N", "4"))
N4_CORES = 4 * N_CORES
N_CONVS = int(os.environ.get("SPARK_GRAFT_QSCALE_CONVS", "150000"))
N_QUERIES = 100
ROOT = os.environ.get("SPARK_GRAFT_QSCALE_ROOT", "/dev/shm/qscale_idx")


def child(mode: str, cpus: int) -> None:
    import time

    from antidb_spark.operators.build import IndexBuilder
    from antidb_spark.session import get_spark
    from antidb_spark.synth import query_set, synth_transcripts

    spark = get_spark(master=f"local[{cpus}]")
    b = IndexBuilder(spark, ROOT)
    if mode == "build":
        t = synth_transcripts(spark, n_convs=N_CONVS).cache()
        n = t.count()
        t0 = time.time()
        b.build(t)
        print(json.dumps({"mode": "build", "cpus": cpus, "n_turns": n,
                          "seconds": round(time.time() - t0, 2)}))
    else:
        qs = query_set(N_QUERIES)
        times = []
        for _ in range(2):
            t0 = time.time()
            b.query_batch(qs, k=10).count()
            times.append(round(time.time() - t0, 2))
        print(json.dumps({"mode": "query", "cpus": cpus,
                          "seconds": min(times), "runs": times}))
    spark.stop()


def run_child(mode: str, cpus: int) -> dict:
    proc = subprocess.run(
        [sys.executable, os.path.abspath(__file__), "--child", mode, str(cpus)],
        capture_output=True, text=True, timeout=3600, cwd=REPO,
    )
    for line in reversed(proc.stdout.strip().splitlines()):
        if line.strip().startswith("{"):
            return json.loads(line)
    raise RuntimeError(f"child {mode}@{cpus} failed:\n{proc.stderr[-2000:]}")


def main() -> None:
    if len(sys.argv) > 1 and sys.argv[1] == "--child":
        child(sys.argv[2], int(sys.argv[3]))
        return
    import shutil

    shutil.rmtree(ROOT, ignore_errors=True)
    print(f"building shared index at {ROOT} ...", file=sys.stderr)
    b = run_child("build", N4_CORES)
    print(json.dumps(b), file=sys.stderr)
    # INTERLEAVED rep pairs: this host's dominant noise source is other
    # tenants' memory-bus traffic — multiplicative, minutes-scale swings
    # (the same config measures 2-3x apart between consecutive runs).
    # Adjacent (4N, N) children share the same noise window, so the
    # PER-PAIR time ratio cancels it; the median of pair ratios is the
    # robust estimator. A sequential min-of-reps design instead pairs
    # whichever level got lucky with a quiet bus.
    import statistics

    reps = int(os.environ.get("SPARK_GRAFT_QSCALE_REPEATS", "8"))
    runs: dict[int, list[float]] = {N_CORES: [], N4_CORES: []}
    ratios = []
    for rep in range(reps):
        pair = {}
        for cpus in (N4_CORES, N_CORES):
            print(f"query batch at local[{cpus}] rep {rep} ...",
                  file=sys.stderr)
            pair[cpus] = run_child("query", cpus)
            print(json.dumps(pair[cpus]), file=sys.stderr)
            runs[cpus].extend(pair[cpus]["runs"])
        ratios.append(
            pair[N_CORES]["seconds"] / pair[N4_CORES]["seconds"]
        )
    ratio = statistics.median(ratios)
    # spread of the estimator itself: interquartile range of pair ratios
    # (≥8 pairs make the median load-bearing on this noisy host)
    qs = statistics.quantiles(ratios, n=4) if len(ratios) >= 4 else None
    t_n, t_4n = min(runs[N_CORES]), min(runs[N4_CORES])
    out = {
        "n_turns": b["n_turns"],
        "n_queries": N_QUERIES,
        f"query_s_local{N_CORES}": t_n,
        f"query_s_local{N4_CORES}": t_4n,
        "runs": {str(c): runs[c] for c in runs},
        "pair_ratios": [round(r, 2) for r in ratios],
        "speedup": round(ratio, 2),
        "efficiency": round(ratio / 4.0, 3),
        "ratio_iqr": (
            [round(qs[0], 2), round(qs[2], 2)] if qs else None
        ),
        "efficiency_iqr": (
            [round(qs[0] / 4.0, 3), round(qs[2] / 4.0, 3)] if qs else None
        ),
        "qps": {str(c): round(N_QUERIES / min(runs[c]), 2) for c in runs},
    }
    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    # the default N=4 level pair keeps the historical filename; other
    # pairs (e.g. 1→4, BELOW the single-box DRAM saturation point — see
    # scaling_bench.hardware_ceiling) are kept alongside
    name = (
        "query_scaling.json"
        if N_CORES == 4
        else f"query_scaling_{N_CORES}to{N4_CORES}.json"
    )
    with open(os.path.join(REPO, "BENCH", name), "w") as f:
        json.dump(out, f, indent=1)
    shutil.rmtree(ROOT, ignore_errors=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
