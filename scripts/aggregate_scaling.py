"""Aggregate scaling-bench logs → BENCH/BASELINE.md.

The sandbox host shows ±2x run-to-run wall-time noise (shared
virtualized CPUs), so a single best-of pairing is unstable. This
aggregator pools EVERY interleaved (local[N], local[4N]) pair across
one or more scaling_bench logs and takes the MEDIAN of per-pair time
ratios — the standard robust estimator for a ratio under multiplicative
noise (adjacent-in-time pairs see the same noise window, which then
cancels in the ratio).

Also folds in ``BENCH/query_scaling.json`` (the controlled same-index
query experiment from scripts/query_scaling.py) when present.

Usage: python scripts/aggregate_scaling.py /tmp/scaling6.log [...]
"""

from __future__ import annotations

import json
import os
import re
import statistics
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
N = int(os.environ.get("SPARK_GRAFT_SCALING_N", "4"))
N4 = 4 * N
RUN_RE = re.compile(r"running bench at local\[(\d+)\] rep (\d+)")


def parse_log(path: str) -> list[tuple[int, dict]]:
    out = []
    cpus = None
    for raw in open(path, errors="replace"):
        line = raw.strip()
        m = RUN_RE.search(line)
        if m:
            cpus = int(m.group(1))
            continue
        if line.startswith('{"metric"') and cpus is not None:
            out.append((cpus, json.loads(line)))
            cpus = None
    return out


def main() -> None:
    entries: list[tuple[int, dict]] = []
    for path in sys.argv[1:]:
        entries.extend(parse_log(path))
    # consecutive (N, 4N) adjacent pairs
    pairs = []
    i = 0
    while i + 1 < len(entries):
        (c1, r1), (c2, r2) = entries[i], entries[i + 1]
        if {c1, c2} == {N, N4}:
            lo, hi = (r1, r2) if c1 == N else (r2, r1)
            pairs.append((lo, hi))
            i += 2
        else:
            i += 1
    if not pairs:
        sys.exit("no (N,4N) pairs found")

    phases = sorted(set(pairs[0][0]["queries"]) & set(pairs[0][1]["queries"]))
    per_phase: dict[str, dict] = {}
    for ph in phases:
        ratios = [p[0]["queries"][ph] / p[1]["queries"][ph] for p in pairs]
        per_phase[ph] = {
            "ratio_median": round(statistics.median(ratios), 2),
            "ratios": [round(r, 2) for r in ratios],
            "efficiency": round(statistics.median(ratios) / 4.0, 3),
            f"t{N}_all": [p[0]["queries"][ph] for p in pairs],
            f"t{N4}_all": [p[1]["queries"][ph] for p in pairs],
        }
    n_turns = pairs[0][0].get("n_turns")
    best_tps = max(p[1].get("turns_per_sec", 0) for p in pairs)

    ceiling = None
    for path in sys.argv[1:]:
        for line in open(path, errors="replace"):
            if "hardware ceiling" in line and "{" in line:
                ceiling = eval(line[line.index("{"):].strip())  # trusted own log
                break
    qscale_path = os.path.join(REPO, "BENCH", "query_scaling.json")
    qscale = json.load(open(qscale_path)) if os.path.exists(qscale_path) else None
    q14_path = os.path.join(REPO, "BENCH", "query_scaling_1to4.json")
    q14 = json.load(open(q14_path)) if os.path.exists(q14_path) else None

    md = os.path.join(REPO, "BENCH", "BASELINE.md")
    os.makedirs(os.path.dirname(md), exist_ok=True)
    with open(md, "w") as f:
        f.write(f"# BENCH/BASELINE — scaling evidence (N={N} vs 4N={N4} cores)\n\n")
        f.write(
            f"Same job, same deterministic input ({n_turns} transcript "
            "turns, 100 BM25 queries), two parallelism levels, fresh JVM "
            "per run via `spark-submit --py-files "
            "build_artifacts/antidb_spark.zip bench.py` (north-rule "
            f"packaging). {len(pairs)} interleaved (N, 4N) pairs pooled "
            "across runs; the estimator is the MEDIAN of per-pair time "
            "ratios — this host shows ±2x wall-time noise between "
            "identical runs (shared virtualized CPUs), and adjacent-pair "
            "ratios cancel the common noise window. "
            "Efficiency = median_ratio / 4.\n\n"
        )
        if ceiling:
            mem = ceiling.get("mem")
            f.write(
                f"**Hardware ceilings** ({N}→{N4} processes, fixed total "
                "work, measured per run): pure-CPU (sha256, "
                f"cache-resident) **{ceiling['efficiency']}** — the bound "
                "for JVM/codegen phases"
                + (
                    f"; DRAM streaming (numpy passes) "
                    f"**{mem['efficiency']}** — the bound for Arrow "
                    "decode+score phases. This single box has ONE memory "
                    "bus: ~4 streaming processes saturate it, so "
                    "bandwidth-bound phases cannot scale past that here "
                    "no matter the software (each node of a real cluster "
                    "brings its own DRAM — see the 1→4 section below, "
                    "measured under the saturation point)"
                    if mem else ""
                )
                + ". No software can exceed these here; each phase reads "
                "against the ceiling of the resource it binds on.\n\n"
            )
        f.write(f"| phase | median T{N}/T{N4} | efficiency | binding ceiling "
                "| ceiling-normalized |\n")
        f.write("|---|---|---|---|---|\n")
        for ph, d in per_phase.items():
            # decode+score phases bind on DRAM bandwidth, build phases
            # on (mostly) CPU — normalize each against its own resource
            if ceiling and ph == "bm25_batch" and ceiling.get("mem"):
                ceil = ceiling["mem"]["efficiency"]
                cname = f"mem {ceil}"
            elif ceiling:
                ceil = ceiling["efficiency"]
                cname = f"cpu {ceil}"
            else:
                ceil, cname = None, "—"
            norm = round(d["efficiency"] / ceil, 3) if ceil else "—"
            f.write(f"| {ph} | {d['ratio_median']}× | {d['efficiency']} "
                    f"| {cname} | {norm} |\n")
        f.write("\nPer-pair ratios (variance evidence): ")
        f.write("; ".join(
            f"{ph}: {d['ratios']}" for ph, d in per_phase.items()) + "\n")
        f.write(f"\nBest observed index-build throughput: **{best_tps} "
                f"turns/sec** (local[{N4}]).\n")
        if qscale:
            f.write(
                "\n## Controlled query-path scaling (same index, "
                "query-only JVMs)\n\n"
                "One JVM builds the packed index on tmpfs; two fresh JVMs "
                "then run the identical 100-query batch against the same "
                "index files (2 runs each, min taken — no build-phase GC "
                "debris, index bytes identical):\n\n"
                f"- local[{N}]: {qscale[f'query_s_local{N}']} s, "
                f"local[{N4}]: {qscale[f'query_s_local{N4}']} s → "
                f"speedup {qscale['speedup']}×, efficiency "
                f"**{qscale['efficiency']}**"
                + (f" (mem-ceiling-normalized "
                   f"{round(qscale['efficiency'] / ceiling['mem']['efficiency'], 3)})"
                   if ceiling and ceiling.get("mem") else "") + "\n"
                f"- throughput: {qscale['qps']} queries/sec\n"
            )
        if q14:
            f.write(
                "\n## Query-path scaling BELOW the DRAM saturation point "
                "(1→4 cores)\n\n"
                "The decode+score stages are memory-bandwidth-bound "
                "(vectorized numpy over posting arrays); on this single "
                "box ~4 streaming processes saturate the one memory bus "
                "(the DRAM ceiling above), so the 4→16 query number "
                "measures the bus, not the engine. The same controlled "
                "experiment at 1 vs 4 cores — below saturation — shows "
                "the engine's own scaling:\n\n"
                f"- local[1]: {q14['query_s_local1']} s, "
                f"local[4]: {q14['query_s_local4']} s → "
                f"speedup {q14['speedup']}×, efficiency "
                f"**{q14['efficiency']}**\n"
                f"- throughput: {q14['qps']} queries/sec\n\n"
                "On a multi-node cluster every 4N executors bring 4N "
                "memory buses, so the 1→4 number — not the bus-saturated "
                "4→16 one — is the transferable query-path figure.\n"
            )
        f.write(
            "\nFixed-latency phases (eq/rng lookups, single-query "
            "topk_docs) are dominated by job-scheduling constants at "
            "sandbox scale and are not scaling-relevant.\n"
        )
    with open(os.path.join(REPO, "BENCH", "scaling_raw.json"), "w") as f:
        json.dump({"pairs": [[p[0]["queries"], p[1]["queries"]] for p in pairs],
                   "per_phase": per_phase, "hardware_ceiling": ceiling,
                   "query_scaling": qscale}, f, indent=1, default=str)
    print(f"wrote {md}")
    print(json.dumps({ph: d["efficiency"] for ph, d in per_phase.items()}))


if __name__ == "__main__":
    main()
