#!/usr/bin/env python3
"""Cross-run bench attribution: explain why quiet-box totals swing.

Usage: tools/bench_attrib.py run1.json run2.json [run3.json ...]

Takes two or more bench_out.json artifacts (same battery) and reports:
  - headline totals / normalized / contention_index / canary floor per run;
  - probe summaries per run (io write/read, 1-thread cpu speed, cpufreq,
    page cache) — the non-CPU telemetry added in round 8;
  - the swing decomposition: for each row, wall minus the min wall across
    runs; summed, this says whether a slow run is slow BROADLY (every row
    a bit slower: frequency / JVM-global state) or CONCENTRATED (a few
    rows much slower: GC spikes, IO stalls);
  - for the most-swinging rows, the own-cpu split: if a slow rep's own
    process cpu seconds scale with its wall the row was compute-shaped
    (cpu frequency, JIT re-profiling); if own-cpu is flat the row was
    WAITING (IO, scheduler, stop-the-world pauses).
"""
import json
import statistics
import sys


def load(path):
    with open(path) as f:
        return json.load(f)


def probe_summary(run):
    ps = run.get("probes", [])
    if not ps:
        return "no probe series (pre-r8 artifact)"
    def med(k):
        vals = [p[k] for p in ps if p.get(k, -1) >= 0]
        return statistics.median(vals) if vals else -1.0
    return (f"io_w {med('io_w_sec'):.3f}s io_r {med('io_r_sec'):.3f}s "
            f"cpu1 {med('cpu1_sec'):.3f}s freq {med('freq_mhz'):.0f}MHz "
            f"cached {med('cached_mb'):.0f}MB avail {med('avail_mb'):.0f}MB")


def main(paths):
    runs = [(p, load(p)) for p in paths]
    names = sorted(runs[0][1]["queries"].keys())
    for p, r in runs:
        floor = r.get("canary", {}).get("floor_sec", -1)
        print(f"{p}: total {r['value']:.1f}s norm {r['value_normalized']} "
              f"ci {r['contention_index']} canary_floor {floor}")
        print(f"  probes: {probe_summary(r)}")

    # per-row swing vs the cross-run min
    mins = {n: min(r["queries"].get(n, float("inf")) for _, r in runs)
            for n in names}
    print("\nswing decomposition (sum of wall - cross-run-min wall):")
    for p, r in runs:
        deltas = {n: r["queries"][n] - mins[n] for n in names
                  if r["queries"].get(n, -1) >= 0}
        total_excess = sum(deltas.values())
        top = sorted(deltas.items(), key=lambda kv: -kv[1])[:8]
        top_share = sum(v for _, v in top)
        n_inflated = sum(1 for v in deltas.values() if v > 0.05)
        print(f"  {p}: excess {total_excess:.1f}s over per-row min; "
              f"top-8 rows carry {top_share:.1f}s "
              f"({100*top_share/max(total_excess,1e-9):.0f}%); "
              f"{n_inflated}/{len(deltas)} rows inflated >0.05s")
        for n, v in top[:4]:
            print(f"      {n}: +{v:.2f}s")

    # own-cpu split for the biggest swingers (needs r8 fields)
    if all("rep_own_cpu_sec" in r for _, r in runs):
        print("\nown-cpu split on the 10 most-swinging rows "
              "(wall ratio vs cpu ratio, slowest run vs fastest run):")
        slowest = max(runs, key=lambda pr: pr[1]["value"])
        fastest = min(runs, key=lambda pr: pr[1]["value"])
        swings = sorted(names,
                        key=lambda n: -(slowest[1]["queries"].get(n, 0) -
                                        fastest[1]["queries"].get(n, 0)))[:10]
        for n in swings:
            ws, wf = slowest[1]["queries"][n], fastest[1]["queries"][n]
            def best_rep_cpu(run, n):
                walls = run["rep_times"][n]
                cpus = run["rep_own_cpu_sec"][n]
                if not walls:
                    return -1.0
                i = walls.index(min(walls))
                return cpus[i] if i < len(cpus) else -1.0
            cs = best_rep_cpu(slowest[1], n)
            cf = best_rep_cpu(fastest[1], n)
            wall_ratio = ws / wf if wf > 0 else float("nan")
            cpu_ratio = cs / cf if cf > 0 else float("nan")
            gc_s = max(slowest[1].get("rep_gc_ms", {}).get(n, [0]) or [0])
            gc_f = max(fastest[1].get("rep_gc_ms", {}).get(n, [0]) or [0])
            shape = ("compute-shaped" if cpu_ratio > 0.8 * wall_ratio
                     else "wait-shaped")
            print(f"  {n}: wall {wf:.2f}->{ws:.2f} ({wall_ratio:.2f}x) "
                  f"owncpu {cf:.1f}->{cs:.1f} ({cpu_ratio:.2f}x) "
                  f"gc {gc_f}->{gc_s}ms -> {shape}")


if __name__ == "__main__":
    if len(sys.argv) < 3:
        sys.exit(__doc__)
    main(sys.argv[1:])
