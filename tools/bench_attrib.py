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


def drift_verdict(base, other, names):
    """Median per-row wall ratio other/base across all common rows, plus a
    verdict: when the MEDIAN row moves >15% in either direction the run
    pair is dominated by box/environment drift, not by targeted changes
    (a real optimization round moves the rows it touched, not the median
    untouched row) — the r9 failure mode where a uniform +25-40% inflation
    across untouched sub-second rows sailed past the contention normalizer
    (r9 VERDICT "Next round" #7)."""
    ratios = []
    for n in names:
        b = base["queries"].get(n, -1)
        o = other["queries"].get(n, -1)
        if b > 0 and o > 0:
            ratios.append(o / b)
    if not ratios:
        return "no common rows"
    med = statistics.median(ratios)
    frac_inflated = sum(1 for r in ratios if r > 1.15) / len(ratios)
    verdict = ("DRIFT SUSPECTED" if abs(med - 1.0) > 0.15
               else "no broad drift")
    return (f"median row ratio {med:.3f} ({len(ratios)} rows, "
            f"{100*frac_inflated:.0f}% rows >15% slower) -> {verdict}")


def env_fingerprint_diff(base, other):
    """Probe-median deltas between two runs: the environment fingerprint a
    drift verdict should ship with (io bandwidth, single-thread speed,
    cpu frequency, page cache)."""
    def med(run, k):
        ps = run.get("probes", [])
        vals = [p[k] for p in ps if p.get(k, -1) >= 0]
        return statistics.median(vals) if vals else -1.0
    parts = []
    for k in ("io_w_sec", "io_r_sec", "cpu1_sec", "freq_mhz", "cached_mb"):
        b, o = med(base, k), med(other, k)
        if b > 0 and o > 0:
            parts.append(f"{k} {b:.3g}->{o:.3g} ({o/b:.2f}x)")
    return "; ".join(parts) if parts else "no probe series"


def main(paths):
    runs = [(p, load(p)) for p in paths]
    names = sorted(runs[0][1]["queries"].keys())
    for p, r in runs:
        floor = r.get("canary", {}).get("floor_sec", -1)
        print(f"{p}: total {r['value']:.1f}s norm {r['value_normalized']} "
              f"ci {r['contention_index']} canary_floor {floor}")
        print(f"  probes: {probe_summary(r)}")

    # drift verdict vs the first run (r9 VERDICT #7: flag runs whose
    # untouched-row median deviates >15% from 1.0, with the environment
    # fingerprint diff alongside)
    base_p, base = runs[0]
    print(f"\ndrift check (vs {base_p}):")
    for p, r in runs[1:]:
        print(f"  {p}: {drift_verdict(base, r, names)}")
        print(f"    env: {env_fingerprint_diff(base, r)}")

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
