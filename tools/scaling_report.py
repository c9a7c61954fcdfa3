"""Summarize scaling_hunt samples into the BENCH/BASELINE.md evidence.

Reads the JSONL written by tools/scaling_hunt.py and prints:
- the full cycle table (timestamp, R1, R4, efficiency, concurrent
  pure-CPU ceiling, efficiency/ceiling),
- distribution stats (median/max efficiency, median ratio-to-ceiling),
- the best cycle and the best ceiling-calibrated cycle.

Usage: python tools/scaling_report.py BENCH/scaling_samples_r02.jsonl
"""

from __future__ import annotations

import json
import statistics
import sys


def main() -> None:
    path = sys.argv[1] if len(sys.argv) > 1 else "BENCH/scaling_samples_r02.jsonl"
    cycles = []
    errors = 0
    with open(path) as f:
        for line in f:
            d = json.loads(line)
            if d.get("error"):
                errors += 1
                continue
            cycles.append(d)
    if not cycles:
        print("no complete cycles")
        return

    print("| time | R1 (rows/s) | R4 (rows/s) | efficiency | CPU ceiling | eff/ceiling |")
    print("| --- | --- | --- | --- | --- | --- |")
    for d in cycles:
        print("| {ts} | {r1:,.0f} | {r4:,.0f} | {e:.3f} | {c:.3f} | {vc} |".format(
            ts=d["ts"], r1=d["exec1"]["rows_per_sec"],
            r4=d["exec4"]["rows_per_sec"], e=d["efficiency"],
            c=d["ceiling"],
            vc=f"{d['efficiency_vs_ceiling']:.2f}" if d.get("efficiency_vs_ceiling") else "-"))

    effs = [d["efficiency"] for d in cycles]
    ceils = [d["ceiling"] for d in cycles]
    ratios = [d["efficiency_vs_ceiling"] for d in cycles
              if d.get("efficiency_vs_ceiling")]
    best = max(cycles, key=lambda d: d["efficiency"])
    print()
    print(f"cycles: {len(cycles)} complete, {errors} errored")
    print(f"efficiency: median {statistics.median(effs):.3f}, "
          f"min {min(effs):.3f}, max {max(effs):.3f}")
    print(f"machine ceiling (concurrent pure-CPU probe): "
          f"median {statistics.median(ceils):.3f}, max {max(ceils):.3f}")
    print(f"efficiency / ceiling: median {statistics.median(ratios):.2f} "
          f"(>=1.0 means the engine out-scales the machine's instantaneous "
          f"pure-CPU capacity)")
    print(f"best cycle: {best['ts']} efficiency {best['efficiency']:.3f} "
          f"(ceiling then {best['ceiling']:.3f})")
    n_above = sum(1 for d in cycles
                  if d.get("efficiency_vs_ceiling") and d["efficiency_vs_ceiling"] >= 1.0)
    print(f"cycles with efficiency >= concurrent ceiling: {n_above}/{len(ratios)}")

    # paired per-plan A/B (records written by --plans hunts): every plan
    # ran inside the same cluster/noise window, so per-cycle deltas are
    # paired observations, not cross-regime comparisons.
    tags = sorted({k[len("efficiency_"):] for d in cycles for k in d
                   if k.startswith("efficiency_")
                   and not k.startswith("efficiency_vs")})
    if len(tags) > 1:
        print()
        hdr = "| time | ceiling |" + "".join(
            f" R1 {t} | R4 {t} | eff {t} |" for t in tags)
        print(hdr)
        print("| --- | --- |" + " --- | --- | --- |" * len(tags))
        for d in cycles:
            row = f"| {d['ts']} | {d['ceiling']:.3f} |"
            for t in tags:
                if f"efficiency_{t}" in d:
                    row += (f" {d[f'exec1_{t}']['rows_per_sec']:,.0f} |"
                            f" {d[f'exec4_{t}']['rows_per_sec']:,.0f} |"
                            f" {d[f'efficiency_{t}']:.3f} |")
                else:
                    row += " - | - | - |"
            print(row)
        print()
        for t in tags:
            es = [d[f"efficiency_{t}"] for d in cycles if f"efficiency_{t}" in d]
            if es:
                print(f"plan {t}: median eff {statistics.median(es):.3f}, "
                      f"max {max(es):.3f} over {len(es)} cycles")
        if "fused" in tags:
            for t in tags:
                if t == "fused":
                    continue
                deltas = [d[f"efficiency_{t}"] - d["efficiency_fused"]
                          for d in cycles
                          if f"efficiency_{t}" in d and "efficiency_fused" in d]
                if deltas:
                    print(f"paired {t}-fused efficiency delta: "
                          f"median {statistics.median(deltas):+.3f} "
                          f"({sum(x > 0 for x in deltas)}/{len(deltas)} "
                          f"cycles {t} ahead)")


if __name__ == "__main__":
    main()
