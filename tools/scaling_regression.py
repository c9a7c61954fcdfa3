"""Cross-batch ceiling-vs-efficiency regression for the scaling gate.

Pre-specified in BENCH/PROTOCOL_r04.md (committed before any round-4
cycle ran): over every unconditional pre-registered weak-scaling cycle
from rounds 2-4, fit OLS weak_efficiency ~ concurrent pure-CPU ceiling,
report the fitted efficiency at ceiling 0.5, and binned medians with
fixed bin edges (<0.2, 0.2-0.5, >=0.5).

The point (VERDICT r03 "what's wrong #1"): individual batches sample one
load regime each; the regression pools all regimes to show what the
engine's weak efficiency is when the HOST can actually scale — i.e.
whether sub-0.8 batch medians are an engine property or a host property.

Usage:
  python tools/scaling_regression.py \
      --inputs BENCH/weak_scaling_r02.jsonl \
               BENCH/weak_scaling_r03_storage.jsonl \
               BENCH/weak_scaling_r03_storage_b2.jsonl \
               BENCH/weak_scaling_r04_storage_b1.jsonl \
               BENCH/weak_scaling_r04_storage_b2.jsonl \
      --out BENCH/scaling_regression_r04.json
"""

from __future__ import annotations

import argparse
import json
import os
import statistics


def load_cycles(paths: "list[str]",
                exclude: "list[str] | None" = None) -> "list[dict]":
    """Load cycles; `exclude` drops records by "basename:ts:eff" triple.

    Used for the batch-3 twin: PROTOCOL_r04.md's incident disclosure fixes
    the batch-3 sample as ONE of the two indistinguishable 15:30:00 twin
    records (the lower efficiency, 0.264) plus the surviving runner's seven
    cycles — so the higher twin (0.266) is excluded here, explicitly.
    """
    excl = set(exclude or [])
    cycles = []
    for path in paths:
        if not os.path.exists(path):
            continue
        with open(path) as f:
            for line in f:
                line = line.strip()
                if not line:
                    continue
                rec = json.loads(line)
                if "error" in rec:
                    cycles.append({"file": os.path.basename(path),
                                   "error": rec["error"][:120]})
                    continue
                eff = rec.get("weak_efficiency")
                ceil = rec.get("ceiling_strong",
                               rec.get("capacity", {}).get("ceiling"))
                if eff is None or ceil is None:
                    continue
                key = "%s:%s:%.3f" % (os.path.basename(path),
                                      rec.get("ts"), float(eff))
                if key in excl:
                    continue
                cycles.append({"file": os.path.basename(path),
                               "ts": rec.get("ts"),
                               "eff": float(eff), "ceiling": float(ceil)})
    return cycles


def ols(xs: "list[float]", ys: "list[float]") -> "dict":
    n = len(xs)
    if n == 0:
        raise SystemExit(
            "scaling_regression: no valid cycles in the input files "
            "(missing paths are skipped; error cycles carry no "
            "efficiency) — nothing to regress"
        )
    mx, my = sum(xs) / n, sum(ys) / n
    sxx = sum((x - mx) ** 2 for x in xs)
    sxy = sum((x - mx) * (y - my) for x, y in zip(xs, ys))
    slope = sxy / sxx if sxx else 0.0
    intercept = my - slope * mx
    ss_res = sum((y - (intercept + slope * x)) ** 2
                 for x, y in zip(xs, ys))
    ss_tot = sum((y - my) ** 2 for y in ys)
    r2 = 1.0 - ss_res / ss_tot if ss_tot else 0.0
    return {"slope": round(slope, 4), "intercept": round(intercept, 4),
            "r2": round(r2, 4), "n": n,
            "fitted_eff_at_ceiling_0_5": round(intercept + slope * 0.5, 4)}


def binned_medians(cycles: "list[dict]") -> "dict":
    bins = {"lt_0_2": [], "0_2_to_0_5": [], "ge_0_5": []}
    for c in cycles:
        if c["ceiling"] < 0.2:
            bins["lt_0_2"].append(c["eff"])
        elif c["ceiling"] < 0.5:
            bins["0_2_to_0_5"].append(c["eff"])
        else:
            bins["ge_0_5"].append(c["eff"])
    return {k: {"median": round(statistics.median(v), 4) if v else None,
                "n": len(v)}
            for k, v in bins.items()}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--inputs", nargs="+", required=True)
    ap.add_argument("--out", default="BENCH/scaling_regression_r04.json")
    ap.add_argument("--exclude", nargs="*", default=[],
                    help="drop records by basename:ts:eff triple")
    args = ap.parse_args()

    cycles = load_cycles(args.inputs, exclude=args.exclude)
    errors = [c for c in cycles if "error" in c]
    good = [c for c in cycles if "error" not in c]
    result = {
        "inputs": [os.path.basename(p) for p in args.inputs
                   if os.path.exists(p)],
        "n_cycles": len(good),
        "n_error_cycles": len(errors),
        "ols": ols([c["ceiling"] for c in good], [c["eff"] for c in good]),
        "binned_medians": binned_medians(good),
        "per_file_medians": {},
        "cycles": [{k: c[k] for k in ("file", "ts", "eff", "ceiling")}
                   for c in good],
    }
    by_file: "dict[str, list[float]]" = {}
    for c in good:
        by_file.setdefault(c["file"], []).append(c["eff"])
    result["per_file_medians"] = {
        k: {"median": round(statistics.median(v), 4), "n": len(v)}
        for k, v in by_file.items()}

    with open(args.out, "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps({"ols": result["ols"],
                      "binned_medians": result["binned_medians"],
                      "per_file_medians": result["per_file_medians"]},
                     indent=1))


if __name__ == "__main__":
    main()
