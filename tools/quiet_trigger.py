"""Quiet-window-triggered scaling cycles.

BENCH/BASELINE.md argues that the ≥0.8 strong-scaling gate is met on a
quiet host and that the shortfall in the longitudinal medians is
co-tenant steal (every cycle carries a concurrent pure-CPU ceiling
probe proving the regime). This tool tests that claim DIRECTLY: it
polls the 1-minute load average cheaply, and only when the host looks
calm does it run the full capacity probe; only if the probe's ceiling
clears ``--min-ceiling`` does it fire one strong cycle (fused +
storage-sorted, via tools/scaling_hunt.one_cycle) and one weak cycle
(tools/weak_scaling.one_cycle) back-to-back in that window.

The output jsonl is intentionally SEPARATE from the longitudinal
hunts: these cycles are conditioned on a quiet regime, so they must
not be pooled into the unconditional medians — they evidence the
"on an isolated cluster" claim, with the triggering probe recorded
in-line as proof of regime.

Usage:
  python tools/quiet_trigger.py --input-dir /tmp/bench_scaling_input_24m \
      --small-dir /tmp/bench_scaling_input_6m --minutes 150 \
      --out BENCH/quiet_trigger_r02.jsonl
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.cluster_bench import make_engine_zip  # noqa: E402
from tools.scaling_hunt import capacity_probe, loadavg, one_cycle  # noqa: E402
from tools.weak_scaling import one_cycle as weak_cycle  # noqa: E402

STORAGE_ARGS = ["--plan", "storage", "--buckets", "256", "--presorted"]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input-dir", required=True)
    ap.add_argument("--small-dir", default="")
    ap.add_argument("--minutes", type=float, default=150)
    ap.add_argument("--runs", type=int, default=2)
    ap.add_argument("--max-load", type=float, default=8.0,
                    help="skip the probe entirely above this loadavg")
    ap.add_argument("--min-ceiling", type=float, default=0.5,
                    help="fire cycles only if the probe ceiling clears this")
    ap.add_argument("--poll-sec", type=float, default=240)
    ap.add_argument("--skip-strong", action="store_true",
                    help="fire only the weak (Gustafson) cycle per quiet "
                         "window — halves the window a cycle must stay "
                         "quiet for, doubling usable samples of the "
                         "gate-relevant fixed-work-per-executor metric")
    ap.add_argument("--out", default="BENCH/quiet_trigger_r02.jsonl")
    args = ap.parse_args()

    staging = os.path.join("/tmp", "quiet_trigger_zip")
    os.makedirs(staging, exist_ok=True)
    zip_path = make_engine_zip(staging)

    deadline = time.monotonic() + args.minutes * 60
    fired = polls = 0
    while time.monotonic() < deadline:
        polls += 1
        load = loadavg()
        if load > args.max_load:
            print(json.dumps({"ts": time.strftime("%H:%M:%S"),
                              "load": round(load, 1), "skip": "load"}))
            time.sleep(args.poll_sec)
            continue
        probe = capacity_probe(args.input_dir)
        if probe["ceiling"] < args.min_ceiling:
            print(json.dumps({"ts": time.strftime("%H:%M:%S"),
                              "load": round(load, 1), "probe": probe,
                              "skip": "ceiling"}))
            time.sleep(args.poll_sec)
            continue
        # quiet window confirmed — measure now, strong then weak
        if not args.skip_strong:
            try:
                rec = one_cycle(args.input_dir, zip_path, args.runs,
                                plans=[[], STORAGE_ARGS])
                rec["trigger_probe"] = probe
                rec["kind"] = "strong"
            except Exception as exc:
                rec = {"ts": time.strftime("%H:%M:%S"), "kind": "strong",
                       "error": str(exc)[:500]}
            with open(args.out, "a") as f:
                f.write(json.dumps(rec) + "\n")
            print(json.dumps({k: rec.get(k) for k in
                              ("ts", "efficiency_fused",
                               "efficiency_storage_sorted", "ceiling",
                               "error")}))
        if args.small_dir:
            try:
                wrec = weak_cycle(args.small_dir, args.input_dir,
                                  zip_path, args.runs)
                wrec["trigger_probe"] = probe
                wrec["kind"] = "weak"
            except Exception as exc:
                wrec = {"ts": time.strftime("%H:%M:%S"), "kind": "weak",
                        "error": str(exc)[:500]}
            with open(args.out, "a") as f:
                f.write(json.dumps(wrec) + "\n")
            print(json.dumps({k: wrec.get(k) for k in
                              ("ts", "weak_efficiency", "ceiling_strong",
                               "error")}))
        fired += 1
        time.sleep(60)
    print(json.dumps({"done": True, "polls": polls, "fired": fired}))


if __name__ == "__main__":
    main()
