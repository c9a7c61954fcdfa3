"""Weak-scaling (Gustafson) companion to the strong-scaling gate.

The north rule's criterion is STRONG scaling: same input, N vs 4N
executors, efficiency = R_4N / (4 * R_N) >= 0.8.  Strong scaling's
denominator penalizes every fixed cost paid once per job (planning,
python-worker spin-up, scan setup) four times as hard at N=1, and on
this shared VM the N=1 leg runs ~4x longer so it integrates 4x the
co-tenant noise exposure.

Weak scaling holds WORK PER EXECUTOR fixed instead: 1 executor on W
rows vs 4 executors on 4W rows.  Ideal is equal wall time, so

    weak efficiency = T(1 exec, W) / T(4 exec, 4W)
                    = (R_4 / 4) / R_1          (R = rows / sec)

This is the regime a 100 TB job actually lives in — you add executors
to take on MORE data at constant wall time, not to shrink a fixed 24M
rows — and it is the measurement the hour-scale north-star job
extrapolates along.

Each cycle is paired inside one noise window and carries the same
concurrent pure-CPU capacity probe as tools/scaling_hunt.py (run on
the large input, i.e. the ceiling is itself a strong-scaling ceiling
— reported for regime context, not as a weak-scaling bound).

Usage:
  python tools/weak_scaling.py --small-dir /tmp/bench_scaling_input_6m \
      --large-dir /tmp/bench_scaling_input_24m --cycles 3 --runs 2 \
      --out BENCH/weak_scaling_r02.jsonl
  (--small-rows 6000000 generates the small input if --small-dir is
  missing; the generator is seed-deterministic, so the small table is
  byte-stable across machines.)
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.cluster_bench import Cluster, make_engine_zip, submit  # noqa: E402
from tools.scaling_hunt import capacity_probe, loadavg  # noqa: E402


def one_cycle(small_dir: str, large_dir: str, zip_path: str,
              runs: int, job_args: "list[str] | None" = None,
              cores_per_worker: int = 8) -> dict:
    rec: dict = {"ts": time.strftime("%H:%M:%S"), "load_pre": loadavg()}
    if job_args:
        rec["job_args"] = job_args
    if cores_per_worker != 8:
        rec["cores_per_worker"] = cores_per_worker
    # per-executor memory scaled to core share; worker offer slightly above
    exec_mem = f"{max(2, cores_per_worker * 10 // 8)}g"
    worker_mem = f"{max(3, cores_per_worker * 14 // 8)}g"
    rec["capacity"] = capacity_probe(
        large_dir, n_small=cores_per_worker, n_large=4 * cores_per_worker)
    with Cluster(4, cores_per_worker=cores_per_worker,
                 worker_memory=worker_mem) as c4:
        rec["exec4_large"] = submit(large_dir, zip_path,
                                    4 * cores_per_worker, runs,
                                    master_url=c4.master_url,
                                    job_args=job_args,
                                    executor_cores=cores_per_worker,
                                    executor_memory=exec_mem)
    rec["load_mid"] = loadavg()
    with Cluster(1, cores_per_worker=cores_per_worker,
                 worker_memory=worker_mem) as c1:
        rec["exec1_small"] = submit(small_dir, zip_path, cores_per_worker,
                                    runs,
                                    master_url=c1.master_url,
                                    job_args=job_args,
                                    executor_cores=cores_per_worker,
                                    executor_memory=exec_mem)
    rec["load_post"] = loadavg()
    t1, t4 = rec["exec1_small"]["sec"], rec["exec4_large"]["sec"]
    rec["weak_efficiency"] = round(t1 / t4, 3)
    rec["ceiling_strong"] = rec["capacity"]["ceiling"]
    return rec


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--small-dir", required=True)
    ap.add_argument("--large-dir", required=True)
    ap.add_argument("--small-rows", type=int, default=6_000_000)
    ap.add_argument("--cycles", type=int, default=3)
    ap.add_argument("--runs", type=int, default=2)
    ap.add_argument("--out", default="BENCH/weak_scaling_r02.jsonl")
    ap.add_argument("--plan", default="",
                    help="scaling_job plan override (e.g. 'storage'); "
                         "'storage' adds --presorted (the zero-Exchange "
                         "production posture, the r03 gate subject)")
    ap.add_argument("--cores-per-worker", type=int, default=8,
                    help="executor size: N and 4N executors of THIS many "
                         "cores each.  2-core executors (8 cores total) "
                         "keep aggregate DRAM demand inside the host's "
                         "measured bandwidth envelope — the "
                         "within-envelope instantiation of the N->4N "
                         "rule on a single shared-memory host")
    args = ap.parse_args()

    job_args: "list[str] | None" = None
    if args.plan:
        job_args = ["--plan", args.plan]
        if args.plan == "storage":
            job_args.append("--presorted")

    if not os.path.isdir(args.small_dir):
        from bench import _gen_input
        from pulsarfeatureextractor_spark.session import get_spark

        gen = get_spark(master="local[32]", app_name="weak-scaling-gen")
        _gen_input(gen, args.small_rows, args.small_dir)
        gen.stop()

    staging = os.path.join("/tmp", "weak_scaling_zip")
    os.makedirs(staging, exist_ok=True)
    zip_path = make_engine_zip(staging)

    for i in range(args.cycles):
        try:
            rec = one_cycle(args.small_dir, args.large_dir, zip_path,
                            args.runs, job_args=job_args,
                            cores_per_worker=args.cores_per_worker)
        except Exception as exc:  # record the window, keep hunting
            rec = {"ts": time.strftime("%H:%M:%S"), "error": str(exc)[:500]}
        with open(args.out, "a") as f:
            f.write(json.dumps(rec) + "\n")
        print(json.dumps({k: rec.get(k) for k in
                          ("ts", "weak_efficiency", "ceiling_strong",
                           "error")}))
        if i + 1 < args.cycles:
            time.sleep(30)


if __name__ == "__main__":
    main()
