#!/usr/bin/env python
"""Host memory-bandwidth scaling envelope probe.

Motivation (BENCH/PROTOCOL_r04.md, regression context): the scaling
workload's hot loop is Arrow transfer + numpy over token arrays —
memory-bandwidth-heavy, not pure-CPU.  The per-cycle capacity probe
measures pure-CPU scaling, which on an idle host is near-ideal 8→32
cores; DRAM bandwidth is NOT per-core, so a bandwidth-bound job's
8→32-core weak efficiency is capped by the host's aggregate-bandwidth
curve even with ZERO co-tenant load.  This probe measures that curve
directly with an embarrassingly parallel STREAM-like kernel (numpy
copy+reduce over buffers far larger than LLC, one pinned process per
worker, no shared state, no synchronization beyond start/stop) — any
shortfall from 4.0× aggregate speedup at 4× workers is host physics
that no engine can beat.

Prints one JSON line:
  {"gbps_1": .., "gbps_8": .., "gbps_32": ..,
   "weak_eff_8_to_32": (gbps_32/gbps_8)/4, ...}

Usage: python tools/host_bandwidth_probe.py [--mb-per-worker 512]
       [--secs 6] [--workers 1 8 32]
"""

from __future__ import annotations

import argparse
import json
import multiprocessing as mp
import os
import time


def _worker(mb: int, secs: float, out_q) -> None:
    import numpy as np

    n = mb * 1024 * 1024 // 8
    src = np.ones(n, dtype=np.float64)
    dst = np.empty_like(src)
    # touch both buffers so pages are faulted in before timing
    dst[:] = src
    t_end = time.perf_counter() + secs
    bytes_moved = 0
    acc = 0.0
    while time.perf_counter() < t_end:
        np.copyto(dst, src)          # n*8 read + n*8 write
        acc += float(dst[0])
        bytes_moved += 2 * n * 8
    out_q.put((bytes_moved, secs, acc))


def measure(workers: int, mb: int, secs: float) -> float:
    """Aggregate GB/s with `workers` concurrent pinned processes."""
    q = mp.Queue()
    procs = []
    ncpu = os.cpu_count() or workers
    for i in range(workers):
        p = mp.Process(target=_worker, args=(mb, secs, q))
        p.start()
        try:
            os.sched_setaffinity(p.pid, {i % ncpu})
        except OSError:
            pass
        procs.append(p)
    total_bytes = 0
    for _ in procs:
        b, s, _ = q.get()
        total_bytes += b
    for p in procs:
        p.join()
    return total_bytes / secs / 1e9


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--mb-per-worker", type=int, default=512)
    ap.add_argument("--secs", type=float, default=6.0)
    ap.add_argument("--workers", type=int, nargs="+", default=[1, 8, 32])
    args = ap.parse_args()

    load_pre = os.getloadavg()[0]
    out = {"load_pre": round(load_pre, 2),
           "mb_per_worker": args.mb_per_worker, "secs": args.secs}
    rates = {}
    for w in args.workers:
        rates[w] = measure(w, args.mb_per_worker, args.secs)
        out[f"gbps_{w}"] = round(rates[w], 2)
    if 8 in rates and 32 in rates:
        # weak-scaling efficiency analogue: per-worker bandwidth at 32
        # workers relative to per-worker bandwidth at 8 workers
        out["weak_eff_8_to_32"] = round((rates[32] / 32) / (rates[8] / 8), 3)
    if 1 in rates and 8 in rates:
        out["weak_eff_1_to_8"] = round((rates[8] / 8) / rates[1], 3)
    out["load_post"] = round(os.getloadavg()[0], 2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
