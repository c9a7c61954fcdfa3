#!/usr/bin/env python
"""The north-rule scaling workload as a spark-submit job.

Deployed exactly as BASELINE.json north_star prescribes::

    spark-submit --master spark://127.0.0.1:7077 \
        --py-files engine.zip jobs/scaling_job.py \
        --input /path/to/bench_input --runs 3

Pipeline: parquet scan of the tokenized table -> event_time -> fused
Lyon+Thornton features (ONE Arrow crossing, tokens dropped at the
boundary) -> as-of join of the feature snapshots -> noop sink (full
execution, no driver collect).  Prints one JSON line with the min
wall time over ``--runs`` fresh plans (re-executing one plan would
reuse shuffle files and fake the timing).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True)
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--master", default=None)
    ap.add_argument("--shuffle-partitions", type=int, default=None)
    args = ap.parse_args()

    from pulsarfeatureextractor_spark.functions.featureset import fused_features_arrow
    from pulsarfeatureextractor_spark.operators.asof import asof_join
    from pulsarfeatureextractor_spark.session import get_spark
    from pulsarfeatureextractor_spark.sources.tokenized import with_event_time

    spark = get_spark(app_name="scaling-job", master=args.master,
                      shuffle_partitions=args.shuffle_partitions)

    def build():
        seqs = with_event_time(
            spark.read.parquet(os.path.join(args.input, "sequences"))
        ).select("doc_id", "event_time", "tokens")
        feats = fused_features_arrow(seqs, include_scores=True, drop=("tokens",))
        snaps = spark.read.parquet(os.path.join(args.input, "snapshots"))
        return asof_join(
            feats, snaps, on="event_time", right_on="obs_time", by="doc_id",
            value_cols=["f_mean", "f_std", "f_skew", "f_kurt"], strategy="window",
        ).select("doc_id", "event_time", "mean", "stdev", "skew", "kurt",
                 "f_mean", "f_std")

    def force(df):
        df.write.format("noop").mode("overwrite").save()

    n_rows = spark.read.parquet(os.path.join(args.input, "sequences")).count()
    force(build())  # warmup: executor JIT, python workers, page cache
    total_cores = int(spark.sparkContext.defaultParallelism)
    times = []
    for _ in range(args.runs):
        t0 = time.perf_counter()
        force(build())
        times.append(round(time.perf_counter() - t0, 3))
    dt = min(times)
    print(json.dumps({
        "cores": total_cores, "rows": n_rows, "sec": dt, "all_secs": times,
        "rows_per_sec": round(n_rows / dt, 1),
    }))
    spark.stop()


if __name__ == "__main__":
    main()
