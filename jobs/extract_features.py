#!/usr/bin/env python
"""Batch feature-extraction job (spark-submit entry point).

The engine's deployment surface (BASELINE.json north_star):

    spark-submit --py-files engine.zip jobs/extract_features.py \
        --input /path/to/sequences_table --snapshot 3 \
        --output /path/to/features_out --checkpoint out/_ckpt.json \
        --asof 2024-01-20T00:00:00 --gap-seconds 1800 --scores

Pipeline (SURVEY.md §3.2): snapshot scan (with manifest file pruning)
-> time filter -> derive event_time -> Lyon moments (+ optional
Thornton scores) -> as-of join of prior feature observations ->
lag/session features -> resumable partitioned write carrying lineage
(snapshot id, partition spec, input manifest) + metrics.

Run it on a cluster by dropping --master local overrides; everything
below is master-agnostic.  Resumability: re-running after a kill
re-emits only partitions missing from the checkpoint manifest.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build_pipeline(spark, args):
    from pyspark.sql import functions as F

    from pulsarfeatureextractor_spark.functions.featureset import extract_features
    from pulsarfeatureextractor_spark.operators.asof import asof_join
    from pulsarfeatureextractor_spark.operators.sessionize import sessionize
    from pulsarfeatureextractor_spark.operators.windows import lagged
    from pulsarfeatureextractor_spark.sinks.manifest import IcebergLikeTable
    from pulsarfeatureextractor_spark.sources.tokenized import with_event_time

    table = IcebergLikeTable(args.input)
    manifest = table.manifest(args.snapshot)
    seqs = table.read(spark, args.snapshot)
    seqs = with_event_time(seqs)
    if args.asof:
        # leakage guard at the scan: nothing after the as-of instant is
        # ever read (predicate pushes down to the parquet row groups)
        seqs = seqs.where(F.col("event_time") <= F.lit(args.asof).cast("timestamp"))

    # Lyon moments are always computed (the as-of snapshots carry them);
    # every other family layers on top VIA THE LIBRARY SELECTOR so the
    # job's output schema for a set name is identical to
    # functions.featureset.extract_features's (mirrors the reference
    # CLI's numbered feature-type switch).
    feature_set = args.feature_set or ("all" if args.scores else "lyon")
    if feature_set == "all":
        feats = extract_features(seqs, "all")
    else:
        feats = extract_features(seqs, "lyon")
        if feature_set != "lyon":
            feats = extract_features(feats, feature_set)

    # prior observations of the same features (obs_time strictly before
    # event_time by construction) as-of joined back — W1 lag features
    snaps = feats.select(
        "doc_id",
        (F.col("event_time") - F.make_interval(secs=F.col("n_tok").cast("double"))
         ).alias("obs_time"),
        F.col("mean").alias("f_mean_obs"),
        F.col("stdev").alias("f_std_obs"),
    )
    joined = asof_join(
        feats, snaps, on="event_time", right_on="obs_time", by="doc_id",
        value_cols=["f_mean_obs", "f_std_obs"], strategy="window",
    )
    enriched = lagged(joined, "doc_id", "event_time", ["mean"], offsets=(1,))
    enriched = sessionize(enriched, "doc_id", "event_time", args.gap_seconds)
    lineage = {
        "snapshot_id": manifest["snapshot_id"],
        "partition_spec_in": manifest["partition_spec"],
        "input_manifest": [f["path"] for f in manifest["files"]],
        "asof": args.asof,
    }
    return enriched.drop("tokens"), lineage


def main(argv=None) -> dict:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True, help="IcebergLikeTable dir")
    ap.add_argument("--snapshot", type=int, default=None)
    ap.add_argument("--output", required=True)
    ap.add_argument("--checkpoint", default=None)
    ap.add_argument("--asof", default=None, help="ISO timestamp upper bound")
    ap.add_argument("--gap-seconds", type=float, default=1800.0)
    ap.add_argument("--scores", action="store_true",
                    help="default --feature-set to 'all' when no explicit "
                         "--feature-set is given")
    ap.add_argument("--feature-set", default=None,
                    choices=["lyon", "thornton", "stats", "widths", "peace", "spinn", "raw", "all"],
                    help="feature family to emit (reference -t switch "
                         "analogue; default lyon, or all with --scores)")
    ap.add_argument("--partition-cols", default="source")
    ap.add_argument("--batch-size", type=int, default=0)
    ap.add_argument("--master", default=None)
    args = ap.parse_args(argv)

    from pulsarfeatureextractor_spark.session import get_spark
    from pulsarfeatureextractor_spark.sinks.partitioned import run_partitioned_job

    from pyspark.sql import SparkSession

    preexisting = SparkSession.getActiveSession() is not None
    spark = get_spark(app_name="extract_features", master=args.master)
    try:
        df, lineage = build_pipeline(spark, args)
        result = run_partitioned_job(
            df,
            args.output,
            args.partition_cols.split(","),
            checkpoint_path=args.checkpoint,
            lineage=lineage,
            batch_size=args.batch_size,
        )
        print(json.dumps({"status": "ok", **{k: len(v) for k, v in result.items()}}))
        return result
    finally:
        if not preexisting:  # don't stop a session we merely joined
            spark.stop()


if __name__ == "__main__":
    main()
