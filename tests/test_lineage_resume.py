"""Lineage snapshots + checkpoint/resume (SURVEY.md §5.2 resume layer).

Gates pinned by BASELINE.json north_rule: a killed run re-emits only
missing partitions; final output identical to an uninterrupted run;
per-partition outputs carry lineage + metrics; snapshot time travel.
"""

import json
import os

import pytest
from pyspark.sql import functions as F

from pulsarfeatureextractor_spark.sinks.manifest import IcebergLikeTable
from pulsarfeatureextractor_spark.sinks.partitioned import (
    load_checkpoint,
    run_partitioned_job,
)


@pytest.fixture()
def seq_df(spark):
    from pulsarfeatureextractor_spark.sources.tokenized import synthetic_sequences

    return synthetic_sequences(spark, 400, seed=7)


def _rows(df):
    return sorted(
        (r.doc_id, r.n_tok, r.source, tuple(r.tokens)) for r in df.collect()
    )


def test_snapshot_write_read_roundtrip(spark, seq_df, tmp_path):
    t = IcebergLikeTable(str(tmp_path / "tbl"))
    man = t.write(seq_df, partition_by=["source"])
    assert man["snapshot_id"] == 1
    assert man["partition_spec"] == ["source"]
    assert man["total_rows"] == 400
    assert all(f["rows"] > 0 for f in man["files"])

    back = t.read(spark)
    assert _rows(back.select("doc_id", "n_tok", "source", "tokens")) == _rows(seq_df)


def test_snapshot_time_travel_append(spark, seq_df, tmp_path):
    t = IcebergLikeTable(str(tmp_path / "tbl"))
    first = seq_df.where(F.col("source") != "src0")
    extra = seq_df.where(F.col("source") == "src0")
    t.write(first)
    t.write(extra, mode="append")
    assert t.snapshot_ids() == [1, 2]
    # snapshot 1 must NOT see the appended rows
    assert t.read(spark, snapshot_id=1).count() == first.count()
    assert t.read(spark, snapshot_id=2).count() == 400
    # overwrite starts a fresh file list but old snapshots stay readable
    t.write(extra, mode="overwrite")
    assert t.read(spark, snapshot_id=3).count() == extra.count()
    assert t.read(spark, snapshot_id=2).count() == 400


def test_manifest_file_pruning(spark, seq_df, tmp_path):
    t = IcebergLikeTable(str(tmp_path / "tbl"))
    t.write(seq_df.withColumn("n_tok_d", F.col("n_tok")), partition_by=["n_tok"])
    man = t.manifest()
    all_files = [f["path"] for f in man["files"]]
    # n_tok is the dir key; prune on the stats of the data column copy
    only_64 = t.prune_files("n_tok_d", 0, 64)
    assert set(only_64) < set(all_files)
    kept = spark.read.parquet(*only_64)
    assert kept.where(F.col("n_tok_d") == 64).count() > 0


def test_resume_reemits_only_missing_partitions(spark, seq_df, tmp_path):
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt.json")
    df = seq_df.withColumn("mean", F.lit(1.0))

    # uninterrupted reference run
    ref_out = str(tmp_path / "ref")
    res = run_partitioned_job(df, ref_out, ["source"], str(tmp_path / "c2.json"),
                              batch_size=0)
    assert res["skipped"] == []
    ref = spark.read.parquet(ref_out)

    # killed run: 3 batches of 4 partitions, dies before batch 3
    with pytest.raises(RuntimeError, match="simulated kill"):
        run_partitioned_job(df, out, ["source"], ckpt, batch_size=4,
                            fail_after_batches=2)
    done_after_kill = set(load_checkpoint(ckpt)["done"])
    assert len(done_after_kill) == 8  # 2 committed batches

    # rerun: re-emits ONLY the missing partitions
    res2 = run_partitioned_job(df, out, ["source"], ckpt, batch_size=4)
    assert set(res2["skipped"]) == done_after_kill
    assert set(res2["written"]).isdisjoint(done_after_kill)
    assert len(res2["written"]) == 20 - 8

    # final output identical to uninterrupted run
    cols = ["doc_id", "n_tok", "source", "mean"]
    assert sorted(map(tuple, spark.read.parquet(out).select(*cols).collect())) == \
        sorted(map(tuple, ref.select(*cols).collect()))

    # third run: everything skipped, nothing written
    res3 = run_partitioned_job(df, out, ["source"], ckpt, batch_size=4)
    assert res3["written"] == []
    assert len(res3["skipped"]) == 20


def test_lineage_sidecars_written(spark, seq_df, tmp_path):
    out = str(tmp_path / "out")
    df = seq_df.withColumn("mean", F.lit(1.0))
    run_partitioned_job(
        df, out, ["source"],
        lineage={"snapshot_id": 7, "input_manifest": ["f1.parquet"]},
        batch_size=0,
    )
    side = json.load(open(os.path.join(out, "source=src0", "_lineage.json")))
    assert side["snapshot_id"] == 7
    assert side["partition_spec"] == ["source"]
    assert side["batch_metrics"]["rows"] == 400
    assert side["batch_metrics"]["partitions"] == 20
