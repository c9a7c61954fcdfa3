"""Fixed-size shuffled-shard export (sinks/shards.py)."""

from __future__ import annotations

import glob
import json
import os

import pyarrow.parquet as pq

from pulsarfeatureextractor_spark.operators.shuffle import global_shuffle_rank
from pulsarfeatureextractor_spark.sinks.shards import export_shuffled_shards


def test_export_one_file_per_shard_exact_sizes(spark, tmp_path):
    df = spark.range(0, 1000).selectExpr("CAST(id AS STRING) AS doc_id",
                                         "id AS payload")
    out = str(tmp_path / "shards")
    man = export_shuffled_shards(df, out, shard_size=64, seed="exp")
    assert man["n_rows"] == 1000
    assert man["n_shards"] == 16  # ceil(1000/64)
    sizes = [s["rows"] for s in man["shards"]]
    assert sizes == [64] * 15 + [40]
    for s in man["shards"]:
        files = glob.glob(os.path.join(out, f"shard_ix={s['shard_ix']}",
                                       "*.parquet"))
        assert len(files) == 1  # exactly ONE data file per shard
        assert pq.read_table(files[0]).num_rows == s["rows"]
    side = json.load(open(os.path.join(out, "_shards.json")))
    assert side == man


def test_export_rows_in_rank_order_and_reproducible(spark, tmp_path):
    df = spark.range(0, 300).selectExpr("CAST(id AS STRING) AS doc_id")
    out = str(tmp_path / "shards2")
    export_shuffled_shards(df, out, shard_size=50, seed="order")
    # expected order from the operator itself (property-tested elsewhere)
    expect = {
        r["doc_id"]: (r["shard_ix"], r["shuffle_rank"])
        for r in global_shuffle_rank(df, seed="order", shard_size=50).collect()
    }
    for d in sorted(glob.glob(os.path.join(out, "shard_ix=*"))):
        six = int(d.rsplit("=", 1)[1])
        (f,) = glob.glob(os.path.join(d, "*.parquet"))
        tbl = pq.read_table(f)  # pyarrow preserves file row order
        ranks = [expect[doc][1] for doc in tbl.column("doc_id").to_pylist()]
        assert ranks == sorted(ranks)  # rank order inside the file
        assert all(expect[doc][0] == six
                   for doc in tbl.column("doc_id").to_pylist())
