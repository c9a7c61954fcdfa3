"""Fixed-size shuffled-shard export (webdataset / MosaicStreaming
posture): the corpus in a seeded reproducible random order, cut into
shards of exactly ``shard_size`` rows (last shard short), ONE parquet
file per shard, rows inside each file in shuffle-rank order.

Spark spelling and why it yields one file per shard:

1. ``global_shuffle_rank`` (operators/shuffle.py) assigns the dense
   global rank + ``shard_ix`` without any single-partition pass over
   the data.
2. ``repartition(n_shards, shard_ix)`` hash-clusters every row of a
   shard into ONE task (all rows share the partition key; a hash
   collision only means one task carries two whole shards, never that
   a shard spans tasks).
3. ``sortWithinPartitions(shard_ix, rank)`` orders rows inside the
   task, so the writer emits each shard's rows in rank order.
4. ``write.partitionBy(shard_ix)`` splits the task's output by shard
   directory — exactly one file per shard, named by Spark, addressed
   by the ``shard_ix=K`` directory.

Scale posture: one range exchange (the rank), one hash exchange (the
shard clustering), no driver-side data movement; the export manifest
is metadata-sized (K rows, one per shard).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.shuffle import global_shuffle_rank

__all__ = ["export_shuffled_shards"]


def export_shuffled_shards(
    df: DataFrame,
    out_dir: str,
    shard_size: int,
    id_col: str = "doc_id",
    seed: str = "",
    rank_out: str = "shuffle_rank",
    shard_out: str = "shard_ix",
) -> dict:
    """Shuffle ``df`` deterministically and write fixed-size shards.

    Returns the export manifest: ``{"n_rows", "n_shards", "shard_size",
    "seed", "shards": [{"shard_ix", "rows"}, ...]}`` — every shard has
    exactly ``shard_size`` rows except the last.  Output layout:
    ``out_dir/shard_ix=K/part-*.parquet`` (one data file per shard,
    rows in shuffle-rank order).
    """
    ranked = global_shuffle_rank(
        df, id_col=id_col, seed=seed, shard_size=shard_size,
        rank_out=rank_out, shard_out=shard_out,
    )
    # global_shuffle_rank already pinned its range assignment with an
    # eager localCheckpoint; the rank/shard columns derive from it
    # deterministically, so no second full materialization is needed.
    # Ranks are dense 0..n-1, so the per-shard sizes are arithmetic:
    # shard_size rows each except the last — one count() suffices.
    n_rows = ranked.count()
    n_shards = -(-n_rows // shard_size) if n_rows else 0
    counts = [
        {
            shard_out: k,
            "rows": shard_size
            if k < n_shards - 1
            else n_rows - (n_shards - 1) * shard_size,
        }
        for k in range(n_shards)
    ]
    (
        ranked.repartition(max(n_shards, 1), F.col(shard_out))
        .sortWithinPartitions(shard_out, rank_out)
        .write.mode("overwrite")
        .partitionBy(shard_out)
        .parquet(out_dir)
    )
    shards = [{"shard_ix": r[shard_out], "rows": r["rows"]} for r in counts]
    manifest = {
        "n_rows": sum(s["rows"] for s in shards),
        "n_shards": n_shards,
        "shard_size": shard_size,
        "seed": seed,
        "shards": shards,
    }
    import json

    # Hadoop-FS write so hdfs:// / s3a:// out_dirs get their manifest
    # too — a local open() would crash AFTER the full distributed write
    from ..fsutil import write_text

    write_text(
        df.sparkSession,
        os.path.join(out_dir, "_shards.json"),
        json.dumps(manifest, indent=1),
    )
    return manifest
