"""Deterministic global shuffle + fixed-size shard assignment.

Training-data consumers need the corpus in a *reproducible random
order*, cut into fixed-size shards — "shuffle once, globally, with a
seed" (webdataset/MosaicStreaming-style shard exports).  The naive
Spark spelling — ``row_number()`` over an unpartitioned window — moves
the entire table through ONE task; at 100 TB that is the exact
single-partition wall this module exists to avoid.

``global_shuffle_rank`` computes the dense global rank of every row
under a seeded content-hash order with only bounded-size single-point
state:

1. Rows get the portable seeded md5 hex digest of their id (the same
   portability tier as :func:`..functions.splits.hash_split` — any
   engine reproduces the order).
2. ``repartitionByRange(digest, id)`` range-partitions by the hash —
   an ordinary range exchange, skew-free because md5 is uniform.  The
   result is pinned with an eager ``localCheckpoint`` so the partition
   assignment cannot silently differ between the two plan branches
   below (range boundaries come from a sampling pass).
3. Within each partition a ``pid``-partitioned window ranks locally
   (Spark re-clusters by ``pid`` — a shuffle of already-partitioned
   rows; acceptable, and the hot path stays whole-stage codegen).
4. Per-partition row counts (ONE K-row aggregate, K = shuffle
   partitions) turn into rank offsets via a window over those K rows —
   metadata-sized, the same two-level prefix-sum shape as
   ``operators/packing.py`` — and broadcast-join back.

The global rank is correct for ANY range-boundary choice: boundaries
only decide *which* partition ranks a row locally; ``offset(pid) +
local_rank`` is the global (digest, id) rank regardless.  Output is
therefore deterministic across reruns, partitionings, and engines.

``shard_ix`` (optional) cuts the ranked stream into fixed-size shards:
``floor(rank / shard_size)`` — every shard except the last has exactly
``shard_size`` rows, reproducibly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

__all__ = ["global_shuffle_rank"]


def global_shuffle_rank(
    df: DataFrame,
    id_col: str = "doc_id",
    seed: str = "",
    shard_size: int | None = None,
    rank_out: str = "shuffle_rank",
    shard_out: str = "shard_ix",
    num_partitions: int | None = None,
) -> DataFrame:
    """Add the 0-based dense global rank of each row under the seeded
    shuffle order (md5(id|seed) asc, id asc), and optionally a
    fixed-size ``shard_ix``.  ``id_col`` values must be distinct for
    the order to be total (duplicates tie-break arbitrarily but
    deterministically on the digest alone).
    """
    if "'" in seed or "\\" in seed:
        raise ValueError("seed must not contain quotes or backslashes")
    if shard_size is not None and shard_size <= 0:
        raise ValueError("shard_size must be positive")
    digest = F.md5(F.concat(F.col(id_col).cast("string"), F.lit("|" + seed)))
    staged = df.withColumn("__shuf_h", digest)
    parts = num_partitions or staged.sparkSession.conf.get(
        "spark.sql.shuffle.partitions"
    )
    ranged = staged.repartitionByRange(
        int(parts), F.col("__shuf_h"), F.col(id_col)
    ).withColumn("__shuf_pid", F.spark_partition_id())
    # freeze the (sampled) range assignment so the counts branch and the
    # rank branch below cannot see different partition ids
    ranged = ranged.localCheckpoint(eager=True)

    local_w = Window.partitionBy("__shuf_pid").orderBy(
        F.col("__shuf_h").asc(), F.col(id_col).asc()
    )
    local = ranged.withColumn("__shuf_local", F.row_number().over(local_w))

    # K-row offsets: cumulative counts of lower-pid partitions (range
    # partitions are ascending in the digest, so pid order == hash order)
    counts = ranged.groupBy("__shuf_pid").agg(F.count("*").alias("__shuf_n"))
    off_w = (
        Window.orderBy("__shuf_pid")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = counts.withColumn(
        "__shuf_off", F.coalesce(F.sum("__shuf_n").over(off_w), F.lit(0))
    ).select("__shuf_pid", "__shuf_off")

    out = local.join(F.broadcast(offsets), "__shuf_pid").withColumn(
        rank_out,
        (F.col("__shuf_off") + F.col("__shuf_local") - F.lit(1)).cast("long"),
    )
    if shard_size is not None:
        out = out.withColumn(
            shard_out, F.floor(F.col(rank_out) / F.lit(int(shard_size)))
        )
    return out.drop("__shuf_h", "__shuf_pid", "__shuf_local", "__shuf_off")
