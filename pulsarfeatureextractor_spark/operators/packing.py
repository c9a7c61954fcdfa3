"""Sequence packing: lay tokenized documents into fixed-length
training sequences (the pretraining concat-and-chunk layout).

Given per-document token counts and a deterministic document order,
compute each document's global token offset in the concatenated
corpus stream, then its pack (training sequence) id and offset within
the pack.  Documents may straddle pack boundaries — exactly the
layout a dataloader reconstructs.

The core is a DISTRIBUTED PREFIX SUM — the naive formulation
(`SUM() OVER (ORDER BY id)` with no partition) is a single-partition
global window, a scale-killer at 10^12 rows.  Two bucketing modes,
both the classic two-level scan (local cumsum → metadata-sized prefix
over bucket totals → broadcast back):

- ``bucket_mode="div"`` (all-JVM): bucket = id div bucket_size.  ONE
  hash shuffle on the bucket + a partial-aggregate totals branch.
  REQUIRES dense-ish numeric ids (manifest ordinals, row ids): with
  sparse ids — hashes, snowflakes — occupancy collapses to ~1 row per
  bucket and the "metadata" prefix becomes data-sized (measured 24M
  sparse ids: the prefix window degenerates to a 24M-row single
  partition).  Density is the caller's contract in this mode.
- ``bucket_mode="range"`` (id-distribution-independent): bucket =
  physical partition of ``repartitionByRange`` (sampled boundaries →
  contiguous, dense, balanced buckets for ANY orderable key), local
  cumsum as a per-partition Arrow pass (mapInPandas over the sorted
  partition, two int columns through the crossing), totals by
  partition id.  One range shuffle of full rows, nothing else
  data-sized.

In both modes the per-bucket totals are prefix-summed with a
single-partition window over #buckets rows (~10^3-10^6 — one
executor's work) and returned via broadcast join; no global sort, no
driver collect of row data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.window import Window


def _apply_prefix(local: DataFrame, totals: DataFrame, seq_len: int,
                  n_tok_col: str, bucket_col: str) -> DataFrame:
    """prefix-over-buckets (metadata window) + broadcast join + offsets."""
    w_bkt = Window.orderBy(F.col(bucket_col).asc()).rowsBetween(
        Window.unboundedPreceding, -1
    )
    prefix = totals.select(
        bucket_col,
        F.coalesce(F.sum("__tot").over(w_bkt), F.lit(0)).alias("__prefix"),
    )
    start = F.col("__prefix") + F.col("__cum") - F.col(n_tok_col).cast("long")
    return (
        local.join(F.broadcast(prefix), bucket_col)
        .withColumn("tok_start", start)
        .withColumn("pack_id", F.expr(f"tok_start DIV {seq_len}"))
        .withColumn("pack_offset", F.pmod("tok_start", F.lit(seq_len)).cast("long"))
        .drop(bucket_col, "__cum", "__prefix")
    )


def _pack_div(df: DataFrame, seq_len: int, n_tok_col: str, id_col: str,
              bucket_size: int) -> DataFrame:
    bkt = (F.col(id_col) / F.lit(bucket_size)).cast("long").alias("__bkt")
    with_b = df.withColumn("__bkt", bkt)
    w_local = (
        Window.partitionBy("__bkt")
        .orderBy(F.col(id_col).asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    local = with_b.withColumn(
        "__cum", F.sum(F.col(n_tok_col).cast("long")).over(w_local)
    )
    # bucket totals from the SOURCE, not the window output: the partial
    # (map-side) aggregate means this branch's exchange carries only
    # #buckets × #tasks partial sums, and its scan is pruned to the two
    # integer columns — strictly cheaper than either re-shuffling full
    # rows or forcing ReuseExchange of the wide-row window exchange
    totals = with_b.groupBy("__bkt").agg(
        F.sum(F.col(n_tok_col).cast("long")).alias("__tot")
    )
    return _apply_prefix(local, totals, seq_len, n_tok_col, "__bkt")


def _pack_range(df: DataFrame, seq_len: int, n_tok_col: str, id_col: str,
                n_buckets: int) -> DataFrame:
    import pandas as pd  # noqa: F401  (mapInPandas contract)

    ranged = df.repartitionByRange(n_buckets, F.col(id_col).asc()) \
               .sortWithinPartitions(F.col(id_col).asc())
    out_schema = T.StructType(
        list(ranged.schema.fields)
        + [T.StructField("__bkt", T.LongType()), T.StructField("__cum", T.LongType())]
    )

    def cumsum_partition(iterator):
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        run = 0
        for pdf in iterator:
            c = pdf[n_tok_col].astype("int64").cumsum() + run
            run = int(c.iloc[-1]) if len(c) else run
            pdf = pdf.assign(__bkt=pid, __cum=c.astype("int64"))
            yield pdf

    # lazily materialize: the totals branch and the main branch both
    # consume the SAME range-shuffle + Arrow pass — without this the
    # plan executes that work twice (column pruning defeats exchange
    # reuse across the two branches)
    local = ranged.mapInPandas(cumsum_partition, out_schema).localCheckpoint(
        eager=False
    )
    # per-partition totals: partial max over __cum — tiny shuffle
    totals = local.groupBy("__bkt").agg(F.max("__cum").alias("__tot"))
    return _apply_prefix(local, totals, seq_len, n_tok_col, "__bkt")


def pack_sequences(
    df: DataFrame,
    seq_len: int,
    n_tok_col: str = "n_tok",
    id_col: str = "doc_id",
    bucket_size: int = 100_000,
    bucket_mode: str = "div",
    n_buckets: int = 512,
) -> DataFrame:
    """Add (tok_start, pack_id, pack_offset) for the concat-and-chunk
    packing of documents ordered by `id_col`.

    tok_start   — global token offset of the document's first token
    pack_id     — tok_start div seq_len (the training sequence index)
    pack_offset — tok_start mod seq_len (position within the sequence)

    ``bucket_mode="div"`` needs dense numeric ids; ``"range"`` handles
    any orderable key (see module docstring for the tradeoff).
    """
    if seq_len <= 0:
        raise ValueError("seq_len must be positive")
    if bucket_mode == "div":
        return _pack_div(df, seq_len, n_tok_col, id_col, bucket_size)
    if bucket_mode == "range":
        return _pack_range(df, seq_len, n_tok_col, id_col, n_buckets)
    raise ValueError(f"unknown bucket_mode {bucket_mode!r}")
