"""Sequence packing: lay tokenized documents into fixed-length
training sequences (the pretraining concat-and-chunk layout).

Given per-document token counts and a deterministic document order,
compute each document's global token offset in the concatenated
corpus stream, then its pack (training sequence) id and offset within
the pack.  Documents may straddle pack boundaries — exactly the
layout a dataloader reconstructs.

The core is a DISTRIBUTED PREFIX SUM — the naive formulation
(`SUM() OVER (ORDER BY id)` with no partition) is a single-partition
global window, a scale-killer at 10^12 rows.  This implementation is
the classic two-level scan:

1. bucket the order key (`bucket = id div bucket_size`) — buckets
   partition the global order into contiguous ranges;
2. local cumulative sum within each bucket — ONE shuffle, on the
   bucket key;
3. bucket totals (same shuffle partitioning — AQE reuses it) are
   prefix-summed with a single-partition window over METADATA-sized
   data (#buckets rows, ~corpus/bucket_size — at 10^12 docs and
   bucket_size 10^6 that is 10^6 rows of (bucket, total), trivially
   one executor's work), then broadcast back;
4. global_offset = bucket_prefix + local_cumsum - n_tok.

So the only full-data operations are one bucket shuffle and one
broadcast join — no global sort, no driver collect of row data.

The order key must be numeric and dense-ish (bucket contiguity is
what makes step 3 a prefix over ranges); ingest layers that assign
monotonic ids (e.g. the snapshot manifest's file ordinals × row
ordinals) provide one.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def pack_sequences(
    df: DataFrame,
    seq_len: int,
    n_tok_col: str = "n_tok",
    id_col: str = "doc_id",
    bucket_size: int = 100_000,
) -> DataFrame:
    """Add (tok_start, pack_id, pack_offset) for the concat-and-chunk
    packing of documents ordered by `id_col`.

    tok_start   — global token offset of the document's first token
    pack_id     — tok_start div seq_len (the training sequence index)
    pack_offset — tok_start mod seq_len (position within the sequence)
    """
    if seq_len <= 0:
        raise ValueError("seq_len must be positive")
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
    # metadata-sized prefix over bucket totals (single-partition window
    # over #buckets rows — see module docstring for why this is fine)
    w_bkt = Window.orderBy(F.col("__bkt").asc()).rowsBetween(
        Window.unboundedPreceding, -1
    )
    prefix = totals.select(
        "__bkt",
        F.coalesce(F.sum("__tot").over(w_bkt), F.lit(0)).alias("__prefix"),
    )

    start = F.col("__prefix") + F.col("__cum") - F.col(n_tok_col).cast("long")
    return (
        local.join(F.broadcast(prefix), "__bkt")
        .withColumn("tok_start", start)
        .withColumn("pack_id", F.expr(f"tok_start DIV {seq_len}"))
        .withColumn("pack_offset", F.pmod("tok_start", F.lit(seq_len)).cast("long"))
        .drop("__bkt", "__cum", "__prefix")
    )
