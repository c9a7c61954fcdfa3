"""Z-order clustered layout — multi-column file skipping at write time.

``prune_files`` (sinks/manifest.py) skips files by ONE column's
min/max; a 100 TB table queried by 2–3 correlated predicates (entity ×
time, lat × lon) needs the layout itself to localize multi-dimensional
ranges.  Z-ordering interleaves the bits of each clustering column's
rank so that rows close in the multi-dim box land in the same files —
after which every engine's ordinary per-file min/max stats prune on
ALL clustering columns at once.

Plan shape (pinned in tests/test_layout.py):
- ONE metadata-sized agg collects per-column min/max (driver holds a
  single row — same posture as the IVF centroid sample).
- The z-key is a pure JVM expression tree (shift/and/or over the
  scaled ranks — whole-stage codegen, no Python, no extra scan).
- ONE range repartition on the z-key (the same single shuffle any
  clustered write pays) + in-partition sort, then a plain parquet
  write.  Cost at 10^12 rows: exactly one pass, one shuffle.

Public-knowledge recast (Morton/Z-curve, as in Delta OPTIMIZE ZORDER
BY / Iceberg's sort-order rewrite); no reference counterpart (the
reference has no storage layer at all — SURVEY.md §2A).
"""

from __future__ import annotations

from typing import Iterable

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

_MAX_Z_BITS = 62  # keep the interleaved key inside a signed long


def _rank_expr(col: str, lo: float, hi: float, bits: int) -> Column:
    """Scale ``col`` into an integer rank in [0, 2^bits) using the
    collected min/max.  NULL and degenerate (min == max) columns rank
    0 — they carry no skipping information either way.  Timestamps
    ride the double cast (epoch seconds)."""
    max_rank = (1 << bits) - 1
    if hi <= lo:
        return F.lit(0).cast("long")
    scaled = (F.col(col).cast("double") - F.lit(float(lo))) \
        / F.lit(float(hi - lo))
    r = F.floor(scaled * F.lit(float(max_rank))).cast("long")
    clamped = F.least(F.greatest(r, F.lit(0)), F.lit(max_rank))
    return F.when(F.col(col).isNull(), F.lit(0)).otherwise(clamped)


def zorder_key(ranks: "list[Column]", bits: int) -> Column:
    """Interleave the rank bits (Morton order): output bit
    ``i * n_cols + j`` is input bit ``i`` of rank ``j``.  A flat
    shift/and/or expression tree — ``bits × n_cols`` terms, all
    codegen'd JVM ops."""
    n = len(ranks)
    z: Column = F.lit(0).cast("long")
    for i in range(bits):
        for j, r in enumerate(ranks):
            bit = F.shiftrightunsigned(r, i).bitwiseAND(F.lit(1))
            z = z.bitwiseOR(F.shiftleft(bit, i * n + j))
    return z


def with_zorder_key(df: DataFrame, cols: "Iterable[str]",
                    bits: int = 16, key_col: str = "__z") -> DataFrame:
    """Attach the z-key column.  One metadata agg (min/max per
    clustering column, a single driver row), then a pure projection."""
    cols = list(cols)
    if not cols:
        raise ValueError("zorder needs at least one column")
    if bits * len(cols) > _MAX_Z_BITS:
        raise ValueError(
            f"bits({bits}) * n_cols({len(cols)}) exceeds {_MAX_Z_BITS}: "
            "lower bits= (rank resolution) or cluster fewer columns")
    stats = df.agg(*(
        [F.min(F.col(c).cast("double")).alias(f"lo_{c}") for c in cols]
        + [F.max(F.col(c).cast("double")).alias(f"hi_{c}") for c in cols]
    )).first()
    ranks = [
        _rank_expr(c,
                   stats[f"lo_{c}"] if stats[f"lo_{c}"] is not None else 0.0,
                   stats[f"hi_{c}"] if stats[f"hi_{c}"] is not None else 0.0,
                   bits)
        for c in cols
    ]
    return df.withColumn(key_col, zorder_key(ranks, bits))


def write_zordered(df: DataFrame, path: str, cols: "Iterable[str]",
                   n_files: int = 32, bits: int = 16,
                   mode: str = "overwrite") -> None:
    """Write ``df`` as ``n_files`` parquet files range-partitioned and
    locally sorted on the z-key (the key itself is dropped from the
    files).  ONE shuffle; per-file min/max footers then prune on every
    clustering column simultaneously."""
    keyed = with_zorder_key(df, cols, bits)
    (keyed.repartitionByRange(n_files, F.col("__z"))
          .sortWithinPartitions("__z")
          .drop("__z")
          .write.mode(mode).parquet(path))


def per_file_ranges(spark: SparkSession, path: str,
                    cols: "Iterable[str]") -> DataFrame:
    """Per-file min/max for the given columns — the skipping stats a
    scan planner (or a test) prunes with.  One column-pruned pass."""
    cols = list(cols)
    df = spark.read.parquet(path).withColumn("__file", F.input_file_name())
    return df.groupBy("__file").agg(*(
        [F.min(c).alias(f"min_{c}") for c in cols]
        + [F.max(c).alias(f"max_{c}") for c in cols]
    ))


def files_overlapping(spark: SparkSession, path: str,
                      box: "dict[str, tuple]") -> "list[str]":
    """Files whose [min, max] envelope intersects every predicate range
    in ``box`` ({col: (lo, hi)}) — i.e. the files a min/max-pruning
    scan must read for the conjunctive range query.  The collect is
    file-count-sized (metadata)."""
    ranges = per_file_ranges(spark, path, list(box))
    cond = F.lit(True)
    for c, (lo, hi) in box.items():
        cond = cond & (F.col(f"max_{c}") >= F.lit(lo)) \
                    & (F.col(f"min_{c}") <= F.lit(hi))
    return [r["__file"] for r in ranges.where(cond).select("__file").collect()]
