"""Deterministic dataset splitting & stratified sampling.

Training-data pipelines need splits that are (a) deterministic across
reruns and engines (a doc must land in `test` forever, or it leaks
into training), (b) driver-free (no collected id lists), and (c)
stable under re-partitioning — so both operators key off a content
hash of the id, never off row order, partition index, or RNG state.

- ``hash_split``: assigns each row a split label ("train"/"val"/...)
  from weighted fractions by bucketing a seeded hash of the id column
  into `buckets` integer buckets and cutting at the cumulative
  weights.  Two hash tiers:
    * ``hasher="xxhash"`` (default) — JVM xxhash64, one 64-bit hash
      per row, the production path.
    * ``hasher="md5"`` — the first 3 hex digits of md5 mapped to a
      bucket in [0, 4096) via digit lookup.  Every SQL engine with
      md5() reproduces it bit-for-bit (the driver's DuckDB oracle
      does), making the assignment portable across engines — the
      property you want when the split must match a warehouse-side
      definition.
  Both are pure row-local JVM expressions: no shuffle, no UDF, fully
  codegen'd; at 100 TB the split is free (fused into the scan stage).

- ``stratified_sample``: exactly-k-per-stratum deterministic sample —
  rank rows within each stratum by the seeded hash (ties broken by
  id) and keep the first k.  One shuffle on the stratum key; the
  hash order is uniform, so this is a uniform random sample that
  every rerun and every engine reproduces.  For strata far larger
  than k at 100 TB, the window sort dominates — pre-filter with an
  approximate hash threshold (keep hash < k/|stratum| ± slack) before
  ranking if stratum sizes are known.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_HEX = "0123456789abcdef"
_MD5_BUCKETS = 4096  # 3 hex digits


def _md5_bucket_expr(id_sql: str, seed: str) -> str:
    """SQL text for the portable md5 bucket — identical in Spark SQL and
    DuckDB (instr / substr / md5 agree on semantics and md5 outputs
    lowercase hex in both)."""
    if "'" in seed or "\\" in seed:
        raise ValueError("seed must not contain quotes or backslashes")
    h = f"md5(concat(CAST({id_sql} AS STRING), '|', '{seed}'))"
    terms = []
    for i, mult in ((1, 256), (2, 16), (3, 1)):
        terms.append(f"(instr('{_HEX}', substr({h}, {i}, 1)) - 1) * {mult}")
    return "(" + " + ".join(terms) + ")"


def hash_split(
    df: DataFrame,
    id_col: str = "doc_id",
    weights: Sequence[tuple[str, float]] = (
        ("train", 0.8),
        ("val", 0.1),
        ("test", 0.1),
    ),
    seed: str = "",
    hasher: str = "xxhash",
    bucket_out: str | None = None,
    split_out: str = "split",
) -> DataFrame:
    """Add a deterministic split-label column (and optionally the raw
    bucket) keyed off a content hash of `id_col`.  See module docstring
    for the hasher tiers."""
    total = sum(w for _, w in weights)
    if total <= 0:
        raise ValueError("weights must sum to a positive value")
    if hasher == "md5":
        buckets = _MD5_BUCKETS
        bucket = F.expr(_md5_bucket_expr(id_col, seed))
    elif hasher == "xxhash":
        buckets = 1 << 20
        bucket = F.pmod(
            F.xxhash64(F.col(id_col).cast("string"), F.lit(seed)), F.lit(buckets)
        )
    else:
        raise ValueError(f"unknown hasher {hasher!r}")

    out = df.withColumn("__bucket", bucket)
    # integer cut points: bucket < cut_i → label_i (cumulative)
    expr = None
    cum = 0.0
    for name, w in weights:
        cum += w
        cut = int(round(buckets * cum / total))
        cond = F.col("__bucket") < F.lit(cut)
        expr = F.when(cond, F.lit(name)) if expr is None else expr.when(cond, F.lit(name))
    # rounding guard: the last cut is exactly `buckets`, so otherwise()
    # is unreachable, but keep the last label as the explicit fallback
    expr = expr.otherwise(F.lit(weights[-1][0]))
    out = out.withColumn(split_out, expr)
    if bucket_out:
        out = out.withColumn(bucket_out, F.col("__bucket"))
    return out.drop("__bucket")


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    k: int,
    id_col: str = "doc_id",
    seed: str = "",
    rank_out: str = "rk",
) -> DataFrame:
    """Exactly min(k, |stratum|) rows per stratum, picked by seeded-hash
    order (deterministic uniform sample), ties broken by id.

    Ranks by the FULL md5 hex digest (lexicographic — identical in any
    engine since md5 is lowercase-hex ASCII in all of them), not the
    4096-value bucket: a truncated key would tie ~|stratum|/4096 rows
    per bucket and the id tie-break would then bias the sample toward
    low ids on big strata."""
    if "'" in seed or "\\" in seed:
        raise ValueError("seed must not contain quotes or backslashes")
    from pyspark.sql.window import Window

    h = F.md5(F.concat(F.col(id_col).cast("string"), F.lit("|" + seed)))
    w = Window.partitionBy(strata_col).orderBy(h.asc(), F.col(id_col).asc())
    return (
        df.withColumn(rank_out, F.row_number().over(w))
        .where(F.col(rank_out) <= k)
    )
