"""DSIR-style data selection: hashed-n-gram importance weights +
deterministic Gumbel top-k resampling (Xie et al. 2023, "Data
Selection for Language Models via Importance Resampling").

Given a small TARGET corpus (the domain you want more of) and a huge
RAW corpus (the crawl), DSIR scores every raw document by how much
more likely its hashed-n-gram bag is under the target distribution
than under the raw distribution, then samples the top of the
Gumbel-perturbed ranking — importance resampling without ever
materializing per-example probabilities beyond two bounded
multinomials.

Engine recast (everything JVM-side, no Python in any dataflow):

1. GRAM TABLE — per document, word unigrams plus adjacent bigrams,
   exploded scan-side (``transform`` + ``explode``; no shuffle).
2. BUCKETS — each gram hashes to one of 4096 buckets via the PORTABLE
   md5 digit-lookup expression shared with ``splits.hash_split``
   (``_md5_bucket_expr``): every SQL engine reproduces it bit-for-bit,
   which is what makes the differential oracle a full SQL query
   rather than a committed literal.  (Production tier: swap in
   ``xxhash64`` exactly as ``hash_split(hasher="xxhash")`` does —
   same plan shape, one 64-bit hash per gram.)
3. LOG-RATIOS — two map-side-combinable aggregates (target bucket
   counts, raw bucket counts; each output ≤ 4096 rows) plus two
   1-row totals.  Add-one smoothing over B = 4096 buckets:

       lr[b] = ln((ct[b]+1) / (Tt+B)) - ln((cr[b]+1) / (Tr+B))

   rounded to 9 decimals and CAST TO DECIMAL(20,9) — the ``lm.py``
   discipline: every later sum of these is EXACTLY associative, so
   Spark's unordered partial aggregation and the oracle's SQL SUM
   agree bit-for-bit.
4. SCORING — explode raw grams, broadcast-join the ≤ 4096-row lr
   table, ONE hash aggregate on the document id:
   ``dsir_logw = SUM(lr)``, n_grams = COUNT.  The only corpus-scale
   shuffle in the whole operator, and it carries exact-decimal
   partial sums.
5. SELECTION — ``dsir_select``: per-stratum Gumbel top-fraction.
   Each row draws a deterministic Gumbel g = -ln(-ln(u)) from the
   md5 bucket of its id (u = (bucket+0.5)/4096 — strictly inside
   (0,1)), key = ROUND(weight + g, 6); keep the top
   ``max(1, floor(frac * |stratum|))`` rows per stratum by
   (key DESC, id ASC).  The window partitions on the stratum column,
   so parallelism tracks stratum count; for one huge stratum use the
   ``splits.stratified_sample`` pre-filter note (hash-threshold
   pre-cut before ranking).

100 TB posture: gram explode is scan-fused; both multinomials are
bounded (≤ 4096 rows) and broadcast; the per-doc aggregate is the
single corpus-scale shuffle with map-side combine; selection shuffles
once on the stratum key.  No driver-side data movement — the two
totals ride a 1-row cross join, never a collect.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from pulsarfeatureextractor_spark.functions.splits import _md5_bucket_expr

__all__ = ["gram_table", "dsir_log_ratios", "with_dsir_logweight",
           "dsir_select", "N_BUCKETS"]

N_BUCKETS = 4096  # the portable md5 3-hex-digit bucket space


def _grams(text_col: str) -> Column:
    """Unigrams ++ adjacent bigrams of the space-split text — one
    scan-side array, document order (unigrams first), NULL-safe."""
    ws = F.filter(
        F.split(F.coalesce(F.col(text_col), F.lit("")), " "),
        lambda w: w != F.lit(""),
    )
    bi = F.when(
        F.size(ws) >= 2,
        F.transform(
            F.sequence(F.lit(1), F.size(ws) - 1),
            lambda i: F.concat(
                F.element_at(ws, i), F.lit(" "), F.element_at(ws, i + 1)
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return F.concat(ws, bi)


def gram_table(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(id, gram) — one row per unigram/bigram occurrence.  Pure
    explode; no shuffle."""
    return df.select(
        F.col(id_col), F.explode(_grams(text_col)).alias("gram")
    )


def _bucketed(grams: DataFrame, seed: str, hasher: str = "md5") -> DataFrame:
    """gram -> bucket in [0, 4096).  Two tiers, the ``hash_split``
    discipline: ``"md5"`` (default) is the PORTABLE digit-lookup
    expression every SQL engine reproduces bit-for-bit — what makes
    the differential oracle a full SQL query; ``"xxhash"`` is the
    production tier — one JVM ``xxhash64`` per gram (an order of
    magnitude cheaper than md5 on the hot path), twinned in tests by
    the from-spec python port in tools/xxh64.py.  Either way the
    bucket is a plain codegen'd projection applied post-explode."""
    if hasher == "md5":
        bucket = F.expr(_md5_bucket_expr("gram", seed))
    elif hasher == "xxhash":
        bucket = F.pmod(
            F.xxhash64(F.concat(F.col("gram"), F.lit("|" + seed))),
            F.lit(N_BUCKETS),
        ).cast("int")
    else:
        raise ValueError(f"unknown hasher {hasher!r}")
    return grams.withColumn("bucket", bucket)


def dsir_log_ratios(
    target: DataFrame,
    raw: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    seed: str = "dsir",
    hasher: str = "md5",
) -> DataFrame:
    """The bounded model: (bucket, lr DECIMAL(20,9)) for every bucket
    that occurs in the raw corpus (the only ones scoring ever needs).
    Two ≤ 4096-row aggregates + two 1-row totals; everything after
    the aggregates is tiny-side arithmetic."""
    tg = _bucketed(gram_table(target, text_col, id_col), seed, hasher)
    rg = _bucketed(gram_table(raw, text_col, id_col), seed, hasher)
    ct = tg.groupBy("bucket").agg(F.count(F.lit(1)).alias("ct"))
    cr = rg.groupBy("bucket").agg(F.count(F.lit(1)).alias("cr"))
    # totals derive from the bucket tables (sum of exact integer
    # counts == total gram count), NOT from a second corpus pass —
    # each corpus gram-explode is scanned exactly once per side
    tt = ct.agg(F.sum("ct").alias("tt"))  # total target grams
    tr = cr.agg(F.sum("cr").alias("tr"))  # total raw grams
    b = F.lit(N_BUCKETS)
    lr = (
        F.log((F.coalesce(F.col("ct"), F.lit(0)) + 1)
              / (F.col("tt") + b).cast("double"))
        - F.log((F.col("cr") + 1) / (F.col("tr") + b).cast("double"))
    )
    return (
        cr.join(F.broadcast(ct), ["bucket"], "left")
        .join(F.broadcast(tt))
        .join(F.broadcast(tr))
        .select(
            "bucket",
            F.round(lr, 9).cast("decimal(20,9)").alias("lr"),
        )
    )


def with_dsir_logweight(
    raw: DataFrame,
    log_ratios: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    seed: str = "dsir",
    hasher: str = "md5",
    out_col: str = "dsir_logw",
    n_out: str = "n_grams",
) -> DataFrame:
    """Score every raw document: input columns + ``n_out`` (gram
    count, 0 for empty/NULL text) + ``out_col`` (exact-decimal gram
    log-ratio sum cast to double, 6 decimals; NULL when no grams).
    ONE corpus-scale shuffle (the id aggregate)."""
    rg = _bucketed(gram_table(raw, text_col, id_col), seed, hasher)
    scored = rg.join(F.broadcast(log_ratios), ["bucket"], "left")
    agg = scored.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("__n"), F.sum("lr").alias("__s")
    )
    return raw.join(agg, [id_col], "left").select(
        *[raw[c] for c in raw.columns],
        F.coalesce(F.col("__n"), F.lit(0)).cast("int").alias(n_out),
        F.round(F.col("__s").cast("double"), 6).alias(out_col),
    )


def dsir_select(
    df: DataFrame,
    weight_col: str = "dsir_logw",
    stratum_col: str = "source",
    id_col: str = "doc_id",
    frac: float = 0.25,
    seed: str = "dsir-gumbel",
    key_out: str = "sel_key",
) -> DataFrame:
    """Deterministic Gumbel top-``frac`` per stratum: returns only the
    selected rows, with the perturbed key in ``key_out``.  The Gumbel
    draw is a pure function of the id (portable md5 bucket -> strictly
    interior uniform -> -ln(-ln(u))), so every rerun and every engine
    selects the same rows.  NULL weights never win (key NULL sorts
    last)."""
    if not 0.0 < frac <= 1.0:
        raise ValueError("frac must be in (0, 1]")
    from pyspark.sql import Window

    u = (F.expr(_md5_bucket_expr(id_col, seed)) + F.lit(0.5)) / F.lit(
        float(N_BUCKETS)
    )
    key = F.round(F.col(weight_col) + -F.log(-F.log(u)), 6)
    w = Window.partitionBy(stratum_col)
    order = w.orderBy(F.col(key_out).desc_nulls_last(), F.col(id_col).asc())
    k = F.greatest(
        F.lit(1), F.floor(F.lit(frac) * F.count(F.lit(1)).over(w))
    )
    return (
        df.withColumn(key_out, key)
        .withColumn("__rk", F.rank().over(order))
        .withColumn("__k", k)
        .where(F.col("__rk") <= F.col("__k"))
        .drop("__rk", "__k")
    )
