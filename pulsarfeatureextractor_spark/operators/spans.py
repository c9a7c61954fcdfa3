"""Repeated n-gram span detection — the distributable core of
exact-substring training-data dedup (Lee et al. 2021, "Deduplicating
Training Data Makes Language Models Better").

Lee et al. remove every ≥ 50-token span that occurs verbatim more
than once in the corpus (across documents OR repeated inside one),
using a monolithic suffix array.  The suffix array itself does not
distribute, but its decision predicate does: a token position is
inside a duplicated span iff some n-gram starting at (or covering) it
occurs ≥ 2 times corpus-wide.  This operator computes, per document,
exactly that coverage — which positions are covered by duplicated
n-grams, and how much of the document that is — the statistic a
span-removal rewrite or a quality gate consumes.

Plan (all JVM built-ins; the same shingle construction as
``operators/dedup.shingles`` / ``operators/contamination``):

1. POSITIONS — per document, every word n-gram WITH its 1-based start
   position: scan-side ``transform(sequence(...))`` + ``explode``.
   Documents shorter than n tokens contribute nothing.
2. DUPLICATED GRAMS — one hash aggregate on the gram
   (count ≥ ``min_count`` total occurrences, so intra-document
   repetition counts, exactly like the suffix-array predicate).  At
   100 TB the shuffle key should be ``xxhash64(gram)`` (16 bytes)
   rather than the string — same plan, smaller exchange; the string
   key keeps the differential oracle pure SQL.
3. SEMI-JOIN — positions ⋉ duplicated grams (LEFT SEMI: no row
   multiplication, ever — a gram occurring a million times joins a
   million position rows to ONE set row, not a million²).
4. COVERAGE — one aggregate per document: collect the surviving start
   positions, expand each to its covered token indices scan-side
   (``flatten(transform(.., sequence(p, p+n-1)))``), distinct-count.
   ``dup_fraction = dup_tokens / n_tokens`` (6 decimals).  Documents
   with no duplicated gram report zeros via the final left join.

Two corpus-scale shuffles total (gram aggregate, document aggregate)
+ the semi-join's exchange — each on a natural key with map-side
combine.  No Python anywhere; no driver-side state.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["repeated_ngram_coverage"]


def _words(text_col: str) -> Column:
    return F.filter(
        F.split(F.coalesce(F.col(text_col), F.lit("")), " "),
        lambda w: w != F.lit(""),
    )


def _positioned_grams(ws: Column, n: int) -> Column:
    """[(pos, gram)] structs for every n-gram start position (1-based);
    empty when the document has fewer than n tokens."""
    return F.when(
        F.size(ws) >= n,
        F.transform(
            F.sequence(F.lit(1), F.size(ws) - (n - 1)),
            lambda i: F.struct(
                i.alias("pos"),
                F.array_join(F.slice(ws, i, n), " ").alias("gram"),
            ),
        ),
    ).otherwise(F.expr("array()").cast("array<struct<pos:int,gram:string>>"))


def repeated_ngram_coverage(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    min_count: int = 2,
) -> DataFrame:
    """Per document: ``n_tokens``, ``n_dup_grams`` (n-gram start
    positions whose gram occurs ≥ ``min_count`` times corpus-wide),
    ``dup_tokens`` (distinct token indices covered by those grams),
    ``dup_fraction`` (6 decimals; 0.0 for token-less documents).
    Every input document appears exactly once in the output."""
    if n < 1 or min_count < 2:
        raise ValueError("need n >= 1 and min_count >= 2")
    ws = _words(text_col)
    pos = df.select(
        F.col(id_col),
        F.size(ws).alias("n_tokens"),
        F.explode(_positioned_grams(ws, n)).alias("pg"),
    ).select(
        id_col, "n_tokens", F.col("pg.pos").alias("pos"),
        F.col("pg.gram").alias("gram"),
    )
    dup = (
        pos.groupBy("gram")
        .agg(F.count(F.lit(1)).alias("c"))
        .where(F.col("c") >= min_count)
        .select("gram")
    )
    hits = pos.join(dup, ["gram"], "left_semi")
    cov = hits.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_dup_grams"),
        F.size(
            F.array_distinct(
                F.flatten(
                    F.transform(
                        F.collect_list("pos"),
                        lambda p: F.sequence(p, p + (n - 1)),
                    )
                )
            )
        ).alias("dup_tokens"),
    )
    return df.join(cov, [id_col], "left").select(
        F.col(id_col),
        F.size(ws).alias("n_tokens"),
        F.coalesce(F.col("n_dup_grams"), F.lit(0)).cast("int")
        .alias("n_dup_grams"),
        F.coalesce(F.col("dup_tokens"), F.lit(0)).cast("int")
        .alias("dup_tokens"),
        F.round(
            F.coalesce(F.col("dup_tokens"), F.lit(0))
            / F.greatest(F.size(ws), F.lit(1)),
            6,
        ).alias("dup_fraction"),
    )
