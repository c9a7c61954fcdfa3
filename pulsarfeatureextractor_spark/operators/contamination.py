"""Benchmark contamination check: eval-set n-gram overlap vs a corpus.

Before training on a 100 TB crawl you ask: how much of each held-out
eval document already appears verbatim(ish) in the training corpus?
This operator answers per eval document: the fraction of its DISTINCT
word n-gram shingles that occur anywhere in the training side.

Plan (all JVM built-ins, shingles shared with operators/dedup.py):

- train side: explode distinct shingles, `dropDuplicates` — one
  shuffle on the shingle; the result is the corpus shingle
  vocabulary, typically ≪ corpus token count;
- eval side: explode distinct shingles — eval sets are tiny relative
  to the corpus;
- LEFT join eval shingles onto the train vocabulary on the shingle
  (shuffle on shingle; the eval side is the small one — at real
  scale mark it broadcast, here left join keeps unmatched rows), then
  one hash aggregate per eval doc:
  n_hit / n_shingles = contamination ratio.

At 100 TB the train vocabulary is the big side; the join is
shuffle-on-shingle with the eval side small enough for a broadcast —
or pre-filter the train side with a bloom filter built from the eval
shingles (`might_contain`) to avoid shuffling the full vocabulary.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pulsarfeatureextractor_spark.operators.dedup import shingles


def contamination_ratio(
    train: DataFrame,
    eval_df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_n: int = 3,
) -> DataFrame:
    """(id_col, n_shingles, n_hit, ratio) per eval document; ratio is
    rounded to 6 decimals (engine-reproducible)."""
    sh = F.explode(F.array_distinct(shingles(text_col, shingle_n))).alias("s")
    train_vocab = train.select(sh).dropDuplicates(["s"])
    eval_sh = eval_df.select(F.col(id_col), sh)
    joined = eval_sh.join(
        train_vocab.withColumn("__hit", F.lit(1)), "s", "left"
    )
    return joined.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_shingles"),
        F.count("__hit").alias("n_hit"),
        F.round(F.count("__hit") / F.count(F.lit(1)), 6).alias("ratio"),
    )
