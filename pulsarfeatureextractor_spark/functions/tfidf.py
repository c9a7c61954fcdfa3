"""TF-IDF term scoring over the documents table.

Classic smoothed TF-IDF, entirely in JVM built-ins (explode + two hash
aggregates + one join + one window):

    tfidf(d, t) = tf(d, t) * (ln((N + 1) / (df(t) + 1)) + 1)

Plan shape / 100 TB posture:
- explode(split(text)) stays in the scan stage (no shuffle);
- tf: one shuffle on (doc, term);
- df(t): aggregates the tf output on term — a second, much smaller
  shuffle (distinct doc-term pairs, not raw tokens);
- the tf ⋈ idf join is on term.  The term dictionary after the df
  aggregate is tiny relative to the corpus (vocabulary-sized), so
  `broadcast_idf=True` (default) broadcasts it and the join is
  shuffle-free; set False for unbounded vocabularies and let AQE
  pick a shuffle join;
- N is a 1-row aggregate cross-joined in (broadcast), never a driver
  collect;
- top-k per doc is a WindowGroupLimit-eligible row_number window
  partitioned by doc — ranking happens on the TF shuffle's
  partitioning.

The score is rounded to 6 decimals BEFORE ranking, and ties broken by
term — so the output (including rank) is reproducible bit-for-bit by
any engine that computes the same rounded score (the driver's DuckDB
oracle does).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def tfidf_topk(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
    broadcast_idf: bool = True,
) -> DataFrame:
    """Top-k terms per document by smoothed TF-IDF.

    Returns (id_col, term, tfidf, rk) with tfidf rounded to 6 decimals
    and rk in 1..k (ties: higher score first, then term ascending).
    """
    words = df.select(
        F.col(id_col), F.explode(F.split(F.col(text_col), " ")).alias("term")
    ).where(F.col("term") != "")
    tf = words.groupBy(id_col, "term").agg(F.count(F.lit(1)).alias("tf"))
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("dfc"))
    n = df.agg(F.count(F.lit(1)).alias("__n"))
    idf = dfreq.join(F.broadcast(n)).select(
        "term",
        (F.log((F.col("__n") + 1.0) / (F.col("dfc") + 1.0)) + 1.0).alias("idf"),
    )
    if broadcast_idf:
        idf = F.broadcast(idf)
    scored = tf.join(idf, "term").select(
        id_col,
        "term",
        F.round(F.col("tf") * F.col("idf"), 6).alias("tfidf"),
    )
    w = Window.partitionBy(id_col).orderBy(
        F.col("tfidf").desc(), F.col("term").asc()
    )
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= k)
        .select(id_col, "term", "tfidf", "rk")
    )
