"""Count-based bigram language-model perplexity scoring (CCNet-style
quality filtering, e.g. Wenzek et al. 2020: keep/bucket documents by
LM perplexity).  The production pipeline trains KenLM offline; this
operator is the from-scratch distributed analogue — an add-1-smoothed
bigram LM trained ON the corpus itself (or any other corpus passed as
``train_df``), then every document scored with it:

    p(w2 | w1) = (c(w1, w2) + 1) / (cd(w1) + V)
    ppl(doc)   = exp(-mean(ln p) over the doc's bigrams)

Plan shape / 100 TB posture:
- bigram extraction is a scan-side higher-order ``transform`` over the
  split token array (no shuffle until the count aggregate);
- training = TWO hash aggregates: bigram counts (one shuffle on
  (w1, w2) over raw pairs) and context counts (aggregates the *bigram
  table*, vocabulary-squared-bounded, not the corpus);  V is a 1-row
  broadcast cross-join, never a driver collect (tfidf.py shape);
- scoring joins the corpus against the LM on (w1, w2) then (w1) —
  by default NO broadcast hint is planted (``broadcast_lm=False``):
  the bigram-count table grows with corpus token diversity, not a
  fixed vocabulary, so a hard-coded broadcast is an executor-OOM trap
  at the 100 TB posture; AQE picks a broadcast join automatically when
  the measured LM size is under the threshold.  Pass
  ``broadcast_lm=True`` only when the vocabulary is known-bounded;
- the per-doc reduction is one hash aggregate on doc_id.

Float discipline (the driver's DuckDB differential compares value
hashes bit-for-bit): ``ln p`` is computed on an IDENTICAL double in
both engines ((c+1) long / (cd+V) cast double — integer inputs are
exact, IEEE division is correctly rounded), rounded to 9 decimals and
CAST TO DECIMAL(20,9) **before** summation, so the per-doc sum is
exact integer arithmetic — associative, partial-aggregable, identical
on any engine and any partitioning.  Only the final
``exp(-sum/n)`` returns to double, rounded to 6 decimals.

Residual cross-engine risk (known, accepted): ``ln`` and ``exp`` are
libm calls, not correctly-rounded — two engines may differ by 1 ulp,
which flips the 9-decimal rounding only when the true value sits
within ~1e-16 of a rounding boundary (~1e-7 per value; likewise the
final 6-decimal ``exp``).  The driver gate runs on fixed sf0.01 data,
where the comparison is deterministic and verified bit-exact; on other
data a rare 1-value mismatch is possible and would indicate this libm
gap, not a logic bug.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["train_bigram_lm", "with_lm_perplexity"]

_WS = "__lm_ws"


def _words(df: DataFrame, text_col: str) -> DataFrame:
    return df.withColumn(
        _WS, F.filter(F.split(F.col(text_col), " "), lambda w: w != F.lit(""))
    )


def _bigrams(df: DataFrame, id_col: str) -> DataFrame:
    """(id, w1, w2) per consecutive token pair — scan-side transform +
    explode, no shuffle."""
    pairs = F.expr(
        f"transform(slice({_WS}, 1, size({_WS}) - 1),"
        f" (x, i) -> struct(x AS w1, element_at({_WS}, i + 2) AS w2))"
    )
    return (
        df.where(F.size(_WS) >= 2)
        .select(F.col(id_col), F.explode(pairs).alias("__p"))
        .select(id_col, F.col("__p.w1").alias("w1"), F.col("__p.w2").alias("w2"))
    )


def train_bigram_lm(
    train_df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> "tuple[DataFrame, DataFrame, DataFrame]":
    """Train the add-1 bigram LM: returns (bigram counts (w1, w2, c),
    context counts (w1, cd), vocabulary size — a 1-row (v) frame)."""
    ws = _words(train_df, text_col)
    big = _bigrams(ws, id_col)
    bi = big.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c"))
    ctx = bi.groupBy("w1").agg(F.sum("c").alias("cd"))
    vocab = (
        ws.select(F.explode(F.array_distinct(F.col(_WS))).alias("w"))
        .select("w")
        .distinct()
        .agg(F.count(F.lit(1)).alias("v"))
    )
    return bi, ctx, vocab


def with_lm_perplexity(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    train_df: DataFrame | None = None,
    out_col: str = "lm_ppl",
    n_out: str = "n_bigrams",
    broadcast_lm: bool = False,
    smoothing: str = "add1",
    discount: float = 0.75,
) -> DataFrame:
    """Score every document's bigram perplexity under the LM trained on
    ``train_df`` (default: the scored corpus itself — the CCNet
    in-domain reference).  Output = input columns + ``n_out`` +
    ``out_col``; documents with fewer than 2 tokens score NULL
    perplexity and 0 bigrams.

    ``smoothing``: ``"add1"`` (module docstring) or ``"kneser_ney"`` —
    interpolated Kneser-Ney with fixed ``discount`` D (Kneser & Ney
    1995; Chen & Goodman 1999 interpolated form, the KenLM family's
    smoothing):

        p(w2|w1) = max(c12 - D, 0)/cd(w1)
                   + (D * n1+(w1,·)/cd(w1)) * pcont(w2)
        pcont(w2) = (n1+(·,w2) + 1) / (n_types + V + 1)

    where n1+(w1,·) / n1+(·,w2) are distinct-continuation /
    distinct-context counts and n_types the number of distinct bigram
    types.  The continuation distribution is add-1 smoothed over the
    vocabulary plus one OOV slot so the model stays total (every
    scored bigram gets p > 0 even for words unseen in training); an
    unseen CONTEXT w1 backs off entirely to pcont(w2).  All extra KN
    statistics aggregate the bigram TABLE (vocabulary²-bounded), not
    the corpus — training stays two corpus-scale aggregates.  The
    float expression is evaluated with one pinned parenthesization,
    identical in the DuckDB oracle.

    ``broadcast_lm`` defaults to False: the bigram table's size tracks
    the training corpus (not a bounded vocabulary), so the safe default
    lets AQE choose the join strategy from measured sizes; set True to
    force a broadcast when the vocabulary is known-bounded.
    """
    if smoothing not in ("add1", "kneser_ney"):
        raise ValueError(f"unknown smoothing {smoothing!r}")
    bi, ctx, vocab = train_bigram_lm(
        train_df if train_df is not None else df, text_col, id_col
    )
    big = _bigrams(_words(df, text_col), id_col)
    if smoothing == "add1":
        if broadcast_lm:
            bi, ctx = F.broadcast(bi), F.broadcast(ctx)
        p = (F.coalesce(F.col("c"), F.lit(0)) + F.lit(1)) / (
            F.coalesce(F.col("cd"), F.lit(0)) + F.col("v")
        ).cast("double")
        scored = (
            big.join(bi, ["w1", "w2"], "left")
            .join(ctx, ["w1"], "left")
            .join(F.broadcast(vocab))
            .select(
                id_col,
                F.round(F.log(p), 9).cast("decimal(20,9)").alias("__logp"),
            )
        )
    else:
        d = float(discount)
        if not 0.0 < d < 1.0:
            raise ValueError("discount must be in (0, 1)")
        ctxk = bi.groupBy("w1").agg(
            F.sum("c").alias("cd"), F.count(F.lit(1)).alias("n1fw")
        )
        cont = bi.groupBy("w2").agg(F.count(F.lit(1)).alias("n1bw"))
        types = bi.agg(F.count(F.lit(1)).alias("nt"))
        if broadcast_lm:
            bi, ctxk, cont = (
                F.broadcast(bi), F.broadcast(ctxk), F.broadcast(cont),
            )
        cd_d = F.col("cd").cast("double")
        pc = (F.coalesce(F.col("n1bw"), F.lit(0)) + 1) / (
            F.col("nt") + F.col("v") + 1
        ).cast("double")
        p = F.when(F.col("cd").isNull(), pc).otherwise(
            F.greatest(
                F.coalesce(F.col("c"), F.lit(0)).cast("double") - F.lit(d),
                F.lit(0.0),
            )
            / cd_d
            + ((F.lit(d) * F.col("n1fw")) / cd_d) * pc
        )
        scored = (
            big.join(bi, ["w1", "w2"], "left")
            .join(ctxk, ["w1"], "left")
            .join(cont, ["w2"], "left")
            .join(F.broadcast(types))
            .join(F.broadcast(vocab))
            .select(
                id_col,
                F.round(F.log(p), 9).cast("decimal(20,9)").alias("__logp"),
            )
        )
    agg = scored.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("__n"), F.sum("__logp").alias("__s")
    )
    return df.join(agg, [id_col], "left").select(
        *[df[c] for c in df.columns],
        F.coalesce(F.col("__n"), F.lit(0)).cast("int").alias(n_out),
        F.round(
            F.exp(-(F.col("__s").cast("double") / F.col("__n"))), 6
        ).alias(out_col),
    )
