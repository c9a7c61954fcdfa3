"""In-engine multinomial Naive Bayes training + classification.

Production LLM-data pipelines gate documents with small learned
classifiers (fastText langid in CCNet, the quality classifiers of
GPT-3/PaLM/FineWeb-Edu).  Round 4 added the *apply* side
(``inference.classify_with_model`` routes features through an injected
model); this module closes the *train* side in-engine: a multinomial
Naive Bayes text classifier (McCallum & Nigam 1998) learned from a
labeled column with nothing but hash aggregates, so the whole
train -> classify -> gate loop runs inside the engine with no external
artifact — the same posture as ``regression.fit_linear_model`` for the
continuous case.

Model (add-alpha smoothing, alpha a positive INTEGER so every
numerator/denominator stays an exact integer):

    P(c)     = ndocs_c / ndocs
    P(t | c) = (cnt_{c,t} + alpha) / (tot_c + alpha * V)

where ``V`` is the training vocabulary size and ``tot_c`` the token
count of class ``c``.  Classification scores
``log P(c) + sum_t log P(t | c)`` over the document's in-vocabulary
token OCCURRENCES (multinomial event model); tokens absent from the
training vocabulary are SKIPPED (the standard NB OOV discipline — a
token no class has evidence for carries no signal).  Prediction is the
argmax; ties break to the lexicographically SMALLEST label; a document
with zero in-vocabulary tokens is predicted by prior alone.

Plan shape / 100 TB posture:
- training = ONE corpus-scale shuffle (the (label, token) count
  aggregate); class totals, vocabulary size, and the smoothing grid
  all aggregate or join the *bounded* (labels x vocab) count table,
  never the corpus;
- classification joins exploded corpus tokens to the model on
  ``token`` (each in-vocab token picks up its K per-class rows), then
  ONE hash aggregate on (id, label) — partial aggregation collapses
  token-level rows to docs x K before the exchange because the
  DECIMAL(20,9) log-prob sum is exactly associative;
- like ``lm.with_lm_perplexity`` (round-4 ADVICE fix), the model join
  plants NO broadcast hint by default (``broadcast_model=False``):
  whitespace-token vocabularies grow with corpus diversity, so a
  hard-coded broadcast is an executor-OOM trap; AQE broadcasts
  automatically when the measured model size is small.  Pass
  ``broadcast_model=True`` only for known-bounded vocabularies.

Float discipline (driver differential is bit-exact on float64): every
log-probability is ``ln`` of a ratio of exact integers cast to double
(IEEE division of exactly-represented integers is correctly rounded,
so both engines see the identical double), rounded to 9 decimals and
cast DECIMAL(20,9) BEFORE any summation; per-(doc, label) scores are
therefore exact decimal arithmetic — associative, engine- and
partitioning-independent.  Only the final reported score returns to
double (one correctly-rounded decimal->double cast).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["train_nb", "classify_nb"]

_WS = "__nb_ws"


def _words(df: DataFrame, text_col: str) -> DataFrame:
    # NULL text == '' (the engine-wide pinned convention — the
    # canonical expression lives in text.clean_words_col).
    from .text import clean_words_col

    return df.withColumn(_WS, clean_words_col(text_col))


def train_nb(
    train_df: DataFrame,
    text_col: str = "text",
    label_col: str = "lang",
    alpha: int = 1,
) -> DataFrame:
    """Learn the NB model table from a labeled corpus.

    Returns the COMPLETE (label x vocabulary) grid — one row per
    (label, token) pair including zero-count pairs, so the smoothed
    log-conditional of an unseen-in-class token is materialized rather
    than special-cased at scoring time — with columns:

      label, token, cnt (long), log_cond (decimal(20,9)),
      log_prior (decimal(20,9))

    The grid is (n_labels x V)-bounded: it never touches the corpus
    after the single count shuffle.  ``alpha`` must be a positive
    integer so the smoothed ratio stays a ratio of exact integers.
    """
    if int(alpha) != alpha or alpha <= 0:
        raise ValueError(f"alpha must be a positive integer, got {alpha!r}")
    alpha = int(alpha)

    # Unlabeled rows are EXCLUDED from training entirely (standard
    # supervised semantics).  Without this filter they would silently
    # inflate the prior denominator while forming no class (the
    # NULL-label grid rows drop at the priors equi-join), leaving
    # priors that do not sum to 1 — pinned by
    # tests/test_nb.py::test_null_labels_excluded.
    train_df = train_df.where(F.col(label_col).isNotNull())

    toks = _words(train_df, text_col).select(
        F.col(label_col).alias("label"), F.explode(_WS).alias("token")
    )
    # The ONE corpus-scale shuffle.
    counts = toks.groupBy("label", "token").agg(F.count("*").alias("cnt"))
    # Everything below aggregates / joins the bounded count table.
    tot = counts.groupBy("label").agg(F.sum("cnt").alias("__tot"))
    vocab = counts.select("token").distinct()
    v = vocab.agg(F.count("*").alias("__v"))

    pri = (
        train_df.groupBy(F.col(label_col).alias("label"))
        .agg(F.count("*").alias("__ndocs"))
    )
    ntot = pri.agg(F.sum("__ndocs").alias("__ntot"))
    pri = pri.crossJoin(F.broadcast(ntot)).select(
        "label",
        F.round(
            F.log(F.col("__ndocs") / F.col("__ntot").cast("double")), 9
        )
        .cast("decimal(20,9)")
        .alias("log_prior"),
    )

    # Labels are genuinely bounded (a handful of classes) — broadcast
    # that side; the vocab side streams.  The label set comes from the
    # PRIORS (every label with >= 1 doc), NOT from the token totals: a
    # label whose training docs are all empty has no (label, token)
    # rows, and deriving the grid from `tot` would silently drop it
    # from the model — and from every later prediction — instead of
    # letting it participate via prior + uniform ln(alpha/(alpha*V))
    # smoothing (pinned by tests/test_nb.py::test_zero_token_label).
    grid = vocab.crossJoin(F.broadcast(pri.select("label")))
    return (
        grid.join(counts, ["label", "token"], "left")
        .join(F.broadcast(tot), "label", "left")
        .withColumn("__tot", F.coalesce(F.col("__tot"), F.lit(0)))
        .crossJoin(F.broadcast(v))
        .join(F.broadcast(pri), "label")
        .select(
            "label",
            "token",
            F.coalesce(F.col("cnt"), F.lit(0)).cast("long").alias("cnt"),
            F.round(
                F.log(
                    (F.coalesce(F.col("cnt"), F.lit(0)) + F.lit(alpha))
                    / (F.col("__tot") + F.lit(alpha) * F.col("__v")).cast(
                        "double"
                    )
                ),
                9,
            )
            .cast("decimal(20,9)")
            .alias("log_cond"),
            "log_prior",
        )
    )


def classify_nb(
    df: DataFrame,
    model: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    broadcast_model: bool = False,
    keep_scores: bool = False,
) -> DataFrame:
    """Score every row of ``df`` against a ``train_nb`` model table.

    Output: ``id_col, nb_pred (string), nb_score (double), n_tok_nb
    (long in-vocabulary token occurrences)``; with ``keep_scores`` the
    per-(id, label) score table is returned instead (label, nb_score,
    n_tok_nb per id) for calibration/inspection.

    Semantics pinned by tests: OOV tokens are skipped; zero-in-vocab
    documents are predicted by prior alone (n_tok_nb = 0); argmax ties
    break to the smallest label.
    """
    m = F.broadcast(model) if broadcast_model else model
    priors = model.select("label", "log_prior").distinct()

    toks = _words(df, text_col).select(
        F.col(id_col), F.explode(_WS).alias("token")
    )
    # Inner join: OOV tokens drop here; each surviving occurrence picks
    # up its K per-class smoothed log-conditionals.
    scored = toks.join(m, "token").groupBy(id_col, "label").agg(
        F.sum("log_cond").alias("__s"),
        F.count("*").alias("__n"),
    )
    # Every (doc, label) pair must exist even for zero-in-vocab docs.
    full = (
        df.select(id_col)
        .crossJoin(F.broadcast(priors))
        .join(scored, [id_col, "label"], "left")
        .select(
            F.col(id_col),
            "label",
            (
                F.coalesce(
                    F.col("__s"), F.lit(0).cast("decimal(20,9)")
                )
                + F.col("log_prior")
            ).alias("__score"),
            F.coalesce(F.col("__n"), F.lit(0)).cast("long").alias("n_tok_nb"),
        )
    )
    if keep_scores:
        return full.select(
            id_col,
            "label",
            F.col("__score").cast("double").alias("nb_score"),
            "n_tok_nb",
        )
    # argmax with the pinned tie-break: min over (-score, label) picks
    # the largest score, then the lexicographically smallest label —
    # decimal negation is exact, so the struct ordering is too.
    best = full.groupBy(id_col).agg(
        F.min(
            F.struct(
                (-F.col("__score")).alias("ns"),
                F.col("label").alias("l"),
                F.col("n_tok_nb").alias("n"),
            )
        ).alias("__b")
    )
    return best.select(
        id_col,
        F.col("__b.l").alias("nb_pred"),
        (-F.col("__b.ns")).cast("double").alias("nb_score"),
        F.col("__b.n").alias("n_tok_nb"),
    )
