"""Distributed unigram-LM (SentencePiece-style) subword tokenizer
TRAINING and encoding — the second of the two standard subword
learners (Kudo 2018, "Subword Regularization"), completing the
tokenizer-training story whose BPE half is ``functions/bpe.py`` and
whose apply-a-fixed-vocabulary half is
``sources/tokenized.vocab_tokenize``.

Algorithm (Viterbi-EM variant, pinned exactly)
----------------------------------------------
1. WORD COUNTS: one corpus-scale aggregate
   (``explode(split(text)) -> groupBy(word).sum``) — after this single
   shuffle every further step is bounded by the distinct-word /
   piece-vocabulary size, independent of corpus row count (same
   posture as ``train_bpe``).
2. SEED VOCABULARY: every substring of every distinct word up to
   ``max_piece_len`` chars, counted PER OCCURRENCE (all start
   positions, overlaps included) weighted by word frequency — a
   scan-side nested-``transform`` explode over the bounded word table,
   then one vocabulary-bounded aggregate.  All single characters are
   always kept; multi-char pieces are cut to the top
   ``seed_max_pieces - n_chars`` by (count desc, piece asc).
3. EM ROUNDS (``em_iters``): E-step Viterbi-segments each DISTINCT
   word under the current piece log-probs (an Arrow-batched pandas UDF
   over the bounded word table — Python is justified here because the
   lattice DP is not expressible in built-in expressions, and the word
   table is vocabulary-bounded so the Python cost does not grow with
   corpus rows); expected piece counts are EXACT INTEGERS
   (sum of word freqs along Viterbi paths — hard EM), aggregated by
   one bounded ``groupBy(piece)``.  M-step (driver-side over the
   collected, bounded count table): add-one smoothing,
   ``logp = log(count + 1) - log(T + V)`` with ``T = sum(counts)``,
   ``V = len(vocab)``.  After each E-step except the last, the bottom
   ``prune_frac`` of multi-char pieces by (count asc, piece asc) are
   dropped (never below ``vocab_size - n_chars``); after the final
   round multi-char pieces are cut to exactly
   ``vocab_size - n_chars`` by (count desc, piece asc).  Single
   characters are never pruned (coverage guarantee).
4. MODEL: ``[(piece, logp)]`` sorted by piece asc — metadata-sized,
   the exportable artifact (``unigram_model_table``).

Viterbi determinism contract (mirrored bit-for-bit by the independent
pure-python twin in ``tools/gen_value_oracles.py``):
- ``best[0] = 0.0``; for ``j = 1..n``:
  ``best[j] = max over i in [max(0, j-L), j-1] of best[i] + logp(w[i:j])``
  scanning ``i`` in INCREASING order and accepting only STRICTLY
  greater scores — so on a float tie the longest piece wins.
- Scores accumulate as ``best[i] + logp`` (one association order; both
  sides add in the same order, so floats agree bit-for-bit).
- ``logp`` values are pure functions of exact integer counts via
  ``math.log(c) - math.log(T)`` style expressions evaluated
  identically on both sides.
- A position with NO vocabulary candidate (unseen char at encode
  time) falls back to the single char with ``logp = UNK_LOGP`` — the
  model stays total.

100 TB posture
--------------
One corpus-scale shuffle (word counts) + one corpus-scale Arrow
crossing at encode time; training iterations touch only the bounded
word table; all collects are vocabulary-bounded (≤ ``seed_max_pieces``
rows) behind explicit guards.  Compare ``functions/bpe.py`` (same
scale argument, different learner).
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = [
    "train_unigram",
    "unigram_encode",
    "unigram_model_table",
    "tokenizer_eval",
    "viterbi_segment",
    "UNK_LOGP",
]

UNK_LOGP = -1e9


def viterbi_segment(word: str, logp: "dict[str, float]",
                    max_piece_len: int) -> "list[str]":
    """Best segmentation of ``word`` under piece log-probs ``logp``
    per the module contract (increasing-i scan, strict >, single-char
    UNK fallback).  Pure function — the engine's E-step/encode and the
    oracle twin both defer to THIS spec (the twin re-implements it
    independently with a memoized recursion; tests pin equality)."""
    n = len(word)
    best = [0.0] + [None] * n  # type: list
    back = [0] * (n + 1)
    for j in range(1, n + 1):
        b, bi = None, -1
        for i in range(max(0, j - max_piece_len), j):
            if best[i] is None:
                continue
            piece = word[i:j]
            lp = logp.get(piece)
            if lp is None:
                continue
            s = best[i] + lp
            if b is None or s > b:
                b, bi = s, i
        if b is None:
            # unseen char fallback: consume one char with UNK_LOGP
            prev = best[j - 1] if best[j - 1] is not None else 0.0
            b, bi = prev + UNK_LOGP, j - 1
        best[j], back[j] = b, bi
    out: "list[str]" = []
    j = n
    while j > 0:
        i = back[j]
        out.append(word[i:j])
        j = i
    out.reverse()
    return out


def _word_counts(df: DataFrame, text_col: str) -> DataFrame:
    return (
        df.select(
            F.explode(
                F.filter(
                    F.split(F.coalesce(F.col(text_col), F.lit("")), " "),
                    lambda w: w != F.lit(""),
                )
            ).alias("__w")
        )
        .groupBy("__w")
        .agg(F.count(F.lit(1)).alias("__freq"))
    )


def _substring_pieces(w: Column, max_piece_len: int) -> Column:
    """All substrings of ``w`` up to ``max_piece_len`` chars, one entry
    per start position (overlaps included) — scan-side, no Python."""
    return F.flatten(
        F.transform(
            F.sequence(F.lit(1), F.length(w)),
            lambda i: F.transform(
                F.sequence(
                    F.lit(1),
                    F.least(F.lit(max_piece_len), F.length(w) - i + 1),
                ),
                lambda l: w.substr(i, l),
            ),
        )
    )


def _mstep(counts: "dict[str, int]") -> "dict[str, float]":
    """Add-one-smoothed log-probs from exact integer counts — the one
    float-producing step, pinned to log(c + 1) - log(T + V)."""
    total = sum(counts.values())
    denom = math.log(total + len(counts))
    return {p: math.log(c + 1) - denom for p, c in counts.items()}


def train_unigram(
    df: DataFrame,
    text_col: str = "text",
    vocab_size: int = 64,
    max_piece_len: int = 4,
    seed_max_pieces: int = 256,
    em_iters: int = 2,
    prune_frac: float = 0.25,
    max_distinct_words: int = 2_000_000,
) -> "list[tuple[str, float]]":
    """Learn a unigram-LM piece vocabulary; returns the model as a
    sorted ``[(piece, logp)]`` list (metadata-sized).

    ``max_distinct_words`` guards the bounded-table invariant: the
    E-step runs Python over DISTINCT words, so a corpus whose distinct
    words exceed the cap raises instead of silently building an
    unbounded stage (the ``text.py max_frequent`` discipline).
    """
    if seed_max_pieces < 1 or vocab_size < 1:
        raise ValueError("seed_max_pieces and vocab_size must be >= 1")
    spark = df.sparkSession
    words = _word_counts(df, text_col).localCheckpoint(eager=True)
    n_words = words.count()
    if n_words == 0:
        # empty / all-empty-text corpus: return the empty model like
        # train_bpe and train_wordpiece do, instead of a math domain
        # error from log(0) deep inside the M-step
        return []
    if n_words > max_distinct_words:
        raise ValueError(
            f"distinct words {n_words} exceed max_distinct_words "
            f"{max_distinct_words}; raise the cap deliberately or "
            "pre-truncate the corpus"
        )

    # ---- seed vocabulary (one bounded aggregate + two bounded collects)
    piece_counts = (
        words.select(
            F.explode(_substring_pieces(F.col("__w"), max_piece_len)).alias(
                "__p"
            ),
            F.col("__freq"),
        )
        .groupBy("__p")
        .agg(F.sum("__freq").alias("__cnt"))
    )
    chars = {
        r["__p"]: int(r["__cnt"])
        for r in piece_counts.where(F.length("__p") == 1).collect()
    }
    n_multi = max(seed_max_pieces - len(chars), 0)
    multi = {
        r["__p"]: int(r["__cnt"])
        for r in (
            piece_counts.where(F.length("__p") >= 2)
            .orderBy(F.col("__cnt").desc(), F.col("__p").asc())
            .limit(n_multi)
            .collect()
        )
    }
    counts: "dict[str, int]" = {**chars, **multi}
    logp = _mstep(counts)

    # ---- EM rounds over the bounded word table
    min_multi = max(vocab_size - len(chars), 0)
    for it in range(int(em_iters)):
        counts = _estep_counts(spark, words, logp, max_piece_len)
        # chars always survive (coverage), even at zero count
        for c in chars:
            counts.setdefault(c, 0)
        multi_items = [(p, c) for p, c in counts.items() if len(p) >= 2]
        if it + 1 < em_iters:
            # prune the bottom prune_frac by (count asc, piece asc),
            # never below min_multi survivors
            n_drop = min(
                int(len(multi_items) * prune_frac),
                max(len(multi_items) - min_multi, 0),
            )
            drop = sorted(multi_items, key=lambda t: (t[1], t[0]))[:n_drop]
            for p, _ in drop:
                del counts[p]
        else:
            # final cut to exactly vocab_size total, keep by
            # (count desc, piece asc)
            keep = sorted(multi_items, key=lambda t: (-t[1], t[0]))[:min_multi]
            counts = {**{c: counts[c] for c in chars},
                      **dict(keep)}
        logp = _mstep(counts)
    return sorted(logp.items())


def _estep_counts(
    spark: SparkSession,
    words: DataFrame,
    logp: "dict[str, float]",
    max_piece_len: int,
) -> "dict[str, int]":
    """One hard-EM E-step: Viterbi pieces per distinct word (Arrow
    batch UDF over the bounded word table), exact integer counts via
    one bounded aggregate, collected (vocabulary-bounded)."""
    model = dict(logp)  # captured by the closure, broadcast with the task

    @F.pandas_udf(T.ArrayType(T.StringType()))
    def viterbi_pieces(ws):  # type: ignore[no-untyped-def]
        return ws.map(lambda w: viterbi_segment(w, model, max_piece_len))

    rows = (
        words.select(
            F.explode(viterbi_pieces(F.col("__w"))).alias("__p"),
            F.col("__freq"),
        )
        .groupBy("__p")
        .agg(F.sum("__freq").alias("__cnt"))
        .collect()
    )
    return {r["__p"]: int(r["__cnt"]) for r in rows}


def unigram_encode(
    df: DataFrame,
    model: "list[tuple[str, float]] | dict[str, float]",
    text_col: str = "text",
    out_col: str = "unigram_tokens",
    n_out: str = "n_unigram",
    max_piece_len: int = 4,
) -> DataFrame:
    """Tokenize ``text_col`` with a trained unigram model: per word,
    the Viterbi-best segmentation under the model's log-probs (module
    determinism contract).  ONE Arrow crossing, zero shuffles — the
    same single-scalar-pandas-UDF posture as
    ``functions/inference.score_with_model``."""
    logp = dict(model)

    @F.pandas_udf(T.ArrayType(T.StringType()))
    def encode(texts):  # type: ignore[no-untyped-def]
        def one(t):  # type: ignore[no-untyped-def]
            out = []
            for w in (t or "").split(" "):
                if w:
                    out.extend(viterbi_segment(w, logp, max_piece_len))
            return out

        return texts.map(one)

    return df.select("*", encode(F.col(text_col)).alias(out_col)).withColumn(
        n_out, F.size(F.col(out_col))
    )


def unigram_model_table(
    spark: SparkSession, model: "list[tuple[str, float]]"
) -> DataFrame:
    """The learned model as a (piece, logp) DataFrame — the exportable
    artifact (SentencePiece-model-shaped: piece + score)."""
    return spark.createDataFrame(
        list(model), "piece string, logp double"
    )


def tokenizer_eval(
    df: DataFrame,
    model: "list[tuple[str, float]] | dict[str, float]",
    text_col: str = "text",
    by: str = "lang",
    max_piece_len: int = 4,
) -> DataFrame:
    """Per-group tokenizer QUALITY metrics for a trained subword model
    — the standard evaluation loop closing train -> encode -> eval
    (SentencePiece/BPE papers report exactly these): per ``by`` group,

      n_docs, n_words (whitespace words), n_tokens (subword pieces),
      n_unk (pieces NOT in the model vocabulary — the single-char
      fallbacks the encoder emits for uncovered characters),
      fertility        = round(n_tokens / n_words, 6)   (lower=better)
      chars_per_token  = round(sum(len(piece)) / n_tokens, 6)
      unk_rate         = round(n_unk / n_tokens, 6)

    Character count is the sum of PIECE lengths (pieces partition each
    word exactly, so this equals the group's in-word character mass —
    whitespace never counts, pinned).  Zero-token groups emit NULL
    ratios instead of dividing by zero (ANSI-safe).

    Plan shape / 100 TB posture: one Arrow crossing (the encode), then
    scan-fused JVM expressions (the vocabulary rides the plan as a
    literal array — vocab_size-bounded by construction) and ONE hash
    aggregate on the group key.  Float discipline: every metric is a
    single division of exact integers rounded 6dp — identical doubles
    in any engine.
    """
    logp = dict(model)
    vocab = sorted(logp)
    enc = unigram_encode(
        df, model, text_col=text_col, max_piece_len=max_piece_len
    )
    toks = F.col("unigram_tokens")
    from .text import clean_words_col

    n_words = F.size(clean_words_col(text_col))
    n_unk = F.size(F.filter(toks, lambda t: ~t.isin(vocab)))
    n_chars = F.aggregate(
        F.transform(toks, lambda t: F.length(t)),
        F.lit(0),
        lambda acc, v: acc + v,
    )
    agg = (
        enc.select(
            F.col(by),
            n_words.alias("__w"),
            F.col("n_unigram").alias("__t"),
            n_unk.alias("__u"),
            n_chars.alias("__c"),
        )
        .groupBy(by)
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("__w").alias("n_words"),
            F.sum("__t").alias("n_tokens"),
            F.sum("__u").alias("n_unk"),
            F.sum("__c").alias("__chars"),
        )
    )
    nz = F.col("n_tokens") > 0
    return agg.select(
        by,
        "n_docs",
        "n_words",
        "n_tokens",
        "n_unk",
        F.when(
            F.col("n_words") > 0,
            F.round(F.col("n_tokens") / F.col("n_words"), 6),
        ).alias("fertility"),
        F.when(nz, F.round(F.col("__chars") / F.col("n_tokens"), 6)).alias(
            "chars_per_token"
        ),
        F.when(nz, F.round(F.col("n_unk") / F.col("n_tokens"), 6)).alias(
            "unk_rate"
        ),
    )
