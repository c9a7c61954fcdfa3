"""Distributed WordPiece subword tokenizer TRAINING and encoding — the
third standard subword learner (Schuster & Nakajima 2012; the BERT
tokenizer's trainer), completing the triad whose other members are
``functions/bpe.py`` (frequency-scored merges) and
``functions/unigram.py`` (unigram-LM pruning).

WordPiece differs from BPE in exactly one place: the merge rule picks
the adjacent pair maximizing the LIKELIHOOD score

    score(a, b) = count(ab) / (count(a) * count(b))

— i.e. the pair whose merge most increases corpus likelihood under a
unigram model — instead of the raw pair count.  Everything else (the
word-frequency table, the wrapped-symbol string state, the greedy
left-to-right merge pass) is shared with ``train_bpe``, and this
module imports that machinery rather than re-implementing it.

Per merge round over the VOCABULARY-bounded word table:
one symbol-count aggregate (explode current tokens), one pair-count
aggregate, a bounded join of the two, and a 1-row argmax collect by
(score desc, p1 asc, p2 asc).  Counts are exact integers; the score
is one double division ``cnt / (c1 * c2)`` computed identically by
the pure-python twin (``tools/gen_value_oracles._wp_twin_train``), so
the learned merge list is partitioning-independent and twin-exact.
(At extreme corpus sizes ``c1 * c2`` is computed in doubles — never
an integer overflow, at worst a rounded score, identically rounded on
both sides.)

Encoding follows published WordPiece INFERENCE semantics: greedy
longest-match-first against the final symbol vocabulary over each
word's atom sequence (chars + the end-of-word marker as one atom);
an atom with no vocabulary entry passes through as itself (UNK
passthrough, total function).  One Arrow-batched pandas UDF — one
crossing, zero shuffles (the ``unigram_encode`` posture); Python is
justified because greedy longest-match is an iterative per-word loop,
and at 100 TB it is a pure map.

100 TB posture: identical to ``train_bpe`` — ONE corpus-scale shuffle
(the word-count aggregate), then every round touches only the bounded
word table; all collects are 1-row argmaxes or the bounded final
vocabulary.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from pulsarfeatureextractor_spark.functions.bpe import (
    _SEP,
    EOW,
    _apply_merge,
    _tokens_of,
    _word_state,
)

__all__ = ["train_wordpiece", "wordpiece_encode", "wordpiece_vocab_table"]


def train_wordpiece(
    df: DataFrame,
    text_col: str = "text",
    n_merges: int = 24,
    min_pair_freq: int = 2,
    max_words: "int | None" = None,
    eow: str = EOW,
    checkpoint_every: int = 8,
) -> "tuple[list[tuple[str, str, float]], list[str]]":
    """Learn ``n_merges`` WordPiece merges; returns
    ``(merges, vocab)`` — merges as ordered ``(p1, p2, score)`` tuples
    and vocab as the sorted final symbol list (both metadata-sized).

    Stops early when no remaining pair reaches ``min_pair_freq`` total
    corpus-weighted occurrences."""
    state = _word_state(df, text_col, max_words, eow)

    merges: "list[tuple[str, str, float]]" = []
    for r in range(int(n_merges)):
        toks = _tokens_of(F.col("__s"))
        tok_tbl = state.select(
            F.col("__freq"), toks.alias("__toks")
        )
        syms = (
            tok_tbl.select(
                F.col("__freq"), F.explode(F.col("__toks")).alias("sym")
            )
            .groupBy("sym")
            .agg(F.sum("__freq").alias("c"))
        )
        pairs = F.expr(
            "transform(slice(__toks, 1, size(__toks) - 1),"
            " (x, i) -> struct(x AS p1, element_at(__toks, i + 2) AS p2))"
        )
        best = (
            tok_tbl.where(F.size(F.col("__toks")) >= 2)
            .select(F.col("__freq"), F.explode(pairs).alias("__p"))
            .groupBy(F.col("__p.p1").alias("p1"), F.col("__p.p2").alias("p2"))
            .agg(F.sum("__freq").alias("cnt"))
            .where(F.col("cnt") >= min_pair_freq)
            .join(syms.withColumnRenamed("sym", "p1")
                      .withColumnRenamed("c", "c1"), ["p1"])
            .join(syms.withColumnRenamed("sym", "p2")
                      .withColumnRenamed("c", "c2"), ["p2"])
            .select(
                "p1", "p2",
                (F.col("cnt")
                 / (F.col("c1").cast("double") * F.col("c2").cast("double"))
                 ).alias("score"),
            )
            .orderBy(F.col("score").desc(), F.col("p1").asc(),
                     F.col("p2").asc())
            .limit(1)
            .collect()  # exactly ONE row: the likelihood argmax
        )
        if not best:
            break
        p1, p2, sc = best[0]["p1"], best[0]["p2"], float(best[0]["score"])
        merges.append((p1, p2, sc))
        state = state.select(
            _apply_merge(F.col("__s"), p1, p2).alias("__s"), F.col("__freq")
        )
        if (r + 1) % max(checkpoint_every, 1) == 0:
            state = state.localCheckpoint(eager=True)

    vocab = sorted(
        r["sym"]
        for r in state.select(
            F.explode(_tokens_of(F.col("__s"))).alias("sym")
        ).distinct().collect()
    )
    return merges, vocab


def greedy_longest_match(word: str, vocab: "set[str]",
                         eow: str = EOW) -> "list[str]":
    """Greedy longest-match-first WordPiece segmentation of one word's
    atom sequence (chars + eow atom) against ``vocab``; an atom with
    no vocabulary candidate passes through as itself.  Pure function —
    the engine's encode UDF and the oracle twin both defer to THIS
    spec (the twin re-implements it independently)."""
    atoms = list(word) + [eow]
    out: "list[str]" = []
    i, n = 0, len(atoms)
    while i < n:
        best_j = i + 1
        piece = atoms[i]
        cand, j = atoms[i], i + 1
        while j < n:
            cand = cand + atoms[j]
            j += 1
            if cand in vocab:
                piece, best_j = cand, j
        out.append(piece)
        i = best_j
    return out


def wordpiece_encode(
    df: DataFrame,
    vocab: "list[str] | set[str]",
    text_col: str = "text",
    out_col: str = "wp_tokens",
    n_out: str = "n_wp",
    eow: str = EOW,
) -> DataFrame:
    """Tokenize ``text_col`` by greedy longest-match against a trained
    WordPiece vocabulary.  ONE Arrow crossing, zero shuffles.  Words
    containing U+001F pass through as single opaque symbols."""
    vset = set(vocab)

    @F.pandas_udf(T.ArrayType(T.StringType()))
    def encode(texts):  # type: ignore[no-untyped-def]
        def one(t):  # type: ignore[no-untyped-def]
            out = []
            for w in (t or "").split(" "):
                if not w:
                    continue
                if _SEP in w:
                    out.append(w)
                    continue
                out.extend(greedy_longest_match(w, vset, eow))
            return out

        return texts.map(one)

    return df.select("*", encode(F.col(text_col)).alias(out_col)).withColumn(
        n_out, F.size(F.col(out_col))
    )


def wordpiece_vocab_table(spark: SparkSession,
                          vocab: "list[str]") -> DataFrame:
    """The learned vocabulary as a 1-column DataFrame — the exportable
    artifact a downstream tokenizer runtime consumes."""
    return spark.createDataFrame([(v,) for v in vocab], "piece string")
