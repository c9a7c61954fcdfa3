"""Tokenizer model artifact round-trips: each learner's exportable
model table (BPE merges, unigram (piece, logp), WordPiece vocab)
written to parquet, reloaded in a fresh DataFrame, and driven through
the same encoder — token-for-token equal to encoding with the
in-memory model.  This is the persistence contract a production
pipeline relies on (train once, tokenize for months)."""

from __future__ import annotations

import os
import tempfile

from pulsarfeatureextractor_spark.functions.bpe import (
    bpe_encode,
    bpe_merge_table,
    train_bpe,
)
from pulsarfeatureextractor_spark.functions.unigram import (
    train_unigram,
    unigram_encode,
    unigram_model_table,
)
from pulsarfeatureextractor_spark.functions.wordpiece import (
    train_wordpiece,
    wordpiece_encode,
    wordpiece_vocab_table,
)

TEXTS = [
    "low low low low low",
    "lower lower newest newest",
    "newest newest newest newest",
    "widest widest widest",
]


def _docs(spark):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(TEXTS)], "doc_id long, text string"
    )


def _toks(df, col):
    return {r["doc_id"]: r[col] for r in df.collect()}


def test_bpe_model_roundtrip(spark):
    d = _docs(spark)
    merges = train_bpe(d, n_merges=10)
    want = _toks(bpe_encode(d, merges), "bpe_tokens")
    with tempfile.TemporaryDirectory() as tmp:
        path = os.path.join(tmp, "bpe_model")
        bpe_merge_table(spark, merges).write.parquet(path)
        back = [
            (r["p1"], r["p2"])
            for r in spark.read.parquet(path).orderBy("rank").collect()
        ]
    assert back == merges  # rank column preserves learned order
    assert _toks(bpe_encode(d, back), "bpe_tokens") == want


def test_unigram_model_roundtrip(spark):
    d = _docs(spark)
    model = train_unigram(d, vocab_size=16, seed_max_pieces=48)
    want = _toks(unigram_encode(d, model), "unigram_tokens")
    with tempfile.TemporaryDirectory() as tmp:
        path = os.path.join(tmp, "uni_model")
        unigram_model_table(spark, model).write.parquet(path)
        back = sorted(
            (r["piece"], r["logp"])
            for r in spark.read.parquet(path).collect()
        )
    assert back == model  # exact float logp survives parquet
    assert _toks(unigram_encode(d, back), "unigram_tokens") == want


def test_wordpiece_model_roundtrip(spark):
    d = _docs(spark)
    _merges, vocab = train_wordpiece(d, n_merges=10)
    want = _toks(wordpiece_encode(d, vocab), "wp_tokens")
    with tempfile.TemporaryDirectory() as tmp:
        path = os.path.join(tmp, "wp_model")
        wordpiece_vocab_table(spark, vocab).write.parquet(path)
        back = sorted(
            r["piece"] for r in spark.read.parquet(path).collect()
        )
    assert back == vocab
    assert _toks(wordpiece_encode(d, back), "wp_tokens") == want
