"""Distributed BPE tokenizer training (functions/bpe.py) — merge-order
determinism across partitionings, equivalence with the independent
pure-python twin (tools/gen_value_oracles.py), the published-algorithm
golden, and the scan-only encode plan."""

from __future__ import annotations

import sys

from pyspark.sql import functions as F

from pulsarfeatureextractor_spark.functions.bpe import (
    bpe_encode,
    bpe_merge_table,
    train_bpe,
)

sys.path.insert(0, "/root/repo")
from tools.gen_value_oracles import (  # noqa: E402
    _bpe_twin_encode,
    _bpe_twin_train,
)

TEXTS = [
    "low low low low low",
    "lower lower newest newest",
    "newest newest newest newest",
    "widest widest widest",
]


def _docs(spark, texts=TEXTS):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


def test_matches_published_algorithm_golden(spark):
    """Sennrich et al. 2016's algorithm on the low/lower/newest/widest
    corpus: first merges must build es -> est -> est</w> (the paper's
    worked example family), with the exact tie-break order pinned."""
    merges = train_bpe(_docs(spark), n_merges=10)
    assert merges[:3] == [("e", "s"), ("es", "t"), ("est", "</w>")]
    assert merges == _bpe_twin_train(TEXTS, 10)


def test_merge_order_deterministic_across_partitionings(spark):
    d = _docs(spark)
    base = train_bpe(d, n_merges=12)
    assert train_bpe(d.repartition(1), n_merges=12) == base
    assert train_bpe(d.repartition(13), n_merges=12) == base
    # lineage checkpoint cadence must not affect the result
    assert train_bpe(d, n_merges=12, checkpoint_every=1) == base


def test_encode_matches_twin_token_for_token(spark):
    d = _docs(spark)
    merges = train_bpe(d, n_merges=10)
    got = {r["doc_id"]: r["bpe_tokens"] for r in bpe_encode(d, merges).collect()}
    for i, t in enumerate(TEXTS):
        assert got[i] == _bpe_twin_encode(t, merges)


def test_min_pair_freq_early_stop(spark):
    # every word unique -> every pair count == 1 < min_pair_freq=2 after
    # the shared suffixes are exhausted; training must stop, not loop
    d = _docs(spark, ["ab", "cd", "ef"])
    merges = train_bpe(d, n_merges=50, min_pair_freq=2)
    assert merges == _bpe_twin_train(["ab", "cd", "ef"], 50)
    assert len(merges) < 50


def test_null_empty_and_sep_words(spark):
    texts = [None, "", "a\x1fb aa", "aa aa"]
    d = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    merges = train_bpe(d, n_merges=4, min_pair_freq=2)
    assert merges == _bpe_twin_train(texts, 4)
    # the \x1f word must not have contributed symbols to training
    assert all("\x1f" not in p1 and "\x1f" not in p2 for p1, p2 in merges)
    out = {r["doc_id"]: r["bpe_tokens"] for r in bpe_encode(d, merges).collect()}
    assert out[0] == [] and out[1] == []          # NULL / empty -> no tokens
    assert out[2][0] == "a\x1fb"                  # opaque passthrough, no eow
    assert out[2][1:] == _bpe_twin_encode("aa", merges)


def test_max_words_caps_active_vocabulary(spark):
    texts = ["xx xx xx yy yy zz"]
    d = _docs(spark, texts)
    # top-1 word by (freq desc, word asc) is xx -> only xx-internal
    # merges; tie-break picks (x, </w>) before (x, x) ('<' < 'x')
    merges = train_bpe(d, n_merges=5, max_words=1, min_pair_freq=2)
    assert merges == [("x", "</w>"), ("x", "x</w>")]
    assert merges == _bpe_twin_train(["xx xx xx"], 5)


def test_merge_table_shape(spark):
    t = bpe_merge_table(spark, [("a", "b"), ("ab", "c")])
    rows = {r["rank"]: (r["p1"], r["p2"]) for r in t.collect()}
    assert rows == {0: ("a", "b"), 1: ("ab", "c")}


def test_encode_plan_has_no_exchange(spark):
    """bpe_encode is a pure scan-side expression chain: zero shuffles,
    no Python in the dataflow (the 100 TB posture claim, pinned)."""
    d = _docs(spark)
    merges = train_bpe(d, n_merges=6)
    plan = (
        bpe_encode(d, merges)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan
    assert "Python" not in plan and "ArrowEval" not in plan
