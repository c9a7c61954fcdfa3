"""Bigram-LM perplexity (functions/lm.py) unit checks."""

from __future__ import annotations

import math

from pulsarfeatureextractor_spark.functions.lm import (
    train_bigram_lm,
    with_lm_perplexity,
)


def _ppl(logps):
    s = sum(round(lp, 9) for lp in logps)
    return round(math.exp(-(s / len(logps))), 6)


def test_train_counts_and_vocab(spark):
    docs = spark.createDataFrame(
        [(1, "a b a"), (2, "b a")], "doc_id long, text string"
    )
    bi, ctx, vocab = train_bigram_lm(docs)
    assert {(r["w1"], r["w2"]): r["c"] for r in bi.collect()} == {
        ("a", "b"): 1,
        ("b", "a"): 2,
    }
    assert {r["w1"]: r["cd"] for r in ctx.collect()} == {"a": 1, "b": 2}
    assert vocab.collect()[0]["v"] == 2


def test_perplexity_hand_computed_self_trained(spark):
    docs = spark.createDataFrame(
        [(1, "a b a"), (2, "b a"), (3, "a")], "doc_id long, text string"
    )
    out = {r["doc_id"]: (r["n_bigrams"], r["lm_ppl"])
           for r in with_lm_perplexity(docs).collect()}
    # LM: c(a,b)=1 c(b,a)=2; cd(a)=1 cd(b)=2; V=2
    p_ab, p_ba = 2 / 3, 3 / 4
    assert out[1] == (2, _ppl([math.log(p_ab), math.log(p_ba)]))
    assert out[2] == (1, _ppl([math.log(p_ba)]))
    assert out[3] == (0, None)  # <2 tokens: no bigrams, NULL ppl


def test_perplexity_unseen_bigram_and_context(spark):
    train = spark.createDataFrame([(1, "a b")], "doc_id long, text string")
    score = spark.createDataFrame(
        [(9, "b a"), (10, "c a")], "doc_id long, text string"
    )
    out = {r["doc_id"]: r["lm_ppl"]
           for r in with_lm_perplexity(score, train_df=train).collect()}
    # LM: c(a,b)=1, cd(a)=1, V=2
    # (b,a): context b unseen -> (0+1)/(0+2); (c,a): same shape
    assert out[9] == _ppl([math.log(1 / 2)])
    assert out[10] == _ppl([math.log(1 / 2)])


def test_low_perplexity_for_in_domain_docs(spark):
    # a corpus dominated by one phrase: the conforming doc must score
    # lower perplexity than the outlier
    rows = [(i, "the cat sat") for i in range(20)] + [(99, "zyx qwv jkl")]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r["lm_ppl"]
           for r in with_lm_perplexity(docs).collect()}
    assert out[0] < out[99]


def test_lm_joins_are_broadcast_when_forced(spark):
    """broadcast_lm=True plants explicit broadcast hints on both LM
    sides; the DEFAULT (False) must NOT, because the bigram table grows
    with corpus token diversity — a hard-coded broadcast is an
    executor-OOM trap at scale (round-4 advice).  AQE still picks a
    broadcast join at runtime for small LMs; the static-plan check here
    pins only the hint behavior."""
    docs = spark.createDataFrame(
        [(1, "a b a"), (2, "b a")], "doc_id long, text string"
    )
    plan = (
        with_lm_perplexity(docs, broadcast_lm=True)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert plan.count("BroadcastHashJoin") >= 2
    logical = with_lm_perplexity(docs)._jdf.queryExecution() \
        .optimizedPlan().toString()
    # the only static hint in the default plan is the 1-row vocab size
    assert logical.count("ResolvedHint") <= 1
