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


def test_kneser_ney_hand_computed_self_trained(spark):
    docs = spark.createDataFrame(
        [(1, "a b a"), (2, "b a"), (3, "a")], "doc_id long, text string"
    )
    out = {r["doc_id"]: (r["n_bigrams"], r["lm_ppl_kn"])
           for r in with_lm_perplexity(
               docs, smoothing="kneser_ney", out_col="lm_ppl_kn"
           ).collect()}
    # bi: c(a,b)=1 c(b,a)=2; ctxk: a->(cd 1, n1fw 1), b->(cd 2, n1fw 1)
    # cont: n1bw(b)=1, n1bw(a)=1; nt=2 types; V=2
    pc_b = (1 + 1) / float(2 + 2 + 1)   # 0.4
    pc_a = (1 + 1) / float(2 + 2 + 1)
    d = 0.75
    p_ab = max(1 - d, 0) / 1.0 + ((d * 1) / 1.0) * pc_b
    p_ba = max(2 - d, 0) / 2.0 + ((d * 1) / 2.0) * pc_a
    assert out[1] == (2, _ppl([math.log(p_ab), math.log(p_ba)]))
    assert out[2] == (1, _ppl([math.log(p_ba)]))
    assert out[3] == (0, None)


def test_kneser_ney_unseen_context_backs_off_to_continuation(spark):
    train = spark.createDataFrame([(1, "a b")], "doc_id long, text string")
    score = spark.createDataFrame([(9, "q b")], "doc_id long, text string")
    out = with_lm_perplexity(
        score, train_df=train, smoothing="kneser_ney", out_col="k"
    ).collect()[0]
    # context 'q' unseen -> p = pcont(b) = (1+1)/(1 types + 2 vocab + 1)
    assert out["k"] == _ppl([math.log(2 / 4.0)])


def test_kneser_ney_differs_from_add1_and_orders_same_docs(spark):
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(
            ["a b a b a b", "a b q z", "z q z q"])],
        "doc_id long, text string",
    )
    a1 = {r["doc_id"]: r["lm_ppl"]
          for r in with_lm_perplexity(docs).collect()}
    kn = {r["doc_id"]: r["k"]
          for r in with_lm_perplexity(
              docs, smoothing="kneser_ney", out_col="k").collect()}
    assert a1 != kn  # genuinely different estimator (and it even
    # ranks docs differently: KN rewards deterministic continuations)
    # the mixed out-of-pattern doc is highest-perplexity under BOTH
    assert max(a1, key=a1.get) == 1 and max(kn, key=kn.get) == 1


def test_kneser_ney_probability_mass_bounded(spark):
    """For each seen context, the discounted+backoff mass over the
    SEEN vocabulary stays <= 1 (the discount frees exactly the mass
    the backoff term redistributes)."""
    docs = spark.createDataFrame(
        [(1, "a b a c a b"), (2, "c a b a")], "doc_id long, text string"
    )
    from pulsarfeatureextractor_spark.functions.lm import (
        _bigrams, _words, train_bigram_lm,
    )
    bi, _ctx, _v = train_bigram_lm(docs)
    rows = bi.collect()
    c = {(r["w1"], r["w2"]): r["c"] for r in rows}
    cd = {}
    n1fw = {}
    for (w1, _w2), cnt in c.items():
        cd[w1] = cd.get(w1, 0) + cnt
        n1fw[w1] = n1fw.get(w1, 0) + 1
    n1bw = {}
    for (_w1, w2) in c:
        n1bw[w2] = n1bw.get(w2, 0) + 1
    nt = len(c)
    vocab = {w for p in c for w in p}
    v = len(vocab)
    d = 0.75
    for w1 in cd:
        mass = 0.0
        for w2 in vocab:
            pc = (n1bw.get(w2, 0) + 1) / float(nt + v + 1)
            mass += (max(c.get((w1, w2), 0) - d, 0) / cd[w1]
                     + ((d * n1fw[w1]) / cd[w1]) * pc)
        assert mass <= 1.0 + 1e-12


def test_kneser_ney_validation(spark):
    docs = spark.createDataFrame([(1, "a b")], "doc_id long, text string")
    import pytest
    with pytest.raises(ValueError):
        with_lm_perplexity(docs, smoothing="nope")
    with pytest.raises(ValueError):
        with_lm_perplexity(docs, smoothing="kneser_ney", discount=1.5)
