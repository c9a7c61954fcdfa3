"""WordPiece tokenizer training (functions/wordpiece.py) — twin
equivalence (merges with scores, vocab, encode), the likelihood-vs-
frequency merge rule, greedy longest-match semantics, UNK/NULL edges,
partitioning determinism, and the single-Arrow-crossing encode plan."""

from __future__ import annotations

import sys

from pulsarfeatureextractor_spark.functions.wordpiece import (
    greedy_longest_match,
    train_wordpiece,
    wordpiece_encode,
    wordpiece_vocab_table,
)

sys.path.insert(0, "/root/repo")
from tools.gen_value_oracles import (  # noqa: E402
    _bpe_twin_train,
    _wp_twin_encode,
    _wp_twin_train,
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


def test_merges_and_vocab_match_twin(spark):
    got_m, got_v = train_wordpiece(_docs(spark), n_merges=12)
    want_m, want_v = _wp_twin_train(TEXTS, n_merges=12)
    assert [(p1, p2) for p1, p2, _ in got_m] == [
        (p1, p2) for p1, p2, _ in want_m
    ]
    # scores are the same doubles (one division over exact ints)
    assert [s for _, _, s in got_m] == [s for _, _, s in want_m]
    assert got_v == want_v


def test_likelihood_rule_differs_from_bpe(spark):
    """A frequent pair of frequent symbols must lose to a rarer pair
    of rare symbols — the defining WordPiece-vs-BPE behavior."""
    # "a b" appears 6x but a,b are everywhere (low score); "x y" only
    # 3x but x,y occur nowhere else (score 3/(3*3) >> 6/(10*8))
    texts = ["ab ab ab ab ab ab xy xy xy", "ba ba ab a b"]
    wp, _ = train_wordpiece(_docs(spark, texts), n_merges=1)
    bpe = _bpe_twin_train(texts, n_merges=1)
    assert (wp[0][0], wp[0][1]) != bpe[0]


def test_deterministic_across_partitionings(spark):
    d = _docs(spark)
    base = train_wordpiece(d, n_merges=12)
    assert train_wordpiece(d.repartition(1), n_merges=12) == base
    assert train_wordpiece(d.repartition(13), n_merges=12) == base


def test_encode_matches_twin_token_for_token(spark):
    d = _docs(spark)
    _m, vocab = train_wordpiece(d, n_merges=12)
    got = {
        r["doc_id"]: r["wp_tokens"]
        for r in wordpiece_encode(d, vocab).collect()
    }
    vs = set(vocab)
    for i, t in enumerate(TEXTS):
        assert got[i] == _wp_twin_encode(t, vs)
        # pieces re-concatenate to the original words + eow markers
        assert "".join(got[i]).replace("</w>", "") == t.replace(" ", "")


def test_greedy_longest_match_contract():
    vocab = {"ab", "abc", "c</w>", "b"}
    # longest wins: "abc" beats "ab"; unseen atom passes through
    assert greedy_longest_match("abcc", vocab) == ["abc", "c</w>"]
    assert greedy_longest_match("qab", vocab) == ["q", "ab", "</w>"]
    assert _wp_twin_encode("abcc qab", vocab) == [
        "abc", "c</w>", "q", "ab", "</w>"
    ]


def test_null_and_empty_text(spark):
    texts = [None, "", "aa aa bb"]
    d = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    m, vocab = train_wordpiece(d, n_merges=4)
    tm, tv = _wp_twin_train(texts, n_merges=4)
    assert m == tm and vocab == tv
    out = {r["doc_id"]: r["wp_tokens"]
           for r in wordpiece_encode(d, vocab).collect()}
    assert out[0] == [] and out[1] == []
    assert "".join(out[2]).replace("</w>", "") == "aaaabb"


def test_vocab_table_shape(spark):
    t = wordpiece_vocab_table(spark, ["a", "ab</w>"])
    assert sorted(r["piece"] for r in t.collect()) == ["a", "ab</w>"]


def test_encode_plan_single_arrow_crossing_no_exchange(spark):
    d = _docs(spark)
    _m, vocab = train_wordpiece(d, n_merges=8)
    plan = (
        wordpiece_encode(d, vocab)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan
    assert plan.count("ArrowEvalPython") == 1
