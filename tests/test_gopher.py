"""Gopher quality rules (functions/text.gopher_rules, Rae et al. 2021
A1.1 word-level subset) — rule boundaries, distinct-stopword
semantics, symbol counting, NULL/empty text, and the zero-shuffle
scan-fused plan."""

from __future__ import annotations

from pulsarfeatureextractor_spark.functions.text import (
    GOPHER_STOPWORDS,
    gopher_rules,
)

LONG = " ".join(["the", "of"] + ["word"] * 58)  # 60 words, 2 stopwords


def _rows(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def _run(spark, rows, **kw):
    return {
        r["doc_id"]: r.asDict()
        for r in gopher_rules(_rows(spark, rows), **kw).collect()
    }


def test_keep_requires_all_rules(spark):
    rows = [
        (0, LONG),                              # passes everything
        (1, " ".join(["word"] * 60)),           # no stopwords
        (2, "the of " + "word " * 10),          # too short (12 words)
        (3, " ".join(["the", "of"] + ["aa"] * 58)),  # mean len 2.2 < 3
    ]
    got = _run(spark, rows)
    assert got[0]["gopher_keep"] is True
    assert got[1]["gopher_keep"] is False and got[1]["stop_hits"] == 0
    assert got[2]["gopher_keep"] is False and got[2]["n_words"] == 12
    assert got[3]["gopher_keep"] is False
    assert got[3]["mean_word_len_g"] < 3.0


def test_stop_hits_count_distinct_words(spark):
    # "the" repeated 30x is ONE distinct stopword -> fails min 2
    rows = [(0, " ".join(["the"] * 30 + ["word"] * 30))]
    got = _run(spark, rows)
    assert got[0]["stop_hits"] == 1 and got[0]["gopher_keep"] is False
    assert set(GOPHER_STOPWORDS) == {
        "the", "be", "to", "of", "and", "that", "have", "with"
    }


def test_symbol_ratio_counts_hash_and_ellipsis(spark):
    # 10 '#' words + 5 '...' words in a 60-word doc: symbols = 10+5
    body = ["the", "of"] + ["word"] * 43 + ["#"] * 10 + ["..."] * 5
    got = _run(spark, [(0, " ".join(body))])
    assert got[0]["n_words"] == 60
    assert got[0]["symbol_ratio"] == 0.25
    assert got[0]["gopher_keep"] is False  # 0.25 > 0.1


def test_alpha_fraction(spark):
    # 30 numeric words of 60 -> alpha_frac 0.5 < 0.8
    body = ["the", "of"] + ["word"] * 28 + ["12345"] * 30
    got = _run(spark, [(0, " ".join(body))])
    assert got[0]["alpha_frac"] == 0.5
    assert got[0]["gopher_keep"] is False


def test_null_and_empty_text(spark):
    got = _run(spark, [(0, None), (1, "")])
    for d in (0, 1):
        assert got[d]["n_words"] == 0
        assert got[d]["mean_word_len_g"] is None
        assert got[d]["alpha_frac"] is None
        assert got[d]["symbol_ratio"] is None
        assert got[d]["gopher_keep"] is False


def test_thresholds_are_parameters(spark):
    got = _run(spark, [(0, "the of word word")], min_words=3,
               min_stop_hits=2)
    assert got[0]["gopher_keep"] is True


def test_plan_scan_fused_no_exchange(spark):
    plan = (
        gopher_rules(_rows(spark, [(0, LONG)]))
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan
    assert "Python" not in plan
