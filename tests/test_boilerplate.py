"""Corpus boilerplate-token removal (functions/text.py
boilerplate_tokens / remove_boilerplate) unit checks."""

from __future__ import annotations

import pytest

from pulsarfeatureextractor_spark.functions.text import (
    boilerplate_tokens,
    remove_boilerplate,
)


def _docs(spark):
    # "the" in 4/4 docs, "cat" in 3/4, "dog" in 2/4, rest rarer
    return spark.createDataFrame(
        [
            (1, "the cat sat on the mat"),
            (2, "the cat ate"),
            (3, "the dog and the cat"),
            (4, "the dog barked loudly"),
        ],
        "doc_id long, text string",
    )


def test_boilerplate_tokens_integer_ratio_cut(spark):
    docs = _docs(spark)
    # >=75% of 4 docs -> dfc >= 3: {the:4, cat:3}
    got = {r["token"]: r["dfc"] for r in
           boilerplate_tokens(docs, ratio=(3, 4)).collect()}
    assert got == {"the": 4, "cat": 3}
    # exact boundary is inclusive: dfc*2 >= n*1 keeps dfc==2
    got50 = {r["token"] for r in
             boilerplate_tokens(docs, ratio=(1, 2)).collect()}
    assert got50 == {"the", "cat", "dog"}


def test_boilerplate_tokens_min_docs(spark):
    docs = _docs(spark)
    # ratio (1,100) admits everything by frequency; min_docs prunes
    got = {r["token"] for r in
           boilerplate_tokens(docs, ratio=(1, 100), min_docs=2).collect()}
    assert got == {"the", "cat", "dog"}


def test_remove_boilerplate_preserves_order_and_multiplicity(spark):
    docs = _docs(spark)
    out = {r["doc_id"]: (r["clean_text"], r["n_kept"])
           for r in remove_boilerplate(docs, ratio=(3, 4)).collect()}
    assert out == {
        1: ("sat on mat", 3),      # both "the" occurrences dropped
        2: ("ate", 1),
        3: ("dog and", 2),
        4: ("dog barked loudly", 3),
    }


def test_remove_boilerplate_all_boilerplate_doc_yields_empty(spark):
    docs = spark.createDataFrame(
        [(1, "a a"), (2, "a b"), (3, "a")],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: (r["clean_text"], r["n_kept"])
           for r in remove_boilerplate(docs, ratio=(1, 1)).collect()}
    # "a" in 3/3 docs -> removed everywhere; doc 1 and 3 become empty
    assert out == {1: ("", 0), 2: ("b", 1), 3: ("", 0)}


def test_remove_boilerplate_no_frequent_tokens_is_identity(spark):
    docs = spark.createDataFrame(
        [(1, "x y"), (2, "z w")], "doc_id long, text string"
    )
    out = {r["doc_id"]: r["clean_text"]
           for r in remove_boilerplate(docs, ratio=(1, 2)).collect()}
    assert out == {1: "x y", 2: "z w"}


def test_remove_boilerplate_guard_raises_on_oversized_set(spark):
    docs = _docs(spark)
    with pytest.raises(ValueError, match="max_frequent"):
        remove_boilerplate(docs, ratio=(1, 100), min_docs=1, max_frequent=2)


def test_boilerplate_tokens_rejects_bad_ratio(spark):
    docs = _docs(spark)
    with pytest.raises(ValueError, match="ratio"):
        boilerplate_tokens(docs, ratio=(0, 2))


def test_remove_boilerplate_zero_shuffle_plan(spark):
    """The removal itself must be scan-fused: the OUTPUT plan carries
    no Exchange (the vocabulary agg ran eagerly at construction)."""
    docs = _docs(spark)
    out = remove_boilerplate(docs, ratio=(3, 4))
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
