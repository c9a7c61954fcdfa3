"""Repeated n-gram span coverage (operators/spans.py) — hand-checked
coverage math, intra-document repetition semantics, short/NULL/empty
documents, min_count, partitioning determinism, and the row-safe
LEFT SEMI plan shape."""

from __future__ import annotations

import pytest

from pulsarfeatureextractor_spark.operators.spans import (
    repeated_ngram_coverage,
)

DOCS = [
    (0, "a b c a b c"),   # "a b"/"b c" repeat (intra + cross) -> full cover
    (1, "a b x"),          # "a b" repeats cross-doc
    (2, "x y z"),          # unique grams only
    (3, None),
    (4, ""),
    (5, "a b c d e"),
    (6, "q r"),            # shorter than n=3: contributes nothing
]


def _docs(spark, rows=DOCS):
    return spark.createDataFrame(rows, "doc_id long, text string")


def _cov(spark, rows=DOCS, **kw):
    return {
        r["doc_id"]: (r["n_tokens"], r["n_dup_grams"], r["dup_tokens"],
                      r["dup_fraction"])
        for r in repeated_ngram_coverage(_docs(spark, rows), **kw).collect()
    }


def test_hand_checked_coverage_n2(spark):
    got = _cov(spark, n=2)
    # doc 0: grams (a b)(b c)(c a)(a b)(b c); "a b" x3 corpus-wide (+doc1,
    # doc5), "b c" x3 (intra + doc5); positions 1,2,4,5 cover tokens 1..6
    assert got[0] == (6, 4, 6, 1.0)
    assert got[1] == (3, 1, 2, 0.666667)
    assert got[2] == (3, 0, 0, 0.0)
    assert got[3] == (0, 0, 0, 0.0)
    assert got[4] == (0, 0, 0, 0.0)
    # doc 5: "a b"(1) "b c"(2) repeat -> tokens 1,2,3 of 5
    assert got[5] == (5, 2, 3, 0.6)
    assert got[6] == (2, 0, 0, 0.0)


def test_intra_document_repetition_counts(spark):
    # a 3-gram repeated only WITHIN one doc still flags (the
    # suffix-array predicate of Lee et al., not a cross-doc-only join)
    got = {
        r["doc_id"]: r["n_dup_grams"]
        for r in repeated_ngram_coverage(
            _docs(spark, [(0, "p q r s p q r"), (1, "z z2 z3")]), n=3
        ).collect()
    }
    # doc 0 grams: (p q r)(q r s)(r s p)(s p q)(p q r) -> "p q r" twice
    assert got[0] == 2 and got[1] == 0


def test_min_count_threshold(spark):
    rows = [(0, "a b c"), (1, "a b d"), (2, "a b e")]  # "a b" occurs 3x
    g2 = _cov(spark, rows, n=2, min_count=2)
    g3 = _cov(spark, rows, n=2, min_count=3)
    g4 = _cov(spark, rows, n=2, min_count=4)
    assert g2[0][1] == 1 and g3[0][1] == 1 and g4[0][1] == 0
    # fixture sanity: only "a b" passes at 2 and 3
    assert {d: v[1] for d, v in g4.items()} == {0: 0, 1: 0, 2: 0}


def test_every_input_doc_appears_once(spark):
    out = repeated_ngram_coverage(_docs(spark), n=3).collect()
    assert sorted(r["doc_id"] for r in out) == [d for d, _ in DOCS]


def test_param_validation(spark):
    d = _docs(spark)
    with pytest.raises(ValueError):
        repeated_ngram_coverage(d, n=0)
    with pytest.raises(ValueError):
        repeated_ngram_coverage(d, min_count=1)


def test_deterministic_across_partitionings(spark):
    base = sorted(map(tuple,
                      repeated_ngram_coverage(_docs(spark), n=2).collect()))
    d13 = _docs(spark).repartition(13)
    assert sorted(map(tuple,
                      repeated_ngram_coverage(d13, n=2).collect())) == base


def test_plan_uses_left_semi_join(spark):
    """The duplicated-gram membership test must be a LEFT SEMI join —
    a hot gram (occurring millions of times) must never multiply
    position rows."""
    plan = (
        repeated_ngram_coverage(_docs(spark), n=3)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "LeftSemi" in plan
