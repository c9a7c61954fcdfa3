"""In-engine multinomial Naive Bayes (functions/nb.py) — model values
pinned against an independent Counter/math twin, the OOV-skip /
zero-token-prior / tie-break semantics, partitioning determinism, the
integer-alpha contract, and the no-Python plan shape."""

from __future__ import annotations

import math
from collections import Counter
from decimal import Decimal

import pytest

from pulsarfeatureextractor_spark.functions.nb import classify_nb, train_nb

FIX = [
    (1, "a b a c", "en"),
    (2, "a b b", "en"),
    (3, "x y x", "fr"),
    (4, "x y y z", "fr"),
    (5, "a x", "en"),
    (6, "", "fr"),        # zero tokens -> prior-only prediction
    (7, None, "en"),      # NULL text == ''
]


def _fixture(spark, parts=2):
    return spark.createDataFrame(
        FIX, "doc_id long, text string, lang string"
    ).repartition(parts)


def _twin_model(alpha=1):
    cnt, tot, nd = Counter(), Counter(), Counter()
    for _id, t, l in FIX:
        nd[l] += 1
        for w in (t or "").split(" "):
            if w:
                cnt[(l, w)] += 1
                tot[l] += 1
    vocab = sorted({t for (_, t) in cnt})
    v = len(vocab)
    model = {
        (l, t): (
            cnt[(l, t)],
            round(math.log((cnt[(l, t)] + alpha) / float(tot[l] + alpha * v)), 9),
        )
        for l in nd
        for t in vocab
    }
    priors = {l: round(math.log(nd[l] / float(len(FIX))), 9) for l in nd}
    return model, priors, vocab


def test_model_matches_twin(spark):
    m = train_nb(_fixture(spark), "text", "lang").collect()
    twin, priors, vocab = _twin_model()
    assert len(m) == 2 * len(vocab)  # complete grid incl. zero counts
    for r in m:
        c, lc = twin[(r.label, r.token)]
        assert r.cnt == c
        assert float(r.log_cond) == lc
        assert float(r.log_prior) == priors[r.label]


def test_classify_semantics(spark):
    df = _fixture(spark)
    model = train_nb(df, "text", "lang")
    out = {r.doc_id: r for r in classify_nb(df, model).collect()}
    # the planted corpus separates cleanly on its own vocabulary
    assert out[1].nb_pred == "en" and out[3].nb_pred == "fr"
    # zero-token docs predict by prior alone: P(en)=4/7 > P(fr)=3/7
    for d in (6, 7):
        assert out[d].nb_pred == "en" and out[d].n_tok_nb == 0
        assert out[d].nb_score == float(
            Decimal(str(round(math.log(4 / 7), 9)))
        )


def test_oov_tokens_skipped(spark):
    df = _fixture(spark)
    model = train_nb(df, "text", "lang")
    new = spark.createDataFrame(
        [(10, "a UNSEEN b WAT")], "doc_id long, text string"
    )
    out = classify_nb(new, model).collect()[0]
    # only 'a' and 'b' are in-vocabulary; the two OOV tokens carry none
    assert out.n_tok_nb == 2 and out.nb_pred == "en"


def test_tiebreak_smallest_label(spark):
    # perfectly symmetric corpus: both classes score identically on
    # 'm' -> the pinned tie-break picks the lexicographically smallest
    df = spark.createDataFrame(
        [(1, "m", "bb"), (2, "m", "aa")], "doc_id long, text string, lang string"
    )
    model = train_nb(df, "text", "lang")
    out = classify_nb(
        spark.createDataFrame([(9, "m")], "doc_id long, text string"), model
    ).collect()[0]
    assert out.nb_pred == "aa"


def test_partitioning_determinism(spark):
    a = classify_nb(
        _fixture(spark, 1), train_nb(_fixture(spark, 1), "text", "lang")
    ).orderBy("doc_id").collect()
    b = classify_nb(
        _fixture(spark, 7), train_nb(_fixture(spark, 7), "text", "lang")
    ).orderBy("doc_id").collect()
    assert a == b


def test_alpha_must_be_positive_integer(spark):
    with pytest.raises(ValueError):
        train_nb(_fixture(spark), "text", "lang", alpha=0)
    with pytest.raises(ValueError):
        train_nb(_fixture(spark), "text", "lang", alpha=0.5)
    # alpha=2 shifts the smoothing exactly as the twin predicts
    m = {
        (r.label, r.token): float(r.log_cond)
        for r in train_nb(_fixture(spark), "text", "lang", alpha=2).collect()
    }
    twin, _, _ = _twin_model(alpha=2)
    assert all(m[k] == v for k, (_, v) in twin.items())


def test_keep_scores_table(spark):
    df = _fixture(spark)
    full = classify_nb(df, train_nb(df, "text", "lang"), keep_scores=True)
    rows = full.collect()
    assert len(rows) == len(FIX) * 2  # every (doc, label) pair present
    assert set(full.columns) == {"doc_id", "label", "nb_score", "n_tok_nb"}


def test_no_python_in_plans(spark):
    df = _fixture(spark)
    model = train_nb(df, "text", "lang")
    for frame in (model, classify_nb(df, model)):
        plan = frame._jdf.queryExecution().executedPlan().toString()
        assert "Python" not in plan  # pure JVM end-to-end


def test_null_labels_excluded(spark):
    """Unlabeled (NULL-label) rows contribute NOTHING to training —
    no class, no vocabulary, no prior mass.  Before the fix they
    inflated the prior denominator while forming no class (NULL-label
    grid rows dropped at the priors equi-join), so priors no longer
    summed to 1."""
    rows = [
        (1, "a b", "en"), (2, "a q", None), (3, "b c", "fr"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    m = train_nb(df, "text", "lang")
    vocab = {r.token for r in m.collect()}
    assert "q" not in vocab  # unlabeled doc's token never enters V
    priors = {
        r.label: float(r.log_prior)
        for r in m.select("label", "log_prior").distinct().collect()
    }
    # two labeled docs -> each prior ln(1/2), summing to 1
    assert priors == {
        "en": round(math.log(1 / 2), 9),
        "fr": round(math.log(1 / 2), 9),
    }


def test_empty_training_degrades_gracefully(spark):
    """An empty (or fully filtered-out) training stage yields an empty
    model; classification against it returns zero rows (no priors to
    attach), so a CLI semi-join gate keeps nothing instead of
    crashing."""
    empty = spark.createDataFrame([], "doc_id long, text string, lang string")
    m = train_nb(empty, "text", "lang")
    assert m.count() == 0
    some = spark.createDataFrame([(1, "a b")], "doc_id long, text string")
    assert classify_nb(some, m).count() == 0


def test_zero_token_label(spark):
    """A label whose training docs are all empty still participates:
    grid rows with tot=0 (uniform ln(alpha/(alpha*V)) conditionals)
    and its prior — a zero-in-vocab doc can be predicted as it.
    Before the fix the label silently vanished from the model (grid
    derived from token totals instead of priors)."""
    rows = [
        (1, "", "aa"), (2, None, "aa"), (3, "", "aa"),  # zero tokens
        (4, "x", "bb"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    m = train_nb(df, "text", "lang")
    labels = {r.label for r in m.collect()}
    assert labels == {"aa", "bb"}  # 'aa' keeps its grid rows
    aa = [r for r in m.collect() if r.label == "aa"][0]
    # tot=0, V=1 -> ln(1/1) = 0 conditionals; prior ln(3/4)
    assert float(aa.log_cond) == 0.0
    assert float(aa.log_prior) == round(math.log(3 / 4), 9)
    out = {r.doc_id: r for r in classify_nb(df, m).collect()}
    # zero-in-vocab docs go to the majority PRIOR: 'aa' (3/4 > 1/4)
    assert out[1].nb_pred == "aa" and out[1].n_tok_nb == 0
    # the 'x' doc: bb has the evidence ln(2/2)=0 vs aa's ln(1/1)=0 —
    # equal conditionals, so the prior decides: aa wins 3/4
    assert out[4].nb_pred == "aa"
