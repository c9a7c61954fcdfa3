"""Single-pass data-quality expectations (functions/quality_checks.py):
metric values vs hand counts, verdict rendering, and the one-scan /
no-extra-shuffle plan shape for the non-distinct rule set."""

from __future__ import annotations

from pulsarfeatureextractor_spark.functions import quality_checks as qc

SCHEMA = "doc_id long, text string, n_chars long, lang string"
DIRTY = [
    (1, "a", 1, "en"),
    (2, None, 5, "xx"),
    (2, "c", -2, "EN"),
    (4, "d", 7, None),
    (None, "e", 3, "fr"),
]
RULES = [
    qc.expect_not_null("text"),
    qc.expect_unique("doc_id"),
    qc.expect_in_range("n_chars", 0, 100),
    qc.expect_matches("lang", "^[a-z]{2}$"),
    qc.expect_in_set("lang", ["en", "fr", "xx"]),
]


def test_metrics_hand_counts(spark):
    df = spark.createDataFrame(DIRTY, SCHEMA)
    row = qc.expectation_metrics(df, RULES).first().asDict()
    assert row == {
        "n_rows": 5,
        "text_null_count": 1,
        "doc_id_distinct_count": 3,   # {1, 2, 4}
        "doc_id_nonnull_count": 4,    # the dup counts twice
        "n_chars_out_of_range_count": 1,   # -2
        "lang_regex_violation_count": 2,   # 'EN' (case-sensitive), NULL
        "lang_out_of_set_count": 2,        # 'EN', NULL
    }


def test_verdicts_fail_then_pass(spark):
    dirty = spark.createDataFrame(DIRTY, SCHEMA)
    res = qc.validate_expectations(dirty, RULES)
    assert not res["passed"]
    assert set(res["failures"]) == {r.name for r in RULES}

    clean = spark.createDataFrame(
        [(1, "a", 1, "en"), (2, "b", 5, "fr"), (3, "c", 0, "xx")], SCHEMA
    )
    res = qc.validate_expectations(clean, RULES)
    assert res["passed"] and res["failures"] == []
    assert res["metrics"]["n_rows"] == 3


def test_unique_approx_posture(spark):
    """exact=False keeps the single-pass plan (HLL) and passes on
    unique keys within its tolerance."""
    df = spark.range(0, 10_000).withColumnRenamed("id", "k")
    res = qc.validate_expectations(df, [qc.expect_unique("k", exact=False)])
    assert res["passed"], res


def test_single_pass_plan_shape(spark, tmp_path):
    """Without an exact-uniqueness rule every expectation is a
    conditional sum: the whole rule set is ONE scan + partial/final
    agg — zero Exchange hashpartitioning, one SinglePartition gather,
    and the scan reads only the referenced columns."""
    p = str(tmp_path / "docs")
    spark.createDataFrame(DIRTY, SCHEMA).write.parquet(p)
    df = spark.read.parquet(p)
    rules = [
        qc.expect_not_null("text"),
        qc.expect_unique("doc_id", exact=False),
        qc.expect_in_range("n_chars", 0, 100),
        qc.expect_matches("lang", "^[a-z]{2}$"),
    ]
    out = qc.expectation_metrics(df, rules)
    out.collect()
    # AQE's executed-plan string repeats operators under "== Initial
    # Plan ==" — pin the FINAL plan section only
    plan = (out._jdf.queryExecution().executedPlan().toString()
            .split("== Initial Plan ==")[0])
    assert plan.count("Exchange hashpartitioning") == 0, plan
    assert plan.count("Exchange SinglePartition") == 1, plan
    assert plan.count("Scan parquet") == 1, plan


def test_exact_unique_plan_pays_one_keyed_exchange(spark, tmp_path):
    """PINNED CONTRACT (expect_unique docstring): exact=True plans a
    real COUNT(DISTINCT) - an Expand + exactly ONE extra keyed exchange
    on the column - while exact=False on the same rule set stays at
    zero keyed exchanges.  The caller chooses; the library never
    silently swaps exactness on a row estimate."""
    p = str(tmp_path / "docs2")
    spark.createDataFrame(DIRTY, SCHEMA).write.parquet(p)
    df = spark.read.parquet(p)

    def plan_for(exact):
        out = qc.expectation_metrics(
            df, [qc.expect_not_null("text"), qc.expect_unique("doc_id",
                                                              exact=exact)])
        out.collect()
        return (out._jdf.queryExecution().executedPlan().toString()
                .split("== Initial Plan ==")[0])

    exact_plan = plan_for(True)
    # the distinct re-keys the aggregate on the column: one (and only
    # one) keyed exchange, grouped on doc_id in the partial rounds
    assert exact_plan.count("Exchange hashpartitioning") == 1, exact_plan
    assert "hashpartitioning(doc_id" in exact_plan, exact_plan
    approx_plan = plan_for(False)
    assert approx_plan.count("Exchange hashpartitioning") == 0, approx_plan
