"""Weighted corpus mixing (operators/mixing.py).

Covers: copy-count math against a hand-computed fixture, determinism
under repartitioning, the max_rate (epoch-cap) clamp, weight-0 source
dropping, achieved-vs-target token closeness at the quantization
bound, input validation, and the plan shape (the corpus side is never
shuffled — one tiny source-key aggregate feeds a broadcast join).
"""

from __future__ import annotations

import hashlib
import math

import pytest
from pyspark.sql import functions as F

from pulsarfeatureextractor_spark.operators.mixing import (
    mix_corpora,
    mixing_copies_sql,
)

WEIGHTS = {"a": 3.0, "b": 1.0}


def _bucket(doc_id, seed: str) -> int:
    """Pure-python twin of splits._md5_bucket_expr."""
    h = hashlib.md5(f"{doc_id}|{seed}".encode()).hexdigest()
    return int(h[:3], 16)


def _expected_copies(doc_id, rate: float, seed: str) -> int:
    base = math.floor(rate)
    thresh = math.floor((rate - base) * 4096)
    return int(base) + (1 if _bucket(doc_id, seed) < thresh else 0)


def _corpus(spark, n_per_source=40):
    rows = [
        (sid * 1000 + i, src, 100 + (sid * 1000 + i) * 7 % 400)
        for sid, src in enumerate(["a", "b", "c"])
        for i in range(n_per_source)
    ]
    return spark.createDataFrame(rows, "doc_id long, source string, n_chars long")


def test_copies_match_hand_computation(spark):
    """Every emitted multiplicity equals the pure-python floor+frac
    rule at the exact per-source rate."""
    df = _corpus(spark)
    budget, seed = 50_000.0, "s1"
    totals = {
        r["source"]: r["t"]
        for r in df.groupBy("source").agg(F.sum("n_chars").alias("t")).collect()
    }
    wsum = sum(WEIGHTS.values())
    out = mix_corpora(df, WEIGHTS, budget, seed=seed).collect()
    got = {}
    for r in out:
        got[r["doc_id"]] = got.get(r["doc_id"], 0) + 1
    for sid, src in ((0, "a"), (1, "b")):
        rate = (budget * WEIGHTS[src] / wsum) / float(totals[src])
        for i in range(40):
            doc = sid * 1000 + i
            assert got.get(doc, 0) == _expected_copies(doc, rate, seed), (
                doc,
                rate,
            )


def test_copy_ix_is_dense_zero_based(spark):
    out = mix_corpora(_corpus(spark), WEIGHTS, 50_000.0, seed="s1")
    per_doc = (
        out.groupBy("doc_id")
        .agg(F.count("*").alias("n"), F.collect_set("copy_ix").alias("ixs"))
        .collect()
    )
    for r in per_doc:
        assert sorted(r["ixs"]) == list(range(r["n"]))


def test_deterministic_under_repartition(spark):
    df = _corpus(spark)
    a = sorted(map(tuple, mix_corpora(df, WEIGHTS, 33_000.0, seed="z").collect()))
    b = sorted(
        map(
            tuple,
            mix_corpora(df.repartition(7, "n_chars"), WEIGHTS, 33_000.0, seed="z")
            .collect(),
        )
    )
    assert a == b and len(a) > 0


def test_weight_zero_sources_dropped(spark):
    out = mix_corpora(_corpus(spark), WEIGHTS, 10_000.0, seed="s")
    assert out.where(F.col("source") == "c").count() == 0


def test_max_rate_caps_epochs(spark):
    """A tiny source with a huge target would repeat ~rate times; the
    epoch cap clamps every doc to at most ceil(max_rate) copies and
    the achieved rate to ~max_rate."""
    df = _corpus(spark)
    out = mix_corpora(df, {"a": 1.0}, 10_000_000.0, seed="s", max_rate=2.5)
    mx = out.groupBy("doc_id").count().agg(F.max("count")).collect()[0][0]
    assert mx == 3  # floor(2.5)+1
    n_docs = df.where(F.col("source") == "a").count()
    total = out.count()
    assert abs(total / n_docs - 2.5) < 0.2


def test_achieved_tokens_near_target(spark):
    """Downsampled source lands within sampling noise of its target;
    the per-doc acceptance quantization is 1/4096."""
    df = _corpus(spark, n_per_source=400)
    budget, seed = 60_000.0, "t"
    out = mix_corpora(df, WEIGHTS, budget, seed=seed)
    ach = {
        r["source"]: r["t"]
        for r in out.groupBy("source").agg(F.sum("n_chars").alias("t")).collect()
    }
    wsum = sum(WEIGHTS.values())
    for src, w in WEIGHTS.items():
        target = budget * w / wsum
        # binomial noise over ~400 docs: generous 15% band
        assert abs(ach[src] - target) / target < 0.15, (src, ach[src], target)


def test_validation_errors(spark):
    df = _corpus(spark)
    with pytest.raises(ValueError):
        mix_corpora(df, {}, 1000.0)
    with pytest.raises(ValueError):
        mix_corpora(df, WEIGHTS, 0.0)
    with pytest.raises(ValueError):
        mix_corpora(df, {"a": -1.0, "b": 1.0}, 1000.0)
    with pytest.raises(ValueError):
        mixing_copies_sql("s", "i", "t", {"bad'name": 1.0}, 10.0)
    with pytest.raises(ValueError):
        mix_corpora(df, WEIGHTS, 1000.0, seed="bad'seed")


def test_plan_corpus_side_not_shuffled(spark, tmp_path):
    """Plan pins: BroadcastHashJoin onto the corpus scan; the only
    Exchange hashpartitioning feeds the K-row source aggregate; the
    corpus side itself is scan→project→generate with no Exchange/Sort."""
    p = str(tmp_path / "corpus")
    _corpus(spark, 200).write.parquet(p)
    out = mix_corpora(spark.read.parquet(p), WEIGHTS, 40_000.0, seed="p")
    out.collect()
    plan = (
        out._jdf.queryExecution()
        .executedPlan()
        .toString()
        .split("== Initial Plan ==")[0]
    )
    assert "BroadcastHashJoin" in plan, plan
    assert plan.count("Exchange hashpartitioning") == 1, plan
    assert "SortMergeJoin" not in plan, plan
    assert plan.count("Sort [") == 0, plan


def test_temperature_weights_math():
    """alpha=1 reproduces the natural shares; alpha=0 is uniform; in
    between the low-resource source gains share monotonically."""
    from pulsarfeatureextractor_spark.operators.mixing import (
        temperature_weights,
    )

    counts = {"web": 900.0, "wiki": 100.0}
    nat = temperature_weights(counts, alpha=1.0)
    assert abs(nat["web"] - 0.9) < 1e-12 and abs(nat["wiki"] - 0.1) < 1e-12
    uni = temperature_weights(counts, alpha=0.0)
    assert abs(uni["web"] - 0.5) < 1e-12
    mid = temperature_weights(counts, alpha=0.3)
    assert 0.1 < mid["wiki"] < 0.5  # up-weighted but not past uniform
    assert abs(sum(mid.values()) - 1.0) < 1e-12
    # zero-token sources are excluded, not divided by
    w = temperature_weights({"a": 100.0, "b": 0.0}, alpha=0.3)
    assert set(w) == {"a"}
    import pytest as _pytest

    with _pytest.raises(ValueError, match="alpha"):
        temperature_weights(counts, alpha=1.5)
    with _pytest.raises(ValueError, match="no source"):
        temperature_weights({"a": 0.0}, alpha=0.3)


def test_source_token_counts_matches_groupby(spark):
    from pulsarfeatureextractor_spark.operators.mixing import (
        source_token_counts,
    )

    df = _corpus(spark, 300)
    got = source_token_counts(df, "source", "n_chars")
    want = {
        r[0]: float(r[1])
        for r in df.groupBy("source").agg(F.sum("n_chars")).collect()
    }
    assert got == want


def test_temperature_mix_flattens_distribution(spark):
    """End to end: alpha-derived weights make the mixed corpus's
    token shares strictly more uniform than the input's."""
    from pulsarfeatureextractor_spark.operators.mixing import (
        mix_corpora,
        source_token_counts,
        temperature_weights,
    )

    rows = [
        (sid * 100000 + i, src, 100 + i * 7 % 400)
        for sid, (src, n) in enumerate(
            [("web", 3000), ("books", 400), ("wiki", 100)]
        )
        for i in range(n)
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, source string, n_chars long"
    )
    counts = source_token_counts(df, "source", "n_chars")
    shares_in = {s: c / sum(counts.values()) for s, c in counts.items()}
    w = temperature_weights(counts, alpha=0.3)
    mixed = mix_corpora(df, w, budget_tokens=sum(counts.values()), seed="t")
    out_counts = {
        r[0]: float(r[1])
        for r in mixed.groupBy("source").agg(F.sum("n_chars")).collect()
    }
    shares_out = {s: c / sum(out_counts.values()) for s, c in out_counts.items()}
    # the dominant source's share must shrink toward uniform
    top = max(shares_in, key=shares_in.get)
    k = len(shares_in)
    assert 1.0 / k <= shares_out[top] < shares_in[top]
