"""Regression pins for the round-4 adversarial-review fixes.

Covers: the zero-token-source guard in mixing_copies_sql (IEEE
Infinity -> saturated INT cast -> sequence() blow-up), the stale-path
refusal on prepare_digest_reference (same hazard class the r2/r3
advice fixed on the as-of layout), the exact+approx unique metric-name
collision in quality_checks, the NULL-perplexity passthrough in the
curation CLI's --max-ppl gate, and the mix-vs-split seed namespacing
(with --hasher md5 both stages would otherwise share the exact md5
bucket, starving val/test of down-sampled sources).
"""

from __future__ import annotations

import os
import sys

import pytest
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def test_mixing_zero_token_source_samples_zero_copies(spark):
    """A weighted source whose available tokens total <= 0 must emit
    zero copies, not an Infinity rate that kills the stage."""
    from pulsarfeatureextractor_spark.operators.mixing import mix_corpora

    rows = [(i, "empty", 0) for i in range(5)] + [
        (100 + i, "full", 100) for i in range(5)
    ]
    df = spark.createDataFrame(rows, "doc_id long, source string, n long")
    out = mix_corpora(
        df, {"empty": 1.0, "full": 1.0}, budget_tokens=500.0, token_col="n"
    )
    got = {r["source"] for r in out.select("source").distinct().collect()}
    assert got == {"full"}  # the zero-token source contributes nothing
    assert out.count() > 0


def test_prepare_digest_reference_refuses_stale_path(spark, tmp_path):
    """Rebuilding a digest reference at a non-empty path must refuse
    (stale part files would otherwise be absorbed into the reference
    and silently drop new documents); overwrite=True clears it."""
    from pulsarfeatureextractor_spark.operators.dedup import (
        dedup_against_bucketed,
        prepare_digest_reference,
    )

    path = str(tmp_path / "digest_ref")
    a = spark.range(0, 50).select(
        F.concat(F.lit("corpusA "), F.col("id")).alias("text")
    )
    b = spark.range(0, 50).select(
        F.concat(F.lit("corpusB "), F.col("id")).alias("text")
    )
    prepare_digest_reference(a, "r4fix_ref", path, text_col="text", n_buckets=4)
    with pytest.raises(ValueError, match="non-empty"):
        prepare_digest_reference(
            b, "r4fix_ref", path, text_col="text", n_buckets=4
        )
    # overwrite rebuilds cleanly: corpus-A digests must be GONE
    prepare_digest_reference(
        b, "r4fix_ref", path, text_col="text", n_buckets=4, overwrite=True
    )
    crawl = spark.range(0, 10).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("corpusA "), F.col("id")).alias("text"),
    )
    survivors = dedup_against_bucketed(crawl, "r4fix_ref", "text").count()
    assert survivors == 10  # vs 0 if corpus A's stale files leaked in
    spark.sql("DROP TABLE IF EXISTS r4fix_ref")


def test_exact_and_approx_unique_coexist(spark):
    """exact and approx uniqueness on the SAME column must not collide
    in the metrics dict: the exact rule judges COUNT(DISTINCT), the
    approx rule judges the HLL estimate, independently."""
    from pulsarfeatureextractor_spark.functions import quality_checks as qc

    df = spark.range(0, 5000).withColumnRenamed("id", "k")
    res = qc.validate_expectations(
        df, [qc.expect_unique("k"), qc.expect_unique("k", exact=False)]
    )
    assert res["passed"], res
    m = res["metrics"]
    assert m["k_distinct_count"] == 5000  # exact, not the HLL estimate
    assert "k_distinct_count_approx" in m


def test_curate_ppl_gate_passes_unscorable_docs(spark, tmp_path):
    """Docs the LM cannot score (fewer than 2 non-empty tokens -> NULL
    lm_ppl) pass the --max-ppl gate instead of vanishing into a NULL
    predicate."""
    sys.path.insert(0, "/root/repo/jobs")
    import curate_corpus

    src = str(tmp_path / "docs_in")
    rows = [(i, "w%d common text body here" % i, "web") for i in range(20)]
    rows.append((99, "solo", "web"))  # 1 token: passes min-tokens 1, NULL ppl
    spark.createDataFrame(rows, "doc_id long, text string, source string").write.parquet(src)
    out = str(tmp_path / "cur_ppl")
    curate_corpus.main([
        "--input", src, "--output", out,
        "--min-tokens", "1", "--max-ppl", "1e12", "--dup-threshold", "0.99",
    ])
    got = spark.read.parquet(out)
    assert got.where(F.col("doc_id") == 99).count() == 1


def test_mix_seed_namespaced_from_split(spark, tmp_path):
    """With --hasher md5 a down-sampled source's survivors must still
    reach the val/test splits: mix acceptance and split assignment use
    namespaced seeds, not the same md5 bucket."""
    sys.path.insert(0, "/root/repo/jobs")
    import curate_corpus

    src = str(tmp_path / "docs_mix_in")
    rows = [
        (i, "doc %d body %s" % (i, " ".join("t%d" % (i * 7 + j) for j in range(8))), "web")
        for i in range(400)
    ]
    spark.createDataFrame(rows, "doc_id long, text string, source string").write.parquet(src)
    avail = sum(
        len("doc %d body %s" % (i, " ".join("t%d" % (i * 7 + j) for j in range(8))))
        for i in range(400)
    )
    out = str(tmp_path / "cur_mix_md5")
    curate_corpus.main([
        "--input", src, "--output", out,
        "--min-tokens", "1", "--dup-threshold", "0.99",
        "--hasher", "md5",
        "--mix-weights", "web:1.0", "--mix-budget", str(avail / 2.0),
        "--split-weights", "train:0.8,val:0.1,test:0.1",
    ])
    got = spark.read.parquet(out)
    splits = {r["split"] for r in got.select("split").distinct().collect()}
    # before the fix every down-sampled survivor sat in buckets < 2048
    # and val/test (high buckets) were empty
    assert {"val", "test"} <= splits, sorted(splits)
