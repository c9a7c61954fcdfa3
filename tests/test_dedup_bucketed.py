"""Big-side posture for cross-corpus dedup (VERDICT r03 next-round #4):
the reference digest set is bucketed ONCE on digest; every later
incremental-crawl anti join then shuffles only the new-crawl side.

Plan-shape pinned: exactly one Exchange (the crawl side), bucketed scan
on the reference side, results identical to the plain two-shuffle
dedup_against."""

import pytest
from pyspark.sql import functions as F

from pulsarfeatureextractor_spark.operators.dedup import (
    dedup_against,
    dedup_against_bucketed,
    exact_dedup,
    prepare_digest_reference,
)


@pytest.fixture(scope="module")
def corpora(spark):
    ingested = spark.range(0, 5000).select(
        F.concat(F.lit("doc "), (F.col("id") % 3000).cast("string")).alias("text")
    )
    crawl = spark.range(0, 2000).select(
        F.col("id").alias("doc_id"),
        # ids 0..999 collide with the ingested corpus, 1000+ are new
        F.concat(
            F.lit("doc "),
            F.when(F.col("id") < 1000, (F.col("id") % 3000))
            .otherwise(F.col("id") + 100000)
            .cast("string"),
        ).alias("text"),
    )
    return ingested, crawl


@pytest.fixture(scope="module")
def ref_table(spark, corpora, tmp_path_factory):
    ingested, _ = corpora
    path = str(tmp_path_factory.mktemp("digest_ref") / "tbl")
    return prepare_digest_reference(
        ingested, "digest_ref_test_tbl", path, text_col="text", n_buckets=8
    )


def test_only_crawl_side_shuffles(spark, corpora, ref_table):
    """Pin the at-scale plan: broadcast disabled (the reference digest
    set is the BIG side in production — a test-sized fixture would
    otherwise be broadcast and hide the bucketing), sort-merge anti
    join, bucketed scan on the reference, and exactly ONE Exchange —
    the new-crawl side."""
    _, crawl = corpora
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        out = dedup_against_bucketed(crawl, ref_table, "text")
        plan = out._jdf.queryExecution().executedPlan().toString()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    assert "BroadcastExchange" not in plan, plan
    assert plan.count("Exchange") == 1, plan  # the crawl side only
    assert "Bucketed: true" in plan, plan
    assert "SortMergeJoin" in plan and "LeftAnti" in plan, plan


def test_matches_plain_dedup_against(spark, corpora, ref_table):
    ingested, crawl = corpora
    bucketed = sorted(
        r["doc_id"]
        for r in dedup_against_bucketed(crawl, ref_table, "text").collect()
    )
    plain = sorted(
        r["doc_id"]
        for r in dedup_against(
            crawl, exact_dedup(ingested, "text", "text"), "text"
        ).collect()
    )
    assert bucketed == plain
    assert len(bucketed) == 1000  # exactly the non-colliding ids survive


def test_accepts_digest_table_input(spark, corpora, tmp_path_factory):
    ingested, crawl = corpora
    digests = exact_dedup(ingested, "text", "text").select("digest")
    path = str(tmp_path_factory.mktemp("digest_ref2") / "tbl")
    name = prepare_digest_reference(
        digests, "digest_ref_test_tbl2", path, n_buckets=4
    )
    out = dedup_against_bucketed(crawl, name, "text")
    assert out.count() == 1000


def test_incremental_append_maintains_layout(spark, corpora, ref_table):
    """INSERT INTO keeps the bucketed layout: after appending the
    crawl's own digests, a re-run dedups against crawl ∪ ingested."""
    _, crawl = corpora
    new_digests = (
        crawl.select(F.md5(F.col("text")).alias("digest")).dropDuplicates()
    )
    new_digests.repartition(8, F.col("digest")).write.insertInto(ref_table)
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        out = dedup_against_bucketed(crawl, ref_table, "text")
        assert out.count() == 0  # everything is now known
        plan = out._jdf.queryExecution().executedPlan().toString()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    assert plan.count("Exchange") == 1, plan
