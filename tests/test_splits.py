"""hash_split / stratified_sample: determinism, portability, plan shape."""

from __future__ import annotations

import duckdb
import pytest

from pyspark.sql import functions as F

from pulsarfeatureextractor_spark.functions.splits import (
    _md5_bucket_expr,
    hash_split,
    stratified_sample,
)


@pytest.fixture(scope="module")
def ids(spark):
    return spark.range(0, 2000).select(F.col("id").alias("doc_id"))


@pytest.mark.parametrize("hasher", ["xxhash", "md5"])
def test_split_deterministic_and_partition_invariant(spark, ids, hasher):
    a = {r["doc_id"]: r["split"] for r in hash_split(ids, hasher=hasher).collect()}
    b = {
        r["doc_id"]: r["split"]
        for r in hash_split(ids.repartition(13), hasher=hasher).collect()
    }
    assert a == b
    assert len(a) == 2000


@pytest.mark.parametrize("hasher", ["xxhash", "md5"])
def test_split_weights_respected(spark, ids, hasher):
    counts = (
        hash_split(ids, hasher=hasher, seed="w")
        .groupBy("split")
        .count()
        .collect()
    )
    got = {r["split"]: r["count"] for r in counts}
    assert set(got) == {"train", "val", "test"}
    # 2000 ids: loose tolerance, the point is the cut logic not the stats
    assert abs(got["train"] - 1600) < 120
    assert abs(got["val"] - 200) < 70
    assert abs(got["test"] - 200) < 70


def test_md5_bucket_matches_duckdb(spark, ids):
    sample = hash_split(
        ids.where(F.col("doc_id") < 50), hasher="md5", seed="s", bucket_out="b"
    ).collect()
    expr = _md5_bucket_expr("doc_id", "s")
    want = dict(
        duckdb.connect()
        .execute(f"SELECT doc_id, {expr} FROM range(50) t(doc_id)")
        .fetchall()
    )
    got = {r["doc_id"]: r["b"] for r in sample}
    assert got == want


def test_split_plan_is_shuffle_free(spark, ids):
    plan = hash_split(ids, hasher="xxhash")._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_split_rejects_bad_args(spark, ids):
    with pytest.raises(ValueError):
        hash_split(ids, weights=[("a", 0.0)])
    with pytest.raises(ValueError):
        hash_split(ids, hasher="sha9000")


def test_stratified_sample_exact_k_and_deterministic(spark):
    df = spark.range(0, 300).select(
        F.col("id").alias("doc_id"),
        (F.col("id") % 3).cast("string").alias("src"),
    )
    out1 = stratified_sample(df, "src", k=7, id_col="doc_id", seed="z").collect()
    out2 = stratified_sample(
        df.repartition(11), "src", k=7, id_col="doc_id", seed="z"
    ).collect()
    assert sorted((r["doc_id"], r["rk"]) for r in out1) == sorted(
        (r["doc_id"], r["rk"]) for r in out2
    )
    per = {}
    for r in out1:
        per.setdefault(r["src"], []).append(r["rk"])
    assert set(per) == {"0", "1", "2"}
    for ranks in per.values():
        assert sorted(ranks) == list(range(1, 8))


def test_stratified_sample_small_stratum_keeps_all(spark):
    df = spark.createDataFrame(
        [(1, "a"), (2, "a"), (3, "b")], "doc_id long, src string"
    )
    out = stratified_sample(df, "src", k=5).collect()
    assert len(out) == 3
