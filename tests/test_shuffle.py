"""Deterministic global shuffle rank (operators/shuffle.py).

Covers: the rank is exactly the pure-python (md5, id) sort order and a
dense 0-based permutation; shard sizes are exact; output is
deterministic under input repartitioning; the data-sized window is
pid-partitioned (the only unpartitioned window runs on the K-row
counts branch); validation.
"""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from pulsarfeatureextractor_spark.operators.shuffle import global_shuffle_rank


def _df(spark, n=500, parts=7):
    return spark.range(0, n, numPartitions=parts).select(
        F.col("id").alias("doc_id"),
        (F.col("id") * 17 % 97).alias("payload"),
    )


def _expected_order(ids, seed):
    return sorted(ids, key=lambda i: (hashlib.md5(f"{i}|{seed}".encode()).hexdigest(), i))


def test_rank_matches_python_sort(spark):
    n, seed = 500, "s1"
    out = global_shuffle_rank(_df(spark, n), seed=seed).collect()
    got = {r["doc_id"]: r["shuffle_rank"] for r in out}
    exp = {i: rk for rk, i in enumerate(_expected_order(range(n), seed))}
    assert got == exp


def test_rank_is_dense_permutation_and_payload_preserved(spark):
    n = 403
    out = global_shuffle_rank(_df(spark, n), seed="z")
    rows = out.collect()
    assert sorted(r["shuffle_rank"] for r in rows) == list(range(n))
    assert all(r["payload"] == r["doc_id"] * 17 % 97 for r in rows)


def test_shard_sizes_exact(spark):
    n, size = 500, 64
    out = global_shuffle_rank(_df(spark, n), seed="s", shard_size=size)
    sizes = {
        r["shard_ix"]: r["n"]
        for r in out.groupBy("shard_ix").agg(F.count("*").alias("n")).collect()
    }
    assert set(sizes) == set(range((n + size - 1) // size))
    for ix, cnt in sizes.items():
        assert cnt == (size if ix < n // size else n % size)


def test_deterministic_under_repartition(spark):
    df = _df(spark, 300, parts=3)
    a = sorted(map(tuple, global_shuffle_rank(df, seed="q").collect()))
    b = sorted(
        map(
            tuple,
            global_shuffle_rank(
                df.repartition(11, "payload"), seed="q", num_partitions=5
            ).collect(),
        )
    )
    assert a == b


def test_data_window_is_pid_partitioned(spark):
    """The row-sized window must be partitioned (on the pid); only the
    K-row counts branch may run an unpartitioned window."""
    out = global_shuffle_rank(_df(spark, 400), seed="p")
    out.collect()
    plan = (
        out._jdf.queryExecution()
        .executedPlan()
        .toString()
        .split("== Initial Plan ==")[0]
    )
    assert "partitionBy" not in plan  # sanity: we read the physical plan
    # the ranking window carries the pid partition spec
    assert "__shuf_pid" in plan
    # exactly one unpartitioned SinglePartition exchange: the K-row
    # offsets window (counts aggregate feeds it)
    assert plan.count("Exchange SinglePartition") == 1, plan


def test_validation(spark):
    df = _df(spark, 10)
    with pytest.raises(ValueError):
        global_shuffle_rank(df, seed="bad'seed")
    with pytest.raises(ValueError):
        global_shuffle_rank(df, shard_size=0)
