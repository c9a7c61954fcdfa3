"""Bucketed (skew-proof) as-of plan == window plan, on random and
skewed fixtures, including tolerance and empty-right edge cases."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from pulsarfeatureextractor_spark.operators.asof import asof_join

EPOCH = np.datetime64("2024-01-01T00:00:00")


def _mk(spark, n_left, n_right, n_entities, seed, hot_frac=0.0):
    rng = np.random.default_rng(seed)
    span = 20 * 86400

    def ids(n):
        raw = rng.integers(0, n_entities, n)
        if hot_frac:
            hot = rng.random(n) < hot_frac
            raw = np.where(hot, 0, raw)
        return [f"e{int(i)}" for i in raw]

    left = spark.createDataFrame(pd.DataFrame({
        "ent": ids(n_left),
        "ts": EPOCH + rng.integers(0, span, n_left).astype("timedelta64[s]"),
        "row_id": np.arange(n_left),
    }))
    right = spark.createDataFrame(pd.DataFrame({
        "ent": ids(n_right),
        "rts": EPOCH + rng.integers(0, span, n_right).astype("timedelta64[s]"),
        # unique values keyed to rows; unique (ent, rts) enforced below
        "val": rng.normal(size=n_right),
    })).dropDuplicates(["ent", "rts"])
    return left, right


def _run(left, right, strategy, tolerance=None, bucket_seconds=86400.0):
    out = asof_join(
        left, right, on="ts", right_on="rts", by="ent",
        value_cols=["val"], strategy=strategy, tolerance=tolerance,
        bucket_seconds=bucket_seconds,
    )
    pdf = out.select("row_id", "val").toPandas().sort_values("row_id")
    return pdf["val"].to_numpy()


@pytest.mark.parametrize("seed,hot", [(1, 0.0), (2, 0.5), (3, 0.9)])
def test_bucketed_equals_window(spark, seed, hot):
    left, right = _mk(spark, 400, 300, 20, seed, hot_frac=hot)
    a = _run(left, right, "window")
    b = _run(left, right, "bucketed")
    assert np.allclose(np.nan_to_num(a, nan=-9e9), np.nan_to_num(b, nan=-9e9))


@pytest.mark.parametrize("bucket", [3600.0, 86400.0, 10 * 86400.0])
def test_bucket_width_irrelevant_to_result(spark, bucket):
    left, right = _mk(spark, 300, 200, 10, 7)
    a = _run(left, right, "window")
    b = _run(left, right, "bucketed", bucket_seconds=bucket)
    assert np.allclose(np.nan_to_num(a, nan=-9e9), np.nan_to_num(b, nan=-9e9))


def test_bucketed_tolerance(spark):
    left, right = _mk(spark, 300, 200, 10, 11)
    a = _run(left, right, "window", tolerance=3600.0)
    b = _run(left, right, "bucketed", tolerance=3600.0)
    assert np.allclose(np.nan_to_num(a, nan=-9e9), np.nan_to_num(b, nan=-9e9))


def test_bucketed_empty_right(spark):
    left, right = _mk(spark, 50, 200, 5, 13)
    empty = right.where(F.lit(False))
    vals = _run(left, empty, "bucketed")
    assert np.isnan(vals).all()


def test_bucketed_partitioning_spreads_hot_key(spark):
    """The plan's first window partitions by (ent, bucket), not ent."""
    left, right = _mk(spark, 200, 100, 5, 17, hot_frac=0.9)
    out = asof_join(left, right, on="ts", right_on="rts", by="ent",
                    value_cols=["val"], strategy="bucketed")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "__asof_bkt" in plan  # bucket key participates in partitioning