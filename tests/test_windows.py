from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import functions as F

from pulsarfeatureextractor_spark.operators.windows import (
    bfill,
    ffill,
    lagged,
    rolling_agg,
    top_k_per_group,
)

EPOCH = pd.Timestamp("2024-01-01")


def _frame(seed=3, n=200, entities=8):
    rng = np.random.default_rng(seed)
    pdf = pd.DataFrame({
        "entity": [f"e{i}" for i in rng.integers(0, entities, n)],
        "ts": EPOCH + pd.to_timedelta(rng.choice(np.arange(0, 50_000), size=n, replace=False), unit="s"),
        "v": rng.normal(size=n),
    })
    pdf.loc[rng.random(n) < 0.3, "v"] = np.nan
    return pdf


def test_ffill_matches_pandas(spark):
    pdf = _frame()
    got = ffill(spark.createDataFrame(pdf), "entity", "ts", ["v"]).toPandas()
    got = got.sort_values(["entity", "ts"]).reset_index(drop=True)
    want = pdf.sort_values(["entity", "ts"]).reset_index(drop=True)
    want["v"] = want.groupby("entity")["v"].ffill()
    pd.testing.assert_series_equal(got["v"], want["v"], check_dtype=False)


def test_bfill_matches_pandas(spark):
    pdf = _frame(4)
    got = bfill(spark.createDataFrame(pdf), "entity", "ts", ["v"]).toPandas()
    got = got.sort_values(["entity", "ts"]).reset_index(drop=True)
    want = pdf.sort_values(["entity", "ts"]).reset_index(drop=True)
    want["v"] = want.groupby("entity")["v"].bfill()
    pd.testing.assert_series_equal(got["v"], want["v"], check_dtype=False)


def test_lagged_matches_pandas(spark):
    pdf = _frame(5)
    got = lagged(spark.createDataFrame(pdf), "entity", "ts", ["v"], offsets=(1, 2, -1))
    got = got.toPandas().sort_values(["entity", "ts"]).reset_index(drop=True)
    want = pdf.sort_values(["entity", "ts"]).reset_index(drop=True)
    g = want.groupby("entity")
    for k, col in [(1, "v_lag1"), (2, "v_lag2")]:
        pd.testing.assert_series_equal(
            got[col], g["v"].shift(k).reset_index(drop=True), check_dtype=False, check_names=False
        )
    pd.testing.assert_series_equal(
        got["v_lead1"], g["v"].shift(-1).reset_index(drop=True), check_dtype=False, check_names=False
    )
    want_dt = (want["ts"] - g["ts"].shift(1).reset_index(drop=True)).dt.total_seconds()
    pd.testing.assert_series_equal(got["delta_t_prev"], want_dt, check_dtype=False, check_names=False)


def test_rolling_sum_matches_pandas(spark):
    pdf = _frame(6)
    pdf["v"] = pdf["v"].fillna(0.0)
    win = 3600
    got = rolling_agg(
        spark.createDataFrame(pdf), "entity", "ts",
        {"roll_sum": F.sum("v"), "roll_n": F.count("v")}, win,
    ).toPandas().sort_values(["entity", "ts"]).reset_index(drop=True)
    want = pdf.sort_values(["entity", "ts"]).reset_index(drop=True)
    # brute force trailing window (inclusive both ends)
    sums, ns = [], []
    for _, row in want.iterrows():
        m = (want["entity"] == row["entity"]) & (want["ts"] <= row["ts"]) & (
            want["ts"] >= row["ts"] - pd.Timedelta(seconds=win))
        sums.append(want.loc[m, "v"].sum())
        ns.append(int(m.sum()))
    assert np.allclose(got["roll_sum"], sums)
    assert got["roll_n"].tolist() == ns


def test_top_k(spark):
    pdf = _frame(7)
    df = spark.createDataFrame(pdf)
    got = top_k_per_group(
        df, "entity", [F.col("ts").desc()], k=3
    ).toPandas()
    want_counts = pdf.groupby("entity").size().clip(upper=3)
    got_counts = got.groupby("entity").size()
    assert got_counts.sort_index().tolist() == want_counts.sort_index().tolist()
    # and they are the 3 most recent
    for ent, grp in pdf.groupby("entity"):
        want_ts = set(grp.nlargest(3, "ts")["ts"])
        got_ts = set(got[got["entity"] == ent]["ts"])
        assert got_ts == want_ts
