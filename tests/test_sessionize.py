from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import functions as F

from pulsarfeatureextractor_spark.operators.sessionize import (
    session_aggregates,
    sessionize,
)
from tests.oracle import sessionize_oracle

EPOCH = pd.Timestamp("2024-01-01")
GAP = 1800.0  # 30 min


def _events(seed=9, n=300, entities=6):
    rng = np.random.default_rng(seed)
    pdf = pd.DataFrame({
        "entity": [f"u{i}" for i in rng.integers(0, entities, n)],
        "ts": EPOCH + pd.to_timedelta(rng.choice(np.arange(0, 400_000), n, replace=False), unit="s"),
        "v": rng.normal(size=n),
    })
    return pdf


def test_sessionize_matches_oracle(spark):
    pdf = _events()
    got = sessionize(spark.createDataFrame(pdf), "entity", "ts", GAP).toPandas()
    got = got.sort_values(["entity", "ts"]).reset_index(drop=True)
    for ent, grp in got.groupby("entity"):
        want = sessionize_oracle(list(grp["ts"]), GAP)
        assert grp["session_id"].tolist() == want


def test_exact_gap_boundary(spark):
    """Gap == gap_seconds exactly -> SAME session (strict >)."""
    pdf = pd.DataFrame({
        "entity": ["a"] * 3,
        "ts": [EPOCH, EPOCH + pd.Timedelta(seconds=GAP), EPOCH + pd.Timedelta(seconds=2 * GAP + 1)],
        "v": [1.0, 2.0, 3.0],
    })
    got = sessionize(spark.createDataFrame(pdf), "entity", "ts", GAP).toPandas()
    got = got.sort_values("ts")
    assert got["session_id"].tolist() == [1, 1, 2]


def test_session_aggregates(spark):
    pdf = _events(10)
    got = session_aggregates(
        spark.createDataFrame(pdf), "entity", "ts", GAP,
        extra_aggs={"v_sum": F.sum("v")},
    ).toPandas()
    # reconstruct brute force
    pdf = pdf.sort_values(["entity", "ts"])
    rows = []
    for ent, grp in pdf.groupby("entity"):
        sids = sessionize_oracle(list(grp["ts"]), GAP)
        grp = grp.assign(sid=sids)
        for sid, sgrp in grp.groupby("sid"):
            rows.append((ent, sid, sgrp["ts"].min(), sgrp["ts"].max(), len(sgrp), sgrp["v"].sum()))
    want = pd.DataFrame(rows, columns=["entity", "session_id", "session_start", "session_end", "n_events", "v_sum"])
    got = got.sort_values(["entity", "session_id"]).reset_index(drop=True)
    want = want.sort_values(["entity", "session_id"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want, check_dtype=False, rtol=1e-12)
