"""Thornton-style scores: vectorized batch path vs a per-row oracle.

The oracle below is an intentionally naive, row-at-a-time numpy
transcription of the published score definitions — independent of the
shared-design-matrix vectorization under test.
"""

import numpy as np
import pytest
from pyspark.sql import functions as F

from tests.oracle import thornton_oracle_row as _oracle_row
from pulsarfeatureextractor_spark.functions.scores import (
    SCORE_FIELDS,
    scores_matrix,
    with_profile_stats_sql,
    with_thornton_scores,
)




def test_scores_match_per_row_oracle():
    rng = np.random.default_rng(11)
    rows = []
    for _ in range(40):
        n = int(rng.choice([64, 128]))
        base = rng.integers(0, 256, n)
        if rng.random() < 0.5:  # inject pulsar-like Gaussian pulse
            c = rng.integers(0, n)
            w = n / rng.choice([32, 16, 8])
            d = (np.arange(n) - c + n // 2) % n - n // 2
            base = base + (200 * np.exp(-0.5 * (d / w) ** 2)).astype(np.int64)
        rows.append(base)
    for n in (64, 128):
        group = [r for r in rows if len(r) == n]
        got = scores_matrix(np.vstack(group))
        for i, r in enumerate(group):
            want = _oracle_row(np.asarray(r))
            for j, name in enumerate(SCORE_FIELDS):
                assert np.isclose(got[i, j], want[name], rtol=1e-9, atol=1e-12), (
                    name, i, got[i, j], want[name])


def test_scores_edge_cases():
    # constant array: sigma=0 -> sn 0, no peaks; short arrays -> all zero
    got = scores_matrix(np.full((1, 64), 7.0))
    d = dict(zip(SCORE_FIELDS, got[0]))
    assert d["sn_ratio"] == 0.0 and d["n_peaks"] == 0.0
    assert scores_matrix(np.ones((2, 3))).sum() == 0.0


@pytest.mark.spark
def test_with_thornton_scores_spark(spark):
    from pulsarfeatureextractor_spark.sources.tokenized import synthetic_sequences

    df = synthetic_sequences(spark, 100, seed=3)
    out = with_thornton_scores(df)
    pdf = out.toPandas()
    assert list(pdf.columns) == ["doc_id", "tokens", "n_tok", "source"] + SCORE_FIELDS
    for _, row in pdf.sample(10, random_state=0).iterrows():
        want = _oracle_row(np.asarray(row["tokens"]))
        for name in SCORE_FIELDS:
            assert np.isclose(row[name], want[name], rtol=1e-9), name
    # token invariant: the multiset of (doc_id, tokens) passes through unmutated
    orig = sorted((r.doc_id, tuple(r.tokens)) for r in df.collect())
    got = sorted((r["doc_id"], tuple(r["tokens"])) for _, r in pdf.iterrows())
    assert got == orig


@pytest.mark.spark
def test_profile_stats_sql_matches_arrow_path(spark):
    from pulsarfeatureextractor_spark.sources.tokenized import synthetic_sequences

    df = synthetic_sequences(spark, 200, seed=5)
    sql_pdf = (with_profile_stats_sql(df).select("doc_id", "sn_ratio", "peak_offset")
               .toPandas().set_index("doc_id").sort_index())
    arrow_pdf = (with_thornton_scores(df).select("doc_id", "sn_ratio", "peak_offset")
                 .toPandas().set_index("doc_id").sort_index())
    assert np.allclose(sql_pdf.to_numpy(), arrow_pdf.to_numpy(), rtol=1e-9)
