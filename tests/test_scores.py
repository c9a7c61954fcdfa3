"""Thornton-style scores: vectorized batch path vs a per-row oracle.

The oracle below is an intentionally naive, row-at-a-time numpy
transcription of the published score definitions — independent of the
shared-design-matrix vectorization under test.
"""

import numpy as np
import pytest
from pyspark.sql import functions as F

from pulsarfeatureextractor_spark.functions.scores import (
    SCORE_FIELDS,
    scores_matrix,
    with_profile_stats_sql,
    with_thornton_scores,
)


def _oracle_row(x: np.ndarray) -> dict:
    x = x.astype(np.float64)
    n = len(x)
    mu, sigma = x.mean(), x.std()
    lo, hi = x.min(), x.max()
    p = (x - lo) / (hi - lo) if hi > lo else np.zeros_like(x)
    th = 2 * np.pi * np.arange(n) / n

    def fit(A, y):
        beta, *_ = np.linalg.lstsq(A, y, rcond=None)
        r = y - A @ beta
        return beta, (r * r).mean()

    _, sin_chi2 = fit(np.column_stack([np.sin(th), np.cos(th), np.ones(n)]), p)
    _, sin2_chi2 = fit(np.column_stack([np.sin(2 * th), np.cos(2 * th), np.ones(n)]), p)

    amax = int(x.argmax())
    rolled = np.roll(p, (n // 2) - amax)
    d = np.arange(n) - n // 2
    best = (np.inf, 0.0, 0.0)
    for frac in (1 / 64, 1 / 32, 1 / 16, 1 / 8, 1 / 4):
        fwhm = max(frac * n, 1.0)
        s = fwhm / 2.3548200450309493
        g = np.exp(-0.5 * (d / s) ** 2)
        beta, chi2 = fit(np.column_stack([g, np.ones(n)]), rolled)
        if chi2 < best[0]:
            best = (chi2, beta[0], fwhm)

    peaks = 0
    for i in range(n):
        v = x[i]
        if v > mu + 2 * sigma and v > x[(i - 1) % n] and v > x[(i + 1) % n]:
            peaks += 1

    counts = np.zeros(10)
    for v in p:
        counts[min(int(v * 10), 9)] += 1
    counts /= n
    centers = (np.arange(10) + 0.5) / 10
    psd = max(p.std(), 1e-9)
    pdf = np.exp(-0.5 * ((centers - p.mean()) / psd) ** 2)
    pdf /= pdf.sum()

    half = max(n // 8, 2)
    win = slice(n // 2 - half, n // 2 + half + 1)
    xq = d[win].astype(float)
    _, quad_chi2 = fit(np.column_stack([xq * xq, xq, np.ones_like(xq)]), rolled[win])

    return {
        "sin_chi2": sin_chi2,
        "sin2_chi2": sin2_chi2,
        "gauss_chi2": best[0],
        "gauss_amp": best[1],
        "gauss_fwhm": best[2],
        "n_peaks": float(peaks),
        "sn_ratio": (x.max() - mu) / sigma if sigma > 0 else 0.0,
        "hist_dist": np.abs(counts - pdf).sum(),
        "peak_offset": (amax - n / 2.0) / n,
        "quad_chi2": quad_chi2,
    }


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
