"""Eatough 12-feature family vs an independent per-row numpy oracle.

The engine computes the features as one fused JVM expression tree
(functions/scores.with_eatough_features); this transcription computes
them row-at-a-time from the published descriptions (Eatough et al.
2010, MNRAS 407:2443 — reconstruction provenance in the docstring),
so an agreement failure localizes to the vectorization, not the math.
"""

import numpy as np
import pytest
from pyspark.sql import functions as F

from pulsarfeatureextractor_spark.functions.scores import (
    EATOUGH_FIELDS,
    with_eatough_features,
)


def eatough_oracle_row(p, q):
    p = np.asarray(p, dtype=np.float64)
    q = np.asarray(q, dtype=np.float64)
    n = len(p)

    def stats(x):
        mu = x.sum() / n
        sig = np.sqrt(max((x * x).sum() / n - mu * mu, 0.0))
        snr = (x.max() - mu) / sig if sig > 0 else 0.0
        idx = int(np.argmax(x))  # first occurrence, 0-based
        return mu, sig, snr, idx

    pmu, psig, psnr, pidx = stats(p)
    qmu, qsig, qsnr, qidx = stats(q)
    pmn, pmx, qmn, qmx = p.min(), p.max(), q.min(), q.max()

    n_peaks = 0
    if n >= 3:
        thr = pmu + 2.0 * psig
        for i in range(1, n - 1):
            if p[i] > p[i - 1] and p[i] > p[i + 1] and p[i] > thr:
                n_peaks += 1

    base = p.sum() - pmn * n
    if base > 0:
        centroid = (np.arange(n) * (p - pmn)).sum() / base
        cen_off = abs(centroid - pidx) / n
    else:
        cen_off = 0.0

    qrng = qmx - qmn
    if qrng > 0:
        i1 = np.arange(1, n + 1)
        norm = (q - qmn) / qrng
        tri = np.maximum(0.0, 1.0 - np.abs(i1 - (qidx + 1)) / (n / 2.0))
        tri_chi2 = ((norm - tri) ** 2).sum() / n
        grad = np.abs(np.diff(q)).max() / qrng if n >= 2 else 0.0
    else:
        tri_chi2 = 0.0
        grad = 0.0

    return {
        "eat_snr": psnr,
        "eat_w50_frac": (p > (pmn + pmx) / 2.0).sum() / n,
        "eat_w25_frac": (p > pmn + 0.75 * (pmx - pmn)).sum() / n,
        "eat_peak_offset": (pidx - n / 2.0) / n,
        "eat_n_peaks": n_peaks,
        "eat_centroid_offset": cen_off,
        "eat_dm_snr": qsnr,
        "eat_dm_w50_frac": (q > (qmn + qmx) / 2.0).sum() / n,
        "eat_dm_peak_offset": (qidx - n / 2.0) / n,
        "eat_dm_tri_chi2": tri_chi2,
        "eat_dm_grad_max": grad,
        "eat_snr_ratio": psnr / (qsnr + 1.0),
    }


@pytest.fixture(scope="module")
def curves(spark):
    rng = np.random.default_rng(7)
    rows = []
    for i in range(40):
        n = int(rng.integers(3, 90))
        p = rng.integers(0, 256, size=n).tolist()
        q = rng.integers(0, 256, size=n).tolist()
        rows.append((str(i), p, q))
    # degenerate shapes: constant curves, two-sample, single peak
    rows.append(("flat", [5] * 10, [7] * 10))
    rows.append(("tiny", [1, 2], [3, 1]))
    rows.append(("spike", [0] * 20 + [255] + [0] * 20, [0] * 40 + [255]))
    df = spark.createDataFrame(
        rows, "doc_id string, tokens_prof array<int>, tokens_dm array<int>"
    )
    return rows, df


def test_eatough_matches_numpy_oracle(spark, curves):
    rows, df = curves
    got = {
        r["doc_id"]: r
        for r in with_eatough_features(df).collect()
    }
    for doc_id, p, q in rows:
        want = eatough_oracle_row(p, q)
        g = got[doc_id]
        for k in EATOUGH_FIELDS:
            assert np.isclose(g[k], want[k], rtol=1e-12, atol=1e-12), (
                doc_id, k, g[k], want[k])


def test_eatough_single_peak_sanity(spark, curves):
    _, df = curves
    g = {r["doc_id"]: r for r in with_eatough_features(df).collect()}
    spike = g["spike"]
    assert spike["eat_n_peaks"] == 1
    assert spike["eat_w50_frac"] == pytest.approx(1 / 41)
    # peak at the exact center of a 41-bin profile -> offset ~ -1/2n
    assert abs(spike["eat_peak_offset"]) < 0.02
    flat = g["flat"]
    assert flat["eat_snr"] == 0.0
    assert flat["eat_dm_tri_chi2"] == 0.0
    assert flat["eat_snr_ratio"] == 0.0
