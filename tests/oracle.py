"""Pure-numpy single-node oracle (SURVEY.md §5.3).

Plays the role of the reference's golden feature outputs while
/root/reference is empty (SURVEY.md §0): a direct transcription of the
published Lyon et al. 2016 moment formulas with the conventions pinned
in SURVEY.md Appendix A.  Deliberately written independently of the
engine (loops allowed here; banned in the engine) so the two
implementations can disagree.
"""

from __future__ import annotations

import numpy as np


def lyon_moments_oracle(x, convention: str = "pinned") -> tuple[float, float, float, float]:
    """(mean, stdev, skew, excess kurtosis) of a 1-D array.

    convention="pinned": stdev ddof=1; skew/kurt from population
    (ddof=0) central moments; zero-variance -> skew = kurt = 0.0.
    """
    x = np.asarray(x, dtype=np.float64)
    n = x.size
    if n == 0:
        return (0.0, 0.0, 0.0, 0.0)
    mu = float(x.mean())
    d = x - mu
    m2 = float((d ** 2).mean())
    m3 = float((d ** 3).mean())
    m4 = float((d ** 4).mean())
    stdev = float(np.sqrt((d ** 2).sum() / (n - 1))) if n >= 2 else 0.0
    if m2 > 0.0:
        skew = m3 / m2 ** 1.5
        kurt = m4 / m2 ** 2 - 3.0
    else:
        skew, kurt = 0.0, 0.0
    return (mu, stdev, skew, kurt)


def asof_oracle(left, right, direction="backward", tolerance=None):
    """Brute-force O(n*m) as-of join oracle over python lists.

    left: list of (entity, t); right: list of (entity, t, value).
    Returns list of matched value-or-None aligned with left.
    Ties: t_r == t matches; among equal t_r the LAST right row wins
    (mirrors window-plan last() and pandas merge_asof).
    """
    out = []
    for ent, t in left:
        best = None
        best_t = None
        for r_ent, r_t, v in right:
            if r_ent != ent:
                continue
            if direction == "backward" and r_t <= t:
                if best_t is None or r_t >= best_t:
                    best, best_t = v, r_t
            elif direction == "forward" and r_t >= t:
                if best_t is None or r_t < best_t:
                    best, best_t = v, r_t
        if best_t is not None and tolerance is not None:
            delta = t - best_t
            secs = delta.total_seconds() if hasattr(delta, "total_seconds") else float(delta)
            if abs(secs) > tolerance:
                best = None
        out.append(best)
    return out


def sessionize_oracle(timestamps, gap_seconds: float):
    """1-based session ids for a SORTED list of datetimes (one entity).
    New session when gap STRICTLY exceeds gap_seconds."""
    ids = []
    sid = 0
    prev = None
    for t in timestamps:
        if prev is None or (t - prev).total_seconds() > gap_seconds:
            sid += 1
        ids.append(sid)
        prev = t
    return ids


def thornton_oracle_row(x: np.ndarray) -> dict:
    """Naive per-row transcription of the Thornton-style score
    definitions — intentionally independent of the engine's
    shared-design-matrix vectorization (loops allowed here).  Used by
    tests/test_scores.py and by tools/gen_value_oracles.py as the
    independence check behind the committed VALUES oracle."""
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


def subband_oracle_row(mat: np.ndarray) -> dict:
    """Naive per-row transcription of the sub-band score definitions
    (functions/scores.SUBBAND_FIELDS) — loops over bands, independent
    of the engine's cube vectorization.  Used by tests/test_scores.py
    and tools/gen_value_oracles.py as the independence check."""
    mat = np.asarray(mat, dtype=np.float64)
    n_chan, n_bins = mat.shape
    zero = {k: 0.0 for k in (
        "sb_corr_mean", "sb_corr_frac", "sb_peak_jitter",
        "sb_intensity_cv", "sb_snr_mean", "sb_peak_col_cv")}
    if n_bins < 4 or n_chan < 2:
        return zero
    prof = mat.sum(axis=0)
    pc = prof - prof.mean()
    psd = prof.std()
    rs, jit2, snrs = [], [], []
    amax_p = int(prof.argmax())
    for b in range(n_chan):
        band = mat[b]
        bc = band - band.mean()
        bsd = band.std()
        denom = bsd * psd
        rs.append(float((bc * pc).mean() / denom) if denom > 0 else 0.0)
        d = abs(int(band.argmax()) - amax_p)
        d = min(d, n_bins - d)
        jit2.append((d / n_bins) ** 2)
        snrs.append(float((band.max() - band.mean()) / bsd) if bsd > 0 else 0.0)
    ssum = mat.sum(axis=1)
    col = mat[:, amax_p]
    return {
        "sb_corr_mean": float(np.mean(rs)),
        "sb_corr_frac": float(np.mean([1.0 if r >= 0.5 else 0.0 for r in rs])),
        "sb_peak_jitter": float(np.sqrt(np.mean(jit2))),
        "sb_intensity_cv": float(ssum.std() / ssum.mean()) if ssum.mean() > 0 else 0.0,
        "sb_snr_mean": float(np.mean(snrs)),
        "sb_peak_col_cv": float(col.std() / col.mean()) if col.mean() > 0 else 0.0,
    }
