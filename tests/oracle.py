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
