"""Weighted corpus mixing to a token budget (deterministic up/down-sampling).

LLM training corpora are assembled from many sources whose *available*
token counts do not match the *desired* mixture: the recipe says
"web 67 %, code 15 %, wiki 4.5 % ..." of an N-token budget, and each
source must be deterministically down-sampled (rate < 1) or up-sampled
/ multi-epoched (rate > 1) to hit its target.  This is the mixing
stage of the published LLaMA / GPT-3 / DoReMi-style pipelines.

``mix_corpora`` implements it engine-side with no RNG state and no
driver-side data movement:

1. ONE hash aggregate computes per-source available tokens
   (map-side combinable; output is K rows for K sources — metadata).
2. The per-source acceptance rate is a pure expression over that tiny
   aggregate: ``rate_s = (budget * w_s / sum(w)) / tokens_s``,
   optionally clamped by ``max_rate`` (epoch cap).
3. The aggregate is **broadcast-joined** back onto the corpus — the
   big side is never shuffled.
4. Each row emits ``floor(rate)`` full copies plus one more with
   probability ``frac(rate)``, decided by the same portable seeded
   md5 bucket used by :func:`..functions.splits.hash_split` — so the
   sample is deterministic across reruns, partitionings, AND engines
   (the DuckDB oracle runs the identical expression text).
5. Copies materialize as a codegen'd ``explode(sequence(...))`` with a
   ``copy_ix`` column (0-based) so downstream packing/shuffling can
   distinguish epochs.

100 TB posture: one tiny aggregate shuffle (K source keys, partial
aggregation makes it a few bytes per task), then a single fused
scan→broadcast-join→project→explode stage over the corpus — row-local,
whole-stage codegen, no Python, no skew (the join key's heaviest value
costs one array lookup per row, not a shuffle partition).

The fractional acceptance threshold is quantized to 1/4096 (the md5
bucket width), i.e. achieved tokens match the target to ~0.02 % of a
source — far below corpus-level noise, and exactly reproducible.
"""

from __future__ import annotations

from typing import Mapping

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.splits import _MD5_BUCKETS, _md5_bucket_expr

__all__ = [
    "mix_corpora",
    "mixing_copies_sql",
    "source_token_counts",
    "temperature_weights",
]


def source_token_counts(
    df: DataFrame, source_col: str = "source", token_col: str = "n_chars"
) -> "dict[str, float]":
    """Per-source available-token totals as a plain dict — ONE
    map-side-combinable aggregate whose result is K rows for K sources
    (metadata-sized collect, same class as the mixing rate table)."""
    return {
        r[0]: float(r[1])
        for r in df.groupBy(source_col)
        .agg(F.sum(F.col(token_col)).cast("double"))
        .collect()
        if r[0] is not None
    }


def temperature_weights(
    token_counts: "Mapping[str, float]", alpha: float = 0.3
) -> "dict[str, float]":
    """Temperature-based mixture weights: ``w_s ∝ p_s**alpha`` where
    ``p_s`` is source s's share of available tokens — the mT5 / XLM-R
    sampling rule (their α≈0.3; some papers write a temperature T with
    exponent 1/T, so T≈3.33 is the same thing).  α=1 reproduces the
    natural distribution; α→0 approaches uniform; in between,
    low-resource sources are up-weighted without letting any single
    giant source dominate the budget.

    Pure driver-side arithmetic over the K-entry counts dict (pair it
    with :func:`source_token_counts`); feed the result straight into
    :func:`mix_corpora` as ``weights``.  Weights are normalized to sum
    to 1 so recipes stay human-readable in lineage metadata."""
    if not 0.0 <= alpha <= 1.0:
        raise ValueError(f"alpha must be in [0, 1], got {alpha}")
    pos = {s: c for s, c in token_counts.items() if c > 0}
    if not pos:
        raise ValueError("temperature_weights: no source has tokens")
    total = sum(pos.values())
    raw = {s: (c / total) ** alpha for s, c in pos.items()}
    z = sum(raw.values())
    return {s: v / z for s, v in sorted(raw.items())}


def _weight_case_sql(source_sql: str, weights: Mapping[str, float]) -> str:
    """CASE text mapping source values to their mixture weight —
    identical in Spark SQL and DuckDB."""
    arms = []
    for name in sorted(weights):
        if "'" in name or "\\" in name:
            raise ValueError("source names must not contain quotes or backslashes")
        arms.append(f"WHEN '{name}' THEN {float(weights[name])!r}")
    return f"(CASE {source_sql} " + " ".join(arms) + " ELSE 0.0 END)"


def mixing_copies_sql(
    source_sql: str,
    id_sql: str,
    tokens_sql: str,
    weights: Mapping[str, float],
    budget_tokens: float,
    seed: str = "",
    max_rate: float | None = None,
) -> str:
    """The shared per-row copy-count expression (Spark SQL == DuckDB SQL).

    ``tokens_sql`` must reference the per-SOURCE available-token total
    (double).  Exposed so the driver oracle can embed the *identical*
    text — engine-portability is part of the operator's contract, like
    ``hash_split``'s md5 tier.
    """
    if budget_tokens <= 0:
        raise ValueError("budget_tokens must be positive")
    wsum = float(sum(weights.values()))
    if wsum <= 0:
        raise ValueError("weights must sum to a positive value")
    w = _weight_case_sql(source_sql, weights)
    rate = f"((({float(budget_tokens)!r} * {w}) / {wsum!r}) / {tokens_sql})"
    if max_rate is not None:
        rate = f"LEAST({rate}, {float(max_rate)!r})"
    # a source whose available tokens are <= 0 cannot contribute: without
    # this guard the IEEE division yields +Infinity, non-ANSI
    # CAST(FLOOR(inf) AS INT) saturates to 2^31-1, and sequence() blows
    # the array-size limit mid-stage instead of sampling zero copies
    rate = f"(CASE WHEN {tokens_sql} <= 0 THEN 0.0 ELSE {rate} END)"
    bucket = _md5_bucket_expr(id_sql, seed)
    return (
        f"CAST(FLOOR({rate}) AS INT) + (CASE WHEN {bucket} < "
        f"CAST(FLOOR(({rate} - FLOOR({rate})) * {_MD5_BUCKETS}) AS INT) "
        f"THEN 1 ELSE 0 END)"
    )


def mix_corpora(
    df: DataFrame,
    weights: Mapping[str, float],
    budget_tokens: float,
    source_col: str = "source",
    token_col: str = "n_chars",
    id_col: str = "doc_id",
    seed: str = "",
    max_rate: float | None = None,
    copy_out: str = "copy_ix",
) -> DataFrame:
    """Deterministically re-sample ``df`` so each source contributes
    ``budget_tokens * w_s / sum(w)`` tokens in expectation.

    Sources absent from ``weights`` are dropped (weight 0).  Rows of an
    up-sampled source appear multiple times, distinguished by
    ``copy_out`` (bigint, 0-based); rows of a down-sampled source
    appear once or not at all.  Output = input columns + ``copy_out``.
    """
    if not weights:
        raise ValueError("weights must be non-empty")
    totals = (
        df.where(F.col(source_col).isin(list(weights)))
        .groupBy(source_col)
        .agg(F.sum(F.col(token_col)).cast("double").alias("__src_tokens"))
    )
    copies = mixing_copies_sql(
        source_col, id_col, "__src_tokens", weights, budget_tokens, seed, max_rate
    )
    joined = df.join(F.broadcast(totals), on=source_col, how="inner")
    out = joined.withColumn("__copies", F.expr(copies))
    out = out.withColumn(
        copy_out,
        F.explode(
            F.when(
                F.col("__copies") > 0,
                F.sequence(F.lit(0), F.col("__copies") - F.lit(1)),
            ).otherwise(F.array().cast("array<int>"))
        ),
    )
    # bigint to match lateral-unnest engines (a generator cannot be
    # nested inside the cast expression itself)
    out = out.withColumn(copy_out, F.col(copy_out).cast("long"))
    return out.drop("__copies", "__src_tokens")
