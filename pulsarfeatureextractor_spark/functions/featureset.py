"""Type-selectable feature extraction — the engine's analogue of the
reference CLI's feature-type flag.

The reference family exposes a numbered feature-type switch choosing
which published feature set to emit per candidate (SURVEY.md §2A A9;
BASELINE.json north_star names the Lyon moments and Thornton-style
scores explicitly — those two are correctness-pinned; the remaining
sets are passthrough/derived conveniences in the same vectorized
patterns).  Sets:

- ``lyon``      : 4 moment features of the token array (A7; the 8-set
  = profile + DM curve is two rows/kinds of the same 4).
- ``thornton``  : 10 curve-fit/peak scores (A8 1-D subset).
- ``stats``     : SQL-expressible quick stats (S/N, peak offset) — the
  JVM-only tier for cheap prefiltering.
- ``widths``    : Eatough-style pulse-width / peak-shape features
  (W50/W25 proxies, peak-to-mean, crest) — JVM-only.
- ``peace``     : Lee et al. 2013 PEACE-style six scores (S/N, duty,
  segment persistence, decile contrast, peaks, smoothness) — JVM-only.
- ``spinn``     : Morello et al. 2014 SPINN-style six features
  (log S/N, duty, persistence, contrast, tail fraction, log length) —
  JVM-only, documented substitutions for absent DM/period inputs.
- ``raw``       : the token array cast to double, unmodified — the
  raw-bins passthrough set (classifier-side normalization).
- ``subband``   : Thornton/Bates-style 2-D sub-band scores (A8 2-D
  family) over the deterministic synthetic cube derived from the token
  curve (real sub-band data is absent from the hinted input shape; a
  real cube loads into the same flat band-major column and scores via
  ``scores.with_subband_scores`` directly).
- ``all``       : lyon + thornton + widths + stats.

Each set appends flat, prunable double columns; ``tokens`` is never
mutated (input_hint invariant).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

FEATURE_SETS = (
    "lyon", "thornton", "stats", "widths", "peace", "spinn", "subband",
    "raw", "all",
)


def extract_features(
    df: DataFrame, feature_set: str = "lyon", tokens_col: str = "tokens"
) -> DataFrame:
    """Append the chosen feature set's columns (see module docstring)."""
    from pulsarfeatureextractor_spark.functions.moments import with_lyon_features
    from pulsarfeatureextractor_spark.functions.scores import (
        with_profile_stats_sql,
        with_thornton_scores,
    )

    if feature_set == "lyon":
        return with_lyon_features(df, tokens_col)
    if feature_set == "thornton":
        return with_thornton_scores(df, tokens_col)
    if feature_set == "stats":
        return with_profile_stats_sql(df, tokens_col)
    if feature_set == "widths":
        from pulsarfeatureextractor_spark.functions.scores import with_width_features

        return with_width_features(df, tokens_col)
    if feature_set == "peace":
        from pulsarfeatureextractor_spark.functions.scores import with_peace_features

        return with_peace_features(df, tokens_col)
    if feature_set == "spinn":
        from pulsarfeatureextractor_spark.functions.scores import with_spinn_features

        return with_spinn_features(df, tokens_col)
    if feature_set == "subband":
        from pulsarfeatureextractor_spark.functions.scores import (
            with_subband_scores,
        )
        from pulsarfeatureextractor_spark.sources.tokenized import (
            with_synthetic_subbands,
        )

        return with_subband_scores(
            with_synthetic_subbands(df, tokens_col), "sb_flat"
        )
    if feature_set == "raw":
        return df.withColumn(
            "raw_bins",
            F.transform(F.col(tokens_col), lambda v: v.cast("double")),
        )
    if feature_set == "all":
        from pulsarfeatureextractor_spark.functions.scores import with_width_features

        out = with_lyon_features(df, tokens_col)
        out = with_thornton_scores(out, tokens_col)
        out = with_width_features(out, tokens_col)
        # stats columns duplicate two thornton columns; suffix them
        out = with_profile_stats_sql(
            out.withColumnRenamed("sn_ratio", "sn_ratio_t")
            .withColumnRenamed("peak_offset", "peak_offset_t"),
            tokens_col,
        )
        return out
    raise ValueError(f"unknown feature set {feature_set!r}; one of {FEATURE_SETS}")


def fused_features_arrow(
    df: DataFrame,
    tokens_col: str = "tokens",
    include_scores: bool = True,
    drop: "tuple[str, ...] | list[str]" = (),
) -> DataFrame:
    """Lyon moments (+ Thornton scores) in ONE ``mapInArrow`` pass —
    the production hot path for the full per-candidate workload.

    Why this exists: composing ``with_lyon_features`` then
    ``with_thornton_scores`` plans TWO consecutive PythonMapInArrow
    operators, i.e. two full JVM→Python→JVM Arrow round-trips in which
    the token arrays (~90% of the bytes) ride both crossings.  Arrow
    transfer is memory-bandwidth-bound, so at high core counts the
    duplicated crossing is contention, not just latency — fusing the
    two kernels into one pass halves the Python-boundary traffic and
    measurably improves N→4N scaling efficiency (BENCH/BASELINE.md).

    ``drop`` additionally removes columns from the OUTPUT batches at
    the Python boundary (typically ``("tokens",)`` once the features
    are computed) so the return crossing ships only the narrow feature
    columns instead of echoing the token buffers back to the JVM.

    Results are identical to the composed operators (pytest-pinned:
    moments bit-exact, scores allclose at 1e-12 — the lstsq kernel is
    batch-composition-dependent at ~1e-16).
    """
    import pyarrow as pa

    from pyspark.sql import types as T

    from pulsarfeatureextractor_spark.functions.moments import (
        LYON_FIELDS,
        moments_list_array,
    )
    from pulsarfeatureextractor_spark.functions.scores import (
        SCORE_FIELDS,
        scores_list_array,
    )

    dropset = set(drop)
    keep = [f for f in df.schema.fields if f.name not in dropset]
    feat_names = list(LYON_FIELDS) + (list(SCORE_FIELDS) if include_scores else [])
    out_schema = T.StructType(
        list(keep) + [T.StructField(n, T.DoubleType(), True) for n in feat_names]
    )
    keep_names = [f.name for f in keep]

    def compute(batches):
        for batch in batches:
            tok = batch.column(tokens_col)
            mats = [moments_list_array(tok)]
            if include_scores:
                mats.append(scores_list_array(tok))
            arrays = [batch.column(n) for n in keep_names]
            for mat in mats:
                arrays.extend(
                    pa.array(mat[:, i], type=pa.float64())
                    for i in range(mat.shape[1])
                )
            yield pa.RecordBatch.from_arrays(arrays, names=keep_names + feat_names)

    return df.mapInArrow(compute, out_schema)
