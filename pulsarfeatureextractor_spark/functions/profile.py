"""Column profiling: per-group numeric summaries for pipeline QA.

A training-data pipeline's first query against a new 100 TB drop is a
profile: row counts, ranges, moments, and a median per partition-ish
group.  One hash aggregate per call — count/min/max/avg/stddev are
partial-aggregable (map-side combine), and the median uses Spark's
exact `percentile` (sort-based within group).  At 100 TB swap
`exact_median=False` to use `approx_percentile` (t-digest sketch,
also partial-aggregable) — the exact median of a billion-row group is
rarely worth its sort.

Floats are rounded to 6 decimals so results are engine-reproducible
(DuckDB oracle: avg/stddev_samp/quantile_cont agree after rounding —
integer sums are exact, interpolation is linear in both).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def numeric_profile(
    df: DataFrame,
    group_col: str,
    value_col: str,
    exact_median: bool = True,
) -> DataFrame:
    """(group, n, min, max, avg, stddev, median) for one numeric column."""
    med = (
        F.percentile(F.col(value_col), F.lit(0.5))
        if exact_median
        else F.percentile_approx(F.col(value_col), F.lit(0.5))
    )
    return df.groupBy(group_col).agg(
        F.count(F.lit(1)).alias("n"),
        F.min(value_col).alias("v_min"),
        F.max(value_col).alias("v_max"),
        F.round(F.avg(value_col), 6).alias("v_avg"),
        F.round(F.stddev_samp(value_col), 6).alias("v_stddev"),
        F.round(med, 6).alias("v_median"),
    )
