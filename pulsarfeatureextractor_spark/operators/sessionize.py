"""Gap-based sessionization of observation runs (BASELINE.json
north_rule: "gap-based sessionization of observation runs").

Construction (SURVEY.md §2B W5) — all JVM window functions:

  new_session = (ts - lag(ts) > gap) OR first row of entity
  session_id  = running sum of new_session flags per entity (1-based)

One hash exchange on the entity key; the running sum and the lag share
the same window clustering, so Catalyst plans a single sort.  Per-
session aggregates afterwards group by (entity, session_id) — AQE
coalesces the post-aggregation partitions.
"""

from __future__ import annotations

from typing import Iterable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def sessionize(
    df: DataFrame,
    by: "str | Iterable[str]",
    ts: str,
    gap_seconds: float,
    session_col: str = "session_id",
) -> DataFrame:
    """Assign 1-based ``session_col`` per entity; a new session starts
    when the gap to the previous observation exceeds ``gap_seconds``.

    Boundary convention (pinned in tests + DuckDB oracle): a gap of
    EXACTLY ``gap_seconds`` does NOT start a new session (strict >).
    """
    by_cols = [by] if isinstance(by, str) else list(by)
    w = Window.partitionBy(*by_cols).orderBy(F.col(ts).asc())
    prev = F.lag(F.col(ts), 1).over(w)
    gap = F.col(ts).cast("double") - prev.cast("double")
    new_session = F.when(prev.isNull() | (gap > F.lit(float(gap_seconds))), 1).otherwise(0)
    running = Window.partitionBy(*by_cols).orderBy(F.col(ts).asc()).rowsBetween(
        Window.unboundedPreceding, 0
    )
    return df.withColumn(session_col, F.sum(new_session).over(running).cast("int"))


def session_aggregates(
    df: DataFrame,
    by: "str | Iterable[str]",
    ts: str,
    gap_seconds: float,
    extra_aggs: "dict[str, object] | None" = None,
) -> DataFrame:
    """Sessionize then aggregate: one row per (entity, session_id) with
    session_start / session_end / n_events (+ caller aggregates)."""
    by_cols = [by] if isinstance(by, str) else list(by)
    s = sessionize(df, by_cols, ts, gap_seconds)
    aggs = [
        F.min(ts).alias("session_start"),
        F.max(ts).alias("session_end"),
        F.count(F.lit(1)).alias("n_events"),
    ]
    for name, col in (extra_aggs or {}).items():
        aggs.append(col.alias(name))
    return s.groupBy(*by_cols, "session_id").agg(*aggs)
