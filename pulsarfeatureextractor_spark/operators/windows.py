"""Windowed feature operators: lag/lead, forward/backward fill,
rolling frame aggregates, top-k per entity.

All pure JVM window functions over ``partitionBy(entity).orderBy(ts)``
— the SAME clustering as the as-of join, so Catalyst elides repeat
exchanges when these are composed after ``asof_join`` (SURVEY.md §4:
the engine's "optimizer" is composition discipline).  No Python
anywhere in this module's dataflow.
"""

from __future__ import annotations

from typing import Iterable, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def _entity_window(by: "str | Iterable[str]", ts: str) -> Window:
    by_cols = [by] if isinstance(by, str) else list(by)
    return Window.partitionBy(*by_cols).orderBy(F.col(ts).asc())


def lagged(
    df: DataFrame,
    by: "str | Iterable[str]",
    ts: str,
    cols: Sequence[str],
    offsets: Sequence[int] = (1,),
    include_delta_t: bool = True,
) -> DataFrame:
    """lag/lead features: ``<col>_lag<k>`` (k>0) / ``<col>_lead<k>`` (k<0),
    plus ``delta_t_prev`` seconds since the previous observation."""
    w = _entity_window(by, ts)
    out = df
    for c in cols:
        for k in offsets:
            if k >= 0:
                out = out.withColumn(f"{c}_lag{k}", F.lag(F.col(c), k).over(w))
            else:
                out = out.withColumn(f"{c}_lead{-k}", F.lead(F.col(c), -k).over(w))
    if include_delta_t:
        prev_ts = F.lag(F.col(ts), 1).over(w)
        out = out.withColumn(
            "delta_t_prev",
            F.col(ts).cast("double") - prev_ts.cast("double"),
        )
    return out


def ffill(
    df: DataFrame, by: "str | Iterable[str]", ts: str, cols: Sequence[str]
) -> DataFrame:
    """Forward-fill: propagate the last non-null value per entity.

    last(ignorenulls) over the unbounded-preceding frame — the standard
    leakage-free construction (only PAST rows are in the frame).
    """
    w = _entity_window(by, ts).rowsBetween(Window.unboundedPreceding, 0)
    out = df
    for c in cols:
        out = out.withColumn(c, F.last(F.col(c), ignorenulls=True).over(w))
    return out


def bfill(
    df: DataFrame, by: "str | Iterable[str]", ts: str, cols: Sequence[str]
) -> DataFrame:
    """Backward-fill: first non-null over the following frame.

    NOT leakage-free (reads future rows) — provided for offline label
    construction only; never compose into the feature path.
    """
    w = _entity_window(by, ts).rowsBetween(0, Window.unboundedFollowing)
    out = df
    for c in cols:
        out = out.withColumn(c, F.first(F.col(c), ignorenulls=True).over(w))
    return out


def rolling_agg(
    df: DataFrame,
    by: "str | Iterable[str]",
    ts: str,
    aggs: "dict[str, Column]",
    window_seconds: int,
) -> DataFrame:
    """Trailing time-range aggregates, e.g. 7-day rolling sum/mean.

    rangeBetween over epoch seconds: frame = (t - window_seconds, t]
    inclusive of the current row — trailing, hence leakage-free.
    ``aggs`` maps output name -> aggregate Column (e.g. F.sum("value")).
    """
    by_cols = [by] if isinstance(by, str) else list(by)
    # epoch-seconds ordering (long): rangeBetween needs integral bounds;
    # second granularity is the engine's range-frame resolution.
    sec = F.col(ts).cast("long")
    w = (
        Window.partitionBy(*by_cols)
        .orderBy(sec)
        .rangeBetween(-int(window_seconds), 0)
    )
    out = df
    for name, agg_col in aggs.items():
        out = out.withColumn(name, agg_col.over(w))
    return out


def top_k_per_group(
    df: DataFrame,
    by: "str | Iterable[str]",
    order: Sequence[Column],
    k: int,
    rank_col: str = "rn",
) -> DataFrame:
    """k best rows per entity by ``order`` (deterministic if order is a
    total order — callers add a unique tiebreaker column).

    Physical plan: single hash exchange on the group keys + in-partition
    sort + WindowGroupLimit (Spark 4 pushes rank<=k below the window —
    partial top-k per map task, like a combiner)."""
    by_cols = [by] if isinstance(by, str) else list(by)
    w = Window.partitionBy(*by_cols).orderBy(*order)
    return (
        df.withColumn(rank_col, F.row_number().over(w))
        .where(F.col(rank_col) <= k)
    )
