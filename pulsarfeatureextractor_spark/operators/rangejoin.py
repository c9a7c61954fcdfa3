"""Range (interval) join with time-bucket prefilter (SURVEY.md §2B J5).

Naive non-equi time-range joins degenerate to per-key nested loops; at
100 TB that's quadratic in the hot key.  Construction: quantize time
into buckets of the window width, equi-join on (key, bucket) for the
(few) buckets an interval can overlap, then apply the exact range
predicate.  The bucket key turns the theta-join into a hash join —
shuffle on (key, bucket), each task sees only candidate rows.
"""

from __future__ import annotations

from typing import Iterable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def range_join_count(
    left: DataFrame,
    right: DataFrame,
    by: "str | Iterable[str]",
    left_ts: str,
    right_ts: str,
    window_seconds: int,
    count_col: str = "n_in_range",
    include_start: bool = False,
) -> DataFrame:
    """For each left row, count right rows of the same entity with
    right_ts in (left_ts, left_ts + window_seconds]  (start exclusive
    unless include_start, end inclusive).

    Left rows with zero matches are kept (count 0).
    """
    by_cols = [by] if isinstance(by, str) else list(by)
    w = int(window_seconds)

    l_sec = F.col(left_ts).cast("double")
    r_sec = F.col(right_ts).cast("double")
    l_bucket = F.floor(l_sec / w).cast("long")
    r_bucket = F.floor(r_sec / w).cast("long")

    l_keyed = left.withColumn("__lb", l_bucket)
    # a (t, t+w] window spans at most 2 buckets of width w
    r_keyed = right.select(
        *by_cols, F.col(right_ts).alias("__rts"), r_bucket.alias("__rb")
    ).withColumn("__b", F.explode(F.array(F.col("__rb"), F.col("__rb") - 1)))

    rts_sec = r_keyed["__rts"].cast("double")
    l_sec_k = l_keyed[left_ts].cast("double")
    lower_ok = rts_sec >= l_sec_k if include_start else rts_sec > l_sec_k
    # range predicate INSIDE the left join: unmatched left rows keep a
    # null __rts and count as 0 (a post-join filter would drop them)
    cond = [
        *(l_keyed[c] == r_keyed[c] for c in by_cols),
        l_keyed["__lb"] == r_keyed["__b"],
        lower_ok,
        rts_sec <= l_sec_k + F.lit(float(w)),
    ]
    matches = l_keyed.join(r_keyed, cond, "left")
    # left rows must be unique (e.g. carry a unique event id) — counts
    # are per distinct left row
    out = (
        matches.groupBy(*[l_keyed[c] for c in left.columns])
        .agg(F.count(r_keyed["__rts"]).alias(count_col))
    )
    return out.select(*left.columns, count_col)
