"""Skew-salted equi join for hot keys (BASELINE.json north_star:
"salting + AQE skew-join handling for hot doc_id/source keys").

AQE's skew-join split (enabled in session.py) is the backstop; this
explicit construction is for keys so hot that even a split partition
overwhelms one task, and for window/groupBy skew AQE does not cover.

Construction (SURVEY.md §2B J6): append a salt in [0, k) to the big
(skewed) side's key — ``pmod(xxhash64(<unique cols>), k)`` so rows of
a hot key spread over k partitions — and EXPLODE the small side k ways
so every salted key still finds its match.  Correctness is proven in
tests by equality with the unsalted join, and in the driver gate by a
plain-SQL DuckDB oracle.

Cost model at scale: big side shuffles once on (key, salt) — same
bytes as the unsalted shuffle but k-way spread of the hot key; small
side is duplicated k× (choose k ~ hot-key-rows / target-partition-rows,
small side stays broadcastable for k·|small| under the broadcast
threshold).
"""

from __future__ import annotations

from typing import Iterable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_SALT = "__salt"


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: "str | Iterable[str]",
    k: int = 8,
    how: str = "inner",
    broadcast_small: bool = True,
) -> DataFrame:
    """Equi-join ``big ⋈ small`` on ``on`` with k-way salt on the big side.

    Result is identical to ``big.join(small, on, how)`` for how in
    ('inner', 'left'); the salt never leaks into the output schema.
    """
    on_cols = [on] if isinstance(on, str) else list(on)
    if how not in ("inner", "left"):
        raise ValueError("salted_join supports inner/left (salt preserves those)")

    # Salt from ALL big-side columns -> uniform spread even when the
    # join key is constant-hot; deterministic (no rand()) so retried
    # tasks re-produce the same partitioning (speculative execution safe).
    salt = F.pmod(F.xxhash64(*[F.col(c) for c in big.columns]), F.lit(k)).cast("int")
    big_salted = big.withColumn(_SALT, salt)

    salts = F.explode(F.sequence(F.lit(0), F.lit(k - 1))).alias(_SALT)
    small_exploded = small.select(F.col("*"), salts)
    if broadcast_small:
        small_exploded = F.broadcast(small_exploded)

    joined = big_salted.join(small_exploded, on_cols + [_SALT], how)
    return joined.drop(_SALT)
