"""Pin the pure-Python XXH64 port bit-for-bit against Spark's JVM
xxhash64 — the oracle-side hash (tools/gen_value_oracles.py) must be a
genuinely independent SECOND implementation of the SAME public
function, or the VALUES-literal oracles prove nothing."""

import string

import numpy as np
import pytest
from pyspark.sql import functions as F

from tools.xxh64 import xxh64


def test_xxh64_matches_spark(spark):
    rng = np.random.default_rng(7)
    samples = ["", "a", "of the and", "héllo ünïcode ☃"]
    # every tail-length class of the algorithm (mod 32 / 8 / 4 / 1)
    samples += ["x" * n for n in range(1, 40)]
    alphabet = np.array(list(string.printable))
    samples += [
        "".join(rng.choice(alphabet, size=int(n)))
        for n in rng.integers(1, 200, size=30)
    ]
    df = spark.createDataFrame([(s,) for s in samples], "s string")
    for row in df.select("s", F.xxhash64("s").alias("h")).collect():
        assert xxh64(row["s"]) == row["h"], row["s"]


def test_xxh64_explicit_seed(spark):
    df = spark.createDataFrame([("abc",)], "s string")
    [row] = df.select(F.xxhash64(F.lit(42).cast("long"), "s").alias("h")).collect()
    # hashing (long 42, "abc") != xxh64("abc", seed=42): Spark folds the
    # first column's hash into the seed of the second.  Guard that the
    # port only claims the single-string-column case.
    assert xxh64("abc") != row["h"]


@pytest.mark.parametrize("n", [0, 3, 4, 7, 8, 31, 32, 33, 63, 64, 65])
def test_xxh64_length_boundaries_stable(n):
    # regression pin: algorithm must be deterministic across calls
    s = "q" * n
    assert xxh64(s) == xxh64(s)
