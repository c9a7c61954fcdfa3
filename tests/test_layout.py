"""Z-order clustered layout (sinks/layout.py): key math, row
preservation, plan shape, and the actual file-skipping win vs a
single-column sort layout on a 2-D box predicate."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pulsarfeatureextractor_spark.sinks.layout import (
    files_overlapping,
    per_file_ranges,
    with_zorder_key,
    write_zordered,
    zorder_key,
)


def _grid(spark, n=64):
    """n×n grid of (x, y) — every cell once, deterministic."""
    return (
        spark.range(0, n * n)
        .select((F.col("id") % n).alias("x"),
                (F.col("id") / n).cast("long").alias("y"),
                F.col("id").alias("payload"))
    )


def test_zorder_key_interleaves_bits(spark):
    """Hand-check: with 2 columns and small ranks, the Morton key is
    the classic bit interleave (x bit i -> z bit 2i, y bit i -> 2i+1)."""
    df = spark.createDataFrame(
        [(0, 0), (1, 0), (0, 1), (1, 1), (2, 3)], "x long, y long")
    out = df.select(
        "x", "y",
        zorder_key([F.col("x"), F.col("y")], bits=4).alias("z")).collect()
    got = {(r["x"], r["y"]): r["z"] for r in out}
    assert got == {(0, 0): 0, (1, 0): 1, (0, 1): 2, (1, 1): 3,
                   (2, 3): 0b1110}  # x=10, y=11 -> z = y1 x1 y0 x0 = 1110


def test_rows_preserved_and_bounds(spark, tmp_path):
    df = _grid(spark, 32)
    p = str(tmp_path / "z")
    write_zordered(df, p, ["x", "y"], n_files=8)
    back = spark.read.parquet(p)
    assert back.count() == 32 * 32
    assert set(back.columns) == {"x", "y", "payload"}  # key dropped
    assert back.select(F.sum("payload")).first()[0] == \
        df.select(F.sum("payload")).first()[0]


def test_null_and_degenerate_columns(spark):
    """NULLs rank 0 and a constant column contributes nothing — no
    crash, key still defined for every row."""
    df = spark.createDataFrame(
        [(None, 5, 1), (3, 5, 2), (9, 5, 3)], "x int, y int, p int")
    out = with_zorder_key(df, ["x", "y"], bits=8)
    rows = out.collect()
    assert all(r["__z"] is not None for r in rows)


def test_bits_budget_guard(spark):
    df = _grid(spark, 4)
    with pytest.raises(ValueError, match="exceeds"):
        with_zorder_key(df, ["x", "y"], bits=32)


def test_zorder_prunes_both_dimensions(spark, tmp_path):
    """The point of the layout: BALANCED pruning.  A linear sort on x
    prunes x-predicates perfectly and y-predicates not at all (every
    file spans all of y); z-order prunes BOTH.  Pinned: (a) a
    y-selective predicate touches strictly fewer z-ordered files, and
    (b) the worst case over the two single-dimension predicates is
    strictly better under z-order."""
    df = _grid(spark, 64)  # 4096 rows
    n_files = 16
    zp, lp = str(tmp_path / "z"), str(tmp_path / "linear")
    write_zordered(df, zp, ["x", "y"], n_files=n_files)
    (df.repartitionByRange(n_files, "x").sortWithinPartitions("x")
       .write.parquet(lp))

    box_y = {"y": (24, 39)}   # middle 25% of the SECONDARY dimension
    box_x = {"x": (24, 39)}
    z_y, l_y = files_overlapping(spark, zp, box_y), \
        files_overlapping(spark, lp, box_y)
    z_x, l_x = files_overlapping(spark, zp, box_x), \
        files_overlapping(spark, lp, box_x)
    # the linear layout cannot prune y at all
    assert len(l_y) == n_files
    assert len(z_y) < len(l_y), (len(z_y), len(l_y))
    # worst case over the two dims: z-order strictly better
    assert max(len(z_x), len(z_y)) < max(len(l_x), len(l_y))
    # and the pruned set still contains every matching row
    matches = (
        spark.read.parquet(*z_y)
        .where(F.col("y").between(*box_y["y"]))
        .count()
    )
    assert matches == 16 * 64


def test_per_file_ranges_shape(spark, tmp_path):
    df = _grid(spark, 16)
    p = str(tmp_path / "z")
    write_zordered(df, p, ["x", "y"], n_files=4)
    pr = per_file_ranges(spark, p, ["x", "y"]).collect()
    assert len(pr) == 4
    for r in pr:
        assert r["min_x"] <= r["max_x"] and r["min_y"] <= r["max_y"]
