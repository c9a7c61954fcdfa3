"""Copy-on-write MERGE on the Iceberg-like snapshot table."""

from __future__ import annotations

import tempfile

from pyspark.sql import functions as F

from pulsarfeatureextractor_spark.sinks.manifest import IcebergLikeTable


def _rows(df):
    return sorted((r["k"], r["v"]) for r in df.collect())


def test_merge_upsert_replaces_and_inserts(spark):
    path = tempfile.mkdtemp(prefix="merge_tbl_")
    tbl = IcebergLikeTable(path)
    # two appends → two data dirs (multiple files)
    tbl.write(
        spark.createDataFrame([(1, "a"), (2, "b")], "k long, v string").repartition(1)
    )
    tbl.write(
        spark.createDataFrame([(3, "c"), (4, "d")], "k long, v string").repartition(1),
        mode="append",
    )
    pre_man = tbl.manifest()
    assert pre_man["total_rows"] == 4

    upd = spark.createDataFrame([(2, "B2"), (5, "e")], "k long, v string")
    man = tbl.merge_upsert(upd, keys=["k"])
    assert man["operation"] == "merge"
    # replaced 2, inserted 5, untouched 1/3/4
    assert _rows(tbl.read(spark)) == [
        (1, "a"),
        (2, "B2"),
        (3, "c"),
        (4, "d"),
        (5, "e"),
    ]
    # copy-on-write: the file holding keys {3,4} is carried over verbatim
    carried = {f["path"] for f in man["files"]} & {
        f["path"] for f in pre_man["files"]
    }
    assert len(carried) >= 1
    assert man["metrics"]["files_rewritten"] == 1
    assert man["metrics"]["files_carried"] == 1
    # time travel: pre-merge snapshot unchanged
    assert _rows(tbl.read(spark, pre_man["snapshot_id"])) == [
        (1, "a"),
        (2, "b"),
        (3, "c"),
        (4, "d"),
    ]


def test_merge_upsert_on_empty_table_inserts(spark):
    path = tempfile.mkdtemp(prefix="merge_tbl_")
    tbl = IcebergLikeTable(path)
    man = tbl.merge_upsert(
        spark.createDataFrame([(1, "a")], "k long, v string"), keys=["k"]
    )
    assert man["total_rows"] == 1
    assert _rows(tbl.read(spark)) == [(1, "a")]


def test_merge_upsert_no_matches_carries_all_files(spark):
    path = tempfile.mkdtemp(prefix="merge_tbl_")
    tbl = IcebergLikeTable(path)
    tbl.write(spark.createDataFrame([(1, "a"), (2, "b")], "k long, v string"))
    pre_files = {f["path"] for f in tbl.manifest()["files"]}
    man = tbl.merge_upsert(
        spark.createDataFrame([(9, "z")], "k long, v string"), keys=["k"]
    )
    assert pre_files <= {f["path"] for f in man["files"]}
    assert man["metrics"]["files_rewritten"] == 0
    assert _rows(tbl.read(spark)) == [(1, "a"), (2, "b"), (9, "z")]


def test_read_incremental_appends_only(spark):
    path = tempfile.mkdtemp(prefix="incr_tbl_")
    tbl = IcebergLikeTable(path)
    m1 = tbl.write(spark.createDataFrame([(1, "a")], "k long, v string"))
    m2 = tbl.write(
        spark.createDataFrame([(2, "b")], "k long, v string"), mode="append"
    )
    m3 = tbl.write(
        spark.createDataFrame([(3, "c")], "k long, v string"), mode="append"
    )
    assert _rows(tbl.read_incremental(spark, m1["snapshot_id"])) == [
        (2, "b"),
        (3, "c"),
    ]
    assert _rows(
        tbl.read_incremental(spark, m1["snapshot_id"], m2["snapshot_id"])
    ) == [(2, "b")]
    assert tbl.read_incremental(spark, m3["snapshot_id"]).count() == 0


def test_read_incremental_sees_merge_rewrites(spark):
    path = tempfile.mkdtemp(prefix="incr_tbl_")
    tbl = IcebergLikeTable(path)
    m1 = tbl.write(
        spark.createDataFrame([(1, "a"), (2, "b")], "k long, v string").repartition(1)
    )
    tbl.merge_upsert(
        spark.createDataFrame([(2, "B2"), (3, "c")], "k long, v string"), keys=["k"]
    )
    # the merge rewrote the file holding (1,2): incremental sees the
    # rewritten content (1 unchanged, 2 updated) plus the insert
    assert _rows(tbl.read_incremental(spark, m1["snapshot_id"])) == [
        (1, "a"),
        (2, "B2"),
        (3, "c"),
    ]


def test_read_incremental_skips_compaction(spark):
    path = tempfile.mkdtemp(prefix="incr_tbl_")
    tbl = IcebergLikeTable(path)
    m1 = tbl.write(spark.createDataFrame([(1, "a")], "k long, v string"))
    tbl.write(spark.createDataFrame([(2, "b")], "k long, v string"), mode="append")
    tbl.compact()  # re-layout only — must contribute nothing
    got = _rows(tbl.read_incremental(spark, m1["snapshot_id"]))
    assert got == [(2, "b")]


def test_read_incremental_raises_across_overwrite(spark):
    import pytest

    path = tempfile.mkdtemp(prefix="incr_tbl_")
    tbl = IcebergLikeTable(path)
    m1 = tbl.write(spark.createDataFrame([(1, "a")], "k long, v string"))
    tbl.write(
        spark.createDataFrame([(9, "z")], "k long, v string"), mode="overwrite"
    )
    with pytest.raises(ValueError, match="overwrite"):
        tbl.read_incremental(spark, m1["snapshot_id"])


def test_merge_upsert_schema_evolution(spark):
    path = tempfile.mkdtemp(prefix="merge_tbl_")
    tbl = IcebergLikeTable(path)
    tbl.write(spark.createDataFrame([(1, "a")], "k long, v string"))
    tbl.write(
        spark.createDataFrame([(2, "b", 7)], "k long, v string, extra long"),
        mode="append",
    )
    tbl.merge_upsert(
        spark.createDataFrame([(1, "A1")], "k long, v string"), keys=["k"]
    )
    rows = {r["k"]: (r["v"], r["extra"]) for r in tbl.read(spark).collect()}
    assert rows == {1: ("A1", None), 2: ("b", 7)}
