"""Storage-bucketed (Exchange-free) as-of == window plan, and stays
Exchange-free.

The zero-exchange claim is the structural scaling argument (VERDICT r01
#6): the one shuffle in the point-in-time workload moves to a one-time
bucketed-layout write, and every later as-of query is Scan → Sort →
Window → Filter with no Exchange at all.
"""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from pulsarfeatureextractor_spark.operators.asof import (
    asof_bucketed_storage,
    asof_join,
    prepare_bucketed_asof_table,
)


@pytest.fixture(scope="module")
def sides(spark):
    left = spark.range(0, 20000).select(
        F.when(F.col("id") % 97 == 0, None)
        .otherwise(F.col("id") % 300).alias("doc_id"),
        F.timestamp_seconds(
            1700000000 + F.pmod(F.xxhash64("id"), F.lit(100000))
        ).alias("ts"),
        F.col("id").alias("event_id"),
    )
    right = spark.range(0, 5000).select(
        (F.col("id") % 300).alias("doc_id"),
        F.timestamp_seconds(
            1700000000 + F.pmod(F.xxhash64("id", F.lit(1)), F.lit(100000))
        ).alias("ts"),
        (F.col("id").cast("double") * 1.5).alias("v"),
    )
    return left, right


@pytest.fixture(scope="module")
def stored(spark, sides, tmp_path_factory):
    left, right = sides
    path = str(tmp_path_factory.mktemp("asof_storage") / "tbl")
    name = "asof_storage_test_tbl"
    prepare_bucketed_asof_table(
        left, right, name, path, on="ts", by="doc_id",
        value_cols=["v"], n_buckets=8,
    )
    return name


def _canon(df):
    pdf = df.toPandas().sort_values("event_id").reset_index(drop=True)
    return pdf[sorted(pdf.columns)]


def test_storage_plan_has_zero_exchanges(spark, stored):
    got = asof_bucketed_storage(spark, stored, on="ts", by="doc_id",
                                value_cols=["v"])
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 0, plan
    assert "Bucketed: true" in plan, plan


def test_storage_equals_window_plan(spark, sides, stored):
    left, right = sides
    ref = asof_join(left, right, on="ts", by="doc_id",
                    value_cols=["v"], strategy="window")
    got = asof_bucketed_storage(spark, stored, on="ts", by="doc_id",
                                value_cols=["v"])
    pd.testing.assert_frame_equal(_canon(ref), _canon(got))


def test_storage_equals_window_plan_with_tolerance(spark, sides, stored):
    left, right = sides
    ref = asof_join(left, right, on="ts", by="doc_id",
                    value_cols=["v"], strategy="window", tolerance=3600.0)
    got = asof_bucketed_storage(spark, stored, on="ts", by="doc_id",
                                value_cols=["v"], tolerance=3600.0)
    pd.testing.assert_frame_equal(_canon(ref), _canon(got))


def test_sorted_table_elides_sort_and_matches(spark, sides, stored):
    """sort=True layout + elide_sort=True → Scan → Window → Filter:
    no Exchange AND no Sort, still bit-equal to the window plan."""
    left, right = sides
    try:
        got = asof_bucketed_storage(spark, stored, on="ts", by="doc_id",
                                    value_cols=["v"], elide_sort=True)
        plan = got._jdf.queryExecution().executedPlan().toString()
        assert plan.count("Exchange") == 0, plan
        assert plan.count("Sort ") == 0, plan
        ref = asof_join(left, right, on="ts", by="doc_id",
                        value_cols=["v"], strategy="window")
        pd.testing.assert_frame_equal(_canon(ref), _canon(got))
    finally:
        spark.conf.unset("spark.sql.legacy.bucketedTableScan.outputOrdering")


def test_multi_file_bucket_reinserts_sort(spark, sides, stored, tmp_path):
    """Safety of sort elision: when a bucket holds MORE than one file,
    Spark itself refuses the ordering claim and re-inserts the Sort —
    no silent wrong results from appended files."""
    import glob
    import os
    import shutil

    src_dir = (spark.sql(f"DESCRIBE TABLE EXTENDED {stored}")
               .where("col_name = 'Location'").first()["data_type"]
               .replace("file:", ""))
    dup_dir = str(tmp_path / "dup")
    shutil.copytree(src_dir, dup_dir)
    a_file = sorted(glob.glob(os.path.join(dup_dir, "part-*_00003*")))[0]
    shutil.copy(a_file, a_file.replace("part-00003", "part-00900"))
    schema = spark.read.parquet(dup_dir).schema
    cols = ", ".join(f"`{f.name}` {f.dataType.simpleString()}"
                     for f in schema.fields)
    spark.sql("DROP TABLE IF EXISTS asof_storage_dup_tbl")
    spark.sql(
        f"CREATE TABLE asof_storage_dup_tbl ({cols}) USING PARQUET "
        f"CLUSTERED BY (doc_id) "
        f"SORTED BY (doc_id, ts, `__asof_side`) "
        f"INTO 8 BUCKETS LOCATION '{dup_dir}'"
    )
    try:
        got = asof_bucketed_storage(spark, "asof_storage_dup_tbl", on="ts",
                                    by="doc_id", value_cols=["v"],
                                    elide_sort=True)
        plan = got._jdf.queryExecution().executedPlan().toString()
        assert plan.count("Sort ") >= 1, plan  # Spark fell back safely
        assert plan.count("Exchange") == 0, plan
    finally:
        spark.conf.unset("spark.sql.legacy.bucketedTableScan.outputOrdering")
        spark.sql("DROP TABLE IF EXISTS asof_storage_dup_tbl")


def test_storage_forward_direction(spark, sides, stored):
    left, right = sides
    ref = asof_join(left, right, on="ts", by="doc_id",
                    value_cols=["v"], strategy="window", direction="forward")
    got = asof_bucketed_storage(spark, stored, on="ts", by="doc_id",
                                value_cols=["v"], direction="forward")
    pd.testing.assert_frame_equal(_canon(ref), _canon(got))
