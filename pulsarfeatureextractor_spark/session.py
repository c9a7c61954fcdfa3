"""SparkSession factory tuned for the engine.

Scale posture: these configs are chosen so the SAME code runs on a
1000-executor cluster against ~100 TB — AQE handles runtime skew /
partition coalescing, Arrow handles the (only) Python boundary, and
shuffle partitioning is explicit at the operator level
(repartitionByRange before the as-of join, salting for hot keys).
Locally we test on local[N]; nothing here is local-mode-specific
except the master default.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# Configs that matter at 100 TB and cost nothing locally.
ENGINE_CONFS: dict[str, str] = {
    # AQE: runtime re-planning — coalesce small shuffle partitions,
    # split skewed join partitions (backstop for explicit salting).
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    # Arrow is the ONLY sanctioned Python boundary (north_star bans
    # per-row Python); batched transfer for pandas UDF / applyInPandas.
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    "spark.sql.execution.arrow.maxRecordsPerBatch": "10000",
    # Deterministic timestamps for the DuckDB differential oracle
    # (duckdb timestamps are UTC-naive).
    "spark.sql.session.timeZone": "UTC",
    # Keep parquet scans prunable: row-group predicate pushdown on.
    "spark.sql.parquet.filterPushdown": "true",
    # zstd: ~30% smaller than snappy at negligible CPU — at 100 TB the
    # scan is bandwidth-bound, so smaller pages are faster pages.
    "spark.sql.parquet.compression.codec": "zstd",
    # Broadcast threshold: dims (nation/region/labels) always fit.
    "spark.sql.autoBroadcastJoinThreshold": str(64 * 1024 * 1024),
    # One BLAS thread per python worker: numpy's OpenBLAS defaults to
    # ncores threads PER PROCESS, so N workers x N threads thrash the
    # box (and tiny lstsq problems are faster single-threaded anyway).
    "spark.executorEnv.OMP_NUM_THREADS": "1",
    "spark.executorEnv.OPENBLAS_NUM_THREADS": "1",
    "spark.executorEnv.MKL_NUM_THREADS": "1",
}


def get_spark(
    app_name: str = "pulsarfeatureextractor_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_confs: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession with engine defaults.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` locally; on a
    real cluster pass ``None`` and let spark-submit decide.
    ``shuffle_partitions`` defaults to the local core count — on a
    cluster, set it to ~2-3x total cores and let AQE coalesce.
    """
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    if master is None:
        master = f"local[{cpus}]"
    if shuffle_partitions is None:
        shuffle_partitions = max(cpus, 8)

    builder = SparkSession.builder.appName(app_name).master(master)
    builder = builder.config("spark.sql.shuffle.partitions", str(shuffle_partitions))
    builder = builder.config("spark.ui.enabled", "false")
    builder = builder.config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "48g"))
    for k, v in ENGINE_CONFS.items():
        builder = builder.config(k, v)
    for k, v in (extra_confs or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
