"""Sinks: Iceberg-like snapshot manifests, lineage-carrying partitioned
writes, and driver-side checkpoint/resume (SURVEY.md §2B S1/S3/S4)."""

from pulsarfeatureextractor_spark.sinks.manifest import (  # noqa: F401
    IcebergLikeTable,
    read_snapshot,
    write_snapshot,
)
from pulsarfeatureextractor_spark.sinks.partitioned import (  # noqa: F401
    load_checkpoint,
    resume_plan,
    run_partitioned_job,
)
