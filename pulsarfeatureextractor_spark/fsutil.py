"""Hadoop-FileSystem helpers shared by the storage-layout writers.

Every table-layout preparer (bucketed as-of tables, bucketed digest
references) must refuse to write a new layout over a non-empty
directory: DROP TABLE on an EXTERNAL table leaves its part files
behind, and a new table registered at the same path would silently
absorb them (duplicate / stale rows — ADVICE r2).  The check and the
small-file writes go through the Hadoop FileSystem API so non-local
URIs (hdfs://, s3a://) are covered too — a local ``os.listdir`` /
``open()`` would silently wave remote paths through (ADVICE r3).
"""

from __future__ import annotations

from pyspark.sql import SparkSession


def _fs_and_path(spark: SparkSession, path: str):
    jvm = spark._jvm
    hconf = spark._jsc.hadoopConfiguration()
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    return hpath.getFileSystem(hconf), hpath


def ensure_empty_dir(
    spark: SparkSession, path: str, overwrite: bool, caller: str
) -> None:
    """Refuse (or, with ``overwrite=True``, clear) a non-empty target
    directory before a layout write.  NOTE: this makes re-running a
    preparer on the same path non-idempotent by design — pass
    ``overwrite=True`` to rebuild a layout in place."""
    fs, hpath = _fs_and_path(spark, path)
    if fs.exists(hpath) and fs.listStatus(hpath):
        if not overwrite:
            raise ValueError(
                f"{caller}: target path {path!r} is non-empty (stale "
                "files from a prior table?). Point each prepare at a "
                "fresh directory, or pass overwrite=True to clear it."
            )
        fs.delete(hpath, True)


def write_text(spark: SparkSession, path: str, text: str) -> None:
    """Write a small metadata file (manifest-sized) at ``path`` through
    the Hadoop FileSystem, so the same code path serves local, HDFS,
    and object-store URIs."""
    fs, hpath = _fs_and_path(spark, path)
    out = fs.create(hpath, True)
    try:
        out.write(bytearray(text.encode("utf-8")))
    finally:
        out.close()
