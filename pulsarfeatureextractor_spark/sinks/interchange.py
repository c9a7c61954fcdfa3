"""CSV / ARFF interchange writers (SURVEY.md §2A A11).

The reference family hands extracted feature vectors to downstream
classifiers as flat CSV or WEKA-style ARFF files.  Spark-first recast:

- ``write_csv``  — a plain distributed ``DataFrameWriter.csv`` job
  (header, deterministic column order, escaped quoting).  At 10^12
  rows this is the only sane shape: one part file per task, no driver
  funnel.
- ``write_arff`` — ARFF is "CSV with a typed header": the data section
  is the SAME distributed CSV write; the @relation/@attribute header is
  O(columns) metadata written driver-side next to the parts.
- ``assemble_single_file`` — concatenates header + parts into the one
  classic single-file artifact classifiers expect.  Driver-side and
  O(output) by design: ONLY for test-scale golden files and small
  feature exports; refuses to run past a size cap so it can never be
  mistaken for the scale path.

Float formatting is ``repr``-style shortest round-trip (Spark's CSV
writer default), so goldens are stable across runs.
"""

from __future__ import annotations

import glob
import os

from pyspark.sql import DataFrame
from pyspark.sql import types as T

_ARFF_NUMERIC = (
    T.ByteType, T.ShortType, T.IntegerType, T.LongType,
    T.FloatType, T.DoubleType, T.DecimalType,
)


def write_csv(df: DataFrame, path: str, order_by: "list[str] | None" = None) -> None:
    """Distributed CSV write with header.  ``order_by`` gives a total
    row order (global sort — one range exchange) for deterministic
    goldens; omit it for the throughput path."""
    if order_by:
        df = df.orderBy(*order_by)
    (df.write.mode("overwrite").option("header", True)
       .option("emptyValue", "").csv(path))


def arff_header(schema: T.StructType, relation: str) -> str:
    """@relation/@attribute lines for a flat schema (numeric / string /
    date attributes; nested types are rejected — ARFF is flat)."""
    lines = [f"@relation {relation}", ""]
    for f in schema.fields:
        if isinstance(f.dataType, _ARFF_NUMERIC):
            kind = "numeric"
        elif isinstance(f.dataType, T.StringType):
            kind = "string"
        elif isinstance(f.dataType, (T.TimestampType, T.DateType)):
            kind = "date"
        else:
            raise ValueError(
                f"ARFF requires flat columns; {f.name} is {f.dataType.simpleString()}"
            )
        lines.append(f"@attribute {f.name} {kind}")
    lines += ["", "@data"]
    return "\n".join(lines) + "\n"


def write_arff(df: DataFrame, path: str, relation: str = "features",
               order_by: "list[str] | None" = None) -> None:
    """ARFF = typed header sidecar + distributed headerless CSV parts."""
    if order_by:
        df = df.orderBy(*order_by)
    (df.write.mode("overwrite").option("header", False)
       .option("emptyValue", "").csv(os.path.join(path, "data")))
    with open(os.path.join(path, "header.arff"), "w") as f:
        f.write(arff_header(df.schema, relation))


def parse_arff_header(header_text: str) -> T.StructType:
    """@attribute lines -> StructType (the inverse of ``arff_header``).

    ARFF's `numeric` carries no width, so numeric attributes come back
    as DoubleType (the widest); `string` -> StringType, `date` ->
    TimestampType.  Lines are whitespace-tolerant; parsing stops at
    @data.
    """
    kinds = {"numeric": T.DoubleType(), "string": T.StringType(),
             "date": T.TimestampType()}
    fields = []
    for line in header_text.splitlines():
        line = line.strip()
        low = line.lower()
        if low.startswith("@data"):
            break
        if not low.startswith("@attribute"):
            continue
        parts = line.split()
        if len(parts) < 3:
            raise ValueError(f"malformed @attribute line: {line!r}")
        name, kind = parts[1], parts[2].lower()
        if kind not in kinds:
            raise ValueError(f"unsupported ARFF attribute type: {line!r}")
        fields.append(T.StructField(name, kinds[kind], True))
    if not fields:
        raise ValueError("no @attribute lines found in ARFF header")
    return T.StructType(fields)


def read_arff(spark, path: str) -> DataFrame:
    """Read a ``write_arff`` directory back: parse the O(columns)
    header sidecar driver-side, then a DISTRIBUTED schema'd CSV scan of
    the part files — the round-trip import path for feature sets
    exported to classifier tooling.  No inference scan, no driver
    funnel."""
    with open(os.path.join(path, "header.arff")) as f:
        schema = parse_arff_header(f.read())
    return (spark.read.schema(schema).option("header", False)
            .option("emptyValue", "").csv(os.path.join(path, "data")))


def assemble_single_file(path: str, out_file: str,
                         max_bytes: int = 256 * 1024 * 1024) -> str:
    """Concatenate an ARFF header + its CSV parts (or a write_csv dir's
    parts) into one file.  DRIVER-SIDE, O(output): guarded by
    ``max_bytes`` so it cannot silently become a 100 TB funnel."""
    header = os.path.join(path, "header.arff")
    data_dir = os.path.join(path, "data")
    parts_dir = data_dir if os.path.isdir(data_dir) else path
    parts = sorted(glob.glob(os.path.join(parts_dir, "part-*")))
    total = sum(os.path.getsize(p) for p in parts)
    if total > max_bytes:
        raise ValueError(
            f"refusing driver-side assembly of {total} bytes > cap {max_bytes}; "
            "ship the part files (or raise max_bytes explicitly)"
        )
    with open(out_file, "w") as out:
        if os.path.exists(header):
            with open(header) as h:
                out.write(h.read())
        for p in parts:
            with open(p) as f:
                out.write(f.read())
    return out_file
