"""Explicit-schema parquet readers for the driver testdata tables.

Schema inference at 10^12 rows is a full scan; every read here declares
its StructType (SURVEY.md §1.2).  The schemas mirror TESTDATA.md /
FIXTURES.md §B (verified with pyarrow).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

_S = T.StructField


TESTDATA_SCHEMAS: dict[str, T.StructType] = {
    "region": T.StructType([
        _S("r_regionkey", T.IntegerType()), _S("r_name", T.StringType()),
    ]),
    "nation": T.StructType([
        _S("n_nationkey", T.IntegerType()), _S("n_name", T.StringType()),
        _S("n_regionkey", T.IntegerType()),
    ]),
    "customer": T.StructType([
        _S("c_custkey", T.LongType()), _S("c_name", T.StringType()),
        _S("c_nationkey", T.IntegerType()), _S("c_acctbal", T.DoubleType()),
        _S("c_mktsegment", T.StringType()),
    ]),
    "supplier": T.StructType([
        _S("s_suppkey", T.LongType()), _S("s_name", T.StringType()),
        _S("s_nationkey", T.IntegerType()), _S("s_acctbal", T.DoubleType()),
    ]),
    "part": T.StructType([
        _S("p_partkey", T.LongType()), _S("p_name", T.StringType()),
        _S("p_brand", T.StringType()), _S("p_type", T.StringType()),
        _S("p_size", T.IntegerType()), _S("p_retailprice", T.DoubleType()),
    ]),
    "orders": T.StructType([
        _S("o_orderkey", T.LongType()), _S("o_custkey", T.LongType()),
        _S("o_orderstatus", T.StringType()), _S("o_totalprice", T.DoubleType()),
        _S("o_orderdate", T.TimestampType()), _S("o_orderpriority", T.StringType()),
    ]),
    "lineitem": T.StructType([
        _S("l_orderkey", T.LongType()), _S("l_partkey", T.LongType()),
        _S("l_suppkey", T.LongType()), _S("l_linenumber", T.IntegerType()),
        _S("l_quantity", T.DoubleType()), _S("l_extendedprice", T.DoubleType()),
        _S("l_discount", T.DoubleType()), _S("l_tax", T.DoubleType()),
        _S("l_returnflag", T.StringType()), _S("l_linestatus", T.StringType()),
        _S("l_shipdate", T.TimestampType()),
    ]),
    "events": T.StructType([
        _S("event_id", T.LongType()), _S("ts", T.TimestampType()),
        _S("user_id", T.LongType()), _S("event_type", T.StringType()),
        _S("value", T.DoubleType()), _S("props", T.StringType()),
    ]),
    "documents": T.StructType([
        _S("doc_id", T.LongType()), _S("text", T.StringType()),
        _S("lang", T.StringType()), _S("source", T.StringType()),
        _S("n_chars", T.LongType()),
    ]),
    "embeddings": T.StructType([
        _S("vec_id", T.LongType()),
        _S("embedding", T.ArrayType(T.FloatType())),
        _S("label", T.IntegerType()),
    ]),
}


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Columnar scan of one testdata table with its declared schema.

    Filters/projections applied by the caller push down to the parquet
    row groups (Catalyst PushedFilters) — verified in tests via explain.
    """
    path = os.path.join(sf_dir, f"{name}.parquet")
    schema = TESTDATA_SCHEMAS.get(name)
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    return reader.parquet(path)
