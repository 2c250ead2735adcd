"""Table IO: explicit schemas for the ten test tables + loaders.

Schemas are declared once here (FIXTURES.md is the measured source of truth)
— production posture, vs. inference-per-read. The ns-timestamp decode for
``events`` lives HERE and nowhere else (SURVEY.md §1.2, §7):

- Parquet stores ``events.ts`` as timestamp[ns]; Spark 4.1.2 reads it only
  with ``spark.sql.legacy.parquet.nanosAsLong=true`` (applied by
  ``session.configure``), surfacing LongType nanoseconds.
- ``ts div 1000`` is *integer* division — exact. A double-routed
  ``(ts/1000).cast('long')`` loses low bits at 1.7e18 ns magnitudes and can
  land ±1 µs off DuckDB's truncation; verified exact-match with ``div``.
- DuckDB 1.0.0's ``read_parquet`` surfaces the same column already truncated
  to µs TIMESTAMP (probed), so oracle SQL uses ``ts`` directly.
"""
from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.types import (
    ArrayType, DoubleType, FloatType, IntegerType, LongType, StringType,
    StructField, StructType, TimestampType,
)

from ..session import configure

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]

SCHEMAS: dict[str, StructType] = {
    "region": StructType([
        StructField("r_regionkey", IntegerType()),
        StructField("r_name", StringType()),
    ]),
    "nation": StructType([
        StructField("n_nationkey", IntegerType()),
        StructField("n_name", StringType()),
        StructField("n_regionkey", IntegerType()),
    ]),
    "supplier": StructType([
        StructField("s_suppkey", LongType()),
        StructField("s_name", StringType()),
        StructField("s_nationkey", IntegerType()),
        StructField("s_acctbal", DoubleType()),
    ]),
    "customer": StructType([
        StructField("c_custkey", LongType()),
        StructField("c_name", StringType()),
        StructField("c_nationkey", IntegerType()),
        StructField("c_acctbal", DoubleType()),
        StructField("c_mktsegment", StringType()),
    ]),
    "part": StructType([
        StructField("p_partkey", LongType()),
        StructField("p_name", StringType()),
        StructField("p_brand", StringType()),
        StructField("p_type", StringType()),
        StructField("p_size", IntegerType()),
        StructField("p_retailprice", DoubleType()),
    ]),
    "orders": StructType([
        StructField("o_orderkey", LongType()),
        StructField("o_custkey", LongType()),
        StructField("o_orderstatus", StringType()),
        StructField("o_totalprice", DoubleType()),
        StructField("o_orderdate", TimestampType()),
        StructField("o_orderpriority", StringType()),
    ]),
    "lineitem": StructType([
        StructField("l_orderkey", LongType()),
        StructField("l_partkey", LongType()),
        StructField("l_suppkey", LongType()),
        StructField("l_linenumber", IntegerType()),
        StructField("l_quantity", DoubleType()),
        StructField("l_extendedprice", DoubleType()),
        StructField("l_discount", DoubleType()),
        StructField("l_tax", DoubleType()),
        StructField("l_returnflag", StringType()),
        StructField("l_linestatus", StringType()),
        StructField("l_shipdate", TimestampType()),
    ]),
    # Raw on-disk shape: ts is LongType *nanoseconds* (nanosAsLong).
    "events": StructType([
        StructField("event_id", LongType()),
        StructField("ts", LongType()),
        StructField("user_id", LongType()),
        StructField("event_type", StringType()),
        StructField("value", DoubleType()),
        StructField("props", StringType()),
    ]),
    "documents": StructType([
        StructField("doc_id", LongType()),
        StructField("text", StringType()),
        StructField("lang", StringType()),
        StructField("source", StringType()),
        StructField("n_chars", LongType()),
    ]),
    "embeddings": StructType([
        StructField("vec_id", LongType()),
        StructField("embedding", ArrayType(FloatType())),
        StructField("label", IntegerType()),
    ]),
}


def path(sf_dir: str, table: str) -> str:
    return f"{sf_dir}/{table}.parquet"


def load_raw(spark: SparkSession, sf_dir: str, table: str) -> DataFrame:
    """Read a table with its explicit schema, no decoding."""
    configure(spark)
    return spark.read.schema(SCHEMAS[table]).parquet(path(sf_dir, table))


def load(spark: SparkSession, sf_dir: str, table: str) -> DataFrame:
    """Read a table; ``events.ts`` is decoded to a µs TimestampType."""
    df = load_raw(spark, sf_dir, table)
    if table == "events":
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {t: load(spark, sf_dir, t) for t in TABLES}
