"""Canonical loaders for the driver's test tables (TESTDATA.md).

The DuckDB oracle registers each parquet as a view with its file schema,
except `events.ts` which DuckDB reads as a µs timestamp (truncating the
file's nanosecond precision). We normalize Spark's view of `events` to the
same µs timestamp so Spark SQL and oracle SQL see identical values.

At 100 TB these would be partitioned/bucketed catalog tables; the loaders
keep the access path in one place so that swap is a one-file change.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

TABLE_NAMES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one test table, normalizing types for oracle parity."""
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events" and isinstance(df.schema["ts"].dataType, T.LongType):
        # parquet TIMESTAMP(NANOS) read as raw ns longs
        # (spark.sql.legacy.parquet.nanosAsLong) → truncate to µs exactly
        # like DuckDB does on read. Integer `div`, NOT `/`: ns epoch values
        # (~1.7e18) exceed double's 2^53 integer range, so float division
        # silently rounds the low microsecond digit.
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLE_NAMES}


def register_views(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Register every test table as a temp view (for the SQL-first operators)."""
    dfs = load_tables(spark, sf_dir)
    for name, df in dfs.items():
        df.createOrReplaceTempView(name)
    return dfs
