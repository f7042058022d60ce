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


def _ntz_as_utc_instant(colname: str):
    """TIMESTAMP_NTZ wall-clock → TIMESTAMP instant, treating the wall clock
    as UTC — independent of spark.sql.session.timeZone (a plain cast would
    shift values by the session offset). DuckDB reads the same parquet
    column as a naive timestamp with identical micros, so this keeps both
    engines byte-identical."""
    return F.expr(
        "timestamp_micros(timestampdiff(MICROSECOND, "
        f"TIMESTAMP_NTZ '1970-01-01 00:00:00', `{colname}`))"
    )


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one test table, normalizing types for oracle parity."""
    try:
        # Unannotated parquet timestamps (isAdjustedToUTC=false) should read
        # as TIMESTAMP (UTC instant), matching the DuckDB oracle's naive
        # micros — Spark 4's NTZ inference would otherwise leak
        # TIMESTAMP_NTZ into every downstream plan (unix_micros etc. reject
        # it). Runtime-settable, so this also covers the driver's session.
        spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
    except Exception:
        pass  # unknown conf on some future version — fallback below
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events" and isinstance(df.schema["ts"].dataType, T.LongType):
        # parquet TIMESTAMP(NANOS) read as raw ns longs
        # (spark.sql.legacy.parquet.nanosAsLong) → truncate to µs exactly
        # like DuckDB does on read. Integer `div`, NOT `/`: ns epoch values
        # (~1.7e18) exceed double's 2^53 integer range, so float division
        # silently rounds the low microsecond digit.
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    for fld in df.schema.fields:
        if isinstance(fld.dataType, T.TimestampNTZType):
            df = df.withColumn(fld.name, _ntz_as_utc_instant(fld.name))
    return df


def events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming read of the events table with `ts` normalized to TIMESTAMP.

    Probes the parquet footer via a batch schema read instead of hardcoding
    the file's timestamp encoding — the driver's test tables have shipped
    `ts` as TIMESTAMP(NANOS)-read-as-long, µs TIMESTAMP_NTZ, and µs UTC at
    different times, and a readStream schema baked for one encoding
    silently corrupts (ns→µs div on µs values) or fails on the others.
    """
    try:
        spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
    except Exception:
        pass
    src = spark.read.parquet(f"{sf_dir}/events.parquet").schema
    stream = (
        spark.readStream.schema(src)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
    )
    ts_type = src["ts"].dataType
    if isinstance(ts_type, T.LongType):
        # TIMESTAMP(NANOS) as raw ns longs — integer div, see load_table
        stream = stream.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    elif isinstance(ts_type, T.TimestampNTZType):
        stream = stream.withColumn("ts", _ntz_as_utc_instant("ts"))
    return stream


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLE_NAMES}


def register_views(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Register every test table as a temp view (for the SQL-first operators)."""
    dfs = load_tables(spark, sf_dir)
    for name, df in dfs.items():
        df.createOrReplaceTempView(name)
    return dfs
