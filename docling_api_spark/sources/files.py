"""Structured file connectors beyond parquet: CSV and JSON with DECLARED
schemas (never inference — schema inference is a full extra pass over the
data and nondeterministic under dirty rows; at 100 TB it's also a correctness
hazard, not just a perf one).

`PERMISSIVE` mode + `_corrupt_record` keeps the error-as-column posture:
malformed rows surface as data, they don't fail the scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T


def read_csv(
    spark: SparkSession,
    path: str,
    schema: T.StructType | str,
    header: bool = True,
    encoding: str = "UTF-8",
    keep_corrupt: bool = True,
) -> DataFrame:
    """CSV scan with declared schema and permissive error capture."""
    if keep_corrupt and isinstance(schema, T.StructType):
        if "_corrupt_record" not in schema.fieldNames():
            schema = T.StructType(
                list(schema.fields) + [T.StructField("_corrupt_record", T.StringType())]
            )
    return (
        spark.read.schema(schema)
        .option("header", str(header).lower())
        .option("encoding", encoding)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .csv(path)
    )


def read_json(
    spark: SparkSession,
    path: str,
    schema: T.StructType | str,
    keep_corrupt: bool = True,
) -> DataFrame:
    """JSON-lines scan with declared schema and permissive error capture."""
    if keep_corrupt and isinstance(schema, T.StructType):
        if "_corrupt_record" not in schema.fieldNames():
            schema = T.StructType(
                list(schema.fields) + [T.StructField("_corrupt_record", T.StringType())]
            )
    return (
        spark.read.schema(schema)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .json(path)
    )


def write_partitioned(
    df: DataFrame, path: str, partition_by: list[str], fmt: str = "parquet"
) -> None:
    """Partitioned columnar sink: downstream scans prune on the partition
    columns (directory-level pruning, zero I/O for filtered-out partitions)."""
    df.write.mode("overwrite").partitionBy(*partition_by).format(fmt).save(path)


def read_orc(
    spark: SparkSession,
    path: str,
    schema: T.StructType | str | None = None,
) -> DataFrame:
    """ORC scan (columnar like parquet: predicate pushdown + column pruning
    apply). Schema optional — ORC files carry their own types, so unlike
    CSV/JSON there is no inference pass to avoid."""
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    return reader.orc(path)


def write_orc(df: DataFrame, path: str, mode: str = "error") -> None:
    """ORC sink — the interchange format for Hive-ecosystem consumers that
    don't read parquet."""
    df.write.mode(mode).orc(path)
