"""Bucketed-table layout for co-located, shuffle-free fact joins.

At 100 TB the dominant cost of a fact-fact join (lineitem ⋈ orders) is
shuffling both sides on the join key. Writing both tables bucketed (and
sorted) BY that key moves the partitioning to write time: every future
join, aggregation, or MERGE keyed on it reads co-located buckets and
skips the Exchange (and, with matching sortBy, the Sort) entirely —
one-time write cost amortized over every downstream query.

Spark specifics: bucketing requires `saveAsTable` (the bucket spec lives
in the catalog, in-memory catalog included); both sides must use the same
bucket count, and `spark.sql.sources.bucketing.enabled` (default true)
turns bucketed reads into pre-partitioned scans. Plan shape pinned by
tests/test_bucketing.py: SortMergeJoin with NO Exchange on either side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    n_buckets: int = 8,
    sort_cols: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist `df` as a bucketed (optionally sorted) catalog table."""
    writer = df.write.mode(mode).bucketBy(n_buckets, *bucket_cols)
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.format("parquet").saveAsTable(table)


def bucketed_table(spark: SparkSession, table: str) -> DataFrame:
    return spark.table(table)
