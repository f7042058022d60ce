"""Registry of the declared query surface (SURVEY.md §2.9).

Each entry pairs a Spark DataFrame builder `fn(spark, sf_dir) -> DataFrame`
with an optional ANSI-SQL oracle string runnable by DuckDB over the same
parquet tables. The driver's correctness gate executes both and compares
row count + schema + order-insensitive value hash, so:

- every computed column is aliased identically on both sides;
- float aggregates go through exact DECIMAL casts (functions.numeric);
- timestamps are emitted as epoch integers or formatted strings, never as
  raw timestamp columns (engine display formats differ).

Queries with `oracle=None` are genuinely non-SQL-expressible (approx
sketches, LSH, pipeline UDFs) and get the driver's weaker rows-only check.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass
class Query:
    name: str
    fn: QueryFn
    oracle: str | None = None
    description: str = ""
    tags: tuple[str, ...] = ()
    bench: bool = False  # include in bench.py's headline set


QUERIES: dict[str, Query] = {}


def register(
    name: str,
    oracle: str | None = None,
    tags: tuple[str, ...] = (),
    bench: bool = False,
) -> Callable[[QueryFn], QueryFn]:
    """Decorator: register a query builder under `name`."""

    def deco(fn: QueryFn) -> QueryFn:
        QUERIES[name] = Query(
            name=name,
            fn=fn,
            oracle=oracle,
            description=(fn.__doc__ or "").strip().splitlines()[0] if fn.__doc__ else "",
            tags=tags,
            bench=bench,
        )
        return fn

    return deco


def all_queries() -> dict[str, Query]:
    """Import every operator module (populating QUERIES) and return the registry."""
    # Imports are deferred so `plans` can be imported without pulling pyspark
    # operator modules at module-import time in tooling contexts.
    from docling_api_spark.operators import (  # noqa: F401
        dedup,
        multimodal,
        pipeline_queries,
        relational,
        sampling,
        similarity,
        subqueries,
        textstats,
        timeseries,
    )

    return QUERIES
