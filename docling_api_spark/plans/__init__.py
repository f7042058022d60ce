"""Query-plan registry: name → (Spark DataFrame builder, DuckDB oracle SQL)."""

from docling_api_spark.plans.registry import QUERIES, Query, all_queries, register

__all__ = ["QUERIES", "Query", "all_queries", "register"]
