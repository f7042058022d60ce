"""docling_api_spark — a PySpark-native analytics & document-ETL engine.

A from-scratch engine with the query and data-processing capabilities of
the reference document-conversion service (drmingler/docling-api), re-expressed
Spark-first:

- ``session``    — tuned SparkSession factory (AQE, Arrow, UTC, ns-timestamp handling)
- ``tables``     — canonical loaders for the TPC-H-ish test tables
- ``operators``  — the declared query surface (relational, event-time, dedup,
                   similarity, text analysis) as composable DataFrame builders
- ``functions``  — column-level helpers (exact decimal aggs, vector math,
                   format sniffing, CSV encoding chain, markdown image splice)
- ``sources``    — binary-file document source + upload-validation filters
- ``pipeline``   — the document→markdown conversion pipeline (the reference's core)
- ``streaming``  — async job mode on Structured Streaming (job status semantics)
- ``plans``      — registry mapping query names → (Spark builder, DuckDB oracle SQL)

Everything is built on public Apache Spark APIs only.
"""

__version__ = "0.1.0"
