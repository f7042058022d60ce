"""Event-time operators over the `events` stream table (SURVEY.md M2).

Populated incrementally: tumbling/sliding windows, session windows, as-of
joins, range joins. Batch forms here (oracle-checkable); the same logic runs
as Structured Streaming in docling_api_spark.streaming.
"""
