"""Async job mode on Structured Streaming (the reference's Celery path)."""

from docling_api_spark.streaming.jobs import (
    get_batch_status,
    get_job_status,
    start_conversion_stream,
)

__all__ = ["start_conversion_stream", "get_job_status", "get_batch_status"]
