"""Document sources and upload-validation filters."""

from docling_api_spark.sources.binaryfiles import read_documents
from docling_api_spark.sources.validation import (
    MAX_BATCH_SIZE_MB,
    MAX_SIZE_PER_FILE_MB,
    split_valid,
    with_size_validation,
)

__all__ = [
    "read_documents",
    "with_size_validation",
    "split_valid",
    "MAX_SIZE_PER_FILE_MB",
    "MAX_BATCH_SIZE_MB",
]
