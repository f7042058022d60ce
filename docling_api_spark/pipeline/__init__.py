"""Document→markdown conversion pipeline (the reference's core capability,
re-expressed as Spark dataflow: binaryFile source → classify → validate →
convert UDF → nested result schema)."""

from docling_api_spark.pipeline.convert import (
    LightweightConverter,
    convert_documents,
    converter_for,
)
from docling_api_spark.pipeline.schemas import (
    CONVERSION_OUTPUT_SCHEMA,
    CONVERSION_RESULT_SCHEMA,
    IMAGE_SCHEMA,
)

__all__ = [
    "LightweightConverter",
    "convert_documents",
    "converter_for",
    "CONVERSION_OUTPUT_SCHEMA",
    "CONVERSION_RESULT_SCHEMA",
    "IMAGE_SCHEMA",
]
