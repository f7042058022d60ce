"""Declared result schemas (no inference anywhere).

Mirrors the reference's pydantic models (`document_converter/schema.py:6-34`)
as Spark StructTypes. Image payloads stay BinaryType end-to-end — base64
only at the serving edge (`base64()` built-in), unlike the reference which
base64-encodes inside the pipeline (service.py:128).
"""

from __future__ import annotations

from pyspark.sql import types as T

IMAGE_SCHEMA = T.StructType(
    [
        T.StructField("type", T.StringType()),  # "table" | "picture"
        T.StructField("filename", T.StringType()),
        T.StructField("image", T.BinaryType()),
    ]
)

# Per-document conversion result (reference schema.py:12-16): exactly one of
# markdown/error is set.
CONVERSION_RESULT_SCHEMA = T.StructType(
    [
        T.StructField("filename", T.StringType()),
        T.StructField("markdown", T.StringType()),
        T.StructField("images", T.ArrayType(IMAGE_SCHEMA)),
        T.StructField("error", T.StringType()),
    ]
)

# mapInPandas output: input identity + format + the result fields flattened.
CONVERSION_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("path", T.StringType()),
        T.StructField("format", T.StringType()),
        T.StructField("filename", T.StringType()),
        T.StructField("markdown", T.StringType()),
        T.StructField("images", T.ArrayType(IMAGE_SCHEMA)),
        T.StructField("error", T.StringType()),
    ]
)

# Async job states (reference schema.py:19-23 / service.py:220-242).
JOB_IN_PROGRESS = "IN_PROGRESS"
JOB_SUCCESS = "SUCCESS"
JOB_FAILURE = "FAILURE"
