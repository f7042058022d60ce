"""Upload-validation filters: per-file and batch size budgets, error routing.

Reference semantics (`upload_validation.py:20-98`) re-expressed as dataflow:
- per-file limit (default 100 MB): file > limit → rejected with a 413-shaped
  reason (F1);
- batch budget (default 500 MB): files are debited against the budget in a
  deterministic order; rows past the point of exhaustion are rejected (F2 —
  the sequential-debit behavior of `_read_document_with_limit`,
  upload_validation.py:54-63, expressed as a running-sum window);
- rejected rows are ROUTED, not dropped — errors surface to the caller
  (error-as-column, F9).

At scale the size predicates run on metadata/stat columns only, so
validation never forces a content read.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F

MAX_SIZE_PER_FILE_MB = 100
MAX_BATCH_SIZE_MB = 500

FILE_TOO_LARGE = "file_too_large"
BATCH_BUDGET_EXCEEDED = "batch_budget_exceeded"
UNSUPPORTED_FORMAT = "unsupported_format"


def mb_to_bytes(mb: int) -> int:
    return mb * 1024 * 1024


def with_size_validation(
    df: DataFrame,
    size_col: str = "length",
    order_col: str = "path",
    batch_col: Column | None = None,
    max_file_bytes: int = mb_to_bytes(MAX_SIZE_PER_FILE_MB),
    max_batch_bytes: int = mb_to_bytes(MAX_BATCH_SIZE_MB),
) -> DataFrame:
    """Add a `reject_reason` column (null = accepted).

    The batch budget is debited in `order_col` order within each batch
    (whole dataset if `batch_col` is None); a file whose cumulative size
    exceeds the budget — and every file after it — is rejected, matching the
    reference's read-loop debit. Oversized files are rejected outright and
    do not consume budget.
    """
    size = F.col(size_col)
    w = (
        W.partitionBy(batch_col if batch_col is not None else F.lit(1))
        .orderBy(order_col)
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    debit = F.when(size <= max_file_bytes, size).otherwise(F.lit(0))
    running = F.sum(debit).over(w)
    reason = (
        F.when(size > max_file_bytes, F.lit(FILE_TOO_LARGE))
        .when(running > max_batch_bytes, F.lit(BATCH_BUDGET_EXCEEDED))
        .otherwise(F.lit(None).cast("string"))
    )
    return df.withColumn("reject_reason", reason)


def with_format_validation(df: DataFrame, format_col: str = "format") -> DataFrame:
    """Reject rows whose classified format is null (F3: 400-shaped reason)."""
    reason = F.when(
        F.col("reject_reason").isNotNull(), F.col("reject_reason")
    ).when(F.col(format_col).isNull(), F.lit(UNSUPPORTED_FORMAT))
    return df.withColumn("reject_reason", reason)


def split_valid(df: DataFrame) -> tuple[DataFrame, DataFrame]:
    """Route rows: (accepted, rejected) — rejections are data, not exceptions."""
    return (
        df.filter(F.col("reject_reason").isNull()).drop("reject_reason"),
        df.filter(F.col("reject_reason").isNotNull()),
    )
