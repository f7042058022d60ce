"""Upload-limit semantics (ports the reference test family
tests/test_upload_limits.py onto the dataflow validators)."""

from __future__ import annotations

from pyspark.sql import functions as F

from docling_api_spark.sources.validation import (
    BATCH_BUDGET_EXCEEDED,
    FILE_TOO_LARGE,
    UNSUPPORTED_FORMAT,
    split_valid,
    with_format_validation,
    with_size_validation,
)


def _df(spark, rows):
    return spark.createDataFrame(rows, "path string, length long, batch string")


def _reasons(df):
    return {r["path"]: r["reject_reason"] for r in df.collect()}


def test_oversized_single_file_rejected(spark):
    df = _df(
        spark,
        [("small.pdf", 10, "b1"), ("big.pdf", 1000, "b1"), ("edge.pdf", 100, "b1")],
    )
    out = with_size_validation(df, max_file_bytes=100, max_batch_bytes=10_000)
    reasons = _reasons(out)
    assert reasons["big.pdf"] == FILE_TOO_LARGE
    assert reasons["small.pdf"] is None
    assert reasons["edge.pdf"] is None  # at-limit accepted (reference :88-102)


def test_batch_budget_debited_in_order(spark):
    # budget 250: a(100) + b(100) fit; c(100) exceeds → c and later rejected
    df = _df(
        spark,
        [("a.pdf", 100, "b1"), ("b.pdf", 100, "b1"), ("c.pdf", 100, "b1"), ("d.pdf", 10, "b1")],
    )
    out = with_size_validation(df, max_file_bytes=1000, max_batch_bytes=250)
    reasons = _reasons(out)
    assert reasons["a.pdf"] is None
    assert reasons["b.pdf"] is None
    assert reasons["c.pdf"] == BATCH_BUDGET_EXCEEDED
    assert reasons["d.pdf"] == BATCH_BUDGET_EXCEEDED


def test_batches_have_independent_budgets(spark):
    df = _df(spark, [("a.pdf", 200, "b1"), ("b.pdf", 200, "b2")])
    out = with_size_validation(
        df, batch_col=F.col("batch"), max_file_bytes=1000, max_batch_bytes=250
    )
    assert set(_reasons(out).values()) == {None}


def test_oversized_file_does_not_consume_batch_budget(spark):
    # big.pdf is rejected for size; the remaining files still fit the budget
    df = _df(
        spark,
        [("a.pdf", 100, "b1"), ("big.pdf", 5000, "b1"), ("z.pdf", 100, "b1")],
    )
    out = with_size_validation(df, max_file_bytes=1000, max_batch_bytes=250)
    reasons = _reasons(out)
    assert reasons["big.pdf"] == FILE_TOO_LARGE
    assert reasons["a.pdf"] is None
    assert reasons["z.pdf"] is None


def test_format_validation_and_error_routing(spark):
    df = spark.createDataFrame(
        [("a.md", 10, "md"), ("b.xyz", 10, None)],
        "path string, length long, format string",
    )
    out = with_format_validation(
        with_size_validation(df, max_file_bytes=100, max_batch_bytes=1000)
    )
    accepted, rejected = split_valid(out)
    assert [r["path"] for r in accepted.collect()] == ["a.md"]
    rej = rejected.collect()
    assert [(r["path"], r["reject_reason"]) for r in rej] == [("b.xyz", UNSUPPORTED_FORMAT)]
