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


def test_unbounded_budget_skips_running_sum(spark):
    df = _df(spark, [("a.pdf", 100, "b1"), ("b.pdf", 5000, "b1")])
    out = with_size_validation(df, max_file_bytes=1000, max_batch_bytes=None)
    reasons = _reasons(out)
    assert reasons["a.pdf"] is None
    assert reasons["b.pdf"] == FILE_TOO_LARGE
    # no running sum → no Window operator in the plan at all
    assert "Window" not in out._jdf.queryExecution().executedPlan().toString()


def test_global_budget_prefix_sum_matches_sequential_debit(spark):
    # 400 rows spread over many input partitions; global budget must debit
    # in path order exactly like the reference's sequential read loop.
    rows = [(f"f{i:04d}.pdf", (i * 37) % 900 + 10, "b1") for i in range(400)]
    df = _df(spark, rows).repartition(16)
    out = with_size_validation(df, max_file_bytes=800, max_batch_bytes=40_000)
    reasons = _reasons(out)

    running = 0
    for path, size, _ in sorted(rows):
        if size > 800:
            assert reasons[path] == FILE_TOO_LARGE, path
            continue
        running += size
        if running > 40_000:
            assert reasons[path] == BATCH_BUDGET_EXCEEDED, path
        else:
            assert reasons[path] is None, path


def test_global_budget_no_single_partition_window(spark):
    rows = [(f"f{i:04d}.pdf", 100, "b1") for i in range(200)]
    df = _df(spark, rows).repartition(8)
    out = with_size_validation(df, max_file_bytes=800, max_batch_bytes=5_000)
    plan = out._jdf.queryExecution().executedPlan().toString()
    # the round-1 defect: partitionBy(lit(1)) folded to an empty partition
    # spec ("Window [sum(...) ... ORDER BY ...]" with no PARTITION BY),
    # funnelling everything into one task. The fix partitions the window by
    # the range bucket.
    import re

    for m in re.finditer(r"Window \[[^\]]*windowspecdefinition\(([^)]*)\)", plan):
        spec = m.group(1)
        assert "_w" in spec or "bucket" in spec or spec.count(",") >= 2, plan


def test_global_budget_bucket_assignment_is_binary_search(spark):
    # round-3 advice: the bucket assignment must NOT embed one literal per
    # range in a per-row O(ranges) array filter. The binary-search rewrite
    # carries the minima in ONE broadcast row and probes log2(ranges) times.
    rows = [(f"f{i:04d}.pdf", 100, "b1") for i in range(500)]
    df = _df(spark, rows).repartition(8)
    out = with_size_validation(df, max_file_bytes=800, max_batch_bytes=5_000)
    plan = out._jdf.queryExecution().optimizedPlan().toString()
    assert "_sv_lows" in plan  # minima ride in as a column, not a literal
    # no higher-order filter over the minima anywhere in the plan
    assert "lambdafunction" not in plan.lower()
    # helper columns do not leak into the result schema
    assert not [c for c in out.columns if c.startswith("_sv_")]


def test_global_budget_empty_and_boundary_cases(spark):
    # empty input: the prefix sum must not blow up on zero ranges
    empty = _df(spark, []).repartition(4)
    assert with_size_validation(empty, max_file_bytes=10, max_batch_bytes=100).count() == 0

    # budget hit exactly AT the boundary: at-limit row accepted, next rejected
    rows = [("a.pdf", 100, "b"), ("b.pdf", 150, "b"), ("c.pdf", 1, "b")]
    out = with_size_validation(_df(spark, rows), max_file_bytes=1000, max_batch_bytes=250)
    reasons = _reasons(out)
    assert reasons["a.pdf"] is None
    assert reasons["b.pdf"] is None  # running sum == budget: not over
    assert reasons["c.pdf"] == BATCH_BUDGET_EXCEEDED

    # all files oversized: nothing debits, nothing trips the batch budget
    rows = [(f"f{i}.pdf", 5000, "b") for i in range(20)]
    out = with_size_validation(
        _df(spark, rows).repartition(7), max_file_bytes=1000, max_batch_bytes=100
    )
    assert set(_reasons(out).values()) == {FILE_TOO_LARGE}
