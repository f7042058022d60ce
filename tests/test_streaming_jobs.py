"""Async job mode: landing dir → streaming conversion → results table →
job/batch status views (reference service.py:220-273 semantics)."""

from __future__ import annotations

import time

from docling_api_spark.streaming.jobs import (
    get_batch_status,
    get_job_status,
    start_conversion_stream,
)


def test_streaming_jobs_lifecycle(spark, tmp_path):
    landing = tmp_path / "landing"
    results = tmp_path / "results"
    ckpt = tmp_path / "ckpt"
    landing.mkdir()

    # status before submit: IN_PROGRESS (PENDING → IN_PROGRESS mapping)
    st = get_job_status(spark, str(results), "notes.md")
    assert st["status"] == "IN_PROGRESS"

    (landing / "notes.md").write_bytes(b"# hello")
    (landing / "bad.xyz").write_bytes(b"unrecognized file content")
    (landing / "batch-7_one.md").write_bytes(b"one")
    (landing / "batch-7_two.xyz").write_bytes(b"unrecognized")

    q = start_conversion_stream(spark, str(landing), str(results), str(ckpt))
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    ok = get_job_status(spark, str(results), "notes.md")
    assert ok["status"] == "SUCCESS"
    assert ok["result"]["markdown"] == "# hello"
    assert ok["result"]["filename"] == "notes"

    # conversion error → task SUCCESS but job FAILURE (service.py:235-238)
    bad = get_job_status(spark, str(results), "bad.xyz")
    assert bad["status"] == "FAILURE"
    assert "Unsupported file format" in bad["error"]

    # unknown id → IN_PROGRESS
    assert get_job_status(spark, str(results), "nope.pdf")["status"] == "IN_PROGRESS"

    # batch: SUCCESS with member failures inside (service.py:244-273)
    batch = get_batch_status(spark, str(results), "batch-7", expected=2)
    assert batch["status"] == "SUCCESS"
    statuses = [m["status"] for m in batch["conversion_results"]]
    assert sorted(statuses) == ["FAILURE", "SUCCESS"]

    # partially-arrived batch is IN_PROGRESS
    assert (
        get_batch_status(spark, str(results), "batch-7", expected=5)["status"]
        == "IN_PROGRESS"
    )


def test_streaming_is_incremental(spark, tmp_path):
    landing = tmp_path / "landing"
    results = tmp_path / "results"
    ckpt = tmp_path / "ckpt"
    landing.mkdir()
    (landing / "first.md").write_bytes(b"first")

    q = start_conversion_stream(spark, str(landing), str(results), str(ckpt))
    try:
        q.processAllAvailable()
        assert get_job_status(spark, str(results), "first.md")["status"] == "SUCCESS"
        # a file that arrives later is picked up by the same query
        (landing / "second.md").write_bytes(b"second")
        time.sleep(0.1)
        q.processAllAvailable()
    finally:
        q.stop()
    second = get_job_status(spark, str(results), "second.md")
    assert second["status"] == "SUCCESS"
    assert second["result"]["markdown"] == "second"
