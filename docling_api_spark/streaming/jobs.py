"""Async conversion jobs as Structured Streaming (SURVEY.md M5 / §3.2).

The reference's async path is Celery over Redis: submit → task id →
worker converts → result backend → client polls a status endpoint
(`route.py:104-120`, `worker/tasks.py:20-43`, `service.py:220-273`).
Spark restatement:

- submit      = drop a file into the landing directory (`job_id` = filename)
- broker      = the landing dir + checkpointed file-source offsets
- worker pool = executors running the conversion stage
- result backend = a parquet results table keyed by job_id
- poll        = `get_job_status` over the results table; a job with no
                result row yet is IN_PROGRESS (the reference maps Celery
                PENDING → IN_PROGRESS, service.py:230-231)

Status semantics preserved exactly:
- single job: SUCCESS with a result, FAILURE carrying the conversion error
  (a conversion error means task SUCCESS but job FAILURE — service.py:235-238)
- batch job: SUCCESS as long as the batch ran, even when member conversions
  failed (per-member FAILURE entries inside — service.py:244-273)
"""

from __future__ import annotations

import os

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from docling_api_spark.pipeline.convert import convert_documents
from docling_api_spark.pipeline.schemas import (
    JOB_FAILURE,
    JOB_IN_PROGRESS,
    JOB_SUCCESS,
)
from docling_api_spark.sources.binaryfiles import read_documents_stream


def job_id_col() -> Column:
    """job_id = landing filename (the submit identity)."""
    return F.element_at(F.split(F.col("path"), "/"), -1)


class _scoped_stream_state_parts:
    """Scope the state-partition count of a bounded drain (guide §2.2:
    size partitions to the data, not the core count).

    A stateful streaming operator creates one state-store instance per
    shuffle partition and commits each of them per micro-batch — at the
    test corpus's volume, 32 state partitions are pure per-batch file I/O
    (measured r15: q36 drain 1.9-7.3 s at 32 state partitions vs
    1.2-1.4 s at 8). The stream's session snapshot makes the setting
    safe to scope: StreamExecution clones the session at start(), and on
    checkpoint RESUME Spark takes the partition count from the offset
    log, not this conf, so recovery semantics (pinned by the
    kill/restart test) are untouched. Env: SPARK_GRAFT_STREAM_STATE_PARTS
    (a real deployment sizes this to its per-trigger volume; default
    min(8, shuffle partitions) matches the test corpus).

    The conf mutation is session-global for the scope's duration: a query
    planned CONCURRENTLY on the same session (another driver thread) would
    inherit the reduced partition count. The drains here are called from
    single-threaded query paths (bench/driver/tests), which is the
    assumption; a multi-tenant deployment should start the stream from a
    cloned session (spark.newSession()) instead."""

    def __init__(self, spark: SparkSession):
        self.spark = spark

    def __enter__(self) -> None:
        self.prev = self.spark.conf.get("spark.sql.shuffle.partitions")
        try:
            prev_n = int(self.prev)
        except (TypeError, ValueError):
            prev_n = 8  # non-integer conf (e.g. "auto" on a fork) — floor it
        target = os.environ.get("SPARK_GRAFT_STREAM_STATE_PARTS") or str(
            min(8, prev_n)
        )
        self.spark.conf.set("spark.sql.shuffle.partitions", target)

    def __exit__(self, *exc) -> None:
        self.spark.conf.set("spark.sql.shuffle.partitions", self.prev)


def drain_stream_to_parquet(stream_df: DataFrame, prefix: str = "drain") -> DataFrame:
    """Run an append-mode stream to completion through the PRODUCTION file
    sink — parquet results + checkpointed offsets, exactly the
    `start_conversion_stream` shape — and read the results back.

    This is how the graded streaming queries (q36/q37) drain: nothing is
    materialized on the driver (the r2 memory-sink harness was
    driver-resident); results land as a parquet table an external consumer
    would poll, and the checkpoint makes the run resumable (pinned by
    tests/test_streaming_jobs.py's kill/restart recovery test).
    """
    import tempfile

    spark = stream_df.sparkSession
    out_dir = tempfile.mkdtemp(prefix=f"{prefix}_out_")
    # Trigger.AvailableNow (r16, guide §2.4 fixed costs): the documented
    # run-to-completion trigger for a bounded drain — the stream plans all
    # available input up front, runs the same micro-batches (data batch +
    # watermark-finalization batch; probed: 2 = 2 on q36/q109), then
    # terminates itself, replacing the processAllAvailable polling
    # handshake with awaitTermination. Measured flat-to-slightly-better
    # locally (family A/B min-sum ×0.85–0.97 over quiet windows); kept
    # for the semantics: self-termination cannot hang on a source that
    # keeps reporting new offsets, and recovery still resumes from the
    # offset log (kill/restart test). Env opt-out restores the old
    # processingTime drain.
    avail = os.environ.get("SPARK_GRAFT_STREAM_AVAILABLE_NOW", "1") == "1"
    with _scoped_stream_state_parts(spark):
        writer = (
            stream_df.writeStream.outputMode("append")
            .format("parquet")
            .option("path", out_dir)
            .option(
                "checkpointLocation", tempfile.mkdtemp(prefix=f"{prefix}_ckpt_")
            )
        )
        if avail:
            writer = writer.trigger(availableNow=True)
        q = writer.start()
    if avail:
        q.awaitTermination()
    else:
        q.processAllAvailable()
    q.stop()
    # explicit schema: an empty emission set leaves no part files, which a
    # schema-inferring read would refuse
    return spark.read.schema(stream_df.schema).parquet(out_dir)


def start_conversion_stream(
    spark: SparkSession,
    landing_dir: str,
    results_dir: str,
    checkpoint_dir: str,
    converter: str = "lightweight",
    batch_extract: str = r"^(batch-[^_]+)_",
) -> StreamingQuery:
    """Watch `landing_dir`, convert new documents, append results keyed by
    job_id (+ batch_id parsed from a 'batch-XXX_' filename prefix).

    Checkpointing gives at-least-once processing; conversion is pure per
    file, so replays are idempotent at the results-table level (reads
    dedupe on job_id via max(mtime) if ever needed).
    """
    docs = read_documents_stream(spark, landing_dir)
    converted = convert_documents(docs, converter=converter)
    results = converted.select(
        job_id_col().alias("job_id"),
        F.regexp_extract(job_id_col(), batch_extract, 1).alias("batch_id"),
        "path",
        "format",
        "filename",
        "markdown",
        "images",
        "error",
    )
    return (
        results.writeStream.format("parquet")
        .option("path", results_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .trigger(processingTime="1 second")
        .start()
    )


def _read_results(spark: SparkSession, results_dir: str) -> DataFrame | None:
    try:
        df = spark.read.parquet(results_dir)
        return df if df.columns else None
    except Exception:
        return None  # sink not created yet → everything IN_PROGRESS


def get_job_status(spark: SparkSession, results_dir: str, job_id: str) -> dict:
    """Single-job status read model (reference service.py:220-242)."""
    results = _read_results(spark, results_dir)
    if results is None:
        return {"job_id": job_id, "status": JOB_IN_PROGRESS, "result": None, "error": None}
    rows = results.filter(F.col("job_id") == job_id).collect()
    if not rows:
        return {"job_id": job_id, "status": JOB_IN_PROGRESS, "result": None, "error": None}
    row = rows[0].asDict()
    if row["error"]:
        return {"job_id": job_id, "status": JOB_FAILURE, "result": None, "error": row["error"]}
    return {
        "job_id": job_id,
        "status": JOB_SUCCESS,
        "result": {
            "filename": row["filename"],
            "markdown": row["markdown"],
            "images": row["images"],
        },
        "error": None,
    }


def get_batch_status(
    spark: SparkSession, results_dir: str, batch_id: str, expected: int | None = None
) -> dict:
    """Batch status (reference service.py:244-273): the batch is SUCCESS once
    it has run — member failures stay inside as per-member FAILURE entries.
    With `expected` set, a partially-arrived batch is IN_PROGRESS."""
    results = _read_results(spark, results_dir)
    rows = (
        []
        if results is None
        else results.filter(F.col("batch_id") == batch_id).orderBy("job_id").collect()
    )
    if not rows or (expected is not None and len(rows) < expected):
        return {"job_id": batch_id, "status": JOB_IN_PROGRESS, "conversion_results": []}
    members = []
    for r in rows:
        d = r.asDict()
        if d["error"]:
            members.append({"status": JOB_FAILURE, "error": d["error"], "result": None})
        else:
            members.append(
                {
                    "status": JOB_SUCCESS,
                    "error": None,
                    "result": {"filename": d["filename"], "markdown": d["markdown"]},
                }
            )
    return {"job_id": batch_id, "status": JOB_SUCCESS, "conversion_results": members}


def drain_stream_upsert(stream_df: DataFrame, keys: list[str], prefix: str = "upsert") -> DataFrame:
    """Run an UPDATE-mode stream through a foreachBatch upsert sink and
    return the resulting snapshot — the production pattern for keyed
    aggregates (running totals, latest-state tables) that file sinks
    can't take in append mode.

    Sink layout is merge-on-read (Hudi/Delta MOR shape without the
    table format): each micro-batch APPENDS its changed rows stamped
    with the batch id; the snapshot read resolves latest-batch-wins per
    key with one window. Appends keep the foreachBatch write atomic and
    idempotent-enough for at-least-once replay (a replayed batch id
    overwrites itself in the read view); a real deployment compacts the
    log periodically with the same latest-wins query.
    """
    import shutil
    import tempfile

    from pyspark.sql import Window as W
    from pyspark.sql import functions as F

    spark = stream_df.sparkSession
    root = tempfile.mkdtemp(prefix=f"{prefix}_drain_")
    log_dir = os.path.join(root, "log")
    ckpt_dir = os.path.join(root, "ckpt")

    def upsert(batch_df: DataFrame, batch_id: int) -> None:
        (
            batch_df.withColumn("_batch_id", F.lit(batch_id))
            .write.mode("append")
            .parquet(log_dir)
        )

    # Trigger.AvailableNow, same rationale as drain_stream_to_parquet
    avail = os.environ.get("SPARK_GRAFT_STREAM_AVAILABLE_NOW", "1") == "1"
    with _scoped_stream_state_parts(spark):
        writer = (
            stream_df.writeStream.outputMode("update")
            .foreachBatch(upsert)
            .option("checkpointLocation", ckpt_dir)
        )
        if avail:
            writer = writer.trigger(availableNow=True)
        q = writer.start()
    if avail:
        q.awaitTermination()
    else:
        q.processAllAvailable()
    q.stop()

    # an empty source produces zero micro-batches → no parquet files, and a
    # bare read would die on schema inference. The stream schema is known
    # statically, so return an empty frame with it.
    if not os.path.isdir(log_dir) or not any(
        f.endswith(".parquet") for f in os.listdir(log_dir)
    ):
        shutil.rmtree(root, ignore_errors=True)
        return spark.createDataFrame([], stream_df.schema)

    log = spark.read.parquet(log_dir)
    w = W.partitionBy(*keys).orderBy(F.col("_batch_id").desc())
    snapshot = (
        log.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .drop("_rn", "_batch_id")
    )
    # the snapshot must outlive the temp log (lazy plan) — materialize it
    # driver-side-free via localCheckpoint, then drop the log directory.
    snapshot = snapshot.localCheckpoint(eager=True)
    shutil.rmtree(root, ignore_errors=True)
    return snapshot
