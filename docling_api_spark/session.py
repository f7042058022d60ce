"""SparkSession factory tuned for this engine.

Scaling posture (mirrors the reference's deployment knobs, SURVEY.md §4/§6):
the reference runs one heavyweight conversion task per worker (`--pool=solo`,
docker-compose.yml:48) and preloads models per worker; here that maps to
executor-level config (`spark.task.cpus` for the conversion stage, lazy
per-executor singletons in the UDF module) while the relational surface relies
on Catalyst + AQE.

Local test mode is `local[N]` (single JVM); on a real cluster the same
configs hold, plus dynamic allocation / executor sizing set by the deployer.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# The events table is written with parquet TIMESTAMP(NANOS); Spark's
# TimestampType is microsecond so we read nanos as raw longs and convert
# with integer division (exactly what DuckDB's µs truncation does).
NANOS_AS_LONG = "spark.sql.legacy.parquet.nanosAsLong"


def get_spark(
    app_name: str = "docling-api-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Create (or fetch) a SparkSession with the engine's standard config.

    Defaults are sized for the local test harness but every choice is
    cluster-safe: AQE re-plans shuffles at runtime (partition coalescing,
    skew-join splitting, broadcast demotion), Arrow keeps the pandas-UDF
    boundary columnar, UTC pins timestamp semantics for oracle parity.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    master = master or os.environ.get("SPARK_GRAFT_MASTER", f"local[{cpus}]")
    if shuffle_partitions is None:
        shuffle_partitions = int(os.environ.get("SPARK_GRAFT_SHUFFLE_PARTITIONS", cpus))

    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # Arrow batch sizing (optimization guide §4.2): bound batches by
        # BYTES, not a row count. The old maxRecordsPerBatch=256 guarded
        # the conversion stage's megabyte binary rows, but it equally
        # throttled every narrow-row Python pass — q106's token-level
        # Misra-Gries consumed ~600k 10-byte rows as ~2300 Arrow batches
        # per task, all serialization round-trips. maxBytesPerBatch keeps
        # the memory bound the 256-row cap was for (large rows still cut
        # batches early; mirrors the reference's lazy one-at-a-time
        # convert_all iterator, service.py:171-177) while narrow rows get
        # full 10k-row batches.
        .config(
            "spark.sql.execution.arrow.maxRecordsPerBatch",
            os.environ.get("SPARK_GRAFT_ARROW_MAXREC", "10000"),
        )
        .config(
            "spark.sql.execution.arrow.maxBytesPerBatch",
            os.environ.get("SPARK_GRAFT_ARROW_MAXBYTES", str(16 * 1024 * 1024)),
        )
        .config(NANOS_AS_LONG, "true")
        # naive µs parquet timestamps read as TIMESTAMP (UTC instant) like
        # Spark 3.x / DuckDB, not Spark 4's inferred TIMESTAMP_NTZ
        .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
        .config("spark.sql.parquet.filterPushdown", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "24g"))
        .config("spark.ui.enabled", "false")
        # executor thread caps carried over from the reference's tuning
        # (docker-compose.yml:16-18): avoid oversubscription in native libs
        .config("spark.executorEnv.OMP_NUM_THREADS", "2")
        .config("spark.executorEnv.MALLOC_ARENA_MAX", "2")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


def liveness(spark: SparkSession) -> bool:
    """Liveness probe (reference /health, main.py:33-38): the session object
    exists and its context hasn't been stopped."""
    try:
        return not spark.sparkContext._jsc.sc().isStopped()
    except Exception:
        return False


def readiness(spark: SparkSession) -> bool:
    """Readiness probe (reference /health/ready, main.py:41-47: broker
    round-trip ≙ executors actually run a job)."""
    try:
        return spark.range(1).count() == 1
    except Exception:
        return False


def readiness_status(
    spark: SparkSession, max_retries: int = 1, timeout: float = 2.0
) -> dict:
    """Structured readiness with bounded retry + timeout — the full contract
    of the reference's probe (main.py:41-47 does
    `conn.ensure_connection(max_retries=1, timeout=2)` and answers
    `{"status": "ok", "broker": "ok"}` or a degraded payload with the
    error, never a 500). Here the "broker" is the cluster scheduler: a
    round-trip means executors actually accept and run a job.

    The probe job runs on a dedicated thread so a hung scheduler degrades
    the status after `timeout` seconds instead of wedging the health
    endpoint — the property the reference gets from ensure_connection's
    socket timeout.
    """
    import concurrent.futures

    last_err: Exception | None = None
    for _ in range(max_retries + 1):
        # no `with`: the CM would JOIN a hung probe thread on exit, turning
        # the timeout we just enforced back into an indefinite wait
        ex = concurrent.futures.ThreadPoolExecutor(max_workers=1)
        try:
            fut = ex.submit(lambda: spark.range(1).count())
            if fut.result(timeout=timeout) == 1:
                return {"status": "ok", "scheduler": "ok"}
            last_err = RuntimeError("probe job returned wrong count")
        except Exception as exc:  # timeout or submission failure
            last_err = exc
        finally:
            ex.shutdown(wait=False, cancel_futures=True)
    return {"status": "degraded", "scheduler": f"unreachable: {last_err}"}
