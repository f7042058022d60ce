"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec, ...}, "queries_median": {...},
"queries_spread": {...}, "sf": ...}.

Each query is warmed once (JVM JIT, parquet footers, Python worker pool),
then timed SPARK_GRAFT_BENCH_RUNS (default 3) times via a noop-format
write so the full plan executes. "queries" carries the per-query MIN
(round-comparable best case); "queries_median"/"queries_spread" carry the
median and max-min across runs so round-over-round deltas are
attributable against run-to-run noise (r2 lesson: untouched queries
drifted +17-41% at n=1).
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

REPO_DIR = os.path.dirname(os.path.abspath(__file__))
if REPO_DIR not in sys.path:
    sys.path.insert(0, REPO_DIR)

from docling_api_spark.plans import all_queries  # noqa: E402
from docling_api_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    spark = get_spark(app_name="docling-api-spark-bench")
    # foreign-cwd safety: pandas-UDF closures reference the package; ship it
    import __spark_entry__

    __spark_entry__._ship_package(spark)

    registry = all_queries()
    bench_queries = {n: q for n, q in sorted(registry.items()) if q.bench}

    # warm-up: JVM JIT, parquet footer cache, Python worker pool
    for name, q in bench_queries.items():
        q.fn(spark, sf_dir).write.format("noop").mode("overwrite").save()

    runs = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "3"))
    timings: dict[str, float] = {}
    medians: dict[str, float] = {}
    spreads: dict[str, float] = {}
    for name, q in bench_queries.items():
        # let the ContextCleaner drop checkpoint/broadcast blocks left by the
        # previous query: a handful of entries (q43/q45/q103/q152/...) pin
        # localCheckpoint blocks until their RDDs are GC'd, and without the
        # nudge those blocks accumulate across the set and tax the
        # checkpoint-heavy queries that run late in alphabetical order
        import gc

        gc.collect()
        spark.sparkContext._jvm.System.gc()
        samples: list[float] = []
        for _ in range(runs):
            t0 = time.perf_counter()
            q.fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            samples.append(time.perf_counter() - t0)
        samples.sort()
        timings[name] = round(samples[0], 4)
        medians[name] = round(statistics.median(samples), 4)
        spreads[name] = round(samples[-1] - samples[0], 4)

    total = round(sum(timings.values()), 4)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_time",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "queries_median": medians,
                "queries_spread": spreads,
                "n_runs": runs,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
