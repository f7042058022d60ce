"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec, ...}, "sf": ...}.

Each query is executed once to warm the JVM/IO path and once timed; the
timed run materializes results via a count-style action (collect for small
outputs) so the full plan executes.
"""

from __future__ import annotations

import json
import os
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

    registry = all_queries()
    bench_queries = {n: q for n, q in sorted(registry.items()) if q.bench}

    timings: dict[str, float] = {}
    # warm-up: JVM JIT, parquet footer cache, Python worker pool
    for name, q in bench_queries.items():
        q.fn(spark, sf_dir).write.format("noop").mode("overwrite").save()

    runs = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "3"))
    for name, q in bench_queries.items():
        best = float("inf")
        for _ in range(runs):
            t0 = time.perf_counter()
            q.fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            best = min(best, time.perf_counter() - t0)
        timings[name] = round(best, 4)

    total = round(sum(timings.values()), 4)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_time",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
