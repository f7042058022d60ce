"""Dump `.explain("formatted")` for headline (bench=True) queries to files.

    python /root/repo/tools/dump_plans.py <out_dir> <suffix> [query_prefix...]

Writes one `<out_dir>/<query>_<suffix>.txt` per headline query, planned at
the bench's own conditions (sf0.1, get_spark defaults) so the files document
exactly what the bench measures. Streaming drains / eager-materializing
queries (EXECUTING_QUERIES) are planned too — their plan is still a static
DataFrame plan here — but failures are recorded in the file, not fatal.
Used for the round-15 optimization evidence (plans/r15/*_before|after.txt).
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    out_dir = sys.argv[1]
    suffix = sys.argv[2]
    prefixes = tuple(sys.argv[3:])
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    os.makedirs(out_dir, exist_ok=True)

    from docling_api_spark.plans import all_queries
    from docling_api_spark.plans.registry import EXECUTING_QUERIES
    from docling_api_spark.session import get_spark

    spark = get_spark(app_name="dump-plans")
    spark.sparkContext.setLogLevel("ERROR")
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )

    for name, q in all_queries().items():
        if prefixes and not name.startswith(prefixes):
            continue
        if not q.bench:
            continue
        if name in EXECUTING_QUERIES:
            continue  # planning runs them; their cost is runtime, not plan shape
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        try:
            df = q.fn(spark, sf_dir)
            plan = df._jdf.queryExecution().explainString(mode)
        except Exception as ex:  # record, don't die
            plan = f"ERROR {type(ex).__name__}: {ex}"
        with open(path, "w") as f:
            f.write(plan)
        print(name, "->", path)


if __name__ == "__main__":
    main()
