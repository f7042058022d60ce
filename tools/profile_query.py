"""Per-stage profile of one or more registered queries.

    python /root/repo/tools/profile_query.py <query> [<query>...]

Runs each query twice (warm + timed) with the Spark UI enabled, then reads
the UI REST API for the timed run's stages: per-stage wall duration,
executor run/CPU time, shuffle bytes, task count. This is the "which stage
is the time going to" instrument of guide §1.1/§7.1, for a box with no
interactive UI. Env: SPARK_GRAFT_SF_DIR (default sf0.1), SPARK_GRAFT_CPUS.
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    names = sys.argv[1:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from docling_api_spark.plans import all_queries
    from docling_api_spark.session import get_spark

    spark = get_spark(
        app_name="profile-query", extra_conf={"spark.ui.enabled": "true"}
    )
    spark.sparkContext.setLogLevel("ERROR")
    ui = spark.sparkContext.uiWebUrl
    app_id = spark.sparkContext.applicationId
    registry = all_queries()

    def rest(path: str):
        with urllib.request.urlopen(f"{ui}/api/v1/applications/{app_id}{path}") as r:
            return json.load(r)

    for name in names:
        q = registry[name]
        # warm (codegen, broadcast, probe memos)
        q.fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        sc = spark.sparkContext
        sc.setJobGroup(name, name)
        jobs_before = {j["jobId"] for j in rest("/jobs")}
        t0 = time.perf_counter()
        q.fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        wall = time.perf_counter() - t0
        sc.setJobGroup(None, None)
        jobs = [j for j in rest("/jobs") if j["jobId"] not in jobs_before]
        stage_ids = sorted({s for j in jobs for s in j["stageIds"]})
        print(f"\n=== {name}: wall {wall:.3f}s, {len(jobs)} jobs, "
              f"{len(stage_ids)} stages ===")
        rows = []
        for sid in stage_ids:
            try:
                infos = rest(f"/stages/{sid}")
            except Exception:
                continue
            for s in infos:
                if s["status"] not in ("COMPLETE", "ACTIVE"):
                    continue
                dur = None
                if s.get("firstTaskLaunchedTime") and s.get("completionTime"):
                    # ISO-ish "2026-08-17T09:05:01.123GMT"
                    from datetime import datetime

                    def ts(x):
                        return datetime.strptime(
                            x.replace("GMT", ""), "%Y-%m-%dT%H:%M:%S.%f"
                        ).timestamp()

                    dur = ts(s["completionTime"]) - ts(s["firstTaskLaunchedTime"])
                rows.append(
                    (
                        dur or 0.0,
                        s["stageId"],
                        s["numCompleteTasks"],
                        s["executorRunTime"] / 1e3,
                        s["executorCpuTime"] / 1e9,
                        s.get("shuffleReadBytes", 0) / 1e6,
                        s.get("shuffleWriteBytes", 0) / 1e6,
                        (s.get("name") or "")[:70],
                    )
                )
        rows.sort(reverse=True)
        print(f"{'wall_s':>7} {'stage':>5} {'tasks':>5} {'run_s':>7} "
              f"{'cpu_s':>7} {'shR_MB':>7} {'shW_MB':>7}  name")
        for r in rows:
            print(f"{r[0]:7.3f} {r[1]:5d} {r[2]:5d} {r[3]:7.2f} {r[4]:7.2f} "
                  f"{r[5]:7.2f} {r[6]:7.2f}  {r[7]}")
        tot_gap = wall - sum(r[0] for r in rows)
        print(f"  (wall not inside stage windows — scheduling/driver/plan: "
              f"{tot_gap:.3f}s)")


if __name__ == "__main__":
    main()
