"""Apply the r13 done-bar (bench.py PROBE_R10_SPARK_MS block, SCALING.md
"Round-13") to a bench record — one command turns a BENCH_r*.json into a
verdict instead of a post-hoc essay:

    python tools/grade_bench.py BENCH_r13.json

Prints the regime, the statistic the bar grades that regime on, and
PASS / GRAY / FAIL per the documented band. GRAY directs the reader to
tools/compare_bench.py vs BENCH_r10 (0 flagged queries at the widened
floor = machine = PASS). Exit code: 0 for PASS, 2 for GRAY (adjudicate),
1 for FAIL or an ungradeable record.
"""

from __future__ import annotations

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from bench import PROBE_R10_SPARK_MS, run_regime  # noqa: E402

QUIET_MEDIAN_BAR_S = 23.0  # the historic bar, claimable only when quiet
# burst band applies to max(carried_total, carried_min_r10_scaled) — the
# conservative statistic (r13 judge Next #1: scaling may excuse nothing
# below the raw min-sum)
BURST_PASS_S = 23.0
BURST_FAIL_S = 24.1  # x1.25 over the r10 record (19.27): code until bisected


def load(path: str) -> dict:
    doc = json.load(open(path, encoding="utf-8"))
    return doc.get("parsed", doc) if isinstance(doc, dict) else doc


def grade(rec: dict) -> tuple[str, str]:
    """-> (verdict in {'PASS','GRAY','FAIL','UNGRADEABLE'}, explanation)."""
    regime = rec.get("regime") or run_regime(rec)
    if regime == "quiet":
        med = rec.get("carried_total_median")
        if not isinstance(med, (int, float)):
            return "UNGRADEABLE", "quiet record without carried_total_median"
        verdict = "PASS" if med <= QUIET_MEDIAN_BAR_S else "FAIL"
        return verdict, (
            f"quiet regime: carried_total_median {med:.2f}s vs "
            f"<= {QUIET_MEDIAN_BAR_S}s bar"
        )
    total, probe = rec.get("carried_total"), rec.get("probe_spark_ms_median")
    if not isinstance(total, (int, float)) or not probe:
        return "UNGRADEABLE", "burst record without carried_total/probe median"
    scaled = total * PROBE_R10_SPARK_MS / probe
    # Conservative statistic (VERDICT r13 Next #1): probe scaling may
    # never IMPROVE on the raw min-sum — r13 scaled 21.95s down to 16.21s
    # ("16% faster than r10") while the same round's boundary A/B measured
    # code-flat, so on a high-probe box the old rule could flatten a real
    # regression into a PASS. Grade max(raw, scaled): a faster-than-r10
    # box still up-corrects (scaled > raw), a slower box no longer
    # down-corrects past the raw number. A raw miss lands in GRAY/FAIL
    # where compare_bench adjudicates machine-vs-code explicitly (exactly
    # how r12's 23.40s was historically cleared).
    stat = max(total, scaled)
    detail = (
        f"burst regime: conservative stat {stat:.2f}s = max(carried_total "
        f"{total:.2f}s, r10-scaled {scaled:.2f}s at probe {probe:.1f}ms) — "
        f"band: <= {BURST_PASS_S} PASS, {BURST_PASS_S}-{BURST_FAIL_S} GRAY "
        f"(compare_bench vs BENCH_r10 adjudicates), > {BURST_FAIL_S} FAIL"
    )
    if stat <= BURST_PASS_S:
        return "PASS", detail
    if stat <= BURST_FAIL_S:
        return "GRAY", detail
    return "FAIL", detail


def main() -> None:
    if len(sys.argv) != 2:
        print(__doc__)
        sys.exit(1)
    rec = load(sys.argv[1])
    verdict, detail = grade(rec)
    print(f"{verdict}: {detail}")
    sys.exit({"PASS": 0, "GRAY": 2}.get(verdict, 1))


if __name__ == "__main__":
    main()
