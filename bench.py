"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints TWO
JSON lines: a detailed record (full-precision per-query min/median/spread
dicts plus raw per-run samples) followed by a compact line —
{"queries": {per-query BEST-OF-N, 2dp}, "queries_stat": "min", "metric":
..., "value": total_sec, "unit": "sec", "carried_total": ...,
"carried_total_median": ..., "regime": "quiet"|"burst", "sf": ...}
— guaranteed to fit inside the grading driver's 2000-char output-tail
capture (it degrades to scalars-only if the per-query dict would
overflow), so the LAST line always parses. The `regime` tag and the
per-regime done-bar are defined at PROBE_R10_SPARK_MS below (VERDICT
r12 Next #1): quiet records are graded on carried_total_median <= 23s,
burst records on carried_min_r10_scaled with a stated accepted band —
no more post-hoc essays when the box is loud.

Best-of-N on the driver-facing line (VERDICT r8 Next #2): BENCH_r08's
standing record was the worst of seven same-HEAD runs because this box's
interference arrives in multi-minute bursts — a burst inflates the
per-query MEDIAN of the n=3 runs while the per-query MIN usually dodges
it (a burst long enough to capture all three runs of a query still shows,
honestly). The compact line therefore reports per-query mins
("queries_stat": "min" marks the regime for tools/compare_bench.py; r5-r8
compact lines carried medians) and promotes `carried_total` (min-sum over
the frozen subset). `carried_total_median` stays on the line for
cross-round continuity with r5-r8 records; both scaled twins live in the
detailed record only since r12 (derivable: carried stat *
PROBE_REF_SPARK_MS / probe_spark_ms_median — the line seat went to the
window probe instead), and the full median/spread dicts and raw per-run
samples stay detailed-only.

Round-over-round comparability (r4 lesson): the headline set grew 27 -> 52
queries in one shared JVM and every carried query drifted +10-40% from
accumulated JVM/broadcast/checkpoint state plus set-size confound. Two
fixes live here:

1. CARRIED_R3 is the frozen 27-query subset benched in round 3, timed
   FIRST in the same fixed order with the same warm-then-time procedure
   over exactly that subset — so ``carried_total`` is measured under the
   same JVM conditions round 3 measured and regressions are attributable
   to code, not to whatever headliners were added since. The remaining
   headliners run as a second phase afterwards.
2. The driver records only the LAST 2000 characters of output and parses
   a JSON line out of them (BENCH_r01-r04 inspection). r3/r4's single
   detailed line outgrew the capture: its head — opening brace and
   scalars — was cut, leaving "parsed": null. The compact final line
   (~1.8KB measured) always fits, so the tail always contains one
   complete parseable record; the detailed line before it preserves the
   full-precision history for humans re-reading the run.

Probe instrument (r6 judge what's-wrong #2): a single point-in-time
probe bakes in one machine state — this box's throughput swings 2-4x
WITHIN a run (observed start/end probe pairs 208/107, 266/71), so one
probe can over/under-credit a whole round. The fixed-work Spark probe
therefore runs at ≥5 points spread across the run (start, interleaved
between timed queries in both phases, end); the MEDIAN of those samples
(`probe_spark_ms_median`) is the normalization denominator and the
spread (`probe_spark_ms_spread` = max-min) is emitted beside it so a
reader can judge how trustworthy the scaling is. `probe_spark_ms` /
`probe_spark_ms_end` keep their historical meanings (first / last
sample) for cross-round records that predate the median.
`tools/compare_bench.py`'s median-of-per-query-ratios remains the
robust cross-round instrument; the scaled scalar here is the headline
approximation of the same adjudication. Since r8 a second fixed-work
probe (`_spark_shuffle_probe`) samples the SHUFFLE path at the same
points: r8's clean runs showed whole-set raw ratios moving ×1.15–×1.25
with the zero-shuffle codegen probe flat, i.e. a drift mode the scaling
denominator cannot see. The shuffle probe is diagnostic only (detailed
record; compare_bench prints its ratio beside the verdict, never scales
by it).

r6 drift adjudication (r5 judge what's-wrong #2): a clean r6 run measured
probe_spark_ms_end 106.8 vs the pinned r5 reference 97.77 (box ~9% slower)
while the median per-query ratio vs BENCH_r05 across all 51 headliners was
1.06 — the whole-set drift is the machine, not the code. The three flagged
carried queries re-measured q57 1.56->1.50, q63 0.84->0.89, q73
0.24->0.27 with their files untouched; probe-scaled they are flat or
faster, so the r4->r5 drifts are CLEARED as machine noise. That is the
adjudication carried_median_probe_scaled now automates.

Each query is warmed once (JVM JIT, parquet footers, Python worker pool),
then timed SPARK_GRAFT_BENCH_RUNS (default 5 since r10; 3 in r5-r9)
times via a noop-format
write so the full plan executes. "queries" carries the per-query MIN
(round-comparable best case); "queries_median"/"queries_spread" carry the
median and max-min across runs so deltas are attributable against
run-to-run noise (r2 lesson: untouched queries drifted +17-41% at n=1).
"""

from __future__ import annotations

import gc
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

# Pinned denominator reference for carried_median_probe_scaled: the
# fully-warm fixed-work Spark probe (sum over a 50M-row range, min of 3)
# measured as BENCH_r05's probe_spark_ms_end on the round-5 grading host
# — local[32], 128 GiB container, single shared JVM, end-of-run (fully
# JIT-tiered) state. Same-code probes on this host have measured 71-110ms
# across clean runs (VERIFICATION.md r6), so the constant represents ONE
# point in that band; the per-run median+spread emitted since r7 are the
# instrument that says where the current run sits relative to it. Do not
# retune casually: changing it rescales the cross-round comparable number.
PROBE_REF_SPARK_MS = 97.77

# ---------------------------------------------------------------------------
# GRADED DONE-BAR (r13, VERDICT r12 Next #1) — the box-robust criterion.
# ---------------------------------------------------------------------------
# The historic bar ("carried_total_median <= 23s") was a single unqualified
# sample of a bimodal box: r10-r12 boundary-code A/Bs proved the code flat
# (+-1.5%) while the driver-timed carried median swung 22.5-30.7s with box
# state. The record now SELF-QUALIFIES ("regime" on the compact line) and
# the bar is defined per regime:
#
#   regime == "quiet"  (every probe instrument's warm spread <= 20% of its
#                       median — the same dead-band compare_bench prices
#                       into its base threshold):
#       carried_total_median <= 23.0s  — the historic bar, claimable only
#       in the regime it was set in.
#
#   regime == "burst"  (any instrument's spread exceeds the dead-band;
#                       per-query MEDIANS are box-dominated in this mode —
#                       bursts inflate medians while best-of-N mins dodge):
#       graded on the CONSERVATIVE statistic (r13 judge Next #1)
#           max(carried_total, carried_min_r10_scaled)
#       where carried_min_r10_scaled = carried_total * PROBE_R10_SPARK_MS /
#       probe_spark_ms_median, the min-sum scaled to the r10 record's box
#       state. Probe scaling may never IMPROVE on the raw min-sum: r13's
#       spark probe inflated x1.354 while the shuffle probe moved only
#       x1.098, scaling 21.95s down to 16.21s — a "speedup" the same
#       round's boundary A/B (x0.987, code-flat) disproved; on such a box
#       the old rule could flatten a genuine x1.3 regression into a PASS.
#       A raw miss now lands in GRAY/FAIL where compare_bench vs BENCH_r10
#       adjudicates machine-vs-code explicitly. Accepted band:
#         <= 23.0          PASS (r10 19.27 identity, r11 21.67, r12 22.24 —
#                          all proven code-flat by the worktree A/B; the
#                          residual x1.10-x1.15 is the measured box offset
#                          the codegen probe cannot see, SCALING.md r12)
#         23.0 - 24.1      GRAY: adjudicate with tools/compare_bench.py vs
#                          BENCH_r10 — 0 flagged queries at the widened
#                          floor => machine, PASS; flags => investigate.
#         > 24.1 (x1.25 over the r10 record) FAIL — no band re-derivation;
#                          treat as a code regression until bisected.
#
# carried_min_r10_scaled itself is derivable from compact-line fields
# (carried_total, probe_spark_ms_median) plus the pinned constant below, so
# it rides the detailed record only — the line seat goes to the regime tag.
PROBE_R10_SPARK_MS = 93.55  # BENCH_r10's probe_spark_ms_median, pinned

# Regime dead-band: warm spread/median above this on ANY instrument tags
# the run "burst". MUST mirror tools/compare_bench.py's BURST_DEADBAND —
# one definition of "quiet" across the grader and the comparer (pinned by
# tests/test_bench_contract.py).
BURST_DEADBAND = 0.2


def run_regime(*stat_dicts: dict) -> str:
    """Self-qualification tag for the compact line: 'quiet' when every
    probe instrument's warm spread stayed within BURST_DEADBAND of its
    median, else 'burst'. Same definition as compare_bench's
    burst_allowance dead-band, so a record tagged quiet is exactly one
    whose comparisons keep the tight x1.25 floor."""
    worst = 0.0
    for s in stat_dicts:
        for k, med in s.items():
            if not k.endswith("_ms_median"):
                continue
            spr = s.get(k[: -len("_ms_median")] + "_ms_spread")
            if (
                isinstance(med, (int, float)) and med > 0
                and isinstance(spr, (int, float)) and spr >= 0
            ):
                worst = max(worst, spr / med)
    return "quiet" if worst <= BURST_DEADBAND else "burst"

# Frozen round-3 headline set (the exact 27 keys of BENCH_r03's
# queries_median, in its sorted order). Do NOT edit this tuple: its sum is
# the round-over-round comparable number. New headliners go in phase 2
# automatically via the registry bench flag.
CARRIED_R3: tuple[str, ...] = (
    "q01_pricing_summary",
    "q03_broadcast_dim_join",
    "q04_multiway_join_revenue",
    "q104_snapshot_diff",
    "q106_heavy_hitters",
    "q108_bloom_semi_join",
    "q112_inverted_index",
    "q118_equidepth_histogram",
    "q134_curation_pipeline",
    "q14_window_topk_per_group",
    "q28_shipping_priority",
    "q29_large_orders",
    "q30_tumbling_window",
    "q32_session_window",
    "q33_asof_join",
    "q35_bucketed_range_join",
    "q42_ngram_jaccard",
    "q43_minhash_lsh",
    "q43_minhash_lsh_xxh",
    "q49_rolling_zscore",
    "q50_cosine_topk",
    "q57_incremental_dedup",
    "q58_incremental_rollup",
    "q62_quality_score",
    "q63_tfidf_top_terms",
    "q72_conversion_pipeline",
    "q73_sequence_packing",
)


def _bench_phase(
    spark, queries, sf_dir: str, runs: int, out: dict,
    probe_cb=None, probe_every: int = 0,
) -> None:
    """Warm every query in `queries` once, then time each `runs` times.

    Mirrors the r1-r3 procedure (one warm sweep over the phase's set, then
    per-query timed runs with a GC nudge between queries so checkpoint/
    broadcast blocks from the previous query don't tax the next one).

    `probe_cb`/`probe_every`: after every `probe_every` timed queries, run
    the fixed-work machine probe BETWEEN queries — outside every timed
    section, and always followed by the per-query GC nudge before the next
    timed run — to sample machine throughput across the run (r6 judge: a
    single point-in-time probe bakes in one machine state). Per-query
    numbers are therefore procedure-CLOSE to r1-r6, not strictly
    identical: the probe adds inter-query JVM work (a 50M-row codegen'd
    job) whose codegen-cache/GC residue the following nudge bounds but
    cannot fully erase (ADVICE r7). The r7/r8 same-regime pairs are the
    comparable ones; cross-boundary deltas get raw ratios only
    (tools/compare_bench.py refuses mixed-regime scaling).
    """
    for name, q in queries.items():
        q.fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
    for i, (name, q) in enumerate(queries.items()):
        if probe_cb is not None and probe_every and i and i % probe_every == 0:
            probe_cb()
        gc.collect()
        spark.sparkContext._jvm.System.gc()
        samples: list[float] = []
        for _ in range(runs):
            t0 = time.perf_counter()
            q.fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            samples.append(time.perf_counter() - t0)
        # raw per-run data, in run order (detailed record only): lets a
        # reader see WHICH run a burst hit, not just that one did
        out["queries_runs"][name] = [round(s, 4) for s in samples]
        samples.sort()
        out["queries"][name] = round(samples[0], 4)
        out["queries_median"][name] = round(statistics.median(samples), 4)
        out["queries_spread"][name] = round(samples[-1] - samples[0], 4)


def quiet_gate(
    probe_fns: dict,
    attempts: int | None = None,
    sleep_s: float | None = None,
    sleep_late_s: float | None = None,
    sleep_fn=time.sleep,
    samples_per: int = 4,
    log=lambda msg: print(msg, file=sys.stderr),
) -> dict:
    """Hold the run until the box is in a QUIET window (VERDICT r13 Next
    #2): before any timed segment starts, sample every probe instrument
    `samples_per` times and start only when each instrument's warm
    spread/median is within BURST_DEADBAND — the same criterion the
    regime tag grades by. Otherwise sleep and retry, bounded. The retry
    cadence escalates: sleeps 1-2 use `sleep_s` (env
    SPARK_GRAFT_QUIET_SLEEP_S, default 20s), later ones `sleep_late_s`
    (env SPARK_GRAFT_QUIET_SLEEP_LATE_S, default 45s) — r14's preflight3
    found quiet on the 45s cadence after the 20s one failed twice.
    Attempt budget: env SPARK_GRAFT_QUIET_ATTEMPTS, default 14.

    Why: the r13 boundary A/B crossed a violent burst and needed a
    three-observation essay to adjudicate q104/q170/q166 (SCALING.md
    "Round-13"); the r12 record sat at 27.34s for the same reason. A
    record or A/B side started inside a quiet window either stays quiet
    (tight floors everywhere downstream) or the regime tag honestly says
    a burst arrived mid-run.

    `probe_fns` maps instrument prefix ("probe_spark", ...) -> zero-arg
    sampler; injectable so the retry/trail contract is unit-testable
    without a JVM (tests/test_bench_contract.py). Returns
    {"quiet": bool, "attempts": n, "trail": [per-attempt stat dicts]} —
    detailed-record material: if the box never went quiet, the trail IS
    the logged proof the done-condition asks for. Per-attempt stats use
    probe_stats' warm convention (first sample discarded), so attempt
    1's JIT tier-up on a cold JVM cannot read as a burst by itself.
    """
    if attempts is None:
        attempts = int(os.environ.get("SPARK_GRAFT_QUIET_ATTEMPTS", "14"))
    if sleep_s is None:
        sleep_s = float(os.environ.get("SPARK_GRAFT_QUIET_SLEEP_S", "20"))
    if sleep_late_s is None:
        sleep_late_s = float(
            os.environ.get("SPARK_GRAFT_QUIET_SLEEP_LATE_S", "45")
        )
    trail: list[dict] = []
    for attempt in range(1, max(1, attempts) + 1):
        stats = [
            probe_stats([fn() for _ in range(samples_per)], prefix=name)
            for name, fn in probe_fns.items()
        ]
        merged = {k: v for s in stats for k, v in s.items()}
        regime = run_regime(*stats)
        trail.append({"attempt": attempt, "regime": regime, **merged})
        log(
            f"quiet-gate attempt {attempt}/{attempts}: {regime} ("
            + ", ".join(
                f"{s_pref}={merged[s_pref + '_ms_median']}/"
                f"{merged[s_pref + '_ms_spread']}ms"
                for s_pref in probe_fns
            )
            + ")"
        )
        if regime == "quiet":
            return {"quiet": True, "attempts": attempt, "trail": trail}
        if attempt < attempts:
            # Escalating cadence (VERDICT r14 Next #1b): the first two
            # retries use the short sleep (a transient burst clears in
            # seconds); from the third retry on, the long one — r14's
            # preflight3 found quiet on a 45s cadence after the 20s one
            # failed twice, i.e. a NEIGHBOR-load burst outlives short
            # sleeps and patience beats frequency. Worst case with the
            # defaults: 2x20s + 11x45s = ~9.5min of sleep across 14
            # attempts — bounded, and cheaper than a FAILing record
            # (BENCH_r14 graded FAIL purely on box state).
            sleep_fn(sleep_s if attempt <= 2 else sleep_late_s)
    return {"quiet": False, "attempts": attempts, "trail": trail}


def gate_summary_scalars(gate: dict | None) -> dict:
    """Compact-line launch-state scalars from a quiet_gate result
    (VERDICT r14 Next #1a): quiet_gate_quiet (0/1), quiet_gate_attempts,
    and the FINAL attempt's per-instrument warm spreads (ints, ms,
    spark/shuffle/window order; instruments the gate didn't sample are
    omitted from the list). Empty dict when the gate was disabled
    (SPARK_GRAFT_QUIET_GATE=0) — absence on the line == no gate ran.
    Unit-tested in tests/test_bench_contract.py; budget worst case
    re-pinned there too."""
    if gate is None:
        return {}
    last = gate["trail"][-1]
    return {
        "quiet_gate_quiet": int(gate["quiet"]),
        "quiet_gate_attempts": gate["attempts"],
        "quiet_gate_spread_ms": [
            int(round(last[p + "_ms_spread"]))
            for p in ("probe_spark", "probe_shuffle", "probe_window")
            if p + "_ms_spread" in last
        ],
    }


def _numpy_probe() -> float:
    """512² float64 matmul, min of 3 (ms) — raw CPU/FPU+memory throughput."""
    import numpy as np

    rng = np.random.default_rng(7)
    a = rng.standard_normal((512, 512))
    a @ a  # warm BLAS thread pool (first call costs ~25ms of one-time init)
    samples = []
    for _ in range(3):
        t0 = time.perf_counter()
        a @ a
        samples.append(time.perf_counter() - t0)
    return round(1000 * min(samples), 2)


def _spark_probe(spark) -> float:
    """Fixed-work Spark probe: sum over a 50M-row range, min of 3 (ms) —
    the JVM codegen/scheduler stack with zero I/O and zero shuffle. Used
    to normalize round-over-round query deltas against machine-level
    throughput drift: same-code runs an hour apart have measured ±25% on
    every query on this host (neighbor contention invisible inside the
    container).

    Each call includes one warm rep (cold first run measures codegen
    compilation, not the machine: observed 411ms cold vs 115ms warm; the
    rep is ~free once the plan is JIT-tiered), then min-of-3. Sampled at
    ≥5 points across the bench run; the per-run MEDIAN is the
    normalization denominator, the spread qualifies it.
    """
    spark.range(50_000_000).selectExpr("sum(id * 2) AS s").collect()
    samples = []
    for _ in range(3):
        t0 = time.perf_counter()
        spark.range(50_000_000).selectExpr("sum(id * 2) AS s").collect()
        samples.append(time.perf_counter() - t0)
    return round(1000 * min(samples), 2)


def _spark_shuffle_probe(spark) -> float:
    """Fixed-work SHUFFLE probe: 2M rows hash-aggregated through 50k
    keys then reduced, min of 3 (ms) — exercises exchange write/read,
    spill buffers, and the disk path that the zero-shuffle `_spark_probe`
    cannot see. Motivated by the r8 observation that whole-set raw
    ratios can move ×1.15–×1.25 across a run while the codegen probe
    stays flat: that drift mode lives in the shuffle/disk path, so a
    flagged regression with a flat codegen probe and a RISING shuffle
    probe is machine, not code. DIAGNOSTIC ONLY: never a scaling
    denominator (compare_bench scales by the codegen probe or not at
    all). Since r9 its median+spread ride the compact line (ADVICE r8:
    driver-written records never saw the diagnostic otherwise), paid for
    by moving probe_numpy_ms/probe_ref_ms to the detailed record; the
    raw samples and start/end keys stay detailed-only.
    """
    plan = lambda: (  # noqa: E731
        spark.range(2_000_000)
        .selectExpr("id % 50000 AS k", "id")
        .groupBy("k")
        .agg({"id": "sum"})
        .selectExpr("sum(`sum(id)`) AS s")
        .collect()
    )
    plan()  # warm rep: codegen + exchange setup, not the machine
    samples = []
    for _ in range(3):
        t0 = time.perf_counter()
        plan()
        samples.append(time.perf_counter() - t0)
    return round(1000 * min(samples), 2)


def _spark_window_probe(spark) -> float:
    """Fixed-work WINDOW-over-shuffle probe (VERDICT r11 Next #2): 1M
    rows hash-partitioned into 10k keys, a running-sum window sorted
    within each partition, reduced to one scalar; min of 3 (ms). This is
    the q296 plan shape — exchange, per-partition SORT, WindowExec frame
    evaluation — i.e. the sort+window resource that three rounds of
    adjudications said the zero-shuffle codegen probe under-tracks (the
    r11 drift's biggest movers q104/q159/q160/q296 all lean on window-
    over-shuffle plans while the codegen probe moved only +2-3%).
    Measured floor on a quiet box ~0.6s, dominated by the sort/window
    stage, not the row count. DIAGNOSTIC ONLY, like the shuffle probe:
    never a scaling denominator; its median+spread ride the compact line
    so driver-written records keep the signal and compare_bench's burst
    floor and diagnostics can use it."""
    plan = lambda: (  # noqa: E731
        spark.range(1_000_000)
        .selectExpr("id % 10000 AS k", "id")
        .selectExpr(
            "k",
            "sum(id) OVER (PARTITION BY k ORDER BY id "
            "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS rs",
        )
        .selectExpr("sum(rs) AS s")
        .collect()
    )
    plan()  # warm rep: codegen + exchange setup, not the machine
    samples = []
    for _ in range(3):
        t0 = time.perf_counter()
        plan()
        samples.append(time.perf_counter() - t0)
    return round(1000 * min(samples), 2)


# < the driver's 2000-char output-tail capture. Hard cap is 1997: the
# tail must hold the full compact line plus the blank separator line and
# the trailing newline (len + 3 <= 2000). 1950 keeps 47 chars of safety
# for driver-side quirks; it was raised from 1900 in r12 to seat the
# window-probe median+spread on the line (VERDICT r11 Next #2) after
# moving the derivable carried_min_probe_scaled to the detailed record
# (= carried_total * PROBE_REF_SPARK_MS / probe_spark_ms_median — all on
# the line or pinned in source).
TAIL_CAPTURE_BUDGET = 1950


def final_line(scalars: dict, per_query: dict) -> str:
    """The guaranteed-parseable last output line: per-query stats (2dp;
    best-of-N since r9, medians r5-r8 — `queries_stat` in the scalars
    names the regime) + scalars when that fits the driver's tail capture,
    else the bounded scalars-only record. Factored out so the contract is
    unit-testable (tests/test_bench_contract.py)."""
    # Compact separators (no spaces) since r15: ~2 chars/pair * ~68
    # pairs = ~130 chars reclaimed, which is what pays for the three
    # quiet-gate launch-state scalars riding the line (VERDICT r14 Next
    # #1a) with the 1950 budget and queries dict intact.
    compact = json.dumps(
        {"queries": {n: round(v, 2) for n, v in per_query.items()}, **scalars},
        separators=(",", ":"),
    )
    if len(compact) <= TAIL_CAPTURE_BUDGET:
        return compact
    return json.dumps(scalars, separators=(",", ":"))


def probe_scaled(median_sum: float, probe_run_ms: float) -> float | None:
    """median_sum normalized to the pinned r5 reference probe — the
    cross-round comparable stat (see module docstring). Since r7 the
    denominator is the MEDIAN of ≥5 probes spread across the run."""
    if not probe_run_ms:
        return None
    return round(median_sum * PROBE_REF_SPARK_MS / probe_run_ms, 4)


def ensure_min_probes(samples: list[float], probe_fn, min_n: int = 5) -> list[float]:
    """Self-enforce the ≥`min_n`-sample probe contract (ADVICE r7): pad
    with extra probe calls instead of silently publishing a median of 2-3
    points when a phase shrinks. Padding happens at the END of the run, so
    the extra samples are fully warm — but they are CONSECUTIVE
    measurements of one machine state, so a padded median over-weights
    end-of-run conditions instead of sampling across the run (ADVICE r8).
    The caller therefore records how many samples were padded
    (`probe_*_padded` in the detailed record) so cross-round readers can
    discount a padded median. Unit-tested in tests/test_bench_contract.py."""
    while len(samples) < min_n:
        samples.append(probe_fn())
    return samples


def probe_stats(samples: list[float], prefix: str = "probe_spark") -> dict:
    """Summarize the run's fixed-work probe samples: first/last keep their
    historical keys (start carries residual JIT tier-up; end is fully
    warm), median is the normalization denominator, spread (max-min) says
    how much the box moved DURING the run — a wide spread means ANY
    single scaled scalar from this run is soft. Median and spread are
    computed over the WARM samples (all but the first): the start sample's
    ~2x JIT inflation is a known constant of the procedure, not machine
    movement, and including it would peg the spread at ~100ms every run.
    `prefix` names the instrument ("probe_spark" = the codegen probe and
    the scaling denominator; "probe_shuffle" = the diagnostic shuffle
    probe, detailed-record only). Unit-tested in
    tests/test_bench_contract.py."""
    warm = samples[1:] if len(samples) > 1 else samples
    return {
        f"{prefix}_ms": samples[0],
        f"{prefix}_ms_end": samples[-1],
        f"{prefix}_ms_median": round(statistics.median(warm), 2),
        f"{prefix}_ms_spread": round(max(warm) - min(warm), 2),
        f"{prefix}_n": len(samples),
    }


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    spark = get_spark(app_name="docling-api-spark-bench")
    # foreign-cwd safety: pandas-UDF closures reference the package; ship it
    import __spark_entry__

    __spark_entry__._ship_package(spark)

    registry = all_queries()
    bench_queries = {n: q for n, q in sorted(registry.items()) if q.bench}
    carried = {n: registry[n] for n in CARRIED_R3 if n in registry}
    rest = {n: q for n, q in bench_queries.items() if n not in carried}

    runs = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "5"))
    # Quiet-window launch gate (VERDICT r13 Next #2): hold the timed run
    # until every instrument's warm spread is inside the regime dead-band,
    # bounded attempts, stderr trail. Disable with SPARK_GRAFT_QUIET_GATE=0
    # (fast contract smokes). Runs BEFORE the recorded start probes — so
    # those start samples arrive pre-warmed; probe_spark_ms (first sample)
    # loses its historical ~2x JIT inflation from this round on, which is
    # diagnostic-only (warm stats always discarded it).
    gate = None
    if os.environ.get("SPARK_GRAFT_QUIET_GATE", "1") != "0":
        gate = quiet_gate({
            "probe_spark": lambda: _spark_probe(spark),
            "probe_shuffle": lambda: _spark_shuffle_probe(spark),
            "probe_window": lambda: _spark_window_probe(spark),
        })
    probe_samples: list[float] = []
    shuffle_samples: list[float] = []
    window_samples: list[float] = []
    numpy_ms = _numpy_probe()
    probe_samples.append(_spark_probe(spark))  # start (JIT tier-up residue)
    shuffle_samples.append(_spark_shuffle_probe(spark))
    window_samples.append(_spark_window_probe(spark))

    def probe_cb() -> None:
        probe_samples.append(_spark_probe(spark))
        shuffle_samples.append(_spark_shuffle_probe(spark))
    # interleave so the run yields ≥5 samples total: start + ~2 inside each
    # phase + end (r6 judge what's-wrong #2: median over the run, not one
    # point-in-time pair)
    out: dict = {
        "queries": {},
        "queries_median": {},
        "queries_spread": {},
        "queries_runs": {},
    }
    # phase 1: the frozen r3 subset under r3-equivalent JVM conditions.
    # NOTE the window probe is NOT in probe_cb: it samples at run start,
    # the phase boundary (x3 since r13 — VERDICT r12 Next #6), and run
    # end, giving >=5 organic points with no padding. Interleaving it
    # per-point would change the r7-r11 inter-query procedure AND
    # sprinkle ~44 extra sort+window+exchange executions through the
    # timed run — exactly the residue class the carried stats must stay
    # comparable against (the r12 bisect could not exonerate the
    # interleaved variant; the boundary schedule removes the confound
    # while keeping the diagnostic on the line).
    _bench_phase(spark, carried, sf_dir, runs, out,
                 probe_cb, probe_every=max(2, len(carried) // 3))
    # phase boundary: THREE window samples (VERDICT r12 Next #6) — the
    # spread that widens compare_bench's burst floor rested on 3 organic
    # points (start/boundary/end) padded at run end; two more BETWEEN the
    # phases (outside every timed segment, before phase 2's warm sweep)
    # bring the organic count to >=5 without touching the r7+ inter-query
    # procedure that carried comparability depends on.
    window_samples.append(_spark_window_probe(spark))
    window_samples.append(_spark_window_probe(spark))
    window_samples.append(_spark_window_probe(spark))
    carried_total = round(sum(out["queries"][n] for n in carried), 4)
    carried_total_median = round(
        sum(out["queries_median"][n] for n in carried), 4
    )
    # phase 2: everything added to the headline set since round 3
    _bench_phase(spark, rest, sf_dir, runs, out,
                 probe_cb, probe_every=max(2, len(rest) // 3))
    # end probe: fully warm, and if the box slowed DURING the run the
    # sample trail shows where
    probe_samples.append(_spark_probe(spark))
    shuffle_samples.append(_spark_shuffle_probe(spark))
    window_samples.append(_spark_window_probe(spark))
    n_spark_organic, n_shuffle_organic = len(probe_samples), len(shuffle_samples)
    n_window_organic = len(window_samples)
    ensure_min_probes(probe_samples, lambda: _spark_probe(spark))
    ensure_min_probes(shuffle_samples, lambda: _spark_shuffle_probe(spark))
    ensure_min_probes(window_samples, lambda: _spark_window_probe(spark))
    probes = {"probe_numpy_ms": numpy_ms, **probe_stats(probe_samples)}
    shuffle_probes = probe_stats(shuffle_samples, prefix="probe_shuffle")
    window_probes = probe_stats(window_samples, prefix="probe_window")
    # padded samples are consecutive end-of-run measurements; mark them so
    # a reader can discount a median they over-weight (ADVICE r8)
    probe_padded = {
        "probe_spark_padded": len(probe_samples) - n_spark_organic,
        "probe_shuffle_padded": len(shuffle_samples) - n_shuffle_organic,
        "probe_window_padded": len(window_samples) - n_window_organic,
    }

    total = round(sum(out["queries"].values()), 4)
    sf_val = float(sf) if sf.replace(".", "").isdigit() else sf
    # Probe normalization (r5 judge directive): ±20-25% machine drift has
    # repeatedly masqueraded as code regression on this host. The headline
    # median-sum is therefore also reported scaled by the fixed-work Spark
    # probe against a pinned reference (BENCH_r05's fully-warm end-probe),
    # so a cross-round delta survives only if it exceeds what the probes
    # attribute to the box: scaled = median_sum * (PROBE_REF_MS / probe_med).
    carried_median_scaled = probe_scaled(
        carried_total_median, probes["probe_spark_ms_median"]
    )
    carried_min_scaled = probe_scaled(
        carried_total, probes["probe_spark_ms_median"]
    )
    # the graded done-bar statistic for burst-regime records (see the
    # PROBE_R10_SPARK_MS block comment): min-sum scaled to the r10
    # record's box state. Detailed record only — derivable from the line.
    carried_min_r10 = (
        round(
            carried_total * PROBE_R10_SPARK_MS / probes["probe_spark_ms_median"], 4
        )
        if probes["probe_spark_ms_median"]
        else None
    )
    regime = run_regime(probes, shuffle_probes, window_probes)
    # Launch-state scalars for the COMPACT line (VERDICT r14 Next #1a):
    # BENCH_r14 graded FAIL on box state and the record could not prove
    # its own launch state — the gate trail lived only in the detailed
    # record the driver's tail capture drops. quiet_gate_quiet (0/1),
    # quiet_gate_attempts, and the FINAL attempt's per-instrument warm
    # spreads (ints, ms, spark/shuffle/window order) now ride the
    # summary line: a reader of BENCH_rN.json alone can see whether the
    # run launched quiet, how long the gate fought for it, and what the
    # box looked like at the moment the timed run began. Absent keys ==
    # gate disabled (SPARK_GRAFT_QUIET_GATE=0). Budget: paid for by
    # final_line's compact separators (see final_line); worst-case
    # pessimistic line re-pinned in tests/test_bench_contract.py.
    gate_scalars = gate_summary_scalars(gate)
    scalars = {
        "metric": "headline_queries_total_time",
        "value": total,
        "unit": "sec",
        "queries_stat": "min",
        "carried_total": carried_total,
        "carried_min_probe_scaled": carried_min_scaled,
        "carried_total_median": carried_total_median,
        "carried_median_probe_scaled": carried_median_scaled,
        "carried_min_r10_scaled": carried_min_r10,
        "regime": regime,
        **gate_scalars,
        "probe_ref_ms": PROBE_REF_SPARK_MS,
        "carried_n": len(carried),
        "n_queries": len(out["queries"]),
        "n_runs": runs,
        **probes,
        **{"probe_shuffle_ms_median": shuffle_probes["probe_shuffle_ms_median"],
           "probe_shuffle_ms_spread": shuffle_probes["probe_shuffle_ms_spread"],
           "probe_window_ms_median": window_probes["probe_window_ms_median"],
           "probe_window_ms_spread": window_probes["probe_window_ms_spread"]},
        "sf": sf_val,
    }
    # Tail-capture budget math: every DERIVABLE or CONSTANT scalar lives
    # in the detailed record only: probe_numpy_ms, probe_ref_ms (pinned
    # above), carried_n (len CARRIED_R3), n_queries (len of the queries
    # dict), n_runs (procedure context, default 5 since r10),
    # carried_median_probe_scaled and (since r12) carried_min_probe_scaled
    # (= carried stat * PROBE_REF_SPARK_MS / probe_spark_ms_median — all
    # on the line or pinned in source). The shuffle AND window probes'
    # median+spread all ride the line: r8's burst mode left the codegen
    # probe flat while the shuffle spread carried the whole signal, r11's
    # uniform drift tracked neither codegen nor shuffle (the window/sort
    # resource was uninstrumented — VERDICT r11 Next #2), and
    # driver-written BENCH_r0N.json records keep ONLY this line.
    # Pessimistic budget check lives in tests/test_bench_contract.py
    # (1928 of the 1950 budget with the real 52-name registry);
    # final_line degrades to scalars-only rather than ever overflowing
    # the capture.
    detailed_extras = {
        "quiet_gate": gate,
        "probe_spark_samples_ms": probe_samples,
        "probe_shuffle_samples_ms": shuffle_samples,
        "probe_window_samples_ms": window_samples,
        **shuffle_probes,
        **window_probes,
        **probe_padded,
    }
    # carried_min_probe_scaled left the compact line in r12 (derivable:
    # carried_total * PROBE_REF_SPARK_MS / probe_spark_ms_median, all on
    # the line or pinned in source) to pay for the window probe's
    # median+spread riding it (VERDICT r11 Next #2); it stays in the
    # detailed record and in `scalars` above for humans re-reading runs.
    compact_scalars = {
        k: v
        for k, v in scalars.items()
        if k not in (
            "probe_spark_ms", "probe_spark_ms_end", "probe_spark_n",
            "probe_numpy_ms", "probe_ref_ms", "carried_n", "n_queries",
            "n_runs", "carried_median_probe_scaled",
            "carried_min_probe_scaled", "carried_min_r10_scaled",
        )
    }
    # detailed record (full precision, min/median/spread per query) —
    # printed FIRST because the grading driver captures only the LAST
    # 2000 characters of output (BENCH_r03/r04 lesson: the single
    # detailed line outgrew the capture and its HEAD — opening brace and
    # scalars — was cut, leaving nothing parseable)
    print(json.dumps({**scalars, **detailed_extras, **out}))
    # Final line: per-query best-of-N mins at 2 decimals + scalars IF that
    # fits the driver's 2000-char tail capture; otherwise scalars only
    # (bounded ~450B), so the tail's last line is ALWAYS one complete
    # parseable record no matter how the headline set grows (r5 advisor:
    # a growing compact line would re-create the r3/r4 "parsed: null").
    # The preceding blank line keeps any truncated fragment of the
    # detailed record on its own line (r5 judge what's-wrong #3).
    print()
    print(final_line(compact_scalars, out["queries"]))
    spark.stop()


if __name__ == "__main__":
    main()
