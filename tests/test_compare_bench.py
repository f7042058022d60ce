"""Unit tests for tools/compare_bench.py's probe-regime handling. Round
8 hardened both seams: ANY regime mix now refuses scaling (VERDICT r7
Next #4 — end-vs-median alone flagged 10+ untouched queries across the
r6/r7 boundary), and probe_of is type-strict so an explicit 0/null/
string probe is reported broken instead of silently falling through to
an older-regime key (ADVICE r7)."""

from __future__ import annotations

import importlib.util
import os

_SPEC = importlib.util.spec_from_file_location(
    "compare_bench",
    os.path.join(os.path.dirname(__file__), "..", "tools", "compare_bench.py"),
)
cb = importlib.util.module_from_spec(_SPEC)
_SPEC.loader.exec_module(cb)


def test_probe_of_prefers_median_then_end_then_start():
    rec = {
        "probe_spark_ms": 200.0,
        "probe_spark_ms_end": 100.0,
        "probe_spark_ms_median": 98.0,
    }
    assert cb.probe_of(rec) == (98.0, "median")
    del rec["probe_spark_ms_median"]
    assert cb.probe_of(rec) == (100.0, "end")
    del rec["probe_spark_ms_end"]
    assert cb.probe_of(rec) == (200.0, "start")
    assert cb.probe_of({}) == (None, "none")


def test_machine_factor_refuses_start_vs_warm_mix():
    old = {"probe_spark_ms": 200.0}  # r1-r4 regime: start only
    new = {"probe_spark_ms": 190.0, "probe_spark_ms_end": 100.0}
    factor, note = cb.machine_factor(old, new)
    assert factor is None
    assert "regimes differ" in note


def test_machine_factor_refuses_end_vs_median_mix():
    old = {"probe_spark_ms_end": 100.0}  # r5-r6 regime
    new = {"probe_spark_ms_median": 110.0}  # r7+ regime
    factor, note = cb.machine_factor(old, new)
    assert factor is None
    assert "regimes differ" in note


def test_probe_of_reports_invalid_values_instead_of_falling_through():
    # explicit zero must NOT fall through to the end probe
    rec = {"probe_spark_ms_median": 0, "probe_spark_ms_end": 100.0}
    val, regime = cb.probe_of(rec)
    assert val is None and "invalid median" in regime
    # null and string likewise
    assert cb.probe_of({"probe_spark_ms_median": None})[0] is None
    assert cb.probe_of({"probe_spark_ms_median": "97.0"})[0] is None
    # a bool is not a probe
    assert cb.probe_of({"probe_spark_ms_median": True})[0] is None
    # and machine_factor survives an invalid probe without formatting crash
    factor, note = cb.machine_factor(
        {"probe_spark_ms_median": "bad"}, {"probe_spark_ms_median": 100.0}
    )
    assert factor is None
    assert "unusable probe" in note


def test_machine_factor_same_regime_no_note():
    old = {"probe_spark_ms_end": 100.0}
    new = {"probe_spark_ms_end": 113.0}
    factor, note = cb.machine_factor(old, new)
    assert factor == 1.13
    assert "note" not in note


def test_machine_factor_missing_probe():
    factor, note = cb.machine_factor({}, {"probe_spark_ms_end": 100.0})
    assert factor is None
    assert "unusable probe" in note


# ---- burst-aware noise floor (VERDICT r8 Next #6) ----


def test_burst_allowance_uses_worst_instrument():
    rec = {
        "probe_spark_ms_median": 100.0,
        "probe_spark_ms_spread": 10.0,   # 0.10 — inside the dead-band
        "probe_shuffle_ms_median": 300.0,
        "probe_shuffle_ms_spread": 240.0,  # 0.80 — the r8 burst profile
    }
    burst, src = cb.burst_allowance(rec)
    assert burst == max(0.0, 240.0 / 300.0 - cb.BURST_DEADBAND)
    assert "shuffle" in src


def test_burst_allowance_sees_the_window_instrument():
    # VERDICT r11 Next #2: the window-over-shuffle probe (r12) is a
    # first-class burst instrument — a run whose codegen and shuffle
    # probes are flat but whose window probe moved 0.9x its median must
    # widen the floor by the window spread's excess
    rec = {
        "probe_spark_ms_median": 100.0,
        "probe_spark_ms_spread": 10.0,
        "probe_shuffle_ms_median": 300.0,
        "probe_shuffle_ms_spread": 30.0,
        "probe_window_ms_median": 600.0,
        "probe_window_ms_spread": 540.0,  # 0.90
    }
    burst, src = cb.burst_allowance(rec)
    assert burst == max(0.0, 540.0 / 600.0 - cb.BURST_DEADBAND)
    assert "window" in src


def test_burst_allowance_caps_and_handles_missing():
    assert cb.burst_allowance({})[0] == 0.0
    rec = {"probe_spark_ms_median": 50.0, "probe_spark_ms_spread": 500.0}
    assert cb.burst_allowance(rec)[0] == cb.BURST_CAP
    # non-numeric spread must not crash or count
    assert cb.burst_allowance({"probe_spark_ms_median": 100.0,
                               "probe_spark_ms_spread": "big"})[0] == 0.0


def test_effective_threshold_widens_for_either_record():
    quiet = {"probe_spark_ms_median": 100.0, "probe_spark_ms_spread": 5.0}
    bursty = {"probe_spark_ms_median": 100.0, "probe_spark_ms_spread": 50.0}
    eff, src = cb.effective_threshold(quiet, bursty)
    assert eff == cb.THRESHOLD * (1.0 + max(0.0, 50.0 / 100.0 - cb.BURST_DEADBAND))
    assert "new run" in src
    eff2, src2 = cb.effective_threshold(bursty, quiet)
    assert eff2 == eff and "old run" in src2


def test_quiet_pair_keeps_the_tight_threshold():
    """Spreads within the dead-band are ordinary scheduler noise: a pair
    of quiet runs must keep the documented x1.25 contract exactly, so a
    genuine ~x1.3 regression between normal runs still flags."""
    quiet = {"probe_spark_ms_median": 100.0, "probe_spark_ms_spread": 15.0}
    eff, _ = cb.effective_threshold(quiet, dict(quiet))
    assert eff == cb.THRESHOLD


def test_burst_profile_run_produces_no_false_flags(capsys, monkeypatch, tmp_path):
    """End-to-end: a ×1.4 drift on an untouched file inside a run whose
    shuffle probe shows the r8 burst profile (spread 0.8x median) must
    NOT print a regression verdict; the same drift between two quiet
    runs must."""
    import json as _json

    def run(old, new):
        po, pn = tmp_path / "old.json", tmp_path / "new.json"
        po.write_text(_json.dumps({"parsed": old}))
        pn.write_text(_json.dumps({"parsed": new}))
        monkeypatch.setattr(cb.sys, "argv", ["compare_bench", str(po), str(pn)])
        code = 0
        try:
            cb.main()
        except SystemExit as e:
            code = e.code
        return code, capsys.readouterr().out

    quiet_probes = {"probe_spark_ms_median": 100.0, "probe_spark_ms_spread": 5.0}
    old = {"queries": {"q63_tfidf_top_terms": 1.0}, **quiet_probes}
    burst_new = {
        "queries": {"q63_tfidf_top_terms": 1.4},
        "probe_spark_ms_median": 100.0, "probe_spark_ms_spread": 8.0,
        "probe_shuffle_ms_median": 300.0, "probe_shuffle_ms_spread": 240.0,
    }
    code, out = run(old, burst_new)
    assert code == 0 and "REGRESSED" not in out
    assert "burst-aware floor" in out

    quiet_new = {"queries": {"q63_tfidf_top_terms": 1.4}, **quiet_probes}
    code, out = run(old, quiet_new)
    assert code == 1 and "REGRESSED" in out


def test_stat_regime_detection_and_note(capsys, monkeypatch, tmp_path):
    assert cb.stat_regime({"queries_stat": "min"}) == "min"
    assert cb.stat_regime({"queries_median": {}}) == "min (detailed)"
    assert cb.stat_regime({}) == "median (r5-r8 compact)"

    import json as _json

    po, pn = tmp_path / "o.json", tmp_path / "n.json"
    po.write_text(_json.dumps({"parsed": {"queries": {"qx": 1.0}}}))
    pn.write_text(_json.dumps({"parsed": {"queries": {"qx": 1.0},
                                          "queries_stat": "min"}}))
    monkeypatch.setattr(cb.sys, "argv", ["compare_bench", str(po), str(pn)])
    try:
        cb.main()
    except SystemExit:
        pass
    out = capsys.readouterr().out
    assert "stat regimes differ" in out
    assert "under-count regressions" in out  # old=median, new=min

    # reversed direction (old=min, new=median): the bias flips — the
    # caveat must warn about phantom REGRESSED rows, not phantom
    # improvements
    monkeypatch.setattr(cb.sys, "argv", ["compare_bench", str(pn), str(po)])
    try:
        cb.main()
    except SystemExit:
        pass
    out = capsys.readouterr().out
    assert "over-count regressions" in out
    assert "'REGRESSED' rows as unproven" in out


def test_same_stat_pair_prints_no_regime_caveat(capsys, monkeypatch, tmp_path):
    """The r9-vs-r10 shape (VERDICT r9 Next #7): BOTH records carry
    `queries_stat: "min"` — the first min-vs-min driver comparison — so
    the regime caveat must NOT print; the ratios are same-statistic and
    fully comparable."""
    import json as _json

    po, pn = tmp_path / "r9.json", tmp_path / "r10.json"
    po.write_text(_json.dumps({"parsed": {
        "queries": {"q63_tfidf_top_terms": 1.0, "q49_rolling_zscore": 0.5},
        "queries_stat": "min",
        "probe_spark_ms_median": 100.0, "probe_spark_ms_spread": 5.0,
    }}))
    pn.write_text(_json.dumps({"parsed": {
        "queries": {"q63_tfidf_top_terms": 1.05, "q49_rolling_zscore": 0.48},
        "queries_stat": "min",
        "probe_spark_ms_median": 102.0, "probe_spark_ms_spread": 6.0,
    }}))
    monkeypatch.setattr(cb.sys, "argv", ["compare_bench", str(po), str(pn)])
    try:
        cb.main()
    except SystemExit as e:
        assert e.code == 0
    out = capsys.readouterr().out
    assert "stat regimes differ" not in out
    assert "REGRESSED" not in out


def test_unwidened_verdict_prints_beside_burst_widened(capsys, monkeypatch, tmp_path):
    """ADVICE r9: when the burst allowance widens the floor, the
    unwidened x1.25 verdict must print too, so the sensitivity the
    widening gave up is visible per comparison — here a x1.4 drift is
    absorbed by the widened floor but counted by the base one."""
    import json as _json

    po, pn = tmp_path / "o.json", tmp_path / "n.json"
    po.write_text(_json.dumps({"parsed": {
        "queries": {"qa": 1.0}, "queries_stat": "min",
        "probe_spark_ms_median": 100.0, "probe_spark_ms_spread": 5.0,
    }}))
    pn.write_text(_json.dumps({"parsed": {
        "queries": {"qa": 1.4}, "queries_stat": "min",
        "probe_spark_ms_median": 100.0, "probe_spark_ms_spread": 8.0,
        "probe_shuffle_ms_median": 300.0, "probe_shuffle_ms_spread": 240.0,
    }}))
    monkeypatch.setattr(cb.sys, "argv", ["compare_bench", str(po), str(pn)])
    try:
        cb.main()
    except SystemExit as e:
        assert e.code == 0  # widened floor absorbs the drift
    out = capsys.readouterr().out
    assert "unwidened x1.25 floor would flag 1" in out
    assert "1 absorbed by the burst allowance" in out

    # a quiet pair never prints the sensitivity line (nothing widened)
    pn2 = tmp_path / "n2.json"
    pn2.write_text(_json.dumps({"parsed": {
        "queries": {"qa": 1.0}, "queries_stat": "min",
        "probe_spark_ms_median": 100.0, "probe_spark_ms_spread": 5.0,
    }}))
    monkeypatch.setattr(cb.sys, "argv", ["compare_bench", str(po), str(pn2)])
    try:
        cb.main()
    except SystemExit:
        pass
    out = capsys.readouterr().out
    assert "unwidened" not in out
