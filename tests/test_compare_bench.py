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
