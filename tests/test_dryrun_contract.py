"""Contract pins for tools/driver_dryrun.py (VERDICT r11 Next #9).

The r11 oracle-cost policy (SCALING.md "Round-11: oracle cost policy")
was enforced by memory: accepted ceiling q257 at ~17s, rejected q43_xxh
at ~73s. The dryrun now times every oracle's own DuckDB wall clock and
exits non-zero when one exceeds ORACLE_BUDGET_S — these tests pin the
ceiling so retuning it is a deliberate, reviewed act.
"""

from __future__ import annotations

import importlib.util
import os

_SPEC = importlib.util.spec_from_file_location(
    "driver_dryrun",
    os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "tools",
        "driver_dryrun.py",
    ),
)
driver_dryrun = importlib.util.module_from_spec(_SPEC)
_SPEC.loader.exec_module(driver_dryrun)


def test_oracle_budget_brackets_the_written_policy():
    # the absolute fallback (new queries without a baseline yet) must
    # admit the accepted ceiling (q257's ~17s DTW replay, with box-noise
    # headroom) and must reject the rejected data point (q43_xxh's ~73s
    # transpilation)
    assert 17.0 < driver_dryrun.ORACLE_BUDGET_S < 73.0


def test_oracle_budget_is_the_policy_constant():
    # the policy says "~tens of seconds"; a silent bump past a minute
    # would let a grading sweep grow minutes-per-round again. 40 = the
    # 17s accepted ceiling x the measured worst box-noise factor (~1.4
    # inflated q257 to 24.2s in the r12 dryrun) with headroom.
    assert driver_dryrun.ORACLE_BUDGET_S == 40.0


# -- per-oracle baseline gate (VERDICT r12 Next #2) --------------------------
def test_ratio_gate_constants():
    # hard at x2.5, soft-warn at x1.5 — the judge's ordered bands. The
    # floor keeps sub-second oracles from flapping on scheduler blips.
    assert driver_dryrun.HARD_RATIO == 2.5
    assert driver_dryrun.SOFT_RATIO == 1.5
    assert 1.0 <= driver_dryrun.RATIO_FLOOR_S <= 10.0


def test_classify_with_baseline_uses_ratios():
    c = driver_dryrun.classify_oracle_cost
    base = {"q": 17.0}
    # the r12 flap scenario: 24.2s on a 17s baseline is x1.42 — OK now
    assert c("q", 24.2, base)[0] == "ok"
    # x1.5-x2.5 is a soft warning, not a failure
    assert c("q", 30.0, base)[0] == "soft"
    # past x2.5 the dryrun fails
    assert c("q", 43.0, base)[0] == "hard"


def test_classify_floor_absorbs_tiny_oracle_noise():
    c = driver_dryrun.classify_oracle_cost
    # a 0.2s oracle reading 0.9s is x4.5 but under the floor: never flags
    assert c("q", 0.9, {"q": 0.2})[0] == "ok"
    # ...but a tiny baseline with a genuinely slow reading still fails
    assert c("q", 30.0, {"q": 0.2})[0] == "hard"


def test_classify_without_baseline_falls_back_to_absolute():
    c = driver_dryrun.classify_oracle_cost
    assert c("new_q", 24.2, {})[0] == "ok"
    assert c("new_q", 41.0, {})[0] == "hard"
    # there is no soft band without a baseline — nothing to be relative to
    assert c("new_q", 39.9, {})[0] == "ok"


def test_baselines_do_not_transfer_across_sf(tmp_path, monkeypatch):
    import json

    path = tmp_path / "oracle_baselines.json"
    path.write_text(json.dumps({"sf": "sf0.01", "baselines": {"q": 2.0}}))
    monkeypatch.setattr(driver_dryrun, "BASELINES_PATH", str(path))
    assert driver_dryrun.load_baselines("/data/sf0.01") == {"q": 2.0}
    assert driver_dryrun.load_baselines("/data/sf0.1") == {}
    assert driver_dryrun.load_baselines("/data/sf0.01/") == {"q": 2.0}


def test_save_baselines_merges_and_resets_on_sf_change(tmp_path, monkeypatch):
    import json

    path = tmp_path / "oracle_baselines.json"
    monkeypatch.setattr(driver_dryrun, "BASELINES_PATH", str(path))
    driver_dryrun.save_baselines("/data/sf0.01", {"a": 1.0})
    driver_dryrun.save_baselines("/data/sf0.01", {"b": 2.0})  # merge
    data = json.loads(path.read_text())
    assert data == {"sf": "sf0.01", "baselines": {"a": 1.0, "b": 2.0}}
    driver_dryrun.save_baselines("/data/sf0.1", {"c": 3.0})  # sf change resets
    data = json.loads(path.read_text())
    assert data == {"sf": "sf0.1", "baselines": {"c": 3.0}}


def test_checked_in_baselines_cover_the_whole_registry():
    """The gate only works if the file exists and covers the registry:
    every registered query must have a recorded sf0.01 baseline —
    oracle-checked queries gate on their DuckDB wall time, rows-only
    queries on their Spark wall time (VERDICT r13 Next #5; previously
    the 5 rows-only queries rode the 40s absolute fallback forever).
    Re-record with `driver_dryrun.py --record-baselines` when adding
    queries."""
    baselines = driver_dryrun.load_baselines("/root/testdata/sf0.01")
    assert baselines, "tools/oracle_baselines.json missing or wrong sf"
    import __spark_entry__ as entrymod

    missing = sorted(set(entrymod.queries()) - set(baselines))
    assert not missing, f"queries without a baseline: {missing[:10]}"
