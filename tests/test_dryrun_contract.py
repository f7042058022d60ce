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
    # must admit the accepted ceiling (q257's ~17s DTW replay, with
    # box-noise headroom) and must reject the rejected data point
    # (q43_xxh's ~73s transpilation)
    assert 17.0 < driver_dryrun.ORACLE_BUDGET_S < 73.0


def test_oracle_budget_is_the_policy_constant():
    # the policy says "~tens of seconds"; a silent bump past a minute
    # would let a grading sweep grow minutes-per-round again. 40 = the
    # 17s accepted ceiling x the measured worst box-noise factor (~1.4
    # inflated q257 to 24.2s in the r12 dryrun) with headroom.
    assert driver_dryrun.ORACLE_BUDGET_S == 40.0
