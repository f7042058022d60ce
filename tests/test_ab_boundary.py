"""tools/ab_boundary.py contract (VERDICT r14 Next #6): the side-runner
must produce a complete side record — compact + detailed + the pre-run
gate trail — even when the box NEVER went quiet, because on a loud box
the trail IS the forensic evidence the record exists to preserve."""

from __future__ import annotations

import importlib.util
import json
import os


def _ab_boundary():
    spec = importlib.util.spec_from_file_location(
        "ab_boundary",
        os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "tools",
            "ab_boundary.py",
        ),
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


NEVER_QUIET_GATE = {
    "quiet": False,
    "attempts": 3,
    "trail": [
        {"attempt": i, "regime": "burst",
         "probe_spark_ms_median": 100.0,
         "probe_spark_ms_spread": 80.0 + i}
        for i in (1, 2, 3)
    ],
}

FAKE_BENCH = """\
import json
detailed = {"metric": "headline_queries_total_time", "value": 40.0,
            "queries": {"q01": 1.0, "q02": 2.0},
            "queries_runs": {"q01": [1.0], "q02": [2.0]}}
compact = {"metric": "headline_queries_total_time", "value": 40.0,
           "unit": "sec", "carried_total": 3.0, "regime": "burst",
           "queries": {"q01": 1.0, "q02": 2.0}}
print(json.dumps(detailed))
print()
print(json.dumps(compact))
"""


def test_run_side_preserves_never_quiet_trail(tmp_path):
    ab = _ab_boundary()
    side = tmp_path / "side"
    side.mkdir()
    (side / "bench.py").write_text(FAKE_BENCH)
    out = tmp_path / "side.json"
    rec = ab.run_side(str(side), "base(test)", str(out), NEVER_QUIET_GATE)
    # returned record and on-disk record agree
    on_disk = json.loads(out.read_text())
    assert on_disk == rec
    # the never-quiet gate rides the record in full, trail included
    assert rec["pre_gate"]["quiet"] is False
    assert [t["attempt"] for t in rec["pre_gate"]["trail"]] == [1, 2, 3]
    assert all(t["regime"] == "burst" for t in rec["pre_gate"]["trail"])
    # compact = LAST line, detailed = FIRST line
    assert rec["parsed"]["carried_total"] == 3.0
    assert rec["detailed"]["queries_runs"]["q02"] == [2.0]
    assert rec["label"] == "base(test)"


def test_run_side_raises_on_broken_child(tmp_path):
    """A side whose bench dies must raise with the child's stderr, never
    write a half-record the comparison step would read as data."""
    import pytest

    ab = _ab_boundary()
    side = tmp_path / "side"
    side.mkdir()
    (side / "bench.py").write_text("import sys; sys.exit(3)")
    out = tmp_path / "side.json"
    with pytest.raises(RuntimeError, match="rc=3"):
        ab.run_side(str(side), "head", str(out), NEVER_QUIET_GATE)
    assert not out.exists()


def test_no_phantom_query_subset_knob():
    """ADVICE r14 #4: the module must not document (or read) a
    SPARK_GRAFT_AB_QUERIES knob — the carried set is measured by both
    sides by construction."""
    src = open(
        os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "tools",
            "ab_boundary.py",
        )
    ).read()
    assert "SPARK_GRAFT_AB_QUERIES" not in src
