"""The driver grades only the first 50 registry entries — pin the ordering
contract so a refactor can't silently push a must-grade query out of the
correctness window (round-1 failure mode: 19 queries ungraded)."""

from __future__ import annotations

from docling_api_spark.plans.registry import GRADED_FIRST, all_queries

DRIVER_WINDOW = 50

# Round-7 contract (VERDICT r6 #1): the FINAL full slate. The window holds
# the 8 rows-only queries (scheduled for a rows-only driver record per
# VERDICT r5 #5) plus the first 42 of the never-graded oracle-checked queue
# (q241..q285 numeric order, skipping the three rows-only among them).
# Every previously-green query rests on its r1-r6 grade on record; the
# round-8 queue is exactly q286..q306 (21 oracle-checked).
ROWS_ONLY_WINDOW = {
    "q43_minhash_lsh_xxh",
    "q118_approx_equidepth",
    "q171_hll_rollup",
    "q175_debounce",
    "q240_compression_ratio",
    "q246_isotonic_calibration",
    "q251_lcs_verify",
    "q257_dtw_distance",
}
MUST_GRADE_PREFIXES = {
    f"q{n}_" for n in range(241, 286) if n not in (246, 251, 257)
}


def _expand(prefixes: set[str], names: set[str]) -> set[str]:
    return {n for n in names if any(n.startswith(p) for p in prefixes)}


def test_graded_first_covers_registry_exactly():
    names = set(all_queries())
    assert set(GRADED_FIRST) == names
    assert len(GRADED_FIRST) == len(names)  # no duplicates


def test_registry_iteration_follows_graded_first():
    assert list(all_queries()) == list(GRADED_FIRST)


def test_must_grade_queries_inside_driver_window():
    names = set(all_queries())
    must = _expand(MUST_GRADE_PREFIXES, names) | ROWS_ONLY_WINDOW
    assert len(must) == DRIVER_WINDOW  # 8 rows-only + 42 oracle-checked
    window = set(list(all_queries())[:DRIVER_WINDOW])
    assert must == window


def test_window_oracle_presence_matches_evidence_plan():
    """Every windowed query is oracle-checked EXCEPT the 8 rows-only
    entries scheduled for their rows-only driver record this round — no
    other oracle-less query may burn a window slot."""
    qs = all_queries()
    window = list(qs)[:DRIVER_WINDOW]
    rows_only = {n for n in window if qs[n].oracle is None}
    assert rows_only == ROWS_ONLY_WINDOW


def test_round8_queue_is_fully_oracle_checked():
    """Positions 51..71 are the round-8 queue (q286..q306) — all oracle-
    checked, so the final rotation drains the backlog completely."""
    qs = all_queries()
    queue = list(qs)[DRIVER_WINDOW : DRIVER_WINDOW + 21]
    nums = sorted(int(n[1:].split("_")[0]) for n in queue)
    assert nums == list(range(286, 307))
    assert all(qs[n].oracle is not None for n in queue)
