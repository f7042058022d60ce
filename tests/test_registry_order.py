"""The driver grades only the first 50 registry entries — pin the ordering
contract so a refactor can't silently push a must-grade query out of the
correctness window (round-1 failure mode: 19 queries ungraded)."""

from __future__ import annotations

from docling_api_spark.plans.registry import GRADED_FIRST, all_queries

DRIVER_WINDOW = 50

# Round-8 contract (VERDICT r7 Next #1/#2): positions 1-21 are the final
# never-driver-graded queries q286..q306 (all oracle-checked); positions
# 22-50 re-certify the 29 highest-priority STALE grades — queries whose
# implementing closure changed after the round that graded them, derived
# by tools/stale_grades.py (judge-named four + all 21 substantive r3-r5
# stales + 7 highest-risk loader-stale r1/r2 grades). Every windowed query
# has a DuckDB oracle, so round 8 produces 50 hash-comparable records and
# leaves every one of the 307 registered queries with a driver record.
FINAL_QUEUE_PREFIXES = {f"q{n}_" for n in range(286, 307)}
STALE_RECERTS = {
    # judge-named (VERDICT r7 wrong #2)
    "q112_inverted_index",
    "q221_poisson_bootstrap",
    "q24_percentiles_exact",
    "q118_equidepth_histogram",
    # own builder / compute helper changed after an r3-r5 grade
    "q152_pagerank",
    "q158_median_mad_outliers",
    "q162_lift_table",
    "q102_revenue_concentration",
    "q114_winsorized_agg",
    "q117_comovement_matrix",
    "q121_rfm_segmentation",
    "q123_market_basket",
    "q138_scd2_point_in_time",
    "q88_collocations_pmi",
    "q103_khop_reachability",
    "q105_funnel_steps",
    "q108_bloom_semi_join",
    "q115_time_weighted_avg",
    "q42_ngram_jaccard",
    "q45_dedup_clusters",
    "q71_upload_validation",
    "q81_frame_sample",
    # loader-stale r1/r2, builder-changed or timestamp-bearing
    "q29_large_orders",
    "q94_merge_upsert",
    "q27_array_agg",
    "q39_gap_fill_resample",
    "q21_date_funcs",
    "q31_sliding_window",
    "q34_funnel_range_join",
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
    must = _expand(FINAL_QUEUE_PREFIXES, names) | STALE_RECERTS
    assert len(must) == DRIVER_WINDOW  # 21 final queue + 29 stale re-certs
    window = set(list(all_queries())[:DRIVER_WINDOW])
    assert must == window


def test_final_queue_leads_the_window():
    """Positions 1-21 are exactly q286..q306 — the last never-driver-graded
    queries drain first even if a future edit reshuffles the re-certs."""
    head = list(all_queries())[:21]
    nums = sorted(int(n[1:].split("_")[0]) for n in head)
    assert nums == list(range(286, 307))


def test_window_is_fully_oracle_checked():
    """Every round-8 windowed query has a DuckDB oracle — the 8 rows-only
    queries got their rows-only driver record in round 7 and must not burn
    a hash-comparable slot this round."""
    qs = all_queries()
    window = list(qs)[:DRIVER_WINDOW]
    assert all(qs[n].oracle is not None for n in window)


def test_stale_recerts_have_prior_driver_grades():
    """The re-cert slots are RE-certification: each name must already hold
    a driver record from an earlier round (it went stale, it was never
    missing). Guards against typos smuggling a never-graded query into a
    slot accounted to the stale plan."""
    import json
    import os

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    graded: set[str] = set()
    for n in range(1, 8):
        path = os.path.join(repo, f"CORRECTNESS_r0{n}.json")
        if os.path.exists(path):
            with open(path) as f:
                graded |= set(json.load(f))
    assert STALE_RECERTS <= graded
