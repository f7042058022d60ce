"""The driver grades only the first 50 registry entries — pin the ordering
contract so a refactor can't silently push a must-grade query out of the
correctness window (round-1 failure mode: 19 queries ungraded)."""

from __future__ import annotations

from docling_api_spark.plans.registry import GRADED_FIRST, all_queries

DRIVER_WINDOW = 50

# Every query the round-3 verdict requires a driver verdict for: the six
# never-driver-graded rotations, the five round-3 curation passes, the ten
# new-operator-class continuation queries, plus one representative per
# §2.9 feature (displaced siblings q10/q17/q19/q26/q31/q34/q39/q46/q52/q65
# and q21/q22/q27/q61/q62 carry r1/r2 hash-green grades on record).
MUST_GRADE = {
    "q36_streaming_tumbling", "q37_streaming_sessionize", "q54_ann_ivf",
    "q64_lang_id", "q66_regex_token_count", "q82_media_resize",
    "q67_pii_redaction", "q68_repetition_filter", "q69_contamination_check",
    "q95_temperature_mix", "q97_paragraph_dedup",
    "q103_khop_reachability", "q104_snapshot_diff", "q105_funnel_steps",
    "q106_heavy_hitters", "q108_bloom_semi_join", "q109_stream_stream_join",
    "q110_interval_overlap_join", "q115_time_weighted_avg",
    "q118_equidepth_histogram", "q120_ab_test_ztest",
    "q30_tumbling_window", "q32_session_window", "q33_asof_join",
    "q35_bucketed_range_join", "q38_salted_skew_agg",
    "q47_retention_cohorts", "q60_lang_breakdown",
    "q63_tfidf_top_terms", "q80_media_features",
    "q90_profile_orders", "q45_dedup_clusters",
}


def test_graded_first_covers_registry_exactly():
    names = set(all_queries())
    assert set(GRADED_FIRST) == names
    assert len(GRADED_FIRST) == len(names)  # no duplicates


def test_registry_iteration_follows_graded_first():
    assert list(all_queries()) == list(GRADED_FIRST)


def test_must_grade_queries_inside_driver_window():
    window = set(list(all_queries())[:DRIVER_WINDOW])
    assert MUST_GRADE <= window


def test_every_oracle_query_in_window_or_documented_overflow():
    qs = all_queries()
    window = list(qs)[:DRIVER_WINDOW]
    # every windowed query except q80 (rows-only by design) has an oracle
    missing = [n for n in window if qs[n].oracle is None and n != "q80_media_features"]
    assert missing == []
