"""The driver grades only the first 50 registry entries — pin the ordering
contract so a refactor can't silently push a must-grade query out of the
correctness window (round-1 failure mode: 19 queries ungraded)."""

from __future__ import annotations

from docling_api_spark.plans.registry import GRADED_FIRST, all_queries

DRIVER_WINDOW = 50

# Round-4 contract (VERDICT r3 #1): the window holds ONLY queries that have
# never been driver-graded, so the driver certifies as much of the 150-query
# surface as one round allows. Every previously-green query rests on its
# r1/r2/r3 grade on record; 13 never-graded queries with graded class-cousins
# are deferred to round 5 (q77/q99/q134/q135/q142..q150).
MUST_GRADE = {
    "q48_fuzzy_match_parts", "q49_rolling_zscore", "q55_embedding_drift",
    "q56_streaming_dedup", "q57_incremental_dedup", "q58_incremental_rollup",
    "q59_zorder_layout",
    "q73_sequence_packing", "q74_curriculum_buckets", "q75_span_dedup_fraction",
    "q76_leakage_safe_split", "q78_vocab_coverage", "q79_embedding_outliers",
    "q83_join_key_skew", "q84_state_intervals", "q85_event_transitions",
    "q86_click_attribution", "q87_growth_accounting", "q88_collocations_pmi",
    "q89_top_paths",
    "q98_source_lang_purity", "q100_chunk_documents", "q101_ks_drift",
    "q102_revenue_concentration", "q107_stream_static_join",
    "q111_text_normalize", "q112_inverted_index", "q113_bigram_familiarity",
    "q114_winsorized_agg", "q116_seasonal_anomaly", "q117_comovement_matrix",
    "q119_cusum_changepoint",
    "q121_rfm_segmentation", "q122_interarrival_histogram", "q123_market_basket",
    "q124_chi_square", "q125_impute_group_mean", "q126_skyline",
    "q127_group_regression", "q128_rolling_median", "q129_fk_audit",
    "q130_ratio_to_parent", "q131_audience_overlap", "q132_grouped_mode",
    "q136_sampling_error_audit", "q137_streaming_upsert",
    "q138_scd2_point_in_time", "q139_tfidf_cosine_pairs",
    "q140_composition_drift", "q141_covariance_matrix",
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
    # every windowed query has an oracle (rows-only queries live in overflow
    # — they can never turn green, so a window slot would be wasted on them)
    missing = [n for n in window if qs[n].oracle is None]
    assert missing == []
