"""The driver grades only the first 50 registry entries — pin the ordering
contract so a refactor can't silently push a must-grade query out of the
correctness window (round-1 failure mode: 19 queries ungraded)."""

from __future__ import annotations

from docling_api_spark.plans.registry import GRADED_FIRST, all_queries

DRIVER_WINDOW = 50

# Round-5 contract (VERDICT r4 #1): the window holds ONLY queries that have
# never been driver-graded — the 13 deferred class-cousins, the q151-q159
# tail, and q160..q189 minus the two rows-only entries (q171/q175, which can
# never hash-green). Every previously-green query rests on its r1-r4 grade
# on record; the round-6 queue starts at q190_phrase_search.
MUST_GRADE = {
    "q77_streaming_sliding", "q99_corpus_report", "q134_curation_pipeline",
    "q135_sla_shipping_delay", "q142_bounce_rate", "q143_promo_share",
    "q144_part_supplier_stats", "q145_idle_rich_customers",
    "q146_dup_provenance", "q147_supplier_cold_start",
    "q148_denorm_drift_audit", "q149_activation_latency",
    "q150_order_size_histogram", "q151_stateful_counter", "q152_pagerank",
    "q153_benford_digit_audit", "q154_source_quality_rollup",
    "q155_ngram_containment", "q156_expectation_suite", "q157_ohlc_bars",
    "q158_median_mad_outliers", "q159_embedding_quantization",
    "q160_weighted_median", "q161_theil_sen_trend", "q162_lift_table",
    "q163_proportional_sample", "q164_mannwhitney_u", "q165_gini_revenue",
    "q166_power_iteration", "q167_salt_planner", "q168_eventually_follows",
    "q169_weighted_sample", "q170_revenue_waterfall", "q172_salted_join",
    "q173_k_anonymity", "q174_density_clusters", "q176_feature_hashing",
    "q177_target_encoding", "q178_confusion_matrix",
    "q179_quantile_normalize", "q180_control_chart",
    "q181_join_size_estimate", "q182_cuped_adjustment",
    "q183_streaming_topk", "q184_survival_hazard", "q185_triangle_census",
    "q186_geo_grid_join", "q187_ewma_smoothing", "q188_lag1_autocorr",
    "q189_bpe_merges",
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
