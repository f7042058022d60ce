"""Partitioning-independence: the engine's core exactness claim is that
every emitted float is assembled from integer/DECIMAL-exact partial
aggregates plus one closing expression, so results cannot depend on how
rows are distributed. This suite re-executes representative queries
under a deliberately different shuffle partitioning and requires
BIT-IDENTICAL rows — not approximately equal ones.

(A float-summing implementation would pass the DuckDB oracle whenever
the local partitioning happens to match, then drift on a 1000-executor
cluster; this test is the local stand-in for that cluster.)"""

from __future__ import annotations

import pytest

from docling_api_spark.plans import all_queries

QS = all_queries()

# Stat-heavy queries whose docstrings promise partition-independent
# floats (exact moment sums, cents quantization, one closing division).
PINNED = [
    "q187_ewma_smoothing",
    "q188_lag1_autocorr",
    "q192_forecast_wape",
    "q120_ab_test_ztest",
    "q141_covariance_matrix",
    "q164_mannwhitney_u",
    "q165_gini_revenue",
    "q180_control_chart",
    "q182_cuped_adjustment",
    "q196_hybrid_rank_fusion",
    "q197_bm25_scoring",
    "q199_item_item_cf",
    "q201_allen_relations",
    # iterative operators: scalar/label state must also be
    # partitioning-independent round over round
    "q191_shortest_path",
    "q194_kmeans_lloyd",
    "q208_entity_resolution",
    # round-4d additions: the closed-form/ladder operators whose
    # docstrings lean hardest on the exactness discipline
    "q215_queue_depth",          # Lindley closed form (window frames)
    "q216_pca2d",                # eigen arithmetic from moment reduce
    "q220_raking_ipf",           # 3 IPF rounds, quantized margins
    "q225_markov_absorption",    # integer-nano ladder
    "q228_geometric_median",     # Weiszfeld rounds, quantized sums
    "q242_binary_segmentation",  # quantized argmax + tie-break
    "q261_kruskal_wallis",       # doubled-rank moments + tie factor
    "q263_jackknife_ratio_variance",  # totals-minus-bucket identity
    "q269_viterbi_path",         # max-product ladder, packed keys
    "q296_watermark_advisor",    # blocked prefix-max lateness
    "q299_stationary_distribution",  # power-iteration ladder
    "q300_class_silhouette",     # broadcast-prototype distances
    # round-5 restructures: the chained-iteration pagerank (integer rank
    # units, single-use ranks — must be bit-stable without the per-round
    # cuts) and the zip-fused CDC chunker (map-side boundary flags)
    "q152_pagerank",
    "q303_cdc_chunking",
    # round-5 hardening/lazy-cut cohort: tie-break keys and lazily
    # checkpointed reused relations must not re-introduce any
    # partitioning sensitivity
    "q115_time_weighted_avg",
    "q138_scd2_point_in_time",
    "q239_burstiness",
    "q222_degree_assortativity",
    "q276_burrows_delta",
    "q304_dominant_period",
    "q166_power_iteration",
    "q199_item_item_cf",
    # round-5 distributed-exact selection: the blocked-rank percentile
    # (integer ranks, exact doubles at the picked order statistics, one
    # interpolation expression) must be bit-stable under any partitioning
    "q118_equidepth_histogram",
    "q158_median_mad_outliers",
    "q227_conformal_interval",
    "q241_quantile_treatment_effect",
]


def _rows(spark, sf_dir, name):
    df = QS[name].fn(spark, sf_dir)
    return sorted(tuple(map(repr, r)) for r in df.collect())


@pytest.mark.parametrize("name", PINNED)
def test_result_is_partitioning_independent(spark, sf_dir, name):
    base_parts = spark.conf.get("spark.sql.shuffle.partitions")
    base_aqe = spark.conf.get("spark.sql.adaptive.enabled")
    try:
        baseline = _rows(spark, sf_dir, name)
        # radically different reducer count + AQE coalescing toggled off:
        # any shuffle-order-dependent accumulation changes the bits
        spark.conf.set("spark.sql.adaptive.enabled", "false")
        spark.conf.set("spark.sql.shuffle.partitions", "3")
        alt = _rows(spark, sf_dir, name)
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", base_parts)
        spark.conf.set("spark.sql.adaptive.enabled", base_aqe)
    assert alt == baseline, f"{name}: result depends on partitioning"
