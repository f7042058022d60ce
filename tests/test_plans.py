"""Physical-plan assertions: the performance characteristics the engine
promises (pushdown, pruning, broadcast, top-k, no accidental nested loops)
must survive refactors — a correct-but-quadratic plan is a regression."""

from __future__ import annotations

import pytest

from docling_api_spark.plans import all_queries

QUERIES = all_queries()


def plan_of(spark, sf_dir, name: str) -> str:
    df = QUERIES[name].fn(spark, sf_dir)
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    return df._jdf.queryExecution().explainString(mode)


def test_q01_prunes_columns_and_pushes_filter(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "q01_pricing_summary")
    # only the 7 needed columns appear anywhere in the plan (pruned scan)
    assert "l_orderkey" not in plan and "l_partkey" not in plan
    assert "l_quantity" in plan and "l_shipdate" in plan
    assert "PushedFilters: [" in plan and "LessThanOrEqual(l_shipdate" in plan


def test_q02_pushes_all_predicates(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "q02_filter_project")
    assert "GreaterThanOrEqual(p_size,10)" in plan
    assert "LessThanOrEqual(p_size,30)" in plan
    assert "GreaterThan(p_retailprice,950.0)" in plan
    assert "EqualTo(p_type,PROMO)" in plan


def test_dimension_joins_are_broadcast(spark, sf_dir):
    for name in ("q03_broadcast_dim_join", "q04_multiway_join_revenue"):
        plan = plan_of(spark, sf_dir, name)
        assert "BroadcastHashJoin" in plan, name
        assert "BroadcastNestedLoopJoin" not in plan, name
        assert "CartesianProduct" not in plan, name


def test_topk_uses_take_ordered(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "q17_topk_global")
    assert "TakeOrderedAndProject" in plan  # no global sort materialization


def test_range_join_is_not_nested_loop(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "q35_bucketed_range_join")
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    assert "Join" in plan  # equi-join on the bucket


def test_funnel_join_is_equi_not_theta(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "q34_funnel_range_join")
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_cosine_topk_broadcasts_queries(spark, sf_dir):
    # cross join is intentional — but the small (query) side must be broadcast
    plan = plan_of(spark, sf_dir, "q50_cosine_topk")
    assert "BroadcastNestedLoopJoin" in plan
    assert "CartesianProduct" not in plan


def test_jaccard_join_is_shuffle_on_shingle(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "q42_ngram_jaccard")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


@pytest.mark.parametrize(
    "name",
    ["q01_pricing_summary", "q04_multiway_join_revenue", "q30_tumbling_window"],
)
def test_aggregates_have_partial_phase(spark, sf_dir, name):
    # map-side combine before the exchange (partial_sum / partial_count)
    plan = plan_of(spark, sf_dir, name)
    assert "partial_" in plan


def test_simhash_pairs_come_from_chunk_equijoin(spark, sf_dir):
    # round-1 defect: q44 generated candidates with an all-pairs self-join
    # per source (O(n²)). The fix equi-joins on (source, chunk_idx,
    # chunk_value) — the join condition must carry the chunk keys, and no
    # nested-loop/cartesian operator may appear.
    plan = plan_of(spark, sf_dir, "q44_simhash")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "cv" in plan and "ci" in plan  # chunk keys participate in the join


def test_asof_join_is_single_window_not_range_explosion(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "q33_asof_join")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert plan.count("Window") >= 1  # union + event-time window emulation


@pytest.mark.parametrize(
    "name",
    [
        "q38_salted_skew_agg",
        "q39_gap_fill_resample",
        "q47_retention_cohorts",
        "q63_tfidf_top_terms",
        "q64_lang_id",
        "q44_simhash",
        "q45_dedup_clusters",
        "q54_ann_ivf",
        "q82_media_resize",
    ],
)
def test_newly_graded_queries_have_no_quadratic_joins(spark, sf_dir, name):
    plan = plan_of(spark, sf_dir, name)
    assert "CartesianProduct" not in plan, name
    # q54: tiny centroid literal join; q63: 1-row broadcast n_docs scalar
    # (r15 folded the eager .count() into the plan — VERDICT r14 #3)
    if name not in ("q54_ann_ivf", "q63_tfidf_top_terms"):
        assert "BroadcastNestedLoopJoin" not in plan, name


def test_salted_agg_is_two_stage(spark, sf_dir):
    # salt → partial agg on (key, salt) → final agg on key: the plan must
    # carry at least two aggregate levels (4 HashAggregates with partials)
    plan = plan_of(spark, sf_dir, "q38_salted_skew_agg")
    assert plan.count("HashAggregate") >= 4
    assert "partial_" in plan


def test_tfidf_broadcasts_document_frequency_table(spark, sf_dir):
    # the df (vocabulary-sized) side must broadcast, never shuffle the
    # exploded token relation twice
    plan = plan_of(spark, sf_dir, "q63_tfidf_top_terms")
    assert "BroadcastHashJoin" in plan


def test_lang_id_broadcasts_profile(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "q64_lang_id")
    assert "BroadcastHashJoin" in plan


def test_contamination_broadcasts_benchmark_grams(spark, sf_dir):
    # q69: the held-out slice's n-gram set must be the broadcast side —
    # a shuffle join here would reshuffle the corpus gram relation
    plan = plan_of(spark, sf_dir, "q69_contamination_check")
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_temperature_mix_never_shuffles_corpus(spark, sf_dir):
    # q95: the corpus side must reach the rate join without an Exchange —
    # the only shuffles allowed are the tiny per-source aggregations
    plan = plan_of(spark, sf_dir, "q95_temperature_mix")
    assert "BroadcastHashJoin" in plan
    # every hash Exchange keys on source (the |sources|-row aggregates);
    # no Exchange on doc-level columns
    for line in plan.splitlines():
        if "Exchange hashpartitioning" in line:
            assert "source" in line, line


@pytest.mark.parametrize(
    "name", ["q67_pii_redaction", "q68_repetition_filter", "q97_paragraph_dedup"]
)
def test_curation_passes_have_no_quadratic_joins(spark, sf_dir, name):
    plan = plan_of(spark, sf_dir, name)
    assert "CartesianProduct" not in plan, name
    assert "BroadcastNestedLoopJoin" not in plan, name


def test_pii_redaction_is_map_side_only(spark, sf_dir):
    # q67 is pure per-row regexp work: any Exchange would be a regression
    plan = plan_of(spark, sf_dir, "q67_pii_redaction")
    assert "Exchange" not in plan


@pytest.mark.parametrize(
    "name",
    ["q48_fuzzy_match_parts", "q73_sequence_packing", "q74_curriculum_buckets",
     "q49_rolling_zscore", "q58_incremental_rollup"],
)
def test_round3_batch2_no_quadratic_joins(spark, sf_dir, name):
    plan = plan_of(spark, sf_dir, name)
    assert "BroadcastNestedLoopJoin" not in plan, name
    assert "CartesianProduct" not in plan, name


def test_fuzzy_match_blocks_via_equijoin(spark, sf_dir):
    # candidate generation must be an equi-join on the block key; the
    # levenshtein verify runs as a post-join filter, never as the join itself
    plan = plan_of(spark, sf_dir, "q48_fuzzy_match_parts")
    assert "SortMergeJoin" in plan or "BroadcastHashJoin" in plan or "ShuffledHashJoin" in plan


def test_sequence_packing_window_is_per_source(spark, sf_dir):
    # the prefix-sum window partitions by source — a global (single
    # partition) sort would serialize packing at scale
    plan = plan_of(spark, sf_dir, "q73_sequence_packing")
    assert "Window" in plan
    assert "SinglePartition" not in plan


def test_rolling_zscore_single_window_pass(spark, sf_dir):
    # one window over user partitions feeding a keyed aggregate: no joins
    plan = plan_of(spark, sf_dir, "q49_rolling_zscore")
    assert "Window" in plan
    assert "Join" not in plan
    assert "SinglePartition" not in plan


def test_incremental_rollup_reaggregates_partials(spark, sf_dir):
    # two HashAggregate levels (minute, then hour) with map-side partials;
    # the raw scan feeds the minute layer only once
    plan = plan_of(spark, sf_dir, "q58_incremental_rollup")
    # formatted mode prints each node twice (tree + detail): 2 == one scan
    assert plan.count("Scan parquet") == 2
    assert "HashAggregate" in plan


def test_zorder_key_is_map_side_no_join(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "q59_zorder_layout")
    assert "Join" not in plan
    assert "HashAggregate" in plan  # keyed profile agg, partial map-side


def test_span_dedup_no_quadratic_join(spark, sf_dir):
    # sharedness comes from a keyed MIN/MAX aggregate + equi-join on the
    # span hash — never a self-join of the span relation on doc pairs
    plan = plan_of(spark, sf_dir, "q75_span_dedup_fraction")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_vocab_coverage_broadcasts_vocabulary(spark, sf_dir):
    # the K-row vocabulary must broadcast; the exploded word relation is
    # only ever shuffled for its one count aggregation
    plan = plan_of(spark, sf_dir, "q78_vocab_coverage")
    assert "BroadcastHashJoin" in plan
    assert "TakeOrderedAndProject" in plan  # top-K, no global sort


def test_incremental_dedup_broadcasts_delta(spark, sf_dir):
    # the delta batch drives both layers: delta digests/shingles broadcast
    # into the base scan, and the corpus is never self-joined (no base-base
    # or delta-delta pair generation anywhere in the plan)
    plan = plan_of(spark, sf_dir, "q57_incremental_dedup")
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_embedding_drift_no_explode_single_agg(spark, sf_dir):
    # centroids are 64 element-wise aggregates in one groupBy — the plan
    # must not explode the embedding array (no Generate), and the 1-row
    # global centroid broadcasts into the 10-row per-label relation
    plan = plan_of(spark, sf_dir, "q55_embedding_drift")
    assert "Generate" not in plan
    assert "Broadcast" in plan


def test_embedding_outliers_broadcasts_centroids(spark, sf_dir):
    # the 10x64 centroid table and the K*|labels| outlier rows both
    # broadcast; the embedding array is never exploded
    plan = plan_of(spark, sf_dir, "q79_embedding_outliers")
    assert "BroadcastHashJoin" in plan
    assert "Generate" not in plan
    assert "CartesianProduct" not in plan


def test_join_key_skew_scans_key_only(spark, sf_dir):
    # the diagnostic must read ONLY the join key from the base table and
    # pick its top keys without a global sort
    plan = plan_of(spark, sf_dir, "q83_join_key_skew")
    assert "TakeOrderedAndProject" in plan
    import re
    m = re.search(r"ReadSchema: struct<([^>]*)>", plan)
    assert m and m.group(1) == "l_orderkey:bigint", m.group(1) if m else plan[:500]


def test_state_intervals_single_event_stream_shuffle(spark, sf_dir):
    # lag + running-sum island detection keeps both event-stream window
    # functions on ONE (user_id) Exchange, which Catalyst then reuses for
    # the run aggregation and the interval stitch — the row_number
    # difference idiom would force a second (user_id, event_type) shuffle
    # of the full event stream
    plan = plan_of(spark, sf_dir, "q84_state_intervals")
    assert plan.count("+- Exchange") == 1
    assert plan.count("hashpartitioning(user_id") == 1


def test_click_attribution_single_shuffle_no_self_join(spark, sf_dir):
    # the conditional last-non-null window replaces a click×purchase
    # self-join: one (user_id) Exchange, no join operators at all
    plan = plan_of(spark, sf_dir, "q86_click_attribution")
    assert plan.count("+- Exchange") == 1
    assert "Join" not in plan


def test_growth_accounting_windows_days_not_events(spark, sf_dir):
    # the cumulative-users window must run on the days-sized relation
    # (single partition of |days| rows) AFTER the aggregations — the
    # event stream is only ever touched by the two keyed aggregations
    plan = plan_of(spark, sf_dir, "q87_growth_accounting")
    assert "BroadcastHashJoin" in plan
    assert "SinglePartition" in plan


def test_collocations_topk_no_global_sort(spark, sf_dir):
    # PMI join runs on vocabulary-sized count relations; top-K must be
    # TakeOrderedAndProject, never a global sort of the bigram vocab
    plan = plan_of(spark, sf_dir, "q88_collocations_pmi")
    assert "TakeOrderedAndProject" in plan
    assert "CartesianProduct" not in plan


def test_top_paths_prunes_per_user_state_mapside(spark, sf_dir):
    # rn <= PATH_LEN must become a WindowGroupLimit (per-user state bounded
    # to 5 rows before any aggregation buffer), and top-K paths must be
    # TakeOrderedAndProject
    plan = plan_of(spark, sf_dir, "q89_top_paths")
    assert "WindowGroupLimit" in plan
    assert "TakeOrderedAndProject" in plan


def test_chunking_is_shuffle_free(spark, sf_dir):
    # chunking is tokenize + index-generate + slice, entirely map-side:
    # the plan must contain no Exchange at all
    plan = plan_of(spark, sf_dir, "q100_chunk_documents")
    assert "Exchange" not in plan
    assert "Generate" in plan  # the chunk-index explode


def test_geo_grid_join_broadcasts_exploded_dim(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "q186_geo_grid_join")
    # the 9x-exploded supplier side is broadcast; the customer fact side
    # joins on its map-side cell key — no shuffle of the big side, and
    # never a nested-loop spatial join
    assert "BroadcastHashJoin" in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_kwic_snippets_is_map_side_only(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "q200_kwic_snippets")
    # scan -> explode -> filter -> project: serving-side snippet
    # generation must not shuffle anything
    assert "Exchange" not in plan


def test_ancestor_rollup_is_single_exchange(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "q198_ancestor_rollup")
    # spend rollup + ancestor agg share hash-partitioning work; the
    # closed-form path explode must not introduce joins
    assert "Join" not in plan
    assert plan.count("Exchange hashpartitioning") <= 2


def test_item_cf_joins_on_order_key(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "q199_item_item_cf")
    # co-occurrence must come from the order-key equi-join (basket-
    # bounded), not any nested-loop/cartesian item pairing
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_bm25_broadcasts_term_stats(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "q197_bm25_scoring")
    # df (2 rows) and the corpus totals (1 row) reach the scorer as
    # broadcasts; the only windows run over matched docs
    assert plan.count("BroadcastExchange") >= 2
