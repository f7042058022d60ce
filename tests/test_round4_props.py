"""Structural invariants of the round-4 operators — properties the DuckDB
hash oracle cannot see (it only certifies engine agreement, not that the
math means what the docstring claims)."""

from __future__ import annotations

from docling_api_spark.plans import all_queries

QS = all_queries()


def test_pagerank_conserves_mass_and_floors(spark, sf_dir):
    from docling_api_spark.operators.graphops import PR_SCALE

    rows = QS["q152_pagerank"].fn(spark, sf_dir).collect()
    n = len(rows)
    mass = sum(r["rank_units"] for r in rows)
    # integer floor division only loses mass: ≤ SCALE, and each of the 3
    # iterations floors at most (n + 1) units per node (contrib + damp).
    assert mass <= PR_SCALE
    assert mass >= PR_SCALE - 10 * n * 3
    base = (15 * PR_SCALE) // (100 * n)
    assert all(r["rank_units"] >= base for r in rows)
    # both node families present, every rank positive
    kinds = {r["node"][0] for r in rows}
    assert kinds == {"c", "s"}


def test_ohlc_bars_ordering_invariants(spark, sf_dir):
    rows = QS["q157_ohlc_bars"].fn(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r["low"] <= r["open"] <= r["high"]
        assert r["low"] <= r["close"] <= r["high"]
        assert r["n_events"] >= 1


def test_benford_shares_sum_to_one(spark, sf_dir):
    rows = QS["q153_benford_digit_audit"].fn(spark, sf_dir).collect()
    assert {r["first_digit"] for r in rows} <= set(range(1, 10))
    assert abs(sum(r["obs_share"] for r in rows) - 1.0) < 1e-9
    assert abs(sum(r["benford_share"] for r in rows) - 1.0) < 1e-6


def test_expectation_suite_bounds(spark, sf_dir):
    rows = QS["q156_expectation_suite"].fn(spark, sf_dir).collect()
    assert len(rows) == 6
    for r in rows:
        assert 0 <= r["n_violations"] <= r["n_rows"]
    # the shipped tables actually satisfy their contracts
    by_name = {r["check_name"]: r["n_violations"] for r in rows}
    assert by_name["customer.c_custkey.unique"] == 0
    assert by_name["lineitem.l_quantity.range_1_50"] == 0
    assert by_name["events.event_type.accepted_values"] == 0


def test_containment_is_directed_and_bounded(spark, sf_dir):
    rows = QS["q155_ngram_containment"].fn(spark, sf_dir).collect()
    for r in rows:
        assert r["doc_src"] != r["doc_dst"]
        assert 0.5 <= r["containment"] <= 1.0 + 1e-12
        assert r["n_common"] >= 1


def test_median_mad_outlier_count_is_conservative(spark, sf_dir):
    rows = QS["q158_median_mad_outliers"].fn(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r["mad_v"] >= 0
        # at most half the points can sit beyond 3 MAD of the median
        assert r["n_outliers"] <= r["n"] / 2


def test_quantization_error_bounded_by_half_step(spark, sf_dir):
    from docling_api_spark.operators.similarity import ERR_UNIT, QUANT_LEVELS

    from docling_api_spark.tables import load_table
    import pyspark.sql.functions as F

    rows = QS["q159_embedding_quantization"].fn(spark, sf_dir).collect()
    assert rows
    # per-label max error ≤ (max per-vector scale)/(2·127) + rounding slack
    scales = (
        load_table(spark, sf_dir, "embeddings")
        .groupBy("label")
        .agg(
            F.max(
                F.expr("array_max(transform(embedding, x -> abs(CAST(x AS DOUBLE))))")
            ).alias("max_scale")
        )
        .collect()
    )
    max_scale = {r["label"]: r["max_scale"] for r in scales}
    for r in rows:
        bound = max_scale[r["label"]] / (2 * QUANT_LEVELS) * ERR_UNIT + 1
        assert r["max_err_units"] <= bound
        assert r["total_err_units"] >= 0
