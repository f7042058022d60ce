"""Round-4 operators: approx equi-depth histogram twin, prefix-sum
binary-search rewrite, and edge-case regressions from the round-3 advice
sweep (short-doc bigrams, empty streaming upsert)."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from docling_api_spark.plans import all_queries
from tests.test_plans import plan_of

QS = all_queries()


# ---------------------------------------------------------------------------
# q118_approx_equidepth — the 100 TB histogram plan
# ---------------------------------------------------------------------------


def test_approx_equidepth_matches_exact_within_tolerance(spark, sf_dir):
    """The sketch twin must put (a) every bucket within 25% of perfect
    equi-depth and (b) produce the same bucket COUNT as the exact twin —
    the plan is identical, only the cut estimator differs."""
    exact = {
        r["bucket_id"]: r["n"]
        for r in QS["q118_equidepth_histogram"].fn(spark, sf_dir).collect()
    }
    approx = {
        r["bucket_id"]: r["n"]
        for r in QS["q118_approx_equidepth"].fn(spark, sf_dir).collect()
    }
    assert set(approx) == set(exact)
    total = sum(approx.values())
    assert total == sum(exact.values())
    perfect = total / len(approx)
    for bucket, n in approx.items():
        assert abs(n - perfect) / perfect < 0.25, (bucket, n, perfect)


def test_approx_equidepth_plan_has_no_window_or_global_sort(spark, sf_dir):
    """Zero Window nodes and zero global Sorts: the whole point of the
    cuts-broadcast formulation vs the textbook ntile() global sort."""
    plan = plan_of(spark, sf_dir, "q118_approx_equidepth")
    assert "Window" not in plan
    assert "approx_percentile" in plan
    # single-partition exchange only for the 1-row cuts aggregate
    assert plan.count("SinglePartition") <= 1


# ---------------------------------------------------------------------------
# q113 — short-document bigram regression (ADVICE r3)
# ---------------------------------------------------------------------------


def test_bigram_familiarity_short_docs_emit_no_rows(spark, tmp_path):
    """Docs with <2 tokens must contribute no bigram rows rather than
    crash (sequence(1,0) is DESCENDING in Spark → element_at(t, 0))."""
    docs = spark.createDataFrame(
        [
            (1, "single"),
            (2, ""),
            (3, "two tokens"),
            (4, "a b c"),
        ],
        "doc_id int, text string",
    )
    sf = str(tmp_path / "sf_short")
    docs.write.parquet(sf + "/documents.parquet")
    out = QS["q113_bigram_familiarity"].fn(spark, sf).collect()
    by_doc = {r["doc_id"]: r["n_bigrams"] for r in out}
    assert 1 not in by_doc and 2 not in by_doc
    assert by_doc[3] == 1
    assert by_doc[4] == 2


# ---------------------------------------------------------------------------
# drain_stream_upsert — zero-micro-batch edge (ADVICE r3)
# ---------------------------------------------------------------------------


def test_drain_stream_upsert_empty_source_returns_typed_empty(spark, tmp_path):
    from docling_api_spark.streaming.jobs import drain_stream_upsert

    src_dir = str(tmp_path / "empty_src")
    spark.createDataFrame([], "k int, v long").write.parquet(src_dir)
    stream = (
        spark.readStream.schema("k int, v long").parquet(src_dir)
        .groupBy("k").agg(F.sum("v").alias("total"))
    )
    out = drain_stream_upsert(stream, keys=["k"], prefix="t_empty")
    assert out.count() == 0
    assert [f.name for f in out.schema.fields] == ["k", "total"]


# ---------------------------------------------------------------------------
# bloom key-type invariance (ADVICE r3)
# ---------------------------------------------------------------------------


def test_bloom_prefilter_int_vs_bigint_build_probe(spark):
    """An int build column against a bigint probe column must produce NO
    false negatives — the cast-to-bigint inside xxhash64 pins this."""
    from docling_api_spark.operators.relational import _bloom_pass, _bloom_words

    build = spark.range(0, 1000).select(F.col("id").cast("int").alias("k"))
    probe = spark.range(0, 2000).select(F.col("id").cast("bigint").alias("k"))
    bloom = _bloom_words(build, "k")
    passed = (
        probe.join(F.broadcast(bloom))
        .where(_bloom_pass("k", "bloom"))
        .select("k")
    )
    got = {r["k"] for r in passed.collect()}
    # every true member survives (bloom = no false negatives)
    assert set(range(1000)) <= got


# ---------------------------------------------------------------------------
# q81 — empty-payload frame sampling regression (q113 class)
# ---------------------------------------------------------------------------


def test_frame_sample_empty_media_emits_no_frames(spark, tmp_path):
    """A zero-byte payload has n_frames = 0 and must emit NO rows:
    sequence(0, -1) is descending in Spark and previously produced a
    spurious frame 0 where the oracle's range(0, 0) is empty."""
    docs = spark.createDataFrame(
        # doc_id % 3 == 2 → classified "video" by the media corpus
        [(2, "", 0), (5, "x" * 300, 300)],
        "doc_id long, text string, n_chars int",
    )
    sf = str(tmp_path / "sf_media")
    docs.write.parquet(sf + "/documents.parquet")
    rows = QS["q81_frame_sample"].fn(spark, sf).collect()
    assert {r["doc_id"] for r in rows} == {5}
    assert all(r["frame_len"] > 0 for r in rows)
