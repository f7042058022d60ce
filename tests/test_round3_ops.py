"""Semantics tests for the round-3 batch-2 operators (sequence packing,
curriculum buckets, fuzzy matching, rolling z-score, streaming dedup,
incremental rollup) on constructed inputs — the oracle sweep pins
cross-engine equality; these pin that the operators do the RIGHT thing."""

from __future__ import annotations

import pyarrow as pa
import pyarrow.parquet as pq

from docling_api_spark.plans import all_queries

QUERIES = all_queries()


def write_documents(path, rows):
    """rows: list of (doc_id, text, lang, source)."""
    tbl = pa.table(
        {
            "doc_id": pa.array([r[0] for r in rows], pa.int64()),
            "text": pa.array([r[1] for r in rows], pa.string()),
            "lang": pa.array([r[2] for r in rows], pa.string()),
            "source": pa.array([r[3] for r in rows], pa.string()),
            "n_chars": pa.array([len(r[1]) for r in rows], pa.int64()),
        }
    )
    pq.write_table(tbl, path / "documents.parquet")


def write_part(path, names):
    tbl = pa.table(
        {
            "p_partkey": pa.array(range(len(names)), pa.int64()),
            "p_name": pa.array(names, pa.string()),
            "p_brand": pa.array(["Brand#1"] * len(names), pa.string()),
            "p_type": pa.array(["ECONOMY"] * len(names), pa.string()),
            "p_size": pa.array([1] * len(names), pa.int32()),
        }
    )
    pq.write_table(tbl, path / "part.parquet")


def write_events(path, rows):
    """rows: list of (event_id, ts_ns, user_id, event_type, value)."""
    tbl = pa.table(
        {
            "event_id": pa.array([r[0] for r in rows], pa.int64()),
            "ts": pa.array([r[1] for r in rows], pa.timestamp("ns")),
            "user_id": pa.array([r[2] for r in rows], pa.int64()),
            "event_type": pa.array([r[3] for r in rows], pa.string()),
            "value": pa.array([r[4] for r in rows], pa.float64()),
            "props": pa.array(["{}"] * len(rows), pa.string()),
        }
    )
    pq.write_table(tbl, path / "events.parquet")


# ---------------------------------------------------------------------------
# q73 sequence packing
# ---------------------------------------------------------------------------


def test_sequence_packing_bin_boundaries(spark, tmp_path):
    # budget 2048: doc sizes 1000,1000,100 → doc3 starts at cum 2000 < 2048
    # so it still lands in bin 0; doc4 (cum 2100) opens bin 1.
    docs = [
        (1, " ".join(["w"] * 1000), "en", "s"),
        (2, " ".join(["w"] * 1000), "en", "s"),
        (3, " ".join(["w"] * 100), "en", "s"),
        (4, " ".join(["w"] * 10), "en", "s"),
    ]
    write_documents(tmp_path, docs)
    rows = {
        (r["source"], r["bin_id"]): r.asDict()
        for r in QUERIES["q73_sequence_packing"].fn(spark, str(tmp_path)).collect()
    }
    assert rows[("s", 0)]["n_docs"] == 3
    assert rows[("s", 0)]["bin_tokens"] == 2100
    assert rows[("s", 0)]["first_doc"] == 1 and rows[("s", 0)]["last_doc"] == 3
    assert rows[("s", 1)]["n_docs"] == 1 and rows[("s", 1)]["first_doc"] == 4


def test_sequence_packing_sources_pack_independently(spark, tmp_path):
    docs = [
        (1, " ".join(["w"] * 3000), "en", "a"),  # bin 0 of source a
        (2, " ".join(["w"] * 10), "en", "a"),  # cum 3000 → bin 1
        (3, " ".join(["w"] * 10), "en", "b"),  # source b restarts at bin 0
    ]
    write_documents(tmp_path, docs)
    out = {
        (r["source"], r["bin_id"])
        for r in QUERIES["q73_sequence_packing"].fn(spark, str(tmp_path)).collect()
    }
    assert out == {("a", 0), ("a", 1), ("b", 0)}


# ---------------------------------------------------------------------------
# q74 curriculum buckets
# ---------------------------------------------------------------------------


def test_curriculum_deciles_are_monotone_in_score(spark, tmp_path):
    # 20 docs, scores 1..20 → deciles of exactly 2 docs each, score-ordered
    docs = [(i, " ".join(["w"] * i), "en", "s") for i in range(1, 21)]
    write_documents(tmp_path, docs)
    rows = sorted(
        (r["decile"], r["min_score"], r["max_score"], r["n_docs"])
        for r in QUERIES["q74_curriculum_buckets"].fn(spark, str(tmp_path)).collect()
    )
    assert [r[3] for r in rows] == [2] * 10
    # decile k holds scores {2k-1, 2k}
    assert all(r[1] == 2 * r[0] - 1 and r[2] == 2 * r[0] for r in rows)


# ---------------------------------------------------------------------------
# q48 fuzzy matching
# ---------------------------------------------------------------------------


def test_fuzzy_match_finds_typo_pairs_within_block(spark, tmp_path):
    write_part(
        tmp_path,
        ["red widget", "red widgit", "red widget", "red gear", "blue widget"],
    )
    out = {
        (r["name_a"], r["name_b"]): r.asDict()
        for r in QUERIES["q48_fuzzy_match_parts"].fn(spark, str(tmp_path)).collect()
    }
    # typo pair matched, support counts carried (2 exact copies of "red widget")
    pair = out[("red widget", "red widgit")]
    assert pair["lev"] == 1
    assert {pair["support_a"], pair["support_b"]} == {1, 2}
    # "red gear" is 5 edits from "red widget" (> 3): filtered out
    assert ("red gear", "red widget") not in out and ("red widget", "red gear") not in out
    # "blue widget" is 1st-token-blocked away from the red block entirely
    assert all("blue" not in k[0] and "blue" not in k[1] for k in out)


def test_fuzzy_match_excludes_identical_names(spark, tmp_path):
    write_part(tmp_path, ["red widget", "red widget"])
    assert QUERIES["q48_fuzzy_match_parts"].fn(spark, str(tmp_path)).count() == 0


# ---------------------------------------------------------------------------
# q49 rolling z-score
# ---------------------------------------------------------------------------


def test_rolling_zscore_flags_obvious_spike(spark, tmp_path):
    # user 1: 5 quiet events then one spike. Frame at the spike holds five
    # 10.00s (mean 1000c, sigma 0) → (n*c-s1)^2 > 0 = anomaly. The quiet
    # rows (frames of identical values) are never anomalous.
    base = 1_700_000_000_000_000_000  # ns
    rows = [(i, base + i * 10**9, 1, "click", 10.0) for i in range(5)]
    rows.append((5, base + 5 * 10**9, 1, "click", 400.0))
    write_events(tmp_path, rows)
    out = QUERIES["q49_rolling_zscore"].fn(spark, str(tmp_path)).collect()
    assert len(out) == 1
    r = out[0].asDict()
    # rows 2..5 have >= 3 history rows (row index >= _ZMIN)
    assert r["n_scored"] == 3
    assert r["n_anomalies"] == 1
    assert r["anomaly_cents"] == 40000


def test_rolling_zscore_users_are_independent(spark, tmp_path):
    base = 1_700_000_000_000_000_000
    rows = [(i, base + i * 10**9, 1, "click", 10.0) for i in range(6)]
    rows += [(10 + i, base + i * 10**9, 2, "click", float(i)) for i in range(2)]
    write_events(tmp_path, rows)
    out = {r["user_id"]: r.asDict() for r in
           QUERIES["q49_rolling_zscore"].fn(spark, str(tmp_path)).collect()}
    # user 2 never accrues _ZMIN history → no scored rows at all
    assert 2 not in out
    assert out[1]["n_anomalies"] == 0  # constant series: never anomalous


# ---------------------------------------------------------------------------
# q56 streaming dedup / q58 incremental rollup
# ---------------------------------------------------------------------------


def test_streaming_dedup_collapses_same_minute_duplicates(spark, tmp_path):
    base = 1_700_000_000_000_000_000
    rows = [
        (0, base, 1, "click", 1.0),
        (1, base + 10**9, 1, "click", 2.0),  # same minute, same key → dup
        (2, base + 61 * 10**9, 1, "click", 3.0),  # next minute → new key
        (3, base, 2, "click", 4.0),  # other user → new key
    ]
    write_events(tmp_path, rows)
    out = QUERIES["q56_streaming_dedup"].fn(spark, str(tmp_path))
    assert out.count() == 3
    assert out.distinct().count() == 3


def test_incremental_rollup_equals_direct_aggregation(spark, sf_dir):
    from pyspark.sql import functions as F

    from docling_api_spark.tables import load_table

    two_level = QUERIES["q58_incremental_rollup"].fn(spark, sf_dir)
    ev = load_table(spark, sf_dir, "events")
    direct = ev.groupBy(
        F.unix_micros(F.date_trunc("hour", "ts")).alias("hour_start_us"),
        "event_type",
    ).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_events"),
        F.sum(F.col("value").cast("decimal(28,6)")).cast("double").alias("total_value"),
        F.countDistinct(F.date_trunc("minute", "ts")).cast("bigint").alias("n_minutes"),
    )
    cols = two_level.columns
    assert sorted(map(tuple, two_level.select(cols).collect())) == sorted(
        map(tuple, direct.select(cols).collect())
    )


# ---------------------------------------------------------------------------
# q59 z-order layout
# ---------------------------------------------------------------------------


def test_zorder_buckets_bound_both_dimensions(spark, sf_dir):
    # 256 consecutive Morton keys = a 16x16 rectangle: every bucket must
    # bound BOTH dimensions to a 16-wide span — the property that lets
    # min/max stats prune on either column after a z-layout write
    rows = QUERIES["q59_zorder_layout"].fn(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0 <= r["x_max"] - r["x_min"] <= 15, r
        assert 0 <= r["y_max"] - r["y_min"] <= 15, r
        # rectangle alignment: the bucket's rectangle starts on a 16-grid
        assert r["x_min"] // 16 == r["x_max"] // 16, r
        assert r["y_min"] // 16 == r["y_max"] // 16, r


def test_sequence_packing_invariant_to_file_layout(spark, tmp_path):
    # bins are a pure function of (source, doc_id, tokens) — reading the
    # same corpus from a different file/partition layout must produce
    # identical bins (the distributed-determinism property; cf. the IVF
    # order-invariance test)
    docs = [(i, " ".join(["w"] * (37 * (i % 7) + 5)), "en", f"s{i % 3}")
            for i in range(30)]
    one = tmp_path / "one"
    two = tmp_path / "two"
    for d in (one, two):
        d.mkdir()
    write_documents(one, docs)
    # split the same rows across two part files under documents.parquet/
    part_dir = two / "documents.parquet"
    part_dir.mkdir()
    _write_doc_part(part_dir / "part-0.parquet", docs[:11])
    _write_doc_part(part_dir / "part-1.parquet", docs[11:])
    fn = QUERIES["q73_sequence_packing"].fn
    a = sorted(map(tuple, fn(spark, str(one)).collect()))
    b = sorted(map(tuple, fn(spark, str(two)).collect()))
    assert a == b


def _write_doc_part(path, rows):
    tbl = pa.table(
        {
            "doc_id": pa.array([r[0] for r in rows], pa.int64()),
            "text": pa.array([r[1] for r in rows], pa.string()),
            "lang": pa.array([r[2] for r in rows], pa.string()),
            "source": pa.array([r[3] for r in rows], pa.string()),
            "n_chars": pa.array([len(r[1]) for r in rows], pa.int64()),
        }
    )
    pq.write_table(tbl, path)


# ---------------------------------------------------------------------------
# q75 span dedup fraction
# ---------------------------------------------------------------------------


def test_span_dedup_sees_chunk_straddling_duplicates(spark, tmp_path):
    # a 16-word run shared at DIFFERENT positions in two docs: fixed-chunk
    # dedup (q97, 20-word chunks) sees different chunk texts, but stride-1
    # spans align on every offset, so both docs report shared spans
    shared = " ".join(f"dup{i}" for i in range(16))
    docs = [
        (1, " ".join(f"a{i}" for i in range(7)) + " " + shared, "en", "s"),
        (2, shared + " " + " ".join(f"b{i}" for i in range(9)), "en", "s"),
        (3, " ".join(f"c{i}" for i in range(30)), "en", "s"),  # unique doc
    ]
    write_documents(tmp_path, docs)
    out = {r["doc_id"]: r.asDict() for r in
           QUERIES["q75_span_dedup_fraction"].fn(spark, str(tmp_path)).collect()}
    # each doc has (tokens - 15) spans; exactly ONE span (the aligned run)
    # is shared between docs 1 and 2
    assert out[1]["n_spans"] == 8 and out[1]["n_shared"] == 1
    assert out[2]["n_spans"] == 10 and out[2]["n_shared"] == 1
    assert out[3]["n_spans"] == 15 and out[3]["n_shared"] == 0


def test_span_dedup_short_docs_produce_no_rows(spark, tmp_path):
    write_documents(tmp_path, [(1, "only five words here now", "en", "s")])
    assert QUERIES["q75_span_dedup_fraction"].fn(spark, str(tmp_path)).count() == 0


# ---------------------------------------------------------------------------
# q76 leakage-safe split
# ---------------------------------------------------------------------------


def test_leakage_safe_split_keeps_clusters_together(spark, sf_dir):
    out = QUERIES["q76_leakage_safe_split"].fn(spark, sf_dir)
    rows = out.collect()
    # every document gets exactly one assignment
    assert len(rows) == len({r["doc_id"] for r in rows})
    # the leakage guarantee: one split per cluster
    by_cluster = {}
    for r in rows:
        by_cluster.setdefault(r["cluster_id"], set()).add(r["split"])
    assert all(len(s) == 1 for s in by_cluster.values())
    # both splits exist and the ratio is hash-80/20-ish
    n_train = sum(r["split"] == "train" for r in rows)
    assert 0.6 < n_train / len(rows) < 0.95


def test_incremental_dedup_semantics(spark, tmp_path):
    """Constructed corpus: delta doc 18 is an exact copy of base doc 3,
    delta doc 19 is a near-copy of base doc 5 (one word changed), delta
    doc 28 is novel. The operator must flag exactly those, never report a
    base doc as delta, and never match across the source boundary."""
    base_text = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    near_text = "alpha beta gamma delta epsilon zeta eta theta iota lambda"
    rows = [
        # base docs (doc_id % 10 < 8)
        (3, base_text, "en", "web"),
        (5, base_text.replace("alpha", "omega"), "en", "web"),
        (7, "totally different words entirely here now folks", "en", "web"),
        # delta docs (doc_id % 10 >= 8)
        (18, base_text, "en", "web"),                       # exact dup of 3
        (19, near_text.replace("alpha", "omega"), "en", "web"),  # near dup of 5
        (28, "completely novel content with no overlap at all", "en", "web"),
        (29, base_text, "en", "other-source"),  # same text, different source:
        # exact layer still fires (md5 ignores source); near layer must not
        # pair it with web docs
    ]
    write_documents(tmp_path, rows)
    out = {
        r["doc_id"]: r
        for r in QUERIES["q57_incremental_dedup"].fn(spark, str(tmp_path)).collect()
    }
    assert set(out) == {18, 19, 28, 29}  # one row per delta doc, no base rows
    assert out[18]["exact_dup_of"] == 3
    assert out[18]["near_dup_of"] == 3 and out[18]["near_jaccard"] == 1.0
    assert out[19]["exact_dup_of"] is None
    assert out[19]["near_dup_of"] == 5
    assert 0.05 <= out[19]["near_jaccard"] < 1.0
    assert out[28]["exact_dup_of"] is None and out[28]["near_dup_of"] is None
    assert out[29]["exact_dup_of"] == 3      # md5 layer is source-blind
    assert out[29]["near_dup_of"] is None    # shingle layer is per-source


def test_state_intervals_and_attribution_semantics(spark, tmp_path):
    """Constructed stream for user 1: view,view,click,click,view,purchase.
    q84 must collapse to 4 runs with contiguous validity intervals; q86
    must attribute the purchase to the LAST click (t4), and a purchase
    with no preceding click (user 2) must get NULL."""
    US = 1_000_000  # µs per second; ts_ns below are seconds * 1e9
    rows = [
        (0, 10 * 10**9, 1, "view", 0.0),
        (1, 20 * 10**9, 1, "view", 0.0),
        (2, 30 * 10**9, 1, "click", 0.0),
        (3, 40 * 10**9, 1, "click", 0.0),
        (4, 50 * 10**9, 1, "view", 0.0),
        (5, 60 * 10**9, 1, "purchase", 9.9),
        (6, 70 * 10**9, 2, "purchase", 1.0),
    ]
    write_events(tmp_path, rows)

    runs = sorted(
        (r["user_id"], r["valid_from_us"], r["valid_to_us"], r["event_type"], r["n_events"])
        for r in QUERIES["q84_state_intervals"].fn(spark, str(tmp_path)).collect()
    )
    assert runs == [
        (1, 10 * US, 30 * US, "view", 2),
        (1, 30 * US, 50 * US, "click", 2),
        (1, 50 * US, 60 * US, "view", 1),
        (1, 60 * US, None, "purchase", 1),
        (2, 70 * US, None, "purchase", 1),
    ]

    attr = {
        r["event_id"]: (r["click_ts_us"], r["gap_us"])
        for r in QUERIES["q86_click_attribution"].fn(spark, str(tmp_path)).collect()
    }
    assert attr == {5: (40 * US, 20 * US), 6: (None, None)}
