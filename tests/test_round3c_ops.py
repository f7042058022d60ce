"""Semantics + plan pins for the batch-3 operators (q103–q108)."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from docling_api_spark.operators.textstats import HH_K, _MG_CAPACITY, _mg_candidates
from docling_api_spark.plans import all_queries
from tests.test_plans import plan_of

QUERIES = all_queries()


# ---------------------------------------------------------------------------
# q103 — BFS semantics on a constructed graph with a known distance table
# ---------------------------------------------------------------------------
def test_khop_distances_on_constructed_graph(spark, tmp_path):
    """3-supplier chain: seed part 0 shares s1 with parts {0,1}; part 1
    shares s2 with part 2; part 2 shares s3 with part 3 (unreachable in 2
    hops from the seed through the hop-through-supplier expansion)."""
    rows = [
        # (l_partkey, l_suppkey) bipartite edges via minimal lineitem rows
        (0, 101),
        (1, 101),
        (1, 102),
        (2, 102),
        (2, 103),
        (3, 103),
        (500, 104),  # second seed (500 % 500 == 0), isolated with part 7
        (7, 104),
    ]
    df = spark.createDataFrame(rows, ["l_partkey", "l_suppkey"])
    for col in ["l_orderkey", "l_linenumber"]:
        df = df.withColumn(col, F.lit(1))
    out_dir = str(tmp_path / "sf")
    df.write.parquet(out_dir + "/lineitem.parquet")

    got = {
        (r.part_key, r.min_hops)
        for r in QUERIES["q103_khop_reachability"].fn(spark, out_dir).collect()
    }
    assert got == {
        (0, 0),
        (500, 0),
        (1, 1),  # via s101
        (7, 1),  # via s104
        (2, 2),  # via s102 from part 1
        # part 3 is 3 hops out: correctly absent
    }


# ---------------------------------------------------------------------------
# q106 — Misra-Gries candidate recall guarantee (pure-python property test)
# ---------------------------------------------------------------------------
def test_mg_candidates_retain_heavy_hitters():
    """Any token with partition frequency > n_p/(capacity+1) must survive
    the batched MG reduction — feed a worst-case stream (heavy tokens
    interleaved with a long unique tail, split across many small batches)
    and check recall."""
    n_heavy, n_tail = 40, 30_000
    heavy_freq = 2_000
    toks: list[str] = []
    for i in range(n_heavy):
        toks.extend([f"hot{i}"] * heavy_freq)
    toks.extend(f"tail{i}" for i in range(n_tail))
    # adversarial ordering: tail interleaved after heavies via striding
    toks = toks[::2] + toks[1::2]

    batches = [
        pd.DataFrame({"token": toks[i : i + 1000]}) for i in range(0, len(toks), 1000)
    ]
    (out,) = list(_mg_candidates(iter(batches)))
    survivors = set(out["token"])
    n_p = len(toks)
    assert heavy_freq > n_p / (_MG_CAPACITY + 1)  # test is actually exercising the bound
    assert {f"hot{i}" for i in range(n_heavy)} <= survivors


def test_heavy_hitters_equals_plain_groupby(spark, sf_dir):
    """End-to-end: the two-pass MG plan returns exactly the full groupBy's
    heavy set (the guarantee, on real data)."""
    from docling_api_spark.tables import load_table

    got = {
        (r.token, r.freq)
        for r in QUERIES["q106_heavy_hitters"].fn(spark, sf_dir).collect()
    }
    toks = load_table(spark, sf_dir, "documents").select(
        F.explode(F.split("text", " ")).alias("token")
    )
    total = toks.count()
    want = {
        (r.token, r.freq)
        for r in toks.groupBy("token")
        .agg(F.count(F.lit(1)).alias("freq"))
        .where(F.col("freq") * HH_K > total)
        .collect()
    }
    assert got == want


# ---------------------------------------------------------------------------
# q108 — bloom prefilter plan shape
# ---------------------------------------------------------------------------
def test_bloom_join_plan(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "q108_bloom_semi_join")
    # single-row bloom side arrives via broadcast nested loop (a map-side
    # lookup), and the exact pass is a broadcast semi join — the probe
    # relation is never shuffled
    assert "BroadcastNestedLoopJoin" in plan
    assert "LeftSemi" in plan
    assert "Exchange hashpartitioning(o_custkey" not in plan


def test_bloom_pass_has_no_false_negatives(spark):
    """Bloom membership must be a superset of true membership: every build
    key passes its own filter."""
    from docling_api_spark.operators.relational import _bloom_pass, _bloom_words

    build = spark.range(0, 5000).select((F.col("id") * 7919 + 13).alias("k"))
    bloom = _bloom_words(build, "k")
    n_pass = (
        build.join(F.broadcast(bloom))
        .where(_bloom_pass("k", "bloom"))
        .count()
    )
    assert n_pass == 5000


# ---------------------------------------------------------------------------
# q105 — funnel step ordering on a constructed stream
# ---------------------------------------------------------------------------
def test_funnel_steps_constructed(spark, tmp_path):
    import datetime as dt

    t0 = dt.datetime(2024, 1, 1)

    def ts(minutes):
        return t0 + dt.timedelta(minutes=minutes)

    rows = [
        # u1: full funnel in order → step 3
        (1, ts(0), 1, "view", 1.0, ""),
        (2, ts(5), 1, "click", 1.0, ""),
        (3, ts(9), 1, "purchase", 1.0, ""),
        # u2: click BEFORE first view → click doesn't count → step 1
        (4, ts(0), 2, "click", 1.0, ""),
        (5, ts(5), 2, "view", 1.0, ""),
        # u3: click more than 24h after view → step 1
        (6, ts(0), 3, "view", 1.0, ""),
        (7, ts(60 * 25), 3, "click", 1.0, ""),
        # u4: never viewed → step 0
        (8, ts(0), 4, "error", 1.0, ""),
        # u5: view+click, purchase before click → step 2
        (9, ts(0), 5, "view", 1.0, ""),
        (10, ts(1), 5, "purchase", 1.0, ""),
        (11, ts(2), 5, "click", 1.0, ""),
    ]
    df = spark.createDataFrame(
        rows, ["event_id", "ts", "user_id", "event_type", "value", "props"]
    )
    out_dir = str(tmp_path / "sf")
    df.write.parquet(out_dir + "/events.parquet")

    got = {
        (r.funnel_step, r.n_users)
        for r in QUERIES["q105_funnel_steps"].fn(spark, out_dir).collect()
    }
    assert got == {(3, 1), (1, 2), (0, 1), (2, 1)}


# ---------------------------------------------------------------------------
# q110 — interval overlap semantics on constructed runs
# ---------------------------------------------------------------------------
def test_interval_overlap_constructed(spark, tmp_path):
    import datetime as dt

    t0 = dt.datetime(2024, 1, 1)

    def ts(hours):
        return t0 + dt.timedelta(hours=hours)

    rows = [
        # u1: view run [0h, 2h], click run [1h, 3h] → overlap 1h
        (1, ts(0), 1, "view", 1.0, ""),
        (2, ts(2), 1, "view", 1.0, ""),
        (3, ts(1), 1, "click", 1.0, ""),
        (4, ts(3), 1, "click", 1.0, ""),
        # u1 second view run [20h, 20h] (12h gap from first): no click overlap
        (5, ts(20), 1, "view", 1.0, ""),
        # u2: view [0h] and click [40h] — disjoint
        (6, ts(0), 2, "view", 1.0, ""),
        (7, ts(40), 2, "click", 1.0, ""),
    ]
    df = spark.createDataFrame(
        rows, ["event_id", "ts", "user_id", "event_type", "value", "props"]
    )
    out_dir = str(tmp_path / "sf")
    df.write.parquet(out_dir + "/events.parquet")

    got = {
        (r.user_id, r.view_start_us, r.click_start_us, r.overlap_us)
        for r in QUERIES["q110_interval_overlap_join"].fn(spark, out_dir).collect()
    }
    h = 3_600_000_000  # 1h in µs
    e0 = int(dt.datetime(2024, 1, 1).timestamp()) * 1_000_000
    assert got == {(1, e0, e0 + h, h)}


# ---------------------------------------------------------------------------
# q111 — normalization batch semantics (pure python)
# ---------------------------------------------------------------------------
def test_normalize_batch_semantics():
    from docling_api_spark.operators.textstats import _normalize_batch

    pdf = pd.DataFrame(
        {
            "doc_id": [1, 2],
            "text": ["Café  au   Lait", "  A\tB\nC  "],
        }
    )
    (out,) = list(_normalize_batch(iter([pdf])))
    assert list(out["norm_text"]) == ["café au lait", "a b c"]  # NFC composed é
    assert list(out["norm_len"]) == [12, 5]


# ---------------------------------------------------------------------------
# q112 — posting list stays capped; q114 — no sort-merge join
# ---------------------------------------------------------------------------
def test_inverted_index_posting_cap(spark, sf_dir):
    from docling_api_spark.operators.textstats import _POSTING_CAP

    rows = QUERIES["q112_inverted_index"].fn(spark, sf_dir).collect()
    assert rows, "vacuous: no tokens met the df threshold"
    for r in rows:
        n_posted = len(r.posting_head.split(","))
        assert n_posted <= _POSTING_CAP
        assert n_posted == min(r.n_docs, _POSTING_CAP)


def test_winsorized_agg_broadcasts_cuts(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "q114_winsorized_agg")
    assert "SortMergeJoin" not in plan
    assert "BroadcastHashJoin" in plan


# ---------------------------------------------------------------------------
# q118 — equi-depth histogram: no single-partition window, balanced buckets
# ---------------------------------------------------------------------------
def test_equidepth_no_global_window(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "q118_equidepth_histogram")
    # cuts via distributed blocked-rank selection, not ntile-over-all
    assert "ntile" not in plan
    # SinglePartition exchanges carry only the ~100-row block table, the
    # one-row total, and the 15-row cut assembly — never the full
    # relation (ntile-over-all, or plain `percentile`'s all-values
    # aggregation buffer, would drag the data through one task).
    assert plan.count("SinglePartition") <= 3
    # the in-block running count is a blk-partitioned (distributed) window
    assert "hashpartitioning(blk" in plan


def test_equidepth_buckets_are_balanced(spark, sf_dir):
    from docling_api_spark.operators.relational import _EQD_BUCKETS

    rows = QUERIES["q118_equidepth_histogram"].fn(spark, sf_dir).collect()
    assert len(rows) == _EQD_BUCKETS
    counts = [r.n for r in rows]
    total = sum(counts)
    # equal-frequency within interpolation slack (ties at cut points)
    assert max(counts) - min(counts) <= max(4, total // _EQD_BUCKETS // 5)
    # buckets tile the value range in order
    by_id = sorted(rows, key=lambda r: r.bucket_id)
    for lo, hi in zip(by_id, by_id[1:]):
        assert lo.max_x <= hi.min_x


# ---------------------------------------------------------------------------
# q115 — TWAP semantics: constant value ⇒ twap == value
# ---------------------------------------------------------------------------
def test_twap_constant_value(spark, tmp_path):
    import datetime as dt

    t0 = dt.datetime(2024, 3, 1)
    rows = [
        (i, t0 + dt.timedelta(minutes=m), 1, "view", 42.5, "")
        for i, m in enumerate([0, 7, 30, 100])
    ]
    df = spark.createDataFrame(
        rows, ["event_id", "ts", "user_id", "event_type", "value", "props"]
    )
    out_dir = str(tmp_path / "sf")
    df.write.parquet(out_dir + "/events.parquet")
    (r,) = QUERIES["q115_time_weighted_avg"].fn(spark, out_dir).collect()
    assert r.n_intervals == 3
    assert r.covered_us == 100 * 60 * 1_000_000
    assert abs(r.twap - 42.5) < 1e-9


# ---------------------------------------------------------------------------
# q119 — CUSUM finds an injected level shift
# ---------------------------------------------------------------------------
def test_cusum_finds_injected_shift(spark, tmp_path):
    import datetime as dt

    t0 = dt.datetime(2024, 5, 1)
    rows = []
    eid = 0
    # 48 hourly buckets: 1 event/hour for 24h, then 5 events/hour for 24h
    for h in range(48):
        per_hour = 1 if h < 24 else 5
        for j in range(per_hour):
            rows.append(
                (eid, t0 + dt.timedelta(hours=h, minutes=j), 7, "view", 1.0, "")
            )
            eid += 1
    df = spark.createDataFrame(
        rows, ["event_id", "ts", "user_id", "event_type", "value", "props"]
    )
    out_dir = str(tmp_path / "sf")
    df.write.parquet(out_dir + "/events.parquet")

    (r,) = QUERIES["q119_cusum_changepoint"].fn(spark, out_dir).collect()
    # |k*S_i - i*s1| peaks exactly at the last pre-shift bucket (h=23)
    change = dt.datetime.fromtimestamp(r.change_bucket_us / 1e6, dt.timezone.utc)
    assert change == dt.datetime(2024, 5, 1, 23, tzinfo=dt.timezone.utc)
    assert r.n_buckets == 48


# ---------------------------------------------------------------------------
# q121 — RFM segment codes are 3-digit tercile compositions
# ---------------------------------------------------------------------------
def test_rfm_segment_codes_valid(spark, sf_dir):
    rows = QUERIES["q121_rfm_segmentation"].fn(spark, sf_dir).collect()
    assert rows
    for r in rows:
        c = r.segment_code
        assert 111 <= c <= 333
        assert all(1 <= int(d) <= 3 for d in str(c))
    # every customer is in exactly one segment
    from docling_api_spark.tables import load_table

    n_cust = load_table(spark, sf_dir, "orders").select("o_custkey").distinct().count()
    assert sum(r.n_customers for r in rows) == n_cust


# ---------------------------------------------------------------------------
# q124 — chi-square is exactly 0 on a perfectly independent table
# ---------------------------------------------------------------------------
def test_chi_square_zero_under_independence(spark, tmp_path):
    import datetime as dt

    t0 = dt.datetime(2024, 1, 1)
    # users: 1,2 in segment X; 3,4 in segment Y
    cust = spark.createDataFrame(
        [(1, "u1", 0, 0.0, "X"), (2, "u2", 0, 0.0, "X"),
         (3, "u3", 0, 0.0, "Y"), (4, "u4", 0, 0.0, "Y")],
        ["c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment"],
    )
    # counts factorize: type view = 20 per segment, type click = 10 per segment
    rows, eid = [], 0
    for utype, per_seg in [("view", 20), ("click", 10)]:
        for seg_users in [(1, 2), (3, 4)]:
            for i in range(per_seg):
                rows.append(
                    (eid, t0 + dt.timedelta(minutes=eid), seg_users[i % 2], utype, 1.0, "")
                )
                eid += 1
    ev = spark.createDataFrame(
        rows, ["event_id", "ts", "user_id", "event_type", "value", "props"]
    )
    out_dir = str(tmp_path / "sf")
    ev.write.parquet(out_dir + "/events.parquet")
    cust.write.parquet(out_dir + "/customer.parquet")

    (r,) = QUERIES["q124_chi_square"].fn(spark, out_dir).collect()
    assert r.n_obs == 60
    assert r.dof == 1
    assert r.chi2 == 0.0  # o == r*c/g exactly in every cell


# ---------------------------------------------------------------------------
# q125 — imputation restores the group sum exactly
# ---------------------------------------------------------------------------
def test_impute_filled_sum(spark, sf_dir):
    from docling_api_spark.tables import load_table

    rows = {r.event_type: r for r in QUERIES["q125_impute_group_mean"].fn(spark, sf_dir).collect()}
    ev = load_table(spark, sf_dir, "events")
    for r in rows.values():
        assert r.n_imputed > 0  # the mask actually fired
        assert r.n_total > r.n_imputed
    # filled_sum == observed_sum + n_imputed * group_mean (exact decimal math)
    obs = {
        r.event_type: (r.s, r.c)
        for r in ev.where(F.col("event_id") % 13 != 0)
        .groupBy("event_type")
        .agg(
            F.sum(F.col("value").cast("decimal(28,6)")).cast("double").alias("s"),
            F.count(F.lit(1)).alias("c"),
        )
        .collect()
    }
    for et, r in rows.items():
        s, c = obs[et]
        # each imputed value is DECIMAL(28,6)-quantized: up to 5e-7 per row
        assert abs(r.filled_sum - (s + r.n_imputed * (s / c))) < 1e-6 * r.n_imputed + 1e-9


# ---------------------------------------------------------------------------
# q126 — skyline prune keeps all true Pareto points on a constructed set
# ---------------------------------------------------------------------------
def test_skyline_constructed(spark, tmp_path):
    rows = [
        # (partkey, price, size): front = {(1, 900.0, 30), (2, 950.0, 10), (3, 990.0, 5)}
        (1, 900.0, 30),
        (2, 950.0, 10),
        (3, 990.0, 5),
        (4, 900.0, 40),   # dominated by 1 (same price, bigger size)
        (5, 960.0, 10),   # dominated by 2
        (6, 990.0, 5),    # duplicate of 3: NOT dominated (no strict edge) → in front
        (7, 999.0, 50),   # dominated by everything
    ]
    df = spark.createDataFrame(rows, ["p_partkey", "p_retailprice", "p_size"])
    df = df.withColumn("p_name", F.lit("x")).withColumn("p_brand", F.lit("b")).withColumn(
        "p_type", F.lit("t")
    )
    out_dir = str(tmp_path / "sf")
    df.write.parquet(out_dir + "/part.parquet")

    got = {r.p_partkey for r in QUERIES["q126_skyline"].fn(spark, out_dir).collect()}
    assert got == {1, 2, 3, 6}


# ---------------------------------------------------------------------------
# q127 — regression recovers an exact injected linear trend
# ---------------------------------------------------------------------------
def test_regression_recovers_line(spark, tmp_path):
    import datetime as dt

    t0 = dt.datetime(2024, 1, 1)
    rows = []
    # value = 10.00 + 0.25 * day  (exact in cents: 1000 + 25*day)
    for day in range(30):
        rows.append((day, t0 + dt.timedelta(days=day), 1, "view", 10.0 + 0.25 * day, ""))
    df = spark.createDataFrame(
        rows, ["event_id", "ts", "user_id", "event_type", "value", "props"]
    )
    out_dir = str(tmp_path / "sf")
    df.write.parquet(out_dir + "/events.parquet")

    (r,) = QUERIES["q127_group_regression"].fn(spark, out_dir).collect()
    assert r.n == 30
    assert abs(r.slope_cents_per_day - 25.0) < 1e-9
    # intercept at day 0 of the x axis (days since 1970) — recompute directly
    x0 = (dt.date(2024, 1, 1) - dt.date(1970, 1, 1)).days
    assert abs((r.intercept_cents + r.slope_cents_per_day * x0) - 1000.0) < 1e-6


# ---------------------------------------------------------------------------
# q137 — foreachBatch upsert: latest-batch-wins across REAL multiple batches
# ---------------------------------------------------------------------------
def test_stream_upsert_latest_wins_across_batches(spark, tmp_path):
    """Two files forced into two micro-batches (maxFilesPerTrigger=1): the
    snapshot must hold each user's cumulative aggregate from the LAST
    batch that touched it, not an append of both emissions."""
    from docling_api_spark.streaming.jobs import drain_stream_upsert

    d = tmp_path / "landing"
    d.mkdir()
    spark.createDataFrame(
        [(1, 100), (2, 200)], ["user_id", "cents"]
    ).coalesce(1).write.parquet(str(d / "f1.parquet"))
    spark.createDataFrame(
        [(1, 50)], ["user_id", "cents"]
    ).coalesce(1).write.parquet(str(d / "f2.parquet"))

    stream = (
        spark.readStream.schema("user_id long, cents long")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(d) + "/*")
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n_events"), F.sum("cents").alias("total_cents"))
    )
    snap = drain_stream_upsert(stream, keys=["user_id"], prefix="upsert_test")
    got = {(r.user_id, r.n_events, r.total_cents) for r in snap.collect()}
    # user 1 was updated in a later batch: cumulative (2, 150), one row only
    assert got == {(1, 2, 150), (2, 1, 200)}


# ---------------------------------------------------------------------------
# q138 — SCD2 probe: boundary containment on a constructed stream
# ---------------------------------------------------------------------------
def test_scd2_point_in_time_boundaries(spark, tmp_path):
    import datetime as dt

    t0 = dt.datetime(2024, 1, 1)

    def ts(minutes):
        return t0 + dt.timedelta(minutes=minutes)

    rows = [
        # u1 states: view-run [0, 10), click-run [10, open)
        (1, ts(0), 1, "view", 1.0, ""),
        (2, ts(10), 1, "click", 1.0, ""),
        # purchases: before any state (dropped), exactly at a boundary
        # (belongs to the NEW state), inside the open tail
        (3, ts(0) - dt.timedelta(minutes=5), 1, "purchase", 1.0, ""),
        (4, ts(10), 1, "purchase", 1.0, ""),
        (5, ts(60), 1, "purchase", 1.0, ""),
        # also: purchase exactly at the FIRST state's start → matches it
        (6, ts(0), 1, "purchase", 1.0, ""),
    ]
    df = spark.createDataFrame(
        rows, ["event_id", "ts", "user_id", "event_type", "value", "props"]
    )
    out_dir = str(tmp_path / "sf")
    df.write.parquet(out_dir + "/events.parquet")

    got = {
        (r.purchase_id, r.state)
        for r in QUERIES["q138_scd2_point_in_time"].fn(spark, out_dir).collect()
    }
    assert got == {(4, "click"), (5, "click"), (6, "view")}  # 3 dropped


# ---------------------------------------------------------------------------
# q139 — TF-IDF cosine: near-identical docs pair up, unrelated don't
# ---------------------------------------------------------------------------
def test_tfidf_cosine_constructed(spark, tmp_path):
    rows = [
        (1, "zebra quokka narwhal axolotl pangolin", "en", "a", 10),
        (2, "zebra quokka narwhal axolotl wombat", "en", "a", 10),  # 4/5 shared
        (3, "gamma delta epsilon zeta eta", "en", "b", 10),  # disjoint
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text", "lang", "source", "n_chars"])
    out_dir = str(tmp_path / "sf")
    df.write.parquet(out_dir + "/documents.parquet")

    got = {
        (r.doc_a, r.doc_b): r.cosine
        for r in QUERIES["q139_tfidf_cosine_pairs"].fn(spark, out_dir).collect()
    }
    assert set(got) == {(1, 2)}
    assert 0.5 <= got[(1, 2)] < 1.0  # high but not identical
