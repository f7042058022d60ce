"""Brute-force cross-checks for the round-4c operator classes
(q186-q193): each statistic/traversal recomputed by an independent
pure-Python/numpy path on the SAME rows must agree. The DuckDB oracle
certifies engine agreement; these certify the math and the semantics."""

from __future__ import annotations

import datetime as dt
from collections import defaultdict

import numpy as np
from pyspark.sql import functions as F

from docling_api_spark.operators.graphops import SP_ROUNDS, SP_SEED_MOD
from docling_api_spark.operators.spatial import CELL
from docling_api_spark.operators.textstats import BPE_ROUNDS, PHRASE
from docling_api_spark.operators.timeseries import EWMA_H, ROLL_W
from docling_api_spark.plans import all_queries
from docling_api_spark.tables import load_table

QS = all_queries()


def _orders(spark, sf_dir):
    return [
        (r.o_custkey, r.o_orderkey, r.o_orderdate, round(r.o_totalprice * 100))
        for r in load_table(spark, sf_dir, "orders")
        .select("o_custkey", "o_orderkey", "o_orderdate", "o_totalprice")
        .collect()
    ]


def test_q187_ewma_matches_brute_force(spark, sf_dir):
    per_cust = defaultdict(list)
    for ck, ok, od, cents in _orders(spark, sf_dir):
        per_cust[ck].append((od, ok, cents))
    expect = {}
    for ck, rows in per_cust.items():
        rows.sort(key=lambda t: (t[0], t[1]), reverse=True)
        recent = rows[:EWMA_H]
        num = sum(c * (1 << (EWMA_H - 1 - i)) for i, (_, _, c) in enumerate(recent))
        den = sum(1 << (EWMA_H - 1 - i) for i in range(len(recent)))
        expect[ck] = (len(recent), num / den)
    got = {
        r.o_custkey: (r.n_used, r.ewma_cents)
        for r in QS["q187_ewma_smoothing"].fn(spark, sf_dir).collect()
    }
    assert set(got) == set(expect)
    for ck, (n, e) in expect.items():
        assert got[ck][0] == n
        assert got[ck][1] == e  # exact: both sides are num/den of exact ints


def test_q188_autocorr_matches_numpy(spark, sf_dir):
    rows = (
        load_table(spark, sf_dir, "orders")
        .join(load_table(spark, sf_dir, "customer"),
              F.col("o_custkey") == F.col("c_custkey"))
        .join(load_table(spark, sf_dir, "nation"),
              F.col("c_nationkey") == F.col("n_nationkey"))
        .select("n_name", F.col("o_orderdate").cast("date").alias("day"),
                "o_totalprice")
        .collect()
    )
    daily = defaultdict(lambda: defaultdict(int))
    for r in rows:
        daily[r.n_name][r.day] += round(r.o_totalprice * 100)
    expect = {}
    for nat, series in daily.items():
        vals = [series[d] for d in sorted(series)]
        x, y = np.array(vals[:-1], dtype=float), np.array(vals[1:], dtype=float)
        if len(x) >= 3:
            expect[nat] = (len(x), float(np.corrcoef(x, y)[0, 1]))
    got = {
        r.n_name: (r.n_pairs, r.lag1_autocorr)
        for r in QS["q188_lag1_autocorr"].fn(spark, sf_dir).collect()
    }
    assert set(got) == set(expect)
    for nat, (n, r_np) in expect.items():
        assert got[nat][0] == n
        assert abs(got[nat][1] - r_np) < 1e-9


def _brute_bpe(word_freq, rounds):
    vocab = {w: list(w) for w in word_freq}
    merges = []
    for rnd in range(1, rounds + 1):
        counts = defaultdict(int)
        for w, toks in vocab.items():
            for a, b in zip(toks, toks[1:]):
                counts[f"{a} {b}"] += word_freq[w]
        pair = min(counts, key=lambda p: (-counts[p], p))
        a, b = pair.split(" ")
        merges.append((rnd, pair, a + b, counts[pair]))
        for w, toks in vocab.items():
            out, i = [], 0
            while i < len(toks):
                if i + 1 < len(toks) and toks[i] == a and toks[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(toks[i])
                    i += 1
            vocab[w] = out
    return merges


def test_q189_bpe_matches_brute_force(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").select("text").collect()
    wf = defaultdict(int)
    for r in docs:
        for w in r.text.split(" "):
            if w:
                wf[w] += 1
    expect = _brute_bpe(wf, BPE_ROUNDS)
    got = [
        (r.rnd, r.pair, r.merged, r.cnt)
        for r in QS["q189_bpe_merges"].fn(spark, sf_dir).collect()
    ]
    assert sorted(got) == sorted(expect)


def test_q190_phrase_search_matches_brute_force(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text").collect()
    expect = {}
    for r in docs:
        toks = r.text.split(" ")
        n = sum(
            1
            for a, b in zip(toks, toks[1:])
            if a == PHRASE[0] and b == PHRASE[1]
        )
        if n:
            expect[r.doc_id] = n
    got = {
        r.doc_id: r.n_hits
        for r in QS["q190_phrase_search"].fn(spark, sf_dir).collect()
    }
    assert got == expect
    assert got, "phrase must occur in the corpus for the test to bite"


def test_q191_bellman_ford_matches_brute_force(spark, sf_dir):
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    pairs = o.join(li, F.col("o_orderkey") == F.col("l_orderkey")).select(
        "o_custkey", "l_suppkey", "o_orderkey"
    ).collect()
    cnt = defaultdict(set)
    for r in pairs:
        cnt[(f"c{r.o_custkey}", f"s{r.l_suppkey}")].add(r.o_orderkey)
    edges = []
    for (c, s), orders in cnt.items():
        w = 1 + 100 // len(orders)
        edges.append((c, s, w))
        edges.append((s, c, w))
    seeds = {
        f"s{r.s_suppkey}"
        for r in load_table(spark, sf_dir, "supplier")
        .where(F.col("s_suppkey") % SP_SEED_MOD == 0)
        .collect()
    }
    dist = {n: 0 for n in seeds}
    for _ in range(SP_ROUNDS):
        nxt = dict(dist)
        for u, v, w in edges:
            if u in dist and dist[u] + w < nxt.get(v, 1 << 60):
                nxt[v] = dist[u] + w
        dist = nxt
    got = {r.node: r.dist for r in QS["q191_shortest_path"].fn(spark, sf_dir).collect()}
    assert got == dist


def test_q186_geo_grid_matches_brute_force(spark, sf_dir):
    custs = [
        r.c_custkey
        for r in load_table(spark, sf_dir, "customer").select("c_custkey").collect()
    ]
    supps = [
        r.s_suppkey
        for r in load_table(spark, sf_dir, "supplier").select("s_suppkey").collect()
    ]
    spos = [(s, (s * 6101) % 12000, (s * 94907) % 36000) for s in supps]
    expect = {}
    for ck in custs:
        clat, clon = (ck * 7919) % 12000, (ck * 104729) % 36000
        cy, cx = clat // CELL, clon // CELL
        best = None
        for s, slat, slon in spos:
            if abs(slat // CELL - cy) <= 1 and abs(slon // CELL - cx) <= 1:
                d2 = (clat - slat) ** 2 + (clon - slon) ** 2
                if best is None or (d2, s) < best:
                    best = (d2, s)
        if best is not None:
            expect[ck] = (best[1], best[0])
    got = {
        r.c_custkey: (r.nearest_suppkey, r.d2_centideg)
        for r in QS["q186_geo_grid_join"].fn(spark, sf_dir).collect()
    }
    assert got == expect
    assert got, "grid must produce at least one match"


def _monday(d: dt.date) -> dt.date:
    return d - dt.timedelta(days=d.weekday())


def test_q192_wape_matches_brute_force(spark, sf_dir):
    rows = (
        load_table(spark, sf_dir, "orders")
        .join(load_table(spark, sf_dir, "customer"),
              F.col("o_custkey") == F.col("c_custkey"))
        .join(load_table(spark, sf_dir, "nation"),
              F.col("c_nationkey") == F.col("n_nationkey"))
        .select("n_name", F.col("o_orderdate").cast("date").alias("day"),
                "o_totalprice")
        .collect()
    )
    weekly = defaultdict(lambda: defaultdict(int))
    for r in rows:
        weekly[r.n_name][_monday(r.day)] += round(r.o_totalprice * 100)
    expect = {}
    for nat, series in weekly.items():
        num = den = fsum = asum = n = 0
        for wk, actual in series.items():
            prev = series.get(wk - dt.timedelta(days=7))
            if prev is not None:
                n += 1
                num += abs(actual - prev)
                fsum += prev
                asum += actual
        if n:
            expect[nat] = (n, num / asum, (fsum - asum) / asum)
    got = {
        r.n_name: (r.n_weeks_scored, r.wape, r.bias)
        for r in QS["q192_forecast_wape"].fn(spark, sf_dir).collect()
    }
    assert set(got) == set(expect)
    for nat, (n, wape, bias) in expect.items():
        assert got[nat][0] == n
        assert got[nat][1] == wape  # exact int sums, one closing division
        assert got[nat][2] == bias


def test_q193_rolling_distinct_matches_brute_force(spark, sf_dir):
    rows = (
        load_table(spark, sf_dir, "events")
        .select("user_id", F.date_trunc("day", "ts").cast("date").alias("day"))
        .collect()
    )
    user_days = {(r.user_id, r.day) for r in rows}
    max_day = max(d for _, d in user_days)
    cover = defaultdict(set)
    for u, d in user_days:
        for o in range(ROLL_W):
            day = d + dt.timedelta(days=o)
            if day <= max_day:
                cover[day].add(u)
    expect = {d.strftime("%Y-%m-%d"): len(us) for d, us in cover.items()}
    got = {
        r.day: r.users_7d
        for r in QS["q193_rolling_distinct"].fn(spark, sf_dir).collect()
    }
    assert got == expect
