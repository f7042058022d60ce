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


def test_q194_kmeans_matches_numpy(spark, sf_dir):
    from docling_api_spark.operators.similarity import (
        KM_ITERS,
        KM_K,
        KM_OFF,
        KM_SCALE,
    )

    emb = {
        r.vec_id: np.array(
            [int(round(float(x) * KM_SCALE)) + KM_OFF for x in r.embedding],
            dtype=object,  # python ints: exact
        )
        for r in load_table(spark, sf_dir, "embeddings").collect()
    }
    cents = [emb[j].copy() for j in range(KM_K)]
    assign = {}
    for it in range(KM_ITERS):
        assign = {}
        for vid, v in emb.items():
            d2s = [(int(((v - c) ** 2).sum()), j) for j, c in enumerate(cents)]
            d2, j = min(d2s)
            assign[vid] = (j, d2)
        if it < KM_ITERS - 1:
            for j in range(KM_K):
                members = [emb[v] for v, (c, _) in assign.items() if c == j]
                if members:
                    s = np.sum(members, axis=0)
                    cents[j] = np.array(
                        [int(x) // len(members) for x in s], dtype=object
                    )
    got = {
        r.vec_id: (r.cluster, r.d2)
        for r in QS["q194_kmeans_lloyd"].fn(spark, sf_dir).collect()
    }
    assert got == assign


def _ntile10(pairs):
    """SQL NTILE(10) over rows already sorted: first (n % 10) buckets get
    one extra row."""
    n = len(pairs)
    base, extra = n // 10, n % 10
    out, idx = {}, 0
    for b in range(1, 11):
        size = base + (1 if b <= extra else 0)
        for _ in range(size):
            if idx < n:
                out[pairs[idx]] = b
                idx += 1
    return out


def test_q195_decile_migration_matches_brute_force(spark, sf_dir):
    rows = _orders(spark, sf_dir)
    y_max = max(d.year for _, _, d, _ in rows)
    y1 = y_max - 2
    spend = defaultdict(int)
    for ck, _, d, cents in rows:
        if d.year in (y1, y1 + 1):
            spend[(ck, d.year)] += cents
    deciles = {}
    for y in (y1, y1 + 1):
        pairs = sorted(
            (cents, ck) for (ck, yy), cents in spend.items() if yy == y
        )
        deciles[y] = {
            ck: b for (cents, ck), b in _ntile10(pairs).items()
        }
    expect = defaultdict(int)
    for ck, d_from in deciles[y1].items():
        d_to = deciles[y1 + 1].get(ck)
        if d_to is not None:
            expect[(d_from, d_to)] += 1
    got = {
        (r.decile_from, r.decile_to): r.n_customers
        for r in QS["q195_decile_migration"].fn(spark, sf_dir).collect()
    }
    assert got == dict(expect)


def _brute_bm25(spark, sf_dir):
    from docling_api_spark.operators.textstats import BM25_TERMS

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text").collect()
    toks = {r.doc_id: r.text.split(" ") for r in docs}
    n_docs = len(toks)
    total_len = sum(len(t) for t in toks.values())
    tf = defaultdict(dict)
    for did, t in toks.items():
        for term in BM25_TERMS:
            c = t.count(term)
            if c:
                tf[term][did] = c
    scores = defaultdict(float)
    for term in BM25_TERMS:
        df = len(tf[term])
        for did, f in tf[term].items():
            dl = len(toks[did])
            idf = (2 * n_docs - 2 * df + 1) / (2 * df + 1)
            scores[did] += (
                idf * (f * 2.2)
                / (f + 1.2 * (0.25 + 0.75 * (dl * n_docs) / total_len))
            )
    ranked = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))
    return {did: (i + 1, s) for i, (did, s) in enumerate(ranked)}


def test_q197_bm25_matches_brute_force(spark, sf_dir):
    from docling_api_spark.operators.textstats import BM25_TOPK

    brute = _brute_bm25(spark, sf_dir)
    got = {
        r.doc_id: (r.rk, r.score)
        for r in QS["q197_bm25_scoring"].fn(spark, sf_dir).collect()
    }
    expect = {d: v for d, v in brute.items() if v[0] <= BM25_TOPK}
    assert set(got) == set(expect)
    for d, (rk, s) in expect.items():
        assert got[d][0] == rk
        assert abs(got[d][1] - s) < 1e-9


def test_q196_rrf_matches_brute_force(spark, sf_dir):
    import math

    from docling_api_spark.operators.textstats import (
        RRF_K,
        RRF_POOL,
        RRF_TOPK,
    )

    emb = {
        r.vec_id: np.array([float(x) for x in r.embedding])
        for r in load_table(spark, sf_dir, "embeddings").collect()
    }
    q = emb[0]
    qn = math.sqrt(float((q * q).sum()))
    cos = {
        vid: float((v * q).sum()) / (math.sqrt(float((v * v).sum())) * qn)
        for vid, v in emb.items()
        if vid != 0
    }
    dense_rk = {
        vid: i + 1
        for i, (vid, _) in enumerate(
            sorted(cos.items(), key=lambda kv: (-kv[1], kv[0]))
        )
        if i < RRF_POOL
    }
    sparse_rk = {
        d: rk for d, (rk, _) in _brute_bm25(spark, sf_dir).items() if rk <= RRF_POOL
    }
    fused = {}
    for d in set(dense_rk) | set(sparse_rk):
        rrf = 0.0
        if d in dense_rk:
            rrf += 1.0 / (RRF_K + dense_rk[d])
        if d in sparse_rk:
            rrf += 1.0 / (RRF_K + sparse_rk[d])
        fused[d] = rrf
    top = sorted(fused.items(), key=lambda kv: (-kv[1], kv[0]))[:RRF_TOPK]
    expect = {
        d: (dense_rk.get(d), sparse_rk.get(d), i + 1)
        for i, (d, _) in enumerate(top)
    }
    got = {
        r.doc_id: (r.dense_rk, r.sparse_rk, r.rn)
        for r in QS["q196_hybrid_rank_fusion"].fn(spark, sf_dir).collect()
    }
    assert got == expect


def test_q198_ancestor_rollup_matches_brute_force(spark, sf_dir):
    from docling_api_spark.operators.analytics import AR_DEPTH

    spend = defaultdict(int)
    for ck, _, _, cents in _orders(spark, sf_dir):
        spend[ck] += cents
    expect = {}
    for node, cents in spend.items():
        for j in range(AR_DEPTH + 1):
            anc = node >> j
            if anc >= 1:
                n, s, d = expect.get(anc, (0, 0, 0))
                expect[anc] = (n + 1, s + cents, max(d, j))
    got = {
        r.ancestor: (r.n_contributors, r.subtree_cents, r.deepest_level)
        for r in QS["q198_ancestor_rollup"].fn(spark, sf_dir).collect()
    }
    assert got == expect


def test_q199_item_item_cf_matches_brute_force(spark, sf_dir):
    import math

    from docling_api_spark.operators.analytics import CF_MIN_CO, CF_TOPK

    rows = (
        load_table(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_partkey")
        .distinct()
        .collect()
    )
    orders_of = defaultdict(set)
    for r in rows:
        orders_of[r.l_partkey].add(r.l_orderkey)
    by_order = defaultdict(set)
    for r in rows:
        by_order[r.l_orderkey].add(r.l_partkey)
    co = defaultdict(int)
    for parts in by_order.values():
        ps = sorted(parts)
        for ii, p1 in enumerate(ps):
            for p2 in ps[ii + 1:]:
                co[(p1, p2)] += 1
    cands = defaultdict(list)
    for (p1, p2), c in co.items():
        if c >= CF_MIN_CO:
            cos = c / math.sqrt(len(orders_of[p1]) * len(orders_of[p2]))
            cands[p1].append((cos, p2, c))
            cands[p2].append((cos, p1, c))
    expect = {}
    for item, lst in cands.items():
        lst.sort(key=lambda t: (-t[0], t[1]))
        for rk, (cos, nb, c) in enumerate(lst[:CF_TOPK], 1):
            expect[(item, rk)] = (nb, cos, c)
    got = {
        (r.item, r.rk): (r.neighbor, r.cosine, r.co_orders)
        for r in QS["q199_item_item_cf"].fn(spark, sf_dir).collect()
    }
    assert got == expect


def test_q200_kwic_matches_brute_force(spark, sf_dir):
    from docling_api_spark.operators.textstats import (
        KWIC_AFTER,
        KWIC_BEFORE,
    )

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text").collect()
    expect = {}
    for r in docs:
        t = r.text.split(" ")
        for i in range(len(t) - 1):
            if t[i] == PHRASE[0] and t[i + 1] == PHRASE[1]:
                pos = i + 1  # 1-based
                lo = max(pos - KWIC_BEFORE, 1)
                hi = min(pos + KWIC_AFTER, len(t))
                expect[(r.doc_id, pos)] = " ".join(t[lo - 1:hi])
    got = {
        (r.doc_id, r.pos): r.snippet
        for r in QS["q200_kwic_snippets"].fn(spark, sf_dir).collect()
    }
    assert got == expect
    assert got


def _allen(s1, e1, s2, e2):
    if e1 < s2:
        return "before"
    if e1 == s2:
        return "meets"
    if s1 < s2 and e1 > s2 and e1 < e2:
        return "overlaps"
    if s1 == s2 and e1 < e2:
        return "starts"
    if s1 > s2 and e1 < e2:
        return "during"
    if s1 > s2 and e1 == e2:
        return "finishes"
    if s1 == s2 and e1 == e2:
        return "equals"
    if s1 < s2 and e1 == e2:
        return "finished_by"
    if s1 < s2 and e1 > e2:
        return "contains"
    if s1 == s2 and e1 > e2:
        return "started_by"
    if s1 > s2 and s1 < e2 and e1 > e2:
        return "overlapped_by"
    if s1 == e2:
        return "met_by"
    return "after"


def test_q201_allen_matches_brute_force(spark, sf_dir):
    rows = (
        load_table(spark, sf_dir, "events")
        .select("user_id", "event_type", F.unix_micros("ts").alias("us"))
        .collect()
    )
    spans = {}
    for r in rows:
        k = (r.user_id, r.event_type)
        s, e = spans.get(k, (r.us, r.us))
        spans[k] = (min(s, r.us), max(e, r.us))
    by_user = defaultdict(dict)
    for (u, t), se in spans.items():
        by_user[u][t] = se
    expect = defaultdict(int)
    for u, types in by_user.items():
        ts = sorted(types)
        for ii, ta in enumerate(ts):
            for tb in ts[ii + 1:]:
                s1, e1 = types[ta]
                s2, e2 = types[tb]
                expect[(ta, tb, _allen(s1, e1, s2, e2))] += 1
    got = {
        (r.type_a, r.type_b, r.relation): r.n_users
        for r in QS["q201_allen_relations"].fn(spark, sf_dir).collect()
    }
    assert got == dict(expect)


def test_q202_bpe_encode_matches_brute_force(spark, sf_dir):
    docs = (
        load_table(spark, sf_dir, "documents")
        .select("source", "text")
        .collect()
    )
    wf = defaultdict(int)
    for r in docs:
        for w in r.text.split(" "):
            if w:
                wf[w] += 1
    # re-train brute-force BPE, then token count per word
    vocab = {w: list(w) for w in wf}
    for _, pair, merged, _ in _brute_bpe(wf, BPE_ROUNDS):
        a, b = pair.split(" ")
        for w, toks in vocab.items():
            out, i = [], 0
            while i < len(toks):
                if i + 1 < len(toks) and toks[i] == a and toks[i + 1] == b:
                    out.append(merged)
                    i += 2
                else:
                    out.append(toks[i])
                    i += 1
            vocab[w] = out
    agg = defaultdict(lambda: [0, 0, 0])
    for r in docs:
        for w in r.text.split(" "):
            if w:
                a = agg[r.source]
                a[0] += 1
                a[1] += len(w)
                a[2] += len(vocab[w])
    expect = {
        src: (n, ch, tk, ch / tk) for src, (n, ch, tk) in agg.items()
    }
    got = {
        r.source: (r.n_words, r.n_chars, r.n_tokens, r.chars_per_token)
        for r in QS["q202_bpe_encode"].fn(spark, sf_dir).collect()
    }
    assert got == expect


def test_q203_negative_sampling_matches_brute_force(spark, sf_dir):
    from docling_api_spark.operators.sampling import NEG_A, NEG_B, NEG_K

    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    pos = {
        (r.o_custkey, r.l_partkey)
        for r in o.join(li, F.col("o_orderkey") == F.col("l_orderkey"))
        .select("o_custkey", "l_partkey")
        .distinct()
        .collect()
    }
    n_items = (
        load_table(spark, sf_dir, "part").agg(F.max("p_partkey")).collect()[0][0]
    )
    expect = set()
    for u in {u for u, _ in pos}:
        for j in range(1, NEG_K + 1):
            item = (u * NEG_A + j * NEG_B) % n_items + 1
            if (u, item) not in pos:
                expect.add((u, item, j))
    got = {
        (r.user_id, r.neg_item, r.draw)
        for r in QS["q203_negative_sampling"].fn(spark, sf_dir).collect()
    }
    assert got == expect
    assert got


def test_q204_gram_matches_numpy(spark, sf_dir):
    from docling_api_spark.operators.similarity import GRAM_SCALE

    X = np.array(
        [
            [int(round(float(v) * GRAM_SCALE)) for v in r.embedding]
            for r in load_table(spark, sf_dir, "embeddings").collect()
        ],
        dtype=np.int64,
    )
    G = X.T @ X
    got = {
        (r.i, r.j): r.g
        for r in QS["q204_gram_matrix"].fn(spark, sf_dir).collect()
    }
    expect = {
        (i + 1, j + 1): int(G[i, j])
        for i in range(X.shape[1])
        for j in range(i, X.shape[1])
    }
    assert got == expect


def test_q205_mahalanobis_matches_numpy(spark, sf_dir):
    from docling_api_spark.operators.analytics import MAHA_TOPK

    rows = (
        load_table(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_linenumber", "l_returnflag",
                "l_quantity", "l_extendedprice")
        .collect()
    )
    by_flag = defaultdict(list)
    for r in rows:
        by_flag[r.l_returnflag].append(
            (r.l_orderkey, r.l_linenumber,
             round(r.l_quantity * 100), round(r.l_extendedprice * 100))
        )
    expect = {}
    for flag, pts in by_flag.items():
        if len(pts) < 3:
            continue
        X = np.array([(x, y) for _, _, x, y in pts], dtype=float)
        mu = X.mean(axis=0)
        C = np.cov(X.T, ddof=1)
        Ci = np.linalg.inv(C)
        d = X - mu
        d2 = (d @ Ci * d).sum(axis=1)
        order = sorted(
            range(len(pts)), key=lambda i: (-d2[i], pts[i][0], pts[i][1])
        )
        for rk, i in enumerate(order[:MAHA_TOPK], 1):
            expect[(flag, rk)] = (pts[i][0], pts[i][1], d2[i])
    got = {
        (r.l_returnflag, r.rk): (r.l_orderkey, r.l_linenumber, r.d2)
        for r in QS["q205_mahalanobis_outliers"].fn(spark, sf_dir).collect()
    }
    assert set(got) == set(expect)
    for k, (ok, ln, d2) in expect.items():
        assert got[k][0] == ok and got[k][1] == ln
        assert abs(got[k][2] - d2) < 1e-6


def test_q206_gdpr_cascade_matches_brute_force(spark, sf_dir):
    from docling_api_spark.operators.quality import GDPR_MOD

    ev = load_table(spark, sf_dir, "events").select("user_id").collect()
    del_keys = {r.user_id for r in ev if r.user_id % GDPR_MOD == 0}
    orders = _orders(spark, sf_dir)
    o_by_key = {ok: ck for ck, ok, _, _ in orders}
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey").collect()
    custs = [
        r.c_custkey
        for r in load_table(spark, sf_dir, "customer").select("c_custkey").collect()
    ]
    ev_rows = [r.user_id for r in ev if r.user_id in del_keys]
    o_rows = [(ck, ok) for ck, ok, _, _ in orders if ck in del_keys]
    li_rows = [
        r.l_orderkey for r in li if o_by_key.get(r.l_orderkey) in del_keys
    ]
    expect = {
        "events": (len(ev_rows), len(set(ev_rows))),
        "orders": (len(o_rows), len({ck for ck, _ in o_rows})),
        "lineitem": (len(li_rows), len({o_by_key[ok] for ok in li_rows})),
        "customer": (
            sum(1 for ck in custs if ck in del_keys),
            len({ck for ck in custs if ck in del_keys}),
        ),
    }
    got = {
        r.table_name: (r.n_rows_to_purge, r.n_keys_matched)
        for r in QS["q206_gdpr_cascade"].fn(spark, sf_dir).collect()
    }
    assert got == expect
    assert got["events"][0] > 0


def test_q207_decayed_leaderboard_matches_brute_force(spark, sf_dir):
    from docling_api_spark.operators.timeseries import (
        DECAY_HALFLIFE_D,
        DECAY_TOPK,
        DECAY_UNIT,
    )

    rows = (
        load_table(spark, sf_dir, "events")
        .where(F.col("event_type") == "purchase")
        .select(F.col("ts").cast("date").alias("d"), "user_id")
        .collect()
    )
    today = max(r.d for r in rows)
    score = defaultdict(lambda: [0, 0])
    for r in rows:
        age = (today - r.d).days
        wt = DECAY_UNIT >> min(age // DECAY_HALFLIFE_D, 62)
        score[r.user_id][0] += wt
        score[r.user_id][1] += 1
    ranked = sorted(score.items(), key=lambda kv: (-kv[1][0], kv[0]))
    expect = {
        u: (s, n, rk) for rk, (u, (s, n)) in enumerate(ranked[:DECAY_TOPK], 1)
    }
    got = {
        r.user_id: (r.decayed_score, r.n_events, r.rk)
        for r in QS["q207_decayed_leaderboard"].fn(spark, sf_dir).collect()
    }
    assert got == expect


def test_q208_entity_resolution_matches_brute_force(spark, sf_dir):
    from docling_api_spark.operators.entity import LEV_MAX

    def lev(a, b):
        if abs(len(a) - len(b)) > LEV_MAX:
            return LEV_MAX + 1
        prev = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            cur = [i]
            for j, cb in enumerate(b, 1):
                cur.append(min(prev[j] + 1, cur[j - 1] + 1,
                               prev[j - 1] + (ca != cb)))
            prev = cur
        return prev[-1]

    support = defaultdict(int)
    for r in load_table(spark, sf_dir, "part").select("p_name").collect():
        support[r.p_name] += 1
    names = sorted(support)
    adj = defaultdict(set)
    by_block = defaultdict(list)
    for n in names:
        by_block[n.split(" ")[0]].append(n)
    for blk in by_block.values():
        for i, a in enumerate(blk):
            for b in blk[i + 1:]:
                if a < b and 0 < lev(a, b) <= LEV_MAX:
                    adj[a].add(b)
                    adj[b].add(a)
    seen, expect = set(), {}
    for n in names:
        if n in seen or n not in adj:
            continue
        comp, stack = set(), [n]
        while stack:
            x = stack.pop()
            if x in comp:
                continue
            comp.add(x)
            stack.extend(adj[x] - comp)
        seen |= comp
        eid = min(comp)
        canonical = sorted(comp, key=lambda m: (-support[m], m))[0]
        expect[eid] = (
            len(comp), sum(support[m] for m in comp), canonical
        )
    got = {
        r.entity_id: (r.n_members, r.total_support, r.canonical_name)
        for r in QS["q208_entity_resolution"].fn(spark, sf_dir).collect()
    }
    assert got == expect
    assert got


def test_q210_calibration_matches_brute_force(spark, sf_dir):
    from docling_api_spark.operators.analytics import CAL_BUCKETS

    orders = _orders(spark, sf_dir)
    y1 = max(d.year for _, _, d, _ in orders) - 1
    actives = {ck for ck, _, d, _ in orders if d.year == y1}
    custs = sorted(
        (r.c_acctbal, r.c_custkey)
        for r in load_table(spark, sf_dir, "customer")
        .select("c_custkey", "c_acctbal")
        .collect()
    )
    nm1 = len(custs) - 1
    agg = defaultdict(lambda: [0, 0, 0])  # n, sum_r, positives
    for r, (_, ck) in enumerate(custs):
        b = min(r * CAL_BUCKETS // nm1, CAL_BUCKETS - 1)
        agg[b][0] += 1
        agg[b][1] += r
        agg[b][2] += 1 if ck in actives else 0
    expect = {
        b: (n, sr / (nm1 * n), pos / n) for b, (n, sr, pos) in agg.items()
    }
    got = {
        r.bucket: (r.n_customers, r.mean_score, r.empirical_rate)
        for r in QS["q210_calibration_curve"].fn(spark, sf_dir).collect()
    }
    assert set(got) == set(expect)
    for b, (n, ms, er) in expect.items():
        assert got[b][0] == n
        assert abs(got[b][1] - ms) < 1e-12
        assert got[b][2] == er


def test_q211_rake_matches_brute_force(spark, sf_dir):
    from docling_api_spark.operators.textstats import RAKE_STOP, RAKE_TOPK

    docs = load_table(spark, sf_dir, "documents").select("text").collect()
    phrases = []
    for r in docs:
        run = []
        for tok in [t for t in r.text.split(" ") if t]:
            if tok in RAKE_STOP:
                if run:
                    phrases.append(run)
                run = []
            else:
                run.append(tok)
        if run:
            phrases.append(run)
    freq, deg = defaultdict(int), defaultdict(int)
    for p in phrases:
        for w in p:
            freq[w] += 1
            deg[w] += len(p)
    occ = defaultdict(int)
    for p in phrases:
        occ[" ".join(p)] += 1
    scored = []
    for phrase, n in occ.items():
        words = phrase.split(" ")
        score = 0.0
        for w in words:
            score += deg[w] / freq[w]
        scored.append((phrase, len(words), n, score))
    scored.sort(key=lambda t: (-t[3], t[0]))
    expect = {
        p: (nw, n, s, rk)
        for rk, (p, nw, n, s) in enumerate(scored[:RAKE_TOPK], 1)
    }
    got = {
        r.phrase: (r.n_words, r.n_occurrences, r.score, r.rk)
        for r in QS["q211_rake_keyphrases"].fn(spark, sf_dir).collect()
    }
    assert set(got) == set(expect)
    for p, (nw, n, s, rk) in expect.items():
        assert got[p][0] == nw and got[p][1] == n and got[p][3] == rk
        assert abs(got[p][2] - s) < 1e-9


def test_q212_modularity_matches_brute_force(spark, sf_dir):
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    pairs = {
        (r.o_custkey, r.l_suppkey)
        for r in o.join(li, F.col("o_orderkey") == F.col("l_orderkey"))
        .select("o_custkey", "l_suppkey")
        .collect()
    }
    nations = {
        r.n_nationkey: r.n_name
        for r in load_table(spark, sf_dir, "nation").collect()
    }
    c_nat = {
        r.c_custkey: nations[r.c_nationkey]
        for r in load_table(spark, sf_dir, "customer").collect()
    }
    s_nat = {
        r.s_suppkey: nations[r.s_nationkey]
        for r in load_table(spark, sf_dir, "supplier").collect()
    }
    m = len(pairs)
    deg, ein = defaultdict(int), defaultdict(int)
    for c, s in pairs:
        deg[c_nat[c]] += 1
        deg[s_nat[s]] += 1
        if c_nat[c] == s_nat[s]:
            ein[c_nat[c]] += 1
    total_num = sum(4 * m * ein[nat] - deg[nat] ** 2 for nat in deg)
    q = total_num / (4.0 * m * m)
    # sanity: matches the textbook Sigma (e/m - (d/2m)^2) within float eps
    q_text = sum(
        ein[nat] / m - (deg[nat] / (2 * m)) ** 2 for nat in deg
    )
    assert abs(q - q_text) < 1e-12
    got = {
        r.community: (r.e_in, r.degree_sum, r.contrib_num, r.modularity)
        for r in QS["q212_nation_modularity"].fn(spark, sf_dir).collect()
    }
    assert set(got) == set(deg)
    for nat in deg:
        assert got[nat][0] == ein[nat]
        assert got[nat][1] == deg[nat]
        assert got[nat][2] == 4 * m * ein[nat] - deg[nat] ** 2
        assert got[nat][3] == q


def test_q213_churn_features_matches_brute_force(spark, sf_dir):
    from docling_api_spark.operators.datapipe import FEAT_LABEL_DAYS

    orders = _orders(spark, sf_dir)
    prio = {
        (r.o_orderkey): r.o_orderpriority
        for r in load_table(spark, sf_dir, "orders")
        .select("o_orderkey", "o_orderpriority")
        .collect()
    }
    cutoff = max(d for _, _, d, _ in orders) - dt.timedelta(
        days=FEAT_LABEL_DAYS
    )
    hist = defaultdict(list)
    fut = set()
    for ck, ok, d, cents in orders:
        if d <= cutoff:
            hist[ck].append((d, cents, prio[ok]))
        else:
            fut.add(ck)
    expect = {}
    for ck, rows in hist.items():
        last = max(d for d, _, _ in rows)
        expect[ck] = (
            (cutoff - last).days,
            len(rows),
            sum(c for _, c, _ in rows),
            len({p for _, _, p in rows}),
            0 if ck in fut else 1,
        )
    got = {
        r.o_custkey: (
            r.recency_days,
            r.frequency,
            r.monetary_cents,
            r.priority_diversity,
            r.churned,
        )
        for r in QS["q213_churn_features"].fn(spark, sf_dir).collect()
    }
    assert got == expect


def test_q214_partition_advisor_matches_brute_force(spark, sf_dir):
    rows = (
        load_table(spark, sf_dir, "orders")
        .select("o_orderdate", "o_orderpriority", "o_orderstatus")
        .collect()
    )
    cands = {
        "order_month": [r.o_orderdate.strftime("%Y-%m") for r in rows],
        "order_priority": [r.o_orderpriority for r in rows],
        "order_status": [r.o_orderstatus for r in rows],
    }
    expect = {}
    for key, parts in cands.items():
        counts = defaultdict(int)
        for p in parts:
            counts[p] += 1
        n_parts, n_rows = len(counts), len(parts)
        mx, mn = max(counts.values()), min(counts.values())
        expect[key] = (n_parts, n_rows, mx, mx * n_parts / n_rows, mn)
    got = {
        r.candidate_key: (
            r.n_partitions,
            r.n_rows,
            r.max_partition_rows,
            r.skew_ratio,
            r.min_partition_rows,
        )
        for r in QS["q214_partition_advisor"].fn(spark, sf_dir).collect()
    }
    assert set(got) == set(expect)
    for k, (np_, nr, mx, sk, mn) in expect.items():
        assert got[k][0] == np_ and got[k][1] == nr
        assert got[k][2] == mx and got[k][4] == mn
        assert abs(got[k][3] - sk) < 1e-12
