"""Brute-force cross-checks for the round-4d operator classes
(q215-q306): each result recomputed by an independent pure-Python/numpy
path on the SAME rows must agree. The DuckDB oracle certifies engine
agreement; these certify the math and the semantics (notably q215, where
the Spark plan is the Lindley CLOSED FORM and the replay below is the
naive sequential clamp recursion it must equal, and q220, where the
replay also asserts the raked margins actually hit the population
margins — the fixpoint IPF exists to reach)."""

from __future__ import annotations

import math
from collections import defaultdict

import numpy as np
from pyspark.sql import functions as F

from docling_api_spark.operators.analytics import _NDCG_K
from docling_api_spark.operators.timeseries import QUEUE_PUSH
from docling_api_spark.plans import all_queries
from docling_api_spark.tables import load_table

QS = all_queries()


def test_q215_lindley_equals_sequential_clamp(spark, sf_dir):
    ev = (
        load_table(spark, sf_dir, "events")
        .select("user_id", "ts", "event_id", "event_type")
        .collect()
    )
    per_user = defaultdict(list)
    for r in ev:
        per_user[r.user_id].append(
            (r.ts, r.event_id, 1 if r.event_type in QUEUE_PUSH else -1)
        )
    expect = {}
    for uid, rows in per_user.items():
        rows.sort(key=lambda t: (t[0], t[1]))
        d = mx = 0
        for _, _, delta in rows:
            d = max(0, d + delta)  # the non-associative recursion itself
            mx = max(mx, d)
        expect[uid] = (len(rows), mx, d)
    got = {
        r.user_id: (r.n_events, r.max_depth, r.end_depth)
        for r in QS["q215_queue_depth"].fn(spark, sf_dir).collect()
    }
    assert got == expect


def test_q216_pca_matches_numpy_eigh(spark, sf_dir):
    orders = (
        load_table(spark, sf_dir, "orders")
        .select("o_custkey", "o_totalprice")
        .collect()
    )
    f = defaultdict(int)
    m = defaultdict(float)
    for r in orders:
        f[r.o_custkey] += 1
        # mirror the DECIMAL(28,6) per-customer sum: exact in cents-ish units
        m[r.o_custkey] += round(r.o_totalprice, 6)
    x = np.array([float(f[k]) for k in f])
    y = np.array([m[k] for k in f])
    cov = np.cov(np.vstack([x, y]), bias=True)  # population, like the query
    lams, vecs = np.linalg.eigh(cov)
    lam1, lam2 = lams[1], lams[0]
    v1 = vecs[:, 1]
    row = QS["q216_pca2d"].fn(spark, sf_dir).collect()[0]
    assert row.n_customers == len(f)
    assert math.isclose(row.lam1, lam1, rel_tol=1e-9)
    assert math.isclose(row.lam2, lam2, rel_tol=1e-6, abs_tol=1e-6 * lam1)
    assert math.isclose(
        row.explained_ratio, lam1 / (lam1 + lam2), rel_tol=1e-9
    )
    # eigenvector direction up to sign
    dot = abs(row.pc1_f * v1[0] + row.pc1_m * v1[1])
    assert math.isclose(dot, 1.0, rel_tol=1e-9)


def test_q217_hellinger_matches_python(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").select("source", "text").collect()
    st = defaultdict(lambda: defaultdict(int))
    ct = defaultdict(int)
    for r in docs:
        for t in r.text.split(" "):
            st[r.source][t] += 1
            ct[t] += 1
    n = sum(ct.values())
    expect = {}
    for s, terms in st.items():
        ns = sum(terms.values())
        bc = sum(
            math.sqrt((c / ns) * (ct[t] / n)) for t, c in terms.items()
        )
        expect[s] = (ns, bc, math.sqrt(1 - bc))
    got = {
        r.source: (r.n_tokens, r.bhattacharyya, r.hellinger)
        for r in QS["q217_hellinger_drift"].fn(spark, sf_dir).collect()
    }
    assert set(got) == set(expect)
    for s, (ns, bc, h) in expect.items():
        assert got[s][0] == ns
        assert math.isclose(got[s][1], bc, rel_tol=1e-9)
        assert math.isclose(got[s][2], h, rel_tol=1e-6)


def test_q218_ndcg_matches_python(spark, sf_dir):
    sup = (
        load_table(spark, sf_dir, "supplier")
        .select("s_suppkey", "s_nationkey", "s_acctbal")
        .collect()
    )
    li = load_table(spark, sf_dir, "lineitem").select("l_suppkey").collect()
    nat = {
        r.n_nationkey: r.n_name
        for r in load_table(spark, sf_dir, "nation").collect()
    }
    cnt = defaultdict(int)
    for r in li:
        cnt[r.l_suppkey] += 1
    by_nat = defaultdict(list)
    for r in sup:
        by_nat[r.s_nationkey].append(
            (r.s_suppkey, r.s_acctbal, cnt.get(r.s_suppkey, 0))
        )

    def dcg(rels):
        return sum(
            rel / math.log2(i + 2) for i, rel in enumerate(rels[:_NDCG_K])
        )

    expect = {}
    for nk, rows in by_nat.items():
        pred = [rel for _, _, rel in sorted(rows, key=lambda t: (-t[1], t[0]))]
        ideal = [rel for _, _, rel in sorted(rows, key=lambda t: (-t[2], t[0]))]
        d, i = dcg(pred), dcg(ideal)
        expect[nat[nk]] = (d, i, d / i if i > 0 else 0.0)
    got = {
        r.nation: (r.dcg, r.idcg, r.ndcg_at_10)
        for r in QS["q218_ndcg_ranking"].fn(spark, sf_dir).collect()
    }
    assert set(got) == set(expect)
    for nk, (d, i, nd) in expect.items():
        # literal discounts are rounded to 15 digits; DECIMAL sums to 6 —
        # agreement bound is far tighter than any real ranking difference
        assert math.isclose(got[nk][0], d, abs_tol=1e-5)
        assert math.isclose(got[nk][1], i, abs_tol=1e-5)
        assert math.isclose(got[nk][2], nd, abs_tol=1e-8)


def test_q219_haar_matches_python(spark, sf_dir):
    rows = (
        load_table(spark, sf_dir, "orders")
        .select("o_orderdate", "o_totalprice")
        .collect()
    )
    daily = defaultdict(int)
    for r in rows:
        daily[r.o_orderdate.date()] += round(r.o_totalprice * 100)
    d0, d1 = min(daily), max(daily)
    series = [daily.get(d0 + __import__("datetime").timedelta(days=i), 0)
              for i in range((d1 - d0).days + 1)]

    def level(vals):
        out = {}
        for i, v in enumerate(vals):
            b = i // 2
            s, d = out.get(b, (0, 0))
            out[b] = (s + v, d + (v if i % 2 == 0 else -v))
        return out

    l1 = level(series)
    l2 = level([l1[b][0] for b in sorted(l1)])
    expect = {}
    for b, (s, d) in l1.items():
        expect[(1, b)] = (s / 2.0 / 100.0, d / 2.0 / 100.0)
    for b, (s, d) in l2.items():
        expect[(2, b)] = (s / 4.0 / 100.0, d / 4.0 / 100.0)
    got = {
        (r.level, r.bucket): (r.approx_rev, r.detail_rev)
        for r in QS["q219_haar_downsample"].fn(spark, sf_dir).collect()
    }
    assert got == expect  # exact: integer pyramid, exact halving


def test_q220_ipf_matches_python(spark, sf_dir):
    from docling_api_spark.operators.analytics import _IPF_SAMPLE_MOD

    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    rg = load_table(spark, sf_dir, "region")
    rows = (
        o.join(c, o.o_custkey == c.c_custkey)
        .join(n, c.c_nationkey == n.n_nationkey)
        .join(rg, n.n_regionkey == rg.r_regionkey)
        .select("o_orderkey", "o_orderpriority", "r_name")
        .collect()
    )
    cells = defaultdict(float)
    tr = defaultdict(float)
    tp = defaultdict(float)
    for r in rows:
        tr[r.r_name] += 1
        tp[r.o_orderpriority] += 1
        if r.o_orderkey % _IPF_SAMPLE_MOD == 0:
            cells[(r.r_name, r.o_orderpriority)] += 1
    w = dict(cells)
    for _ in range(3):
        rs = defaultdict(float)
        for (rg_, p), v in w.items():
            rs[rg_] += v
        w = {(rg_, p): v * tr[rg_] / rs[rg_] for (rg_, p), v in w.items()}
        ps = defaultdict(float)
        for (rg_, p), v in w.items():
            ps[p] += v
        w = {(rg_, p): v * tp[p] / ps[p] for (rg_, p), v in w.items()}
    got = {
        (r.region, r.priority): (r.n_sample, r.raked_weight, r.expansion_factor)
        for r in QS["q220_raking_ipf"].fn(spark, sf_dir).collect()
    }
    assert set(got) == set(w)
    for key, wv in w.items():
        assert got[key][0] == int(cells[key])
        assert math.isclose(got[key][1], wv, rel_tol=1e-6)
        assert math.isclose(got[key][2], wv / cells[key], rel_tol=1e-6)
    # raked margins actually hit the population margins (the point of IPF)
    for rg_ in tr:
        s = sum(v for (g, _), v in w.items() if g == rg_)
        assert math.isclose(s, tr[rg_], rel_tol=1e-3)


def test_q221_bootstrap_matches_python(spark, sf_dir):
    import hashlib

    from docling_api_spark.operators.analytics import _BOOT_B, _BOOT_CUTS

    rows = (
        load_table(spark, sf_dir, "orders")
        .select("o_orderkey", "o_totalprice")
        .collect()
    )
    cents = [(r.o_orderkey, round(r.o_totalprice * 100)) for r in rows]
    means = []
    for b in range(_BOOT_B):
        num = den = 0
        for ok, cv in cents:
            u = int(hashlib.md5(str(ok * _BOOT_B + b).encode()).hexdigest()[:8],
                    16) % 1000000
            w = next((k for k, cut in enumerate(_BOOT_CUTS) if u < cut), 7)
            num += w * cv
            den += w
        means.append(num / (100.0 * den))
    means.sort()
    row = QS["q221_poisson_bootstrap"].fn(spark, sf_dir).collect()[0]
    assert row.n_replicates == _BOOT_B
    full = sum(cv for _, cv in cents) / (100.0 * len(cents))
    assert math.isclose(row.mean_full, full, rel_tol=1e-12)
    assert math.isclose(row.ci_lo, means[1], rel_tol=1e-12)
    assert math.isclose(row.ci_hi, means[_BOOT_B - 2], rel_tol=1e-12)
    assert row.ci_lo < row.mean_full < row.ci_hi


def test_q222_assortativity_matches_python(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey").collect()
    pt = {
        r.p_partkey: r.p_brand
        for r in load_table(spark, sf_dir, "part").collect()
    }
    items = {(r.l_orderkey, pt[r.l_partkey]) for r in li}
    by_order = defaultdict(set)
    for ok, br in items:
        by_order[ok].add(br)
    support = defaultdict(int)
    for brs in by_order.values():
        srt = sorted(brs)
        for i, a in enumerate(srt):
            for b in srt[i + 1:]:
                support[(a, b)] += 1
    med = float(np.median(list(support.values())))
    edges = [e for e, s in support.items() if s > med]
    deg = defaultdict(int)
    for a, b in edges:
        deg[a] += 1
        deg[b] += 1
    js = [deg[a] for a, b in edges] + [deg[b] for a, b in edges]
    ks = [deg[b] for a, b in edges] + [deg[a] for a, b in edges]
    m = len(js)
    sj, sjj = sum(js), sum(j * j for j in js)
    sjk = sum(j * k for j, k in zip(js, ks))
    r_expect = (m * sjk - sj * sj) / (m * sjj - sj * sj)
    row = QS["q222_degree_assortativity"].fn(spark, sf_dir).collect()[0]
    assert row.n_nodes == len(deg)
    assert row.n_edges == len(edges)
    assert math.isclose(row.assortativity, r_expect, rel_tol=1e-9)


def _daily_cents(spark, sf_dir, round_to_dollars=False):
    import datetime as dt

    rows = (
        load_table(spark, sf_dir, "orders")
        .select("o_orderdate", "o_totalprice")
        .collect()
    )
    daily = defaultdict(int)
    for r in rows:
        # engine ROUND is half-AWAY; python round() is half-even (cents
        # are safe — 2-decimal data makes *100 integral — dollars are not)
        v = (int(math.floor(r.o_totalprice + 0.5)) if round_to_dollars
             else round(r.o_totalprice * 100))
        daily[r.o_orderdate.date()] += v
    d0, d1 = min(daily), max(daily)
    return [daily.get(d0 + dt.timedelta(days=i), 0)
            for i in range((d1 - d0).days + 1)]


def test_q223_stl_matches_python(spark, sf_dir):
    series = _daily_cents(spark, sf_dir)
    span = len(series) - 1
    det = {}
    for day in range(3, span - 2):
        s7 = sum(series[day - 3:day + 4])
        det[day] = round((series[day] - s7 / 7.0) * 1e6)
    seas = defaultdict(list)
    for day, d in det.items():
        seas[day % 7].append(d)
    seas = {k: sum(v) / (1e6 * len(v)) for k, v in seas.items()}
    got = {r.day: r for r in QS["q223_stl_decompose"].fn(spark, sf_dir).collect()}
    assert set(got) == set(det)
    for day, d in det.items():
        r = got[day]
        assert r.dow == day % 7
        assert math.isclose(r.revenue, series[day] / 100.0, rel_tol=1e-12)
        assert math.isclose(r.trend, (series[day] - d / 1e6) / 100.0, rel_tol=1e-9)
        assert math.isclose(r.seasonal, seas[day % 7] / 100.0, rel_tol=1e-9)
        assert math.isclose(
            r.resid, (d / 1e6 - seas[day % 7]) / 100.0,
            rel_tol=1e-6, abs_tol=1e-6,
        )
        # the decomposition recomposes: trend + seasonal + resid == revenue
        assert math.isclose(
            r.trend + r.seasonal + r.resid, r.revenue,
            rel_tol=1e-9, abs_tol=1e-6,  # abs_tol for zero-revenue gap days
        )


def test_q224_sax_matches_python(spark, sf_dir):
    series = _daily_cents(spark, sf_dir, round_to_dollars=True)
    weekly = defaultdict(lambda: [0, 0])
    for day, v in enumerate(series):
        weekly[day // 7][0] += v
        weekly[day // 7][1] += 1
    full = {w: s for w, (s, c) in weekly.items() if c == 7}
    k = len(full)
    mu = sum(full.values()) / (7.0 * k)
    var = sum(s * s for s in full.values()) / (49.0 * k) - mu * mu
    sd = math.sqrt(var)
    bp = 0.6744897501960817
    words = defaultdict(dict)
    for w, s in full.items():
        z = (s / 7.0 - mu) / sd
        sym = "a" if z < -bp else ("b" if z < 0 else ("c" if z < bp else "d"))
        words[w // 4][w] = sym
    expect = {
        blk: "".join(sym for _, sym in sorted(d.items()))
        for blk, d in words.items()
    }
    got = {
        r.block: (r.n_weeks, r.sax_word)
        for r in QS["q224_sax_symbols"].fn(spark, sf_dir).collect()
    }
    assert set(got) == set(expect)
    for blk, word in expect.items():
        assert got[blk] == (len(word), word)


def test_q225_absorption_matches_python(spark, sf_dir):
    from docling_api_spark.operators.timeseries import _ABS_N, _ABSORB_TARGET

    ev = (
        load_table(spark, sf_dir, "events")
        .select("user_id", "ts", "event_type")
        .collect()
    )
    per_user = defaultdict(list)
    for r in ev:
        per_user[r.user_id].append((r.ts, r.event_type))
    counts = defaultdict(int)
    for rows in per_user.values():
        rows.sort()
        for (_, a), (_, b) in zip(rows, rows[1:]):
            counts[(a, b)] += 1
    totals = defaultdict(int)
    for (a, _), c in counts.items():
        totals[a] += c
    pn = {xy: round(_ABS_N * c / totals[xy[0]]) for xy, c in counts.items()}
    h = {}
    for _ in range(3):
        nh = {}
        for x in totals:
            acc = 0
            for (a, y), p in pn.items():
                if a != x:
                    continue
                acc += p * (_ABS_N if y == _ABSORB_TARGET else h.get(y, 0))
            nh[x] = round(float(acc) / _ABS_N)
        h = nh
    got = {
        r.state: (r.n_obs, r.p_absorb_3)
        for r in QS["q225_markov_absorption"].fn(spark, sf_dir).collect()
    }
    assert set(got) == set(totals)
    for x in totals:
        assert got[x][0] == totals[x]
        assert math.isclose(got[x][1], h[x] / _ABS_N, abs_tol=2e-9)
        assert 0.0 <= got[x][1] <= 1.0


def test_q226_emd_matches_scipy_style(spark, sf_dir):
    from docling_api_spark.operators.analytics import _EMD_BUCKET

    rows = (
        load_table(spark, sf_dir, "orders")
        .join(load_table(spark, sf_dir, "customer"),
              F.col("o_custkey") == F.col("c_custkey"))
        .join(load_table(spark, sf_dir, "nation"),
              F.col("c_nationkey") == F.col("n_nationkey"))
        .join(load_table(spark, sf_dir, "region"),
              F.col("n_regionkey") == F.col("r_regionkey"))
        .select("r_name", "o_totalprice")
        .collect()
    )
    by_region = defaultdict(list)
    allv = []
    for r in rows:
        b = round(r.o_totalprice) // _EMD_BUCKET
        by_region[r.r_name].append(b)
        allv.append(b)
    mb = max(allv)
    ng = len(allv)
    gh = defaultdict(int)
    for b in allv:
        gh[b] += 1
    expect = {}
    for region, bs in by_region.items():
        rh = defaultdict(int)
        for b in bs:
            rh[b] += 1
        cr = cg = 0
        acc = 0
        for b in range(mb + 1):
            cr += rh.get(b, 0)
            cg += gh.get(b, 0)
            acc += round(1e9 * abs(cr / len(bs) - cg / ng))
        expect[region] = (len(bs), acc / 1e9 * _EMD_BUCKET)
    got = {
        r.region: (r.n_orders, r.emd_dollars)
        for r in QS["q226_emd_regions"].fn(spark, sf_dir).collect()
    }
    assert set(got) == set(expect)
    for region, (n, emd) in expect.items():
        assert got[region][0] == n
        assert math.isclose(got[region][1], emd, rel_tol=1e-9)


def test_q227_conformal_matches_python(spark, sf_dir):
    import numpy as np

    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority", "o_totalprice"
    ).collect()
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey").collect()
    xs = defaultdict(int)
    for r in li:
        xs[r.l_orderkey] += 1
    groups = defaultdict(lambda: ([], []))  # train, cal
    for r in o:
        if r.o_orderkey not in xs:
            continue
        pt = (xs[r.o_orderkey], round(r.o_totalprice * 100))
        groups[r.o_orderpriority][r.o_orderkey % 2].append(pt)
    got = {
        r.priority: r
        for r in QS["q227_conformal_interval"].fn(spark, sf_dir).collect()
    }
    assert set(got) == set(groups)
    for pr, (train, cal) in groups.items():
        k = len(train)
        sx = sum(x for x, _ in train)
        sy = sum(y for _, y in train)
        sxx = sum(x * x for x, _ in train)
        sxy = sum(x * y for x, y in train)
        beta = (k * sxy - sx * sy) / (k * sxx - sx * sx)
        alpha = (sy - beta * sx) / k
        resid = [round(abs(y - (alpha + beta * x))) for x, y in cal]
        qhat = float(np.percentile(resid, 90, method="linear")) / 100.0
        r = got[pr]
        assert r.n_train == k and r.n_cal == len(cal)
        assert math.isclose(r.beta, beta, rel_tol=1e-9)
        assert math.isclose(r.alpha, alpha, rel_tol=1e-9)
        assert math.isclose(r.qhat_dollars, qhat, rel_tol=1e-9)
        # conformal guarantee sanity: ~90% of calibration residuals inside
        inside = sum(1 for rr in resid if rr / 100.0 <= r.qhat_dollars)
        assert inside >= 0.88 * len(cal)


def test_q228_weiszfeld_matches_python(spark, sf_dir):
    from docling_api_spark.operators.analytics import _WEISZ_Q

    q = float(_WEISZ_Q)
    orders = (
        load_table(spark, sf_dir, "orders")
        .select("o_custkey", "o_totalprice")
        .collect()
    )
    f = defaultdict(int)
    cents = defaultdict(int)
    for r in orders:
        f[r.o_custkey] += 1
        cents[r.o_custkey] += round(r.o_totalprice * 100)
    pts = [(float(f[k]), cents[k] / 100.0) for k in f]
    n = len(pts)
    cx = sum(int(x) for x, _ in pts) / n
    cy = sum(cents.values()) / (100.0 * n)
    mean = (cx, cy)
    for _ in range(3):
        nx = ny = dn = 0
        for x, y in pts:
            d = math.sqrt((x - cx) * (x - cx) + (y - cy) * (y - cy))
            if d > 0:
                nx += round(q * x / d)
                ny += round(q * y / d)
                dn += round(q / d)
        cx, cy = nx / dn, ny / dn
    row = QS["q228_geometric_median"].fn(spark, sf_dir).collect()[0]
    assert row.n_customers == n
    assert math.isclose(row.mean_f, mean[0], rel_tol=1e-12)
    assert math.isclose(row.mean_m, mean[1], rel_tol=1e-12)
    assert math.isclose(row.gmed_f, cx, rel_tol=1e-9)
    assert math.isclose(row.gmed_m, cy, rel_tol=1e-9)
    # robustness direction: the spend cloud is right-skewed, so the
    # geometric median must sit at or below the mean on the spend axis
    assert row.gmed_m <= row.mean_m


def test_q229_bitmap_matches_set_algebra(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events").select("event_type", "user_id").collect()
    segs = defaultdict(set)
    for r in ev:
        segs[r.event_type].add(r.user_id)
    names = sorted(segs)
    expect = {}
    for i, a in enumerate(names):
        for b in names[i + 1:]:
            inter = len(segs[a] & segs[b])
            union = len(segs[a] | segs[b])
            expect[(a, b)] = (len(segs[a]), len(segs[b]), inter, union,
                              inter / union)
    got = {
        (r.seg_a, r.seg_b): (r.n_a, r.n_b, r.n_intersect, r.n_union, r.jaccard)
        for r in QS["q229_bitmap_intersect"].fn(spark, sf_dir).collect()
    }
    assert set(got) == set(expect)
    for k, (na, nb, i_, u, j) in expect.items():
        assert got[k][:4] == (na, nb, i_, u)
        assert math.isclose(got[k][4], j, rel_tol=1e-12)


def test_q230_xcorr_matches_numpy(spark, sf_dir):
    from docling_api_spark.operators.timeseries import (
        _XCORR_A, _XCORR_B, _XCORR_LAGS,
    )

    ev = load_table(spark, sf_dir, "events").select("ts", "event_type").collect()
    hours = [int(r.ts.timestamp() * 1e6) // 3600000000 for r in ev]
    h0, h1 = min(hours), max(hours)
    nh = h1 - h0 + 1
    xa = np.zeros(nh)
    xb = np.zeros(nh)
    for r, h in zip(ev, hours):
        if r.event_type == _XCORR_A:
            xa[h - h0] += 1
        elif r.event_type == _XCORR_B:
            xb[h - h0] += 1
    got = {
        r.lag: (r.n, r.xcorr)
        for r in QS["q230_lagged_xcorr"].fn(spark, sf_dir).collect()
    }
    assert set(got) == set(range(-_XCORR_LAGS, _XCORR_LAGS + 1))
    for lag in got:
        # pair x_t with y_{t+lag}
        if lag >= 0:
            a, b = xa[: nh - lag], xb[lag:]
        else:
            a, b = xa[-lag:], xb[: nh + lag]
        r_np = float(np.corrcoef(a, b)[0, 1])
        assert got[lag][0] == len(a)
        assert math.isclose(got[lag][1], r_np, rel_tol=1e-9, abs_tol=1e-12)


def test_q231_did_matches_python(spark, sf_dir):
    import hashlib

    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "ts", "event_type", "value"
    ).collect()
    ts_us = [int(r.ts.timestamp() * 1e6) for r in ev]
    mid = (min(ts_us) + max(ts_us)) // 2
    users = sorted({r.user_id for r in ev})
    arm = {
        u: int(hashlib.md5(str(u).encode()).hexdigest()[:8], 16) % 2
        for u in users
    }
    y = defaultdict(int)
    for r, t in zip(ev, ts_us):
        if r.event_type == "purchase":
            y[(r.user_id, 0 if t < mid else 1)] += round(r.value * 100)
    cells = defaultdict(list)
    for u in users:
        for p in (0, 1):
            cells[(arm[u], p)].append(y.get((u, p), 0))
    mean = {k: sum(v) / len(v) for k, v in cells.items()}
    did = ((mean[(1, 1)] - mean[(1, 0)]) - (mean[(0, 1)] - mean[(0, 0)])) / 100.0
    var_sum = 0.0
    for k, v in cells.items():
        n = len(v)
        s, ss = sum(v), sum(x * x for x in v)
        var_sum += round(1e6 * (n * ss - s * s) / (n * (n - 1) * n)) / 1e6
    z = ((mean[(1, 1)] - mean[(1, 0)]) - (mean[(0, 1)] - mean[(0, 0)])) / math.sqrt(var_sum)
    row = QS["q231_diff_in_diff"].fn(spark, sf_dir).collect()[0]
    assert row.n_t == len(cells[(1, 0)]) and row.n_c == len(cells[(0, 0)])
    assert math.isclose(row.t_pre, mean[(1, 0)] / 100.0, rel_tol=1e-12)
    assert math.isclose(row.c_post, mean[(0, 1)] / 100.0, rel_tol=1e-12)
    assert math.isclose(row.did_estimate, did, rel_tol=1e-9, abs_tol=1e-9)
    assert math.isclose(row.z_stat, z, rel_tol=1e-9)


def test_q232_att_matches_python(spark, sf_dir):
    from docling_api_spark.operators.analytics import _ATT_TREAT_SEG

    o = load_table(spark, sf_dir, "orders").select("o_custkey", "o_totalprice").collect()
    c = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey", "c_mktsegment"
    ).collect()
    spend = defaultdict(int)
    for r in o:
        spend[r.o_custkey] += round(r.o_totalprice * 100)
    strata = defaultdict(lambda: {0: [], 1: []})
    for r in c:
        t = 1 if r.c_mktsegment == _ATT_TREAT_SEG else 0
        strata[r.c_nationkey][t].append(spend.get(r.c_custkey, 0))
    num = 0
    n_t_tot = n_c_tot = n_strata = 0
    for cell in strata.values():
        if not cell[0] or not cell[1]:
            continue
        n_strata += 1
        n_t, n_c = len(cell[1]), len(cell[0])
        n_t_tot += n_t
        n_c_tot += n_c
        num += round(1e6 * n_t * (sum(cell[1]) / n_t - sum(cell[0]) / n_c))
    att = num / (1e6 * 100.0 * n_t_tot)
    row = QS["q232_stratified_att"].fn(spark, sf_dir).collect()[0]
    assert (row.n_treated, row.n_control, row.n_strata) == (
        n_t_tot, n_c_tot, n_strata,
    )
    assert math.isclose(row.att_dollars, att, rel_tol=1e-9)


def test_q233_cms_matches_python_and_guarantee(spark, sf_dir):
    import hashlib

    from docling_api_spark.operators.textstats import _CMS_D, _CMS_TOPK, _CMS_W

    docs = load_table(spark, sf_dir, "documents").select("text").collect()
    exact = defaultdict(int)
    for r in docs:
        for t in r.text.split(" "):
            exact[t] += 1

    def cell(j, term):
        return int(
            hashlib.md5(f"{j}:{term}".encode()).hexdigest()[:8], 16
        ) % _CMS_W

    cells = defaultdict(int)
    for term, n in exact.items():
        for j in range(_CMS_D):
            cells[(j, cell(j, term))] += n
    probe = sorted(exact.items(), key=lambda kv: (-kv[1], kv[0]))[:_CMS_TOPK]
    expect = {}
    for term, n in probe:
        est = min(cells[(j, cell(j, term))] for j in range(_CMS_D))
        expect[term] = (n, est, est - n)
    got = {
        r.term: (r.exact_n, r.cms_est, r.overestimate)
        for r in QS["q233_count_min_sketch"].fn(spark, sf_dir).collect()
    }
    assert got == expect
    assert all(v[2] >= 0 for v in got.values())  # the CMS guarantee


def test_q234_slo_matches_python(spark, sf_dir):
    from docling_api_spark.operators.timeseries import _SLO_BUDGET_X

    ev = load_table(spark, sf_dir, "events").select("ts", "event_type").collect()
    hrs = [int(r.ts.timestamp() * 1e6) // 3600000000 for r in ev]
    h0, h1 = min(hrs), max(hrs)
    err = defaultdict(int)
    tot = defaultdict(int)
    for r, h in zip(ev, hrs):
        tot[h - h0] += 1
        if r.event_type == "error":
            err[h - h0] += 1
    got = {r.hour: r for r in QS["q234_slo_burn_alerts"].fn(spark, sf_dir).collect()}
    assert set(got) == set(range(h1 - h0 + 1))
    for h in got:
        e, t = err.get(h, 0), tot.get(h, 0)
        e6 = sum(err.get(i, 0) for i in range(max(0, h - 5), h + 1))
        t6 = sum(tot.get(i, 0) for i in range(max(0, h - 5), h + 1))
        r = got[h]
        assert (r.err, r.tot, r.err_6h, r.tot_6h) == (e, t, e6, t6)
        assert r.alert == (
            1 if e * _SLO_BUDGET_X > t and e6 * _SLO_BUDGET_X > t6 else 0
        )
        if t:
            assert math.isclose(r.burn_1h, e / t * _SLO_BUDGET_X, rel_tol=1e-12)


def test_q235_novelty_matches_python(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text").collect()
    tris = defaultdict(set)
    for r in docs:
        t = r.text.split(" ")
        for i in range(len(t) - 2):
            tris[r.doc_id].add(" ".join(t[i:i + 3]))
    first = {}
    for did in sorted(tris):
        for tr in tris[did]:
            first.setdefault(tr, did)
    got = {
        r.doc_id: (r.n_tris, r.n_novel, r.novelty)
        for r in QS["q235_ngram_novelty"].fn(spark, sf_dir).collect()
    }
    expect_docs = {d for d, s in tris.items() if s}
    assert set(got) == expect_docs
    for did in expect_docs:
        n = len(tris[did])
        nov = sum(1 for tr in tris[did] if first[tr] == did)
        assert got[did][0] == n and got[did][1] == nov
        assert math.isclose(got[did][2], nov / n, rel_tol=1e-12)


def test_q236_kcore_matches_python(spark, sf_dir):
    from docling_api_spark.operators.analytics import _KCORE_K

    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey").collect()
    pt = {r.p_partkey: r.p_brand for r in load_table(spark, sf_dir, "part").collect()}
    by_order = defaultdict(set)
    for r in li:
        by_order[r.l_orderkey].add(pt[r.l_partkey])
    support = defaultdict(int)
    for brs in by_order.values():
        srt = sorted(brs)
        for i, a in enumerate(srt):
            for b in srt[i + 1:]:
                support[(a, b)] += 1
    med = float(np.median(list(support.values())))
    edges = [e for e, sup in support.items() if sup > med]
    for _ in range(2):  # two peels, as in the query
        deg = defaultdict(int)
        for a, b in edges:
            deg[a] += 1
            deg[b] += 1
        keep = {x for x, d in deg.items() if d >= _KCORE_K}
        edges = [(a, b) for a, b in edges if a in keep and b in keep]
    deg = defaultdict(int)
    for a, b in edges:
        deg[a] += 1
        deg[b] += 1
    expect = {x: (d, 1 if d >= _KCORE_K else 0) for x, d in deg.items()}
    got = {
        r.brand: (r.degree, r.stable)
        for r in QS["q236_kcore_peel"].fn(spark, sf_dir).collect()
    }
    assert got == expect


def test_q237_rbo_matches_python(spark, sf_dir):
    from docling_api_spark.operators.analytics import _RBO_D

    sup = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_acctbal").collect()
    li = load_table(spark, sf_dir, "lineitem").select("l_suppkey").collect()
    vol = defaultdict(int)
    for r in li:
        vol[r.l_suppkey] += 1
    a = [k for k, _ in sorted(((r.s_suppkey, r.s_acctbal) for r in sup),
                              key=lambda t: (-t[1], t[0]))][:_RBO_D]
    b = [k for k, _ in sorted(((r.s_suppkey, vol.get(r.s_suppkey, 0)) for r in sup),
                              key=lambda t: (-t[1], t[0]))][:_RBO_D]
    p = 0.9
    rbo = 0.0
    for d in range(1, _RBO_D + 1):
        x = len(set(a[:d]) & set(b[:d]))
        rbo += round(1e12 * round(p ** (d - 1), 15) * x / d)
    rbo = 0.1 * rbo / 1e12
    row = QS["q237_rank_biased_overlap"].fn(spark, sf_dir).collect()[0]
    assert row.depth == _RBO_D
    assert row.overlap_at_depth == len(set(a) & set(b))
    assert math.isclose(row.rbo, rbo, abs_tol=1e-9)
    assert 0.0 <= row.rbo <= 1.0


def test_q238_beta_binomial_matches_scipy_formulas(spark, sf_dir):
    from docling_api_spark.operators.analytics import _BB_HEAVY

    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment").collect()
    o = load_table(spark, sf_dir, "orders").select("o_custkey").collect()
    cnt = defaultdict(int)
    for r in o:
        cnt[r.o_custkey] += 1
    seg = defaultdict(lambda: [0, 0])
    for r in c:
        seg[r.c_mktsegment][0] += 1
        if cnt.get(r.c_custkey, 0) >= _BB_HEAVY:
            seg[r.c_mktsegment][1] += 1
    got = {r.segment: r for r in QS["q238_beta_binomial"].fn(spark, sf_dir).collect()}
    assert set(got) == set(seg)
    for sname, (n, k) in seg.items():
        a, b = 1.0 + k, 1.0 + n - k
        mean = a / (a + b)
        sd = math.sqrt(a * b / ((a + b) ** 2 * (a + b + 1)))
        r = got[sname]
        assert (r.n, r.k) == (n, k)
        assert math.isclose(r.post_mean, mean, rel_tol=1e-12)
        assert math.isclose(r.post_sd, sd, rel_tol=1e-12)
        # shrinkage direction: posterior mean sits between raw rate and 1/2
        lo, hi = sorted((r.raw_rate, 0.5))
        assert lo - 1e-12 <= r.post_mean <= hi + 1e-12


def test_q239_burstiness_matches_python(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events").select("user_id", "ts").collect()
    per_user = defaultdict(list)
    for r in ev:
        per_user[r.user_id].append(int(r.ts.timestamp() * 1e6))
    got = {r.user_id: r for r in QS["q239_burstiness"].fn(spark, sf_dir).collect()}
    for uid, tss in per_user.items():
        tss.sort()
        gaps = [(b - a) // 1000000 for a, b in zip(tss, tss[1:])]
        n = len(gaps)
        if n < 3:
            assert uid not in got
            continue
        mu = sum(gaps) / n
        sd = math.sqrt(n * sum(g * g for g in gaps) - sum(gaps) ** 2) / n
        bB = (sd - mu) / (sd + mu)
        pairs = list(zip(gaps, gaps[1:]))
        m = float(np.corrcoef([x for x, _ in pairs], [y for _, y in pairs])[0, 1])
        r = got[uid]
        assert r.n == n
        assert math.isclose(r.mean_gap_s, mu, rel_tol=1e-12)
        assert math.isclose(r.sd_gap_s, sd, rel_tol=1e-9)
        assert math.isclose(r.burstiness, bB, rel_tol=1e-9)
        assert math.isclose(r.memory_coef, m, rel_tol=1e-6, abs_tol=1e-9)
        assert -1.0 <= r.burstiness <= 1.0


def test_q240_compression_matches_zlib(spark, sf_dir):
    import zlib

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text").collect()
    expect = {}
    for r in docs:
        raw = r.text.encode("utf-8")
        z = len(zlib.compress(raw, 6))
        expect[r.doc_id] = (len(raw), z, z / len(raw))
    got = {
        r.doc_id: (r.raw_len, r.zlib_len, r.ratio)
        for r in QS["q240_compression_ratio"].fn(spark, sf_dir).collect()
    }
    assert set(got) == set(expect)
    for did, (rl, zl, ratio) in expect.items():
        assert got[did][0] == rl and got[did][1] == zl
        assert math.isclose(got[did][2], ratio, rel_tol=1e-12)


def test_q241_qte_matches_numpy(spark, sf_dir):
    import hashlib

    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_type", "value"
    ).collect()
    y = defaultdict(int)
    users = set()
    for r in ev:
        users.add(r.user_id)
        if r.event_type == "purchase":
            y[r.user_id] += round(r.value * 100)
    arms = {0: [], 1: []}
    for u in users:
        arm = int(hashlib.md5(str(u).encode()).hexdigest()[:8], 16) % 2
        arms[arm].append(y.get(u, 0))
    got = {r.tau: r for r in
           QS["q241_quantile_treatment_effect"].fn(spark, sf_dir).collect()}
    assert set(got) == {0.1, 0.5, 0.9}
    for tau in got:
        qt = float(np.percentile(arms[1], tau * 100, method="linear")) / 100
        qc = float(np.percentile(arms[0], tau * 100, method="linear")) / 100
        r = got[tau]
        assert math.isclose(r.q_treat, qt, rel_tol=1e-9)
        assert math.isclose(r.q_ctrl, qc, rel_tol=1e-9)
        assert math.isclose(r.qte, qt - qc, rel_tol=1e-9, abs_tol=1e-9)


def _daily_dollars(spark, sf_dir):
    import datetime as dt

    rows = (
        load_table(spark, sf_dir, "orders")
        .select("o_orderdate", "o_totalprice")
        .collect()
    )
    daily = defaultdict(int)
    for r in rows:
        # engine ROUND is half-AWAY; python round() is half-even
        daily[r.o_orderdate.date()] += int(math.floor(r.o_totalprice + 0.5))
    d0, d1 = min(daily), max(daily)
    return [daily.get(d0 + dt.timedelta(days=i), 0)
            for i in range((d1 - d0).days + 1)]


def test_q242_binary_segmentation_matches_python(spark, sf_dir):
    v = _daily_dollars(spark, sf_dir)
    n, s = len(v), sum(v)
    best = (None, None)
    sl = 0
    for i, x in enumerate(v[:-1]):
        sl += x
        nl = i + 1
        g = round(sl * sl / nl + (s - sl) * (s - sl) / (n - nl))
        if best[0] is None or g > best[0]:
            best = (g, (i, nl, sl))
    _, (day, nl, sl) = best
    row = QS["q242_binary_segmentation"].fn(spark, sf_dir).collect()[0]
    assert row.split_day == day
    assert (row.n_left, row.n_right) == (nl, n - nl)
    assert math.isclose(row.mean_left, sl / nl, rel_tol=1e-12)
    assert math.isclose(row.mean_right, (s - sl) / (n - nl), rel_tol=1e-12)
    # the split genuinely reduces SSE vs no split
    sse0 = sum(x * x for x in v) - s * s / n
    sse1 = (sum(x * x for x in v[:nl]) - sl * sl / nl) + (
        sum(x * x for x in v[nl:]) - (s - sl) ** 2 / (n - nl)
    )
    assert sse1 < sse0


def test_q243_diversity_matches_python(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events").select("user_id", "event_type").collect()
    c = defaultdict(lambda: defaultdict(int))
    for r in ev:
        c[r.user_id][r.event_type] += 1
    got = {r.user_id: r for r in QS["q243_simpson_diversity"].fn(spark, sf_dir).collect()}
    assert set(got) == set(c)
    for uid, types in c.items():
        n = sum(types.values())
        kk = sum(k * k for k in types.values())
        r = got[uid]
        assert (r.n, r.n_types) == (n, len(types))
        assert math.isclose(r.gini_simpson, 1 - kk / (n * n), rel_tol=1e-12)
        assert math.isclose(r.effective_types, n * n / kk, rel_tol=1e-12)
        assert 1.0 <= r.effective_types <= len(types) + 1e-9


def test_q244_peaks_match_python(spark, sf_dir):
    v = _daily_dollars(spark, sf_dir)
    span = len(v) - 1
    expect = {}
    for d in range(3, span - 2):
        s7 = sum(v[d - 3:d + 4])
        if (v[d] > max(v[d - 3:d]) and v[d] > max(v[d + 1:d + 4])
                and 35 * v[d] > 6 * s7):
            expect[d] = (v[d], s7, 7.0 * v[d] / s7)
    got = {
        r.peak_day: (r.revenue_dollars, r.window_sum, r.lift)
        for r in QS["q244_peak_detection"].fn(spark, sf_dir).collect()
    }
    assert set(got) == set(expect)
    for d, (rev, s7, lift) in expect.items():
        assert got[d][0] == rev and got[d][1] == s7
        assert math.isclose(got[d][2], lift, rel_tol=1e-12)
        assert got[d][2] > 1.2


def test_q245_selectivity_matches_python(spark, sf_dir):
    from docling_api_spark.operators.layout import _SEL_BUCKETS, _SEL_PREDS

    vals = [int(math.floor(r.o_totalprice + 0.5)) for r in
            load_table(spark, sf_dir, "orders").select("o_totalprice").collect()]
    lo_all, hi_all, n = min(vals), max(vals) + 1, len(vals)
    width = (hi_all - lo_all) / _SEL_BUCKETS
    hist = defaultdict(int)
    for d in vals:
        hist[(_SEL_BUCKETS * (d - lo_all)) // (hi_all - lo_all)] += 1
    got = {(r.pred_lo, r.pred_hi): r for r in
           QS["q245_selectivity_audit"].fn(spark, sf_dir).collect()}
    assert set(got) == set(_SEL_PREDS)
    for lo, hi in _SEL_PREDS:
        est_m = 0
        for b, c in hist.items():
            b_lo, b_hi = lo_all + b * width, lo_all + (b + 1) * width
            if b_hi > lo and b_lo < hi:
                frac = (min(float(hi), b_hi) - max(float(lo), b_lo)) / width
                est_m += int(math.floor(1e6 * c * frac + 0.5))
        act = sum(1 for d in vals if lo <= d < hi)
        r = got[(lo, hi)]
        assert r.est_rows == int(math.floor(est_m / 1e6 + 0.5))
        assert r.actual_rows == act
        assert math.isclose(r.est_selectivity, est_m / (1e6 * n), rel_tol=1e-9)
        assert math.isclose(r.actual_selectivity, act / n, rel_tol=1e-12)
        # an equi-width histogram must be near-exact on the full range
        if (lo, hi) == (0, 600_000):
            assert abs(r.est_rows - act) <= 1


def test_q246_isotonic_matches_python_pava(spark, sf_dir):
    from docling_api_spark.operators.analytics import _ISO_BANDS, _LATE_DAYS

    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority", "o_totalprice", "o_orderdate"
    ).collect()
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_shipdate"
    ).collect()
    odate = {r.o_orderkey: r.o_orderdate.date() for r in o}
    late = defaultdict(int)
    for r in li:
        lag = (r.l_shipdate.date() - odate[r.l_orderkey]).days
        if lag > _LATE_DAYS:
            late[r.l_orderkey] = 1
    with_lines = {r.l_orderkey for r in li}
    o = [r for r in o if r.o_orderkey in with_lines]  # the query joins
    dollars = {r.o_orderkey: int(math.floor(r.o_totalprice + 0.5)) for r in o}
    lo, hi = min(dollars.values()), max(dollars.values()) + 1
    bands = defaultdict(lambda: [0, 0])
    for r in o:
        band = (_ISO_BANDS * (dollars[r.o_orderkey] - lo)) // (hi - lo)
        cell = bands[(r.o_orderpriority, band)]
        cell[0] += 1
        cell[1] += late.get(r.o_orderkey, 0)
    got = {
        (r.priority, r.band): r
        for r in QS["q246_isotonic_calibration"].fn(spark, sf_dir).collect()
    }
    assert set(got) == set(bands)
    prios = {p for p, _ in bands}
    for pr in prios:
        rows = sorted(
            (band, nk[0], nk[1]) for (p, band), nk in bands.items() if p == pr
        )
        merged = []
        for band, bn, bk in rows:
            merged.append([band, bn, bk])
            while len(merged) >= 2 and (
                merged[-2][2] * merged[-1][1] > merged[-1][2] * merged[-2][1]
            ):
                lastm = merged.pop()
                merged[-1][1] += lastm[1]
                merged[-1][2] += lastm[2]
        fitted = {}
        for i, (first, bn, bk) in enumerate(merged):
            until = merged[i + 1][0] if i + 1 < len(merged) else _ISO_BANDS
            for band in range(first, until):
                fitted[band] = bk / bn
        seq = []
        for band, bn, bk in rows:
            r = got[(pr, band)]
            assert (r.n, r.k) == (bn, bk)
            assert math.isclose(r.iso_rate, fitted[band], rel_tol=1e-12)
            seq.append(r.iso_rate)
        assert seq == sorted(seq)  # the monotonicity PAVA guarantees


def test_q247_texttiling_matches_python(spark, sf_dir):
    from docling_api_spark.operators.textstats import _TILE_BLOCK

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text").collect()
    got = {r.doc_id: r for r in QS["q247_text_tiling"].fn(spark, sf_dir).collect()}
    for r in docs:
        toks = r.text.split(" ")
        blocks = [toks[i:i + _TILE_BLOCK]
                  for i in range(0, len(toks), _TILE_BLOCK)]
        if len(blocks) < 2:
            assert r.doc_id not in got
            continue
        counts = []
        for blk in blocks:
            c = defaultdict(int)
            for t in blk:
                c[t] += 1
            counts.append(c)
        sims = []
        for a, b in zip(counts, counts[1:]):
            dot = sum(ca * b.get(t, 0) for t, ca in a.items())
            na = math.sqrt(sum(x * x for x in a.values()))
            nb = math.sqrt(sum(x * x for x in b.values()))
            sims.append(dot / (na * nb))
        bounds = sum(
            1 for i in range(1, len(sims) - 1)
            if sims[i] < sims[i - 1] and sims[i] < sims[i + 1]
        )
        row = got[r.doc_id]
        assert row.n_blocks == len(blocks)
        assert row.n_gaps == len(sims)
        assert row.n_boundaries == bounds
        assert math.isclose(row.min_sim, min(sims), rel_tol=1e-9)
        mean_q = sum(int(math.floor(1e9 * s + 0.5)) for s in sims) / (1e9 * len(sims))
        assert math.isclose(row.mean_sim, mean_q, rel_tol=1e-9)


def test_q248_reconcile_matches_python(spark, sf_dir):
    o = load_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderdate", "o_totalprice"
    ).collect()
    c = {r.c_custkey: r.c_nationkey
         for r in load_table(spark, sf_dir, "customer").collect()}
    n = {r.n_nationkey: (r.n_name, r.n_regionkey)
         for r in load_table(spark, sf_dir, "nation").collect()}
    rg = {r.r_regionkey: r.r_name
          for r in load_table(spark, sf_dir, "region").collect()}
    monthly = defaultdict(int)
    for r in o:
        nat, rk = n[c[r.o_custkey]]
        mk = r.o_orderdate.year * 12 + r.o_orderdate.month
        monthly[(nat, rg[rk], mk)] += round(r.o_totalprice * 100)
    t = max(mk for _, _, mk in monthly) + 1
    nat_f = defaultdict(int)
    reg_trail = defaultdict(int)
    nat_region = {}
    for (nat, region, mk), cents in monthly.items():
        nat_region[nat] = region
        if mk == t - 12:
            nat_f[nat] += cents
        if t - 3 <= mk <= t - 1:
            reg_trail[region] += cents
    reg_seasonal = defaultdict(int)
    for nat, region in nat_region.items():
        reg_seasonal[region] += nat_f.get(nat, 0)
    got = {r.nation: r for r in QS["q248_forecast_reconcile"].fn(spark, sf_dir).collect()}
    assert set(got) == set(nat_region)
    recon_sums = defaultdict(float)
    for nat, region in nat_region.items():
        r = got[nat]
        f_nat = nat_f.get(nat, 0)
        assert r.region == region
        assert math.isclose(r.f_nation_naive, f_nat / 100.0, rel_tol=1e-12)
        assert math.isclose(r.f_region_trail3, reg_trail[region] / 300.0,
                            rel_tol=1e-12)
        share = f_nat / reg_seasonal[region] if reg_seasonal[region] else 0.0
        assert math.isclose(r.share, share, rel_tol=1e-12)
        recon_sums[region] += r.f_reconciled
    # coherence: reconciled nation forecasts sum to the region model
    for region, s in recon_sums.items():
        if reg_seasonal[region]:
            assert math.isclose(s, reg_trail[region] / 300.0, rel_tol=1e-9)


def test_q249_rolling_regression_matches_numpy(spark, sf_dir):
    from docling_api_spark.operators.timeseries import _ROLL_REG_W

    v = _daily_dollars(spark, sf_dir)
    got = {r.day: r for r in QS["q249_rolling_regression"].fn(spark, sf_dir).collect()}
    assert set(got) == set(range(_ROLL_REG_W - 1, len(v)))
    for day in list(got)[:50] + list(got)[-5:]:
        xs = np.arange(day - _ROLL_REG_W + 1, day + 1, dtype=float)
        ys = np.array(v[day - _ROLL_REG_W + 1: day + 1], dtype=float)
        slope, intercept = np.polyfit(xs, ys, 1)
        assert math.isclose(got[day].slope_per_day, slope, rel_tol=1e-6, abs_tol=1e-6)
        assert math.isclose(got[day].intercept, intercept, rel_tol=1e-6,
                            abs_tol=abs(slope) + 1e-6)


def test_q250_link_prediction_matches_python(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey").collect()
    pt = {r.p_partkey: r.p_brand for r in load_table(spark, sf_dir, "part").collect()}
    by_order = defaultdict(set)
    for r in li:
        by_order[r.l_orderkey].add(pt[r.l_partkey])
    support = defaultdict(int)
    for brs in by_order.values():
        srt = sorted(brs)
        for i, x in enumerate(srt):
            for yb in srt[i + 1:]:
                support[(x, yb)] += 1
    med = float(np.median(list(support.values())))
    edges = {e for e, s in support.items() if s > med}
    nbrs = defaultdict(set)
    for x, yb in edges:
        nbrs[x].add(yb)
        nbrs[yb].add(x)
    cand = {}
    for x in nbrs:
        for via in nbrs[x]:
            for yb in nbrs[via]:
                if x < yb and (x, yb) not in edges:
                    key = (x, yb)
                    if key not in cand:
                        inter = len(nbrs[x] & nbrs[yb])
                        union = len(nbrs[x] | nbrs[yb])
                        cand[key] = (inter, len(nbrs[x]), len(nbrs[yb]),
                                     inter / union)
    top = sorted(cand.items(), key=lambda kv: (-kv[1][3], kv[0]))[:20]
    got = [
        ((r.brand_a, r.brand_b), (r.common, r.dega, r.degc, r.jaccard))
        for r in QS["q250_link_prediction"].fn(spark, sf_dir).collect()
    ]
    assert len(got) == len(top)
    for (k_exp, v_exp), (k_got, v_got) in zip(top, got):
        assert k_got == k_exp
        assert v_got[:3] == v_exp[:3]
        assert math.isclose(v_got[3], v_exp[3], rel_tol=1e-12)


def test_q251_lcs_matches_python_dp(spark, sf_dir):
    from docling_api_spark.operators.entity import LEV_MAX

    def lev(a, b):
        prev = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            cur = [i]
            for j, cb in enumerate(b, 1):
                cur.append(min(prev[j] + 1, cur[j - 1] + 1,
                               prev[j - 1] + (ca != cb)))
            prev = cur
        return prev[-1]

    def lcs(a, b):
        prev = [0] * (len(b) + 1)
        for x in a:
            cur = [0]
            for j, yb in enumerate(b, 1):
                cur.append(prev[j - 1] + 1 if x == yb
                           else max(prev[j], cur[j - 1]))
            prev = cur
        return prev[-1]

    names = sorted({r.p_name for r in
                    load_table(spark, sf_dir, "part").collect()})
    expect = {}
    blocks = defaultdict(list)
    for nm in names:
        blocks[nm.split(" ")[0]].append(nm)
    for blk in blocks.values():
        for i, na in enumerate(blk):
            for nb in blk[i + 1:]:
                if abs(len(na) - len(nb)) <= LEV_MAX and 0 < lev(na, nb) <= LEV_MAX:
                    lt = lcs(na.split(" "), nb.split(" "))
                    expect[(na, nb)] = (
                        lt,
                        2.0 * lt / (len(na.split(" ")) + len(nb.split(" "))),
                    )
    got = {
        (r.name_a, r.name_b): (r.lcs_tokens, r.lcs_ratio)
        for r in QS["q251_lcs_verify"].fn(spark, sf_dir).collect()
    }
    # q48's candidate predicate allows lev = 0 only for distinct names,
    # and name_a < name_b — mirror exactly
    assert set(got) == set(expect)
    for k, (lt, ratio) in expect.items():
        assert got[k][0] == lt
        assert math.isclose(got[k][1], ratio, rel_tol=1e-12)


def test_q252_ece_matches_python(spark, sf_dir):
    from docling_api_spark.operators.analytics import CAL_BUCKETS

    o = load_table(spark, sf_dir, "orders").select("o_custkey", "o_orderdate").collect()
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_acctbal").collect()
    y1 = max(r.o_orderdate.year for r in o) - 1
    actives = {r.o_custkey for r in o if r.o_orderdate.year == y1}
    ranked = sorted(c, key=lambda r: (r.c_acctbal, r.c_custkey))
    nm1 = len(ranked) - 1
    buckets = defaultdict(lambda: [0, 0, 0])  # nb, sr, sy
    for r0, r in enumerate(ranked):
        b = min(r0 * CAL_BUCKETS // nm1, CAL_BUCKETS - 1)
        cell = buckets[b]
        cell[0] += 1
        cell[1] += r0
        cell[2] += 1 if r.c_custkey in actives else 0
    n = len(ranked)
    num = 0
    mce = 0.0
    for nb, sr, sy in buckets.values():
        gap = abs(sy / nb - sr / (nm1 * nb))
        num += int(math.floor(1e6 * nb * gap + 0.5))
        mce = max(mce, gap)
    row = QS["q252_expected_calibration_error"].fn(spark, sf_dir).collect()[0]
    assert row.n_customers == n
    assert math.isclose(row.ece, num / (1e6 * n), rel_tol=1e-9)
    assert math.isclose(row.mce, mce, rel_tol=1e-9)
    assert 0.0 <= row.ece <= row.mce <= 1.0


def test_q253_spearman_matches_scipy_formula(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_totalprice"
    ).collect()
    f = defaultdict(int)
    m = defaultdict(int)
    for r in orders:
        f[r.o_custkey] += 1
        m[r.o_custkey] += round(r.o_totalprice * 100)
    keys = sorted(f)
    fx = np.array([f[k] for k in keys], dtype=float)
    my = np.array([m[k] for k in keys], dtype=float)

    def avg_ranks(v):
        order = np.argsort(v, kind="mergesort")
        ranks = np.empty(len(v))
        sv = v[order]
        i = 0
        while i < len(v):
            j = i
            while j + 1 < len(v) and sv[j + 1] == sv[i]:
                j += 1
            ranks[order[i:j + 1]] = (i + j) / 2 + 1
            i = j + 1
        return ranks

    rf, rm = avg_ranks(fx), avg_ranks(my)
    rho = float(np.corrcoef(rf, rm)[0, 1])
    row = QS["q253_spearman_rank_corr"].fn(spark, sf_dir).collect()[0]
    assert row.n == len(keys)
    assert math.isclose(row.spearman_rho, rho, rel_tol=1e-9)
    assert -1.0 <= row.spearman_rho <= 1.0


def test_q254_partial_corr_matches_numpy(spark, sf_dir):
    o = load_table(spark, sf_dir, "orders").select("o_custkey", "o_totalprice").collect()
    c = {r.c_custkey: r.c_acctbal
         for r in load_table(spark, sf_dir, "customer").collect()}
    x = defaultdict(int)
    y = defaultdict(int)
    for r in o:
        x[r.o_custkey] += 1
        y[r.o_custkey] += int(math.floor(r.o_totalprice + 0.5))
    keys = sorted(x)
    xa = np.array([x[k] for k in keys], dtype=float)
    ya = np.array([y[k] for k in keys], dtype=float)
    za = np.array([int(math.floor(c[k] + 0.5)) for k in keys], dtype=float)
    rxy = float(np.corrcoef(xa, ya)[0, 1])
    rxz = float(np.corrcoef(xa, za)[0, 1])
    ryz = float(np.corrcoef(ya, za)[0, 1])
    part = (rxy - rxz * ryz) / (math.sqrt(1 - rxz**2) * math.sqrt(1 - ryz**2))
    row = QS["q254_partial_correlation"].fn(spark, sf_dir).collect()[0]
    assert row.n == len(keys)
    for got, exp in ((row.rxy, rxy), (row.rxz, rxz), (row.ryz, ryz),
                     (row.partial_rxy_given_z, part)):
        assert math.isclose(got, exp, rel_tol=1e-9, abs_tol=1e-12)


def test_q255_qini_matches_python(spark, sf_dir):
    import hashlib

    from docling_api_spark.operators.analytics import CONV_MIN

    ev = load_table(spark, sf_dir, "events").select("user_id", "event_type").collect()
    pur = defaultdict(int)
    users = set()
    for r in ev:
        users.add(r.user_id)
        if r.event_type == "purchase":
            pur[r.user_id] += 1

    def h(key, mod):
        return int(hashlib.md5(str(key).encode()).hexdigest()[:8], 16) % mod

    rows = sorted(
        ((h(u * 7919, 1000000), u) for u in users)
    )
    n = len(rows)
    cum = defaultdict(lambda: [0, 0, 0, 0])
    for r0, (_, u) in enumerate(rows):
        d = min(r0 * 10 // n, 9)
        arm = h(u, 2)
        yv = 1 if pur.get(u, 0) >= CONV_MIN else 0
        cell = cum[d]
        if arm == 1:
            cell[0] += 1
            cell[2] += yv
        else:
            cell[1] += 1
            cell[3] += yv
    got = {r.decile: r for r in QS["q255_qini_uplift"].fn(spark, sf_dir).collect()}
    nt = nc = ct = cc = 0
    for d in sorted(cum):
        bnt, bnc, bct, bcc = cum[d]
        nt, nc, ct, cc = nt + bnt, nc + bnc, ct + bct, cc + bcc
        r = got[d]
        assert (r.n_treat, r.n_ctrl, r.conv_treat, r.conv_ctrl) == (nt, nc, ct, cc)
        assert math.isclose(r.qini, ct - cc * nt / nc, rel_tol=1e-12)


def test_q256_rolling_origin_matches_python(spark, sf_dir):
    from docling_api_spark.operators.timeseries import _RO_FOLDS

    o = load_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderdate", "o_totalprice"
    ).collect()
    c = {r.c_custkey: r.c_nationkey
         for r in load_table(spark, sf_dir, "customer").collect()}
    n = {r.n_nationkey: r.n_name
         for r in load_table(spark, sf_dir, "nation").collect()}
    monthly = defaultdict(int)
    for r in o:
        mk = r.o_orderdate.year * 12 + r.o_orderdate.month
        monthly[(n[c[r.o_custkey]], mk)] += round(r.o_totalprice * 100)
    mmax = max(mk for _, mk in monthly)
    got = {r.fold: r for r in
           QS["q256_rolling_origin_backtest"].fn(spark, sf_dir).collect()}
    assert set(got) == set(range(_RO_FOLDS))
    for fold in range(_RO_FOLDS):
        t = mmax - fold
        acts = {nat: v for (nat, mk), v in monthly.items() if mk == t}
        sae = sse = sa = 0
        for nat, act in acts.items():
            fc = monthly.get((nat, t - 12), 0)
            sae += abs(fc - act)
            sse += fc - act
            sa += act
        r = got[fold]
        assert r.target_mk == t and r.n_nations == len(acts)
        assert math.isclose(r.wape, sae / sa, rel_tol=1e-12)
        assert math.isclose(r.bias, sse / sa, rel_tol=1e-12)


def test_q257_dtw_matches_python_dp(spark, sf_dir):
    o = load_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderdate", "o_totalprice"
    ).collect()
    c = {r.c_custkey: r.c_nationkey
         for r in load_table(spark, sf_dir, "customer").collect()}
    n = {r.n_nationkey: r.n_name
         for r in load_table(spark, sf_dir, "nation").collect()}
    monthly = defaultdict(lambda: defaultdict(int))
    for r in o:
        mk = r.o_orderdate.year * 12 + r.o_orderdate.month
        monthly[n[c[r.o_custkey]]][mk] += int(math.floor(r.o_totalprice + 0.5))
    series = {
        nat: [v for _, v in sorted(d.items())] for nat, d in monthly.items()
    }

    def znorm(ints):
        # the r11 exact-order redesign: int sums, single correctly-rounded
        # divisions, IEEE sqrt — EXACT equality expected, not isclose
        n, s = len(ints), sum(ints)
        ss = sum(x * x for x in ints)
        mean = float(s) / float(n)
        std = math.sqrt(float(n * ss - s * s) / float(n * n)) or 1.0
        return [(float(x) - mean) / std for x in ints]

    def dtw(a, b):
        na, nb = len(a), len(b)
        inf = float("inf")
        prev = [0.0] + [inf] * nb
        for i in range(1, na + 1):
            cur = [inf] * (nb + 1)
            for j in range(1, nb + 1):
                d = abs(a[i - 1] - b[j - 1])
                cur[j] = d + min(prev[j], cur[j - 1], prev[j - 1])
            prev = cur
        return prev[nb]

    got = {
        (r.nation_a, r.nation_b): r.dtw
        for r in QS["q257_dtw_distance"].fn(spark, sf_dir).collect()
    }
    names = sorted(series)
    expect_keys = {(a, b) for i, a in enumerate(names) for b in names[i + 1:]}
    assert set(got) == expect_keys
    for (a, b) in sorted(expect_keys)[:40]:
        za, zb = znorm(series[a]), znorm(series[b])
        assert got[(a, b)] == dtw(za, zb), (a, b)
        # DTW never exceeds the straight (unwarped) alignment cost
        if len(za) == len(zb):
            assert got[(a, b)] <= sum(
                abs(x - y) for x, y in zip(za, zb)
            ) + 1e-9


def test_q258_range_planner_matches_numpy(spark, sf_dir):
    from docling_api_spark.operators.layout import _RANGE_PARTS

    days = [
        (r.o_orderdate.date() - __import__("datetime").date(1970, 1, 1)).days
        for r in load_table(spark, sf_dir, "orders").select("o_orderdate").collect()
    ]
    taus = [(i + 1) / _RANGE_PARTS for i in range(_RANGE_PARTS - 1)]
    cuts = [
        float(np.percentile(days, t * 100, method="inverted_cdf"))
        for t in taus
    ]
    parts = defaultdict(list)
    for d in days:
        part = next(
            (i + 1 for i, cut in enumerate(cuts) if d <= cut), _RANGE_PARTS
        )
        parts[part].append(d)
    got = {r.part: r for r in
           QS["q258_range_partition_planner"].fn(spark, sf_dir).collect()}
    assert set(got) == set(parts)
    n = len(days)
    for part, ds in parts.items():
        r = got[part]
        assert r.n_rows == len(ds)
        assert (r.min_day, r.max_day) == (min(ds), max(ds))
        assert math.isclose(r.fill_ratio, len(ds) * _RANGE_PARTS / n,
                            rel_tol=1e-12)
    # balanced by construction: every partition within 2x of ideal
    assert max(r.fill_ratio for r in got.values()) < 2.0


def test_q259_elasticity_matches_python(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_shipdate", "l_quantity", "l_extendedprice"
    ).collect()
    pt = {r.p_partkey: r.p_brand for r in load_table(spark, sf_dir, "part").collect()}
    bm = defaultdict(lambda: [0, 0])
    for r in li:
        mk = r.l_shipdate.year * 12 + r.l_shipdate.month
        cell = bm[(pt[r.l_partkey], mk)]
        cell[0] += int(math.floor(r.l_quantity + 0.5))
        cell[1] += round(r.l_extendedprice * 100)
    expect = defaultdict(lambda: [0, 0, 0])  # n_pairs, support, num
    brands = {b for b, _ in bm}
    for b in brands:
        mks = sorted(mk for bb, mk in bm if bb == b)
        for m1, m2 in zip(mks, mks[1:]):
            if m2 != m1 + 1:
                continue
            q1, c1 = bm[(b, m1)]
            q2, c2 = bm[(b, m2)]
            if q1 <= 0 or q2 <= 0 or c2 / q2 == c1 / q1:
                continue
            e = ((q2 - q1) / ((q2 + q1) / 2)) / (
                ((c2 / q2) - (c1 / q1)) / (((c2 / q2) + (c1 / q1)) / 2)
            )
            cell = expect[b]
            cell[0] += 1
            cell[1] += q1 + q2
            cell[2] += int(math.floor(1e6 * (q1 + q2) * e + 0.5)) if (q1 + q2) * e >= 0 else -int(math.floor(-1e6 * (q1 + q2) * e + 0.5))
    got = {r.brand: r for r in QS["q259_arc_elasticity"].fn(spark, sf_dir).collect()}
    assert set(got) == set(expect)
    for b, (np_, sup, num) in expect.items():
        r = got[b]
        assert (r.n_pairs, r.total_support) == (np_, sup)
        assert math.isclose(r.weighted_elasticity, num / (1e6 * sup), rel_tol=1e-6)


def test_q260_markov_baseline_matches_python(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events").select("user_id", "ts", "event_type").collect()
    per_user = defaultdict(list)
    for r in ev:
        per_user[r.user_id].append((r.ts, r.event_type))
    counts = defaultdict(lambda: defaultdict(int))
    for rows in per_user.values():
        rows.sort()
        for (_, x), (_, y) in zip(rows, rows[1:]):
            counts[x][y] += 1
    got = {r.state: r for r in
           QS["q260_markov_baseline_accuracy"].fn(spark, sf_dir).collect()}
    assert set(got) == set(counts)
    for x, ys in counts.items():
        # max count, ties to alphabetically first
        y_hat = max(ys.items(), key=lambda kv: (kv[1], -ord(kv[0][0])))[0]
        n = sum(ys.values())
        r = got[x]
        assert r.predicted_next == y_hat
        assert (r.n_obs, r.n_correct) == (n, ys[y_hat])
        assert math.isclose(r.top1_accuracy, ys[y_hat] / n, rel_tol=1e-12)


def test_q261_kruskal_matches_scipy_formula(spark, sf_dir):
    o = load_table(spark, sf_dir, "orders").select("o_custkey", "o_totalprice").collect()
    c = {r.c_custkey: r.c_nationkey
         for r in load_table(spark, sf_dir, "customer").collect()}
    n = {r.n_nationkey: r.n_regionkey
         for r in load_table(spark, sf_dir, "nation").collect()}
    rg = {r.r_regionkey: r.r_name
          for r in load_table(spark, sf_dir, "region").collect()}
    vals = [(rg[n[c[r.o_custkey]]], round(r.o_totalprice * 100)) for r in o]
    try:
        from scipy import stats as sps
        groups = defaultdict(list)
        for g, v in vals:
            groups[g].append(v)
        h_ref = float(sps.kruskal(*groups.values()).statistic)
    except ImportError:
        # manual H with tie correction
        allv = sorted(v for _, v in vals)
        ranks = {}
        i = 0
        while i < len(allv):
            j = i
            while j + 1 < len(allv) and allv[j + 1] == allv[i]:
                j += 1
            ranks[allv[i]] = (i + j) / 2 + 1
            i = j + 1
        nn = len(vals)
        groups = defaultdict(list)
        for g, v in vals:
            groups[g].append(ranks[v])
        h = 12 / (nn * (nn + 1)) * sum(
            len(rs) * (sum(rs) / len(rs)) ** 2 for rs in groups.values()
        ) - 3 * (nn + 1)
        tiecnt = defaultdict(int)
        for _, v in vals:
            tiecnt[v] += 1
        h_ref = h / (1 - sum(t**3 - t for t in tiecnt.values()) / (nn**3 - nn))
    row = QS["q261_kruskal_wallis"].fn(spark, sf_dir).collect()[0]
    assert row.n_orders == len(vals)
    assert row.k_groups == len({g for g, _ in vals})
    assert math.isclose(row.h_statistic, h_ref, rel_tol=1e-6)


def test_q262_power_matches_statsmodels_formula(spark, sf_dir):
    from docling_api_spark.operators.analytics import (
        _PWR_MDES, _PWR_Z_ALPHA, _PWR_Z_BETA, CONV_MIN,
    )

    ev = load_table(spark, sf_dir, "events").select("user_id", "event_type").collect()
    pur = defaultdict(int)
    users = set()
    for r in ev:
        users.add(r.user_id)
        if r.event_type == "purchase":
            pur[r.user_id] += 1
    k = sum(1 for u in users if pur.get(u, 0) >= CONV_MIN)
    p1 = k / len(users)
    z = float(_PWR_Z_ALPHA) + float(_PWR_Z_BETA)
    got = {r.mde: r for r in QS["q262_power_analysis"].fn(spark, sf_dir).collect()}
    assert set(got) == set(_PWR_MDES)
    for mde in _PWR_MDES:
        p2 = p1 + mde
        n = math.ceil(z * z * (p1 * (1 - p1) + p2 * (1 - p2)) / (mde * mde))
        r = got[mde]
        assert (r.n_users, r.k) == (len(users), k)
        assert r.n_per_arm == n
    # a smaller effect needs more samples
    ns = [got[m].n_per_arm for m in sorted(_PWR_MDES)]
    assert ns == sorted(ns, reverse=True)


def test_q263_jackknife_matches_python(spark, sf_dir):
    import hashlib

    from docling_api_spark.operators.analytics import _JK_BUCKETS

    o = load_table(spark, sf_dir, "orders").select("o_custkey", "o_totalprice").collect()
    b = defaultdict(lambda: [0, 0])
    for r in o:
        bk = int(hashlib.md5(str(r.o_custkey).encode()).hexdigest()[:8],
                 16) % _JK_BUCKETS
        cell = b[bk]
        cell[0] += 1
        cell[1] += round(r.o_totalprice * 100)
    tn = sum(n for n, _ in b.values())
    tc = sum(cents for _, cents in b.values())
    g = len(b)
    thetas = [(tc - cents) / (tn - n) for n, cents in b.values()]
    tbar = sum(int(math.floor(1e6 * t + 0.5)) for t in thetas) / (1e6 * g)
    ssd = sum(
        int(math.floor(1e3 * (t - tbar) ** 2 + 0.5)) for t in thetas
    ) / 1e3
    var = (g - 1) / g * ssd / 1e4
    row = QS["q263_jackknife_ratio_variance"].fn(spark, sf_dir).collect()[0]
    assert row.n_buckets == g
    assert math.isclose(row.mean_order_value, tc / (100.0 * tn), rel_tol=1e-12)
    assert math.isclose(row.jackknife_variance, var, rel_tol=1e-6)
    assert math.isclose(row.jackknife_se, math.sqrt((g - 1) / g * ssd) / 100,
                        rel_tol=1e-6)


def test_q264_vocab_overlap_matches_python(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").select("source", "text").collect()
    vocab = defaultdict(set)
    for r in docs:
        vocab[r.source].update(r.text.split(" "))
    names = sorted(vocab)
    got = {
        (r.source_a, r.source_b): r
        for r in QS["q264_source_vocab_overlap"].fn(spark, sf_dir).collect()
    }
    for i, a in enumerate(names):
        for b_ in names[i + 1:]:
            inter = len(vocab[a] & vocab[b_])
            if inter == 0:
                assert (a, b_) not in got
                continue
            r = got[(a, b_)]
            assert (r.vocab_a, r.vocab_b, r.vocab_common) == (
                len(vocab[a]), len(vocab[b_]), inter,
            )
            assert math.isclose(
                r.jaccard, inter / len(vocab[a] | vocab[b_]), rel_tol=1e-12
            )
            assert math.isclose(
                r.containment, inter / min(len(vocab[a]), len(vocab[b_])),
                rel_tol=1e-12,
            )


def test_q265_shrinkage_matches_python(spark, sf_dir):
    o = load_table(spark, sf_dir, "orders").select("o_custkey", "o_totalprice").collect()
    c = {r.c_custkey: r.c_nationkey
         for r in load_table(spark, sf_dir, "customer").collect()}
    nn = {r.n_nationkey: r.n_name
          for r in load_table(spark, sf_dir, "nation").collect()}
    groups = defaultdict(list)
    for r in o:
        groups[nn[c[r.o_custkey]]].append(int(math.floor(r.o_totalprice + 0.5)))
    n = sum(len(v) for v in groups.values())
    k = len(groups)
    ts = sum(sum(v) for v in groups.values())
    ssw = sum(
        int(math.floor(sum(x * x for x in v) - sum(v) ** 2 / len(v) + 0.5))
        for v in groups.values()
    )
    ssb_raw = sum(
        int(math.floor(len(v) * (sum(v) / len(v)) ** 2 + 0.5))
        for v in groups.values()
    )
    var_w = ssw / (n - k)
    var_b = max(
        ((ssb_raw - ts * ts / n) / (k - 1) - var_w) / (n / k), 0.0
    )
    got = {r.nation: r for r in
           QS["q265_james_stein_shrinkage"].fn(spark, sf_dir).collect()}
    assert set(got) == set(groups)
    grand = ts / n
    for nat, v in groups.items():
        ni = len(v)
        raw = sum(v) / ni
        w = var_b / (var_b + var_w / ni)
        r = got[nat]
        assert r.ni == ni
        assert math.isclose(r.raw_mean, raw, rel_tol=1e-12)
        assert math.isclose(r.grand_mean, grand, rel_tol=1e-12)
        assert math.isclose(r.w, w, rel_tol=1e-9)
        assert math.isclose(r.shrunk_mean, w * raw + (1 - w) * grand,
                            rel_tol=1e-9)
        # shrinkage pulls toward (never past) the grand mean
        lo, hi = sorted((raw, grand))
        assert lo - 1e-9 <= r.shrunk_mean <= hi + 1e-9


def test_q266_hysteresis_matches_python(spark, sf_dir):
    v = _daily_dollars(spark, sf_dir)
    hi = float(np.percentile(v, 90, method="linear"))
    lo = float(np.percentile(v, 70, method="linear"))
    armed = 0
    days_armed = alerts = 0
    for x in v:
        prev = armed
        if x >= hi:
            armed = 1
        elif x <= lo:
            armed = 0
        days_armed += armed
        if armed and not prev:
            alerts += 1
    row = QS["q266_hysteresis_alerts"].fn(spark, sf_dir).collect()[0]
    assert row.n_days == len(v)
    assert (row.days_armed, row.n_alerts) == (days_armed, alerts)
    assert math.isclose(row.hi_threshold, hi, rel_tol=1e-9)
    assert math.isclose(row.lo_threshold, lo, rel_tol=1e-9)
    # hysteresis suppresses flapping: each alert covers >= 1 armed day
    assert row.n_alerts <= row.days_armed


def test_q267_l_diversity_matches_python(spark, sf_dir):
    from docling_api_spark.operators.quality import _LDIV_K, _LDIV_L

    o = load_table(spark, sf_dir, "orders").select("o_custkey", "o_orderpriority").collect()
    c = {r.c_custkey: (r.c_nationkey, r.c_mktsegment)
         for r in load_table(spark, sf_dir, "customer").collect()}
    nn = {r.n_nationkey: r.n_name
          for r in load_table(spark, sf_dir, "nation").collect()}
    cells = defaultdict(lambda: defaultdict(int))
    for r in o:
        nk, seg = c[r.o_custkey]
        cells[(nn[nk], seg)][r.o_orderpriority] += 1
    got = {(r.nation, r.segment): r for r in
           QS["q267_l_diversity"].fn(spark, sf_dir).collect()}
    assert set(got) == set(cells)
    for key, sens in cells.items():
        n = sum(sens.values())
        r = got[key]
        assert (r.n_rows, r.l_distinct) == (n, len(sens))
        assert math.isclose(r.dominant_share, max(sens.values()) / n,
                            rel_tol=1e-12)
        assert r.k_anonymous == (1 if n >= _LDIV_K else 0)
        assert r.l_diverse == (1 if len(sens) >= _LDIV_L else 0)


def test_q268_gini_stump_matches_python(spark, sf_dir):
    from docling_api_spark.operators.analytics import _LATE_DAYS, _STUMP_BUCKETS

    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice", "o_orderdate"
    ).collect()
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate").collect()
    odate = {r.o_orderkey: r.o_orderdate.date() for r in o}
    late = defaultdict(int)
    for r in li:
        if (r.l_shipdate.date() - odate[r.l_orderkey]).days > _LATE_DAYS:
            late[r.l_orderkey] = 1
    with_lines = {r.l_orderkey for r in li}
    pts = [
        (int(math.floor(r.o_totalprice + 0.5)), late.get(r.o_orderkey, 0))
        for r in o if r.o_orderkey in with_lines
    ]
    lo, hi = min(d for d, _ in pts), max(d for d, _ in pts) + 1
    buckets = defaultdict(lambda: [0, 0])
    for d, y in pts:
        cell = buckets[(_STUMP_BUCKETS * (d - lo)) // (hi - lo)]
        cell[0] += 1
        cell[1] += y
    nt = sum(n for n, _ in buckets.values())
    kt = sum(k for _, k in buckets.values())

    def gini(k, n):
        p = k / n
        return 1 - p * p - (1 - p) * (1 - p)

    best = None
    nl = kl = 0
    for b in sorted(buckets):
        nl += buckets[b][0]
        kl += buckets[b][1]
        if nl >= nt:
            continue
        gq = int(math.floor(1e9 * (
            nl / nt * gini(kl, nl) + (nt - nl) / nt * gini(kt - kl, nt - nl)
        ) + 0.5))
        if best is None or gq < best[0]:
            best = (gq, b, nl, kl)
    gq, b, nl, kl = best
    row = QS["q268_gini_stump"].fn(spark, sf_dir).collect()[0]
    assert row.split_bucket == b
    assert (row.n_left, row.n_right) == (nl, nt - nl)
    assert math.isclose(row.left_rate, kl / nl, rel_tol=1e-12)
    assert math.isclose(row.right_rate, (kt - kl) / (nt - nl), rel_tol=1e-12)
    assert math.isclose(row.weighted_gini, gq / 1e9, rel_tol=1e-12)
    # the chosen split beats the no-split impurity
    assert row.weighted_gini <= gini(kt, nt) + 1e-12


def test_q269_viterbi_matches_python(spark, sf_dir):
    from docling_api_spark.operators.timeseries import _ABS_N, _ABSORB_TARGET

    ev = load_table(spark, sf_dir, "events").select("user_id", "ts", "event_type").collect()
    per_user = defaultdict(list)
    for r in ev:
        per_user[r.user_id].append((r.ts, r.event_type))
    counts = defaultdict(int)
    for rows in per_user.values():
        rows.sort()
        for (_, a), (_, b) in zip(rows, rows[1:]):
            counts[(a, b)] += 1
    totals = defaultdict(int)
    for (a, _), c in counts.items():
        totals[a] += c
    pn = {xy: round(_ABS_N * c / totals[xy[0]]) for xy, c in counts.items()}
    v = {}  # state -> (best_prob_n, path)
    for _ in range(3):
        nv = {}
        for x in totals:
            cands = []
            for (a, y), p in pn.items():
                if a != x:
                    continue
                if y == _ABSORB_TARGET:
                    sc = round(float(p * _ABS_N) / _ABS_N)
                    pa = _ABSORB_TARGET
                else:
                    prev = v.get(y)
                    sc = round(float(p * (prev[0] if prev else 0)) / _ABS_N)
                    pa = f"{y}-{prev[1] if prev else '?'}"
                cands.append((sc, pa))
            best_sc = max(sc for sc, _ in cands)
            # ties: lexicographically largest path (the packed-key rule)
            best_pa = max(pa for sc, pa in cands if sc == best_sc)
            nv[x] = (best_sc, best_pa)
        v = nv
    got = {r.state: r for r in QS["q269_viterbi_path"].fn(spark, sf_dir).collect()}
    assert set(got) == set(totals)
    for x, (sc, pa) in v.items():
        r = got[x]
        assert r.best_path == f"{x}-{pa}"
        assert math.isclose(r.path_prob, sc / _ABS_N, abs_tol=2e-9)
        assert r.best_path.endswith(_ABSORB_TARGET)


def test_q270_capture_recapture_matches_python(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events").select("user_id", "event_type").collect()
    views = {r.user_id for r in ev if r.event_type == "view"}
    clicks = {r.user_id for r in ev if r.event_type == "click"}
    allu = {r.user_id for r in ev}
    n1, n2, m = len(views), len(clicks), len(views & clicks)
    est = (n1 + 1) * (n2 + 1) / (m + 1) - 1
    row = QS["q270_capture_recapture"].fn(spark, sf_dir).collect()[0]
    assert (row.n1, row.n2, row.m, row.n_true) == (n1, n2, m, len(allu))
    assert math.isclose(row.n_chapman, est, rel_tol=1e-12)
    assert math.isclose(row.rel_error, (est - len(allu)) / len(allu),
                        rel_tol=1e-9, abs_tol=1e-12)


def test_q271_truncation_recall_matches_numpy(spark, sf_dir):
    from docling_api_spark.operators.similarity import (
        _TRUNC_DIMS, _TRUNC_K, _TRUNC_QUERIES,
    )

    rows = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding").collect()
    vecs = {r.vec_id: np.array(r.embedding, dtype=np.float64) for r in rows}
    qids = sorted(v for v in vecs if v % 97 == 0)[:_TRUNC_QUERIES]

    def topk(qid, dims):
        qv = vecs[qid][:dims] if dims else vecs[qid]
        scored = []
        for vid, v in vecs.items():
            if vid == qid:
                continue
            vv = v[:dims] if dims else v
            cos = float(vv @ qv) / (
                float(np.sqrt(vv @ vv)) * float(np.sqrt(qv @ qv))
            )
            scored.append((-cos, vid))
        scored.sort()
        return {vid for _, vid in scored[:_TRUNC_K]}

    got = {r.query_id: r for r in
           QS["q271_truncation_recall"].fn(spark, sf_dir).collect()}
    assert set(got) == set(qids)
    for qid in qids:
        full = topk(qid, None)
        trunc = topk(qid, _TRUNC_DIMS)
        common = len(full & trunc)
        r = got[qid]
        assert r.n_common == common
        assert math.isclose(r.recall_at_10, common / _TRUNC_K, rel_tol=1e-12)


def test_q272_proration_matches_python(spark, sf_dir):
    import calendar
    import datetime as dt

    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice", "o_orderdate"
    ).collect()
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate").collect()
    last_ship = {}
    for r in li:
        d = r.l_shipdate.date()
        if r.l_orderkey not in last_ship or d > last_ship[r.l_orderkey]:
            last_ship[r.l_orderkey] = d
    monthly = defaultdict(lambda: [0, 0])
    for r in o:
        if r.o_orderkey not in last_ship:
            continue
        s = r.o_orderdate.date()
        e = max(last_ship[r.o_orderkey], s)
        cents = round(r.o_totalprice * 100)
        span = (e - s).days + 1
        mk = s.year * 12 + s.month - 1
        mk_e = e.year * 12 + e.month - 1
        while mk <= mk_e:
            y, m0 = mk // 12, mk % 12 + 1
            m_start = dt.date(y, m0, 1)
            m_end = dt.date(y, m0, calendar.monthrange(y, m0)[1])
            ov = (min(e, m_end) - max(s, m_start)).days + 1
            cell = monthly[mk]
            cell[0] += 1
            cell[1] += int(math.floor(cents * ov / span + 0.5))
            mk += 1
    got = {r.month_key: r for r in
           QS["q272_revenue_proration"].fn(spark, sf_dir).collect()}
    assert set(got) == set(monthly)
    total_rec = 0.0
    for mk, (n, cents) in monthly.items():
        r = got[mk]
        assert r.n_orders == n
        assert math.isclose(r.recognized_revenue, cents / 100.0, rel_tol=1e-12)
        total_rec += r.recognized_revenue
    # conservation: recognized total ~ booked total (rounding residue only)
    booked = sum(r.o_totalprice for r in o if r.o_orderkey in last_ship)
    assert abs(total_rec - booked) < 0.01 * len(monthly) * 40


def test_q273_budget_selection_matches_python(spark, sf_dir):
    from docling_api_spark.operators.datapipe import _BUDGET_FRACTION_PCT

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text").collect()
    buckets = defaultdict(lambda: [0, 0])
    total = 0
    for r in docs:
        t = r.text.split(" ")
        q = 1000 * len(set(t)) // len(t)
        cell = buckets[q]
        cell[0] += 1
        cell[1] += len(t)
        total += len(t)
    budget = total * _BUDGET_FRACTION_PCT // 100
    kept_docs = kept_tokens = 0
    threshold = None
    cum = 0
    for q in sorted(buckets, reverse=True):
        n, toks = buckets[q]
        if cum < budget:  # bucket starts inside budget -> taken whole
            kept_docs += n
            kept_tokens += toks
            threshold = q
        cum += toks
    row = QS["q273_token_budget_selection"].fn(spark, sf_dir).collect()[0]
    assert (row.n_docs_kept, row.tokens_kept) == (kept_docs, kept_tokens)
    assert row.threshold_permille == threshold
    assert math.isclose(row.budget_used, kept_tokens / total, rel_tol=1e-12)


def test_q274_nearest_centroid_matches_numpy(spark, sf_dir):
    rows = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", "embedding", "label"
    ).collect()
    by_label = defaultdict(list)
    for r in rows:
        by_label[r.label].append(np.array(r.embedding, dtype=np.float64))
    protos = {}
    for lab, vs in by_label.items():
        # mirror the DECIMAL(28,12)-quantized per-dim mean
        m = np.stack(vs)
        protos[lab] = np.array([
            sum(round(float(x), 12) for x in m[:, j]) / len(vs)
            for j in range(m.shape[1])
        ])
    correct = defaultdict(int)
    count = defaultdict(int)
    for r in rows:
        v = np.array(r.embedding, dtype=np.float64)
        best = None
        for lab in sorted(protos):
            c = protos[lab]
            cos = float(v @ c) / (
                float(np.sqrt(v @ v)) * float(np.sqrt(c @ c))
            )
            key = (round(1e9 * (cos + 1)), lab)
            if best is None or key > best[0]:
                best = (key, lab)
        count[r.label] += 1
        if best[1] == r.label:
            correct[r.label] += 1
    got = {r.label: r for r in QS["q274_nearest_centroid"].fn(spark, sf_dir).collect()}
    assert set(got) == set(count)
    for lab in count:
        r = got[lab]
        assert (r.n_vectors, r.n_correct) == (count[lab], correct[lab])
        assert math.isclose(r.accuracy, correct[lab] / count[lab], rel_tol=1e-12)


def test_q275_factorial_matches_python(spark, sf_dir):
    import hashlib

    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_type", "value"
    ).collect()
    y = defaultdict(int)
    users = set()
    for r in ev:
        users.add(r.user_id)
        if r.event_type == "purchase":
            y[r.user_id] += round(r.value * 100)

    def h(key):
        return int(hashlib.md5(str(key).encode()).hexdigest()[:8], 16) % 2

    cells = defaultdict(list)
    for u in users:
        cells[(h(u), h(u * 31 + 7))].append(y.get(u, 0))
    m = {k: sum(v) / len(v) for k, v in cells.items()}
    var_sum = sum(
        int(math.floor(1e6 * (len(v) * sum(x * x for x in v) - sum(v) ** 2)
                       / (len(v) * (len(v) - 1) * len(v)) + 0.5)) / 1e6
        for v in cells.values()
    )
    inter = (m[(1, 1)] - m[(1, 0)]) - (m[(0, 1)] - m[(0, 0)])
    row = QS["q275_factorial_experiment"].fn(spark, sf_dir).collect()[0]
    assert row.n_users == len(users)
    assert math.isclose(
        row.effect_a,
        ((m[(1, 0)] + m[(1, 1)]) / 2 - (m[(0, 0)] + m[(0, 1)]) / 2) / 100,
        rel_tol=1e-9, abs_tol=1e-9,
    )
    assert math.isclose(
        row.effect_b,
        ((m[(0, 1)] + m[(1, 1)]) / 2 - (m[(0, 0)] + m[(1, 0)]) / 2) / 100,
        rel_tol=1e-9, abs_tol=1e-9,
    )
    assert math.isclose(row.interaction_ab, inter / 100, rel_tol=1e-9,
                        abs_tol=1e-9)
    assert math.isclose(row.interaction_z, inter / math.sqrt(var_sum),
                        rel_tol=1e-6)


def test_q276_burrows_delta_matches_python(spark, sf_dir):
    from docling_api_spark.operators.textstats import _DELTA_TOPK

    docs = load_table(spark, sf_dir, "documents").select("source", "text").collect()
    freq = defaultdict(lambda: defaultdict(int))
    tot = defaultdict(int)
    corpus = defaultdict(int)
    for r in docs:
        for w in r.text.split(" "):
            freq[r.source][w] += 1
            tot[r.source] += 1
            corpus[w] += 1
    topw = [w for w, _ in sorted(corpus.items(), key=lambda kv: (-kv[1], kv[0]))[:_DELTA_TOPK]]
    sources = sorted(tot)
    fq = {
        (s, w): int(math.floor(1e9 * freq[s].get(w, 0) / tot[s] + 0.5))
        for s in sources for w in topw
    }
    z = {}
    for w in topw:
        vals = [fq[(s, w)] for s in sources]
        k = len(vals)
        s1, s2 = sum(vals), sum(v * v for v in vals)
        sd = math.sqrt((k * s2 - s1 * s1) / (k * k))
        for s in sources:
            z[(s, w)] = (fq[(s, w)] - s1 / k) / sd
    got = {(r.source_a, r.source_b): r.delta
           for r in QS["q276_burrows_delta"].fn(spark, sf_dir).collect()}
    for i, a in enumerate(sources):
        for b in sources[i + 1:]:
            d = sum(
                int(math.floor(1e6 * abs(z[(a, w)] - z[(b, w)]) + 0.5))
                for w in topw
            ) / (1e6 * len(topw))
            assert math.isclose(got[(a, b)], d, rel_tol=1e-9)


def test_q277_reserve_curve_matches_python(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_orderkey", "l_linenumber", "l_extendedprice"
    ).collect()
    stacks = defaultdict(list)
    for r in li:
        stacks[r.l_partkey].append(
            (round(r.l_extendedprice * 100), r.l_orderkey, r.l_linenumber)
        )
    top2 = {}
    for pk, bids in stacks.items():
        bids.sort(key=lambda t: (-t[0], t[1], t[2]))
        top2[pk] = (bids[0][0], bids[1][0] if len(bids) > 1 else 0)
    b1s = sorted(b1 for b1, _ in top2.values())
    reserves = {
        float(np.percentile(b1s, t * 100, method="inverted_cdf"))
        for t in (0.1, 0.3, 0.5, 0.7, 0.9)
    }
    got = {r.reserve_cents: r for r in
           QS["q277_reserve_price_curve"].fn(spark, sf_dir).collect()}
    assert set(got) == {int(r) for r in reserves}
    for r in reserves:
        sold = [(b1, b2) for b1, b2 in top2.values() if b1 >= r]
        rev = sum(max(b2, int(r)) for _, b2 in sold)
        row = got[int(r)]
        assert row.n_sold == len(sold)
        assert math.isclose(row.revenue, rev / 100.0, rel_tol=1e-12)
    # monotone trade-off: higher reserve, fewer sales
    ordered = [got[k].n_sold for k in sorted(got)]
    assert ordered == sorted(ordered, reverse=True)


def test_q278_coverage_matches_python(spark, sf_dir):
    from docling_api_spark.operators.textstats import _COV_KS

    docs = load_table(spark, sf_dir, "documents").select("text").collect()
    counts = defaultdict(int)
    for r in docs:
        for w in r.text.split(" "):
            counts[w] += 1
    ranked = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))
    total = sum(counts.values())
    got = {r.k: r for r in QS["q278_ngram_coverage"].fn(spark, sf_dir).collect()}
    assert set(got) == set(_COV_KS)
    prev = 0.0
    for k in sorted(_COV_KS):
        cov = sum(c for _, c in ranked[:k])
        r = got[k]
        assert r.total_tokens == total and r.covered_tokens == cov
        assert math.isclose(r.coverage, cov / total, rel_tol=1e-12)
        assert r.coverage >= prev  # coverage is monotone in k
        prev = r.coverage


def test_q279_rdd_matches_numpy(spark, sf_dir):
    from docling_api_spark.operators.analytics import (
        _LATE_DAYS, _RD_BW, _RD_CUTOFF,
    )

    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice", "o_orderdate"
    ).collect()
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate").collect()
    odate = {r.o_orderkey: r.o_orderdate.date() for r in o}
    late = defaultdict(int)
    order_has = set()
    for r in li:
        order_has.add(r.l_orderkey)
        if (r.l_shipdate.date() - odate[r.l_orderkey]).days > _LATE_DAYS:
            late[r.l_orderkey] = 1
    pts = []
    for r in o:
        if r.o_orderkey not in order_has:
            continue
        d = int(math.floor(r.o_totalprice + 0.5))
        if _RD_CUTOFF - _RD_BW <= d < _RD_CUTOFF + _RD_BW:
            pts.append((d - _RD_CUTOFF, late.get(r.o_orderkey, 0)))
    row = QS["q279_regression_discontinuity"].fn(spark, sf_dir).collect()[0]
    for side, flt in (("l", lambda x: x < 0), ("r", lambda x: x >= 0)):
        xs = np.array([x for x, _ in pts if flt(x)], dtype=float)
        ys = np.array([y for x, y in pts if flt(x)], dtype=float)
        slope, intercept = np.polyfit(xs, ys, 1)
        if side == "l":
            assert row.n_left == len(xs)
            assert math.isclose(row.slope_left, slope, rel_tol=1e-6,
                                abs_tol=1e-12)
            assert math.isclose(row.rate_at_cut_left, intercept,
                                rel_tol=1e-6, abs_tol=1e-9)
        else:
            assert row.n_right == len(xs)
            assert math.isclose(row.slope_right, slope, rel_tol=1e-6,
                                abs_tol=1e-12)
            assert math.isclose(row.rate_at_cut_right, intercept,
                                rel_tol=1e-6, abs_tol=1e-9)
    assert math.isclose(
        row.rd_jump, row.rate_at_cut_right - row.rate_at_cut_left,
        rel_tol=1e-9, abs_tol=1e-12,
    )


def test_q280_consistent_hashing_matches_python(spark, sf_dir):
    import hashlib

    from docling_api_spark.operators.layout import (
        _CH_NODES, _CH_SPACE, _CH_VNODES,
    )

    keys = [r.c_custkey for r in
            load_table(spark, sf_dir, "customer").select("c_custkey").collect()]

    def h(s):
        return int(hashlib.md5(s.encode()).hexdigest()[:8], 16)

    def ring(n):
        return [
            (node, h(f"n{node}:{v}"))
            for node in range(n) for v in range(_CH_VNODES)
        ]

    def assign(kh, r):
        return min(
            r, key=lambda t: (((t[1] - kh) % _CH_SPACE + _CH_SPACE)
                              % _CH_SPACE) * 100 + t[0]
        )[0]

    ra, rb = ring(_CH_NODES), ring(_CH_NODES + 1)
    ring_moved = modulo_moved = 0
    for k in keys:
        kh = h(str(k))
        if assign(kh, ra) != assign(kh, rb):
            ring_moved += 1
        if k % _CH_NODES != k % (_CH_NODES + 1):
            modulo_moved += 1
    row = QS["q280_consistent_hashing"].fn(spark, sf_dir).collect()[0]
    assert (row.n_keys, row.ring_moved, row.modulo_moved) == (
        len(keys), ring_moved, modulo_moved,
    )
    # the point of the ring: a node join moves a ~1/(n+1) minority, while
    # modulo moves a large majority
    assert row.ring_moved_frac < 0.5 < row.modulo_moved_frac


def test_q281_media_dedup_matches_python(spark, sf_dir):
    import hashlib

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text").collect()
    groups = defaultdict(list)
    for r in docs:
        b = r.text.encode("utf-8")
        groups[(hashlib.md5(b).hexdigest(), len(b))].append(r.doc_id)
    got = {(r.digest, r.n_bytes): r for r in
           QS["q281_media_content_dedup"].fn(spark, sf_dir).collect()}
    assert set(got) == set(groups)
    for key, ids in groups.items():
        r = got[key]
        assert r.n_copies == len(ids)
        assert r.keeper_doc == min(ids)
        assert r.reclaimable_bytes == (len(ids) - 1) * key[1]
        assert r.is_duplicate == (1 if len(ids) >= 2 else 0)


def test_q282_stride_signature_matches_python(spark, sf_dir):
    import hashlib

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text").collect()
    groups = defaultdict(lambda: [0, set(), None])
    for r in docs:
        b = r.text.encode("utf-8")
        n = len(b)
        sig = hashlib.md5(
            b[0:8] + b[n // 4:n // 4 + 8] + b[n // 2:n // 2 + 8]
            + b[(3 * n) // 4:(3 * n) // 4 + 8]
        ).hexdigest()
        cell = groups[sig]
        cell[0] += 1
        cell[1].add(hashlib.md5(b).hexdigest())
        cell[2] = r.doc_id if cell[2] is None else min(cell[2], r.doc_id)
    got = {r.sig: r for r in
           QS["q282_media_stride_signature"].fn(spark, sf_dir).collect()}
    assert set(got) == set(groups)
    for sig, (n, digs, sample) in groups.items():
        r = got[sig]
        assert (r.n_blobs, r.n_distinct, r.sample_doc) == (n, len(digs), sample)
        assert r.candidate_group == (1 if n >= 2 else 0)
        assert r.near_dup_group == (1 if len(digs) >= 2 else 0)
        # an exact-dup group is always also a candidate group
        if r.near_dup_group:
            assert r.candidate_group


def test_q283_kappa_matches_sklearn_formula(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text").collect()
    uniq = []
    tlen = []
    for r in docs:
        t = r.text.split(" ")
        uniq.append(1000 * len(set(t)) // len(t))
        tlen.append(1000 * (len(r.text) - len(t) + 1) // len(t))
    cu = float(np.percentile(uniq, 50, method="linear"))
    ct = float(np.percentile(tlen, 50, method="linear"))
    cells = defaultdict(int)
    for u, tl in zip(uniq, tlen):
        cells[(1 if u >= cu else 0, 1 if tl >= ct else 0)] += 1
    n = len(uniq)
    po = (cells[(1, 1)] + cells[(0, 0)]) / n
    pa1 = (cells[(1, 1)] + cells[(1, 0)]) / n
    pb1 = (cells[(1, 1)] + cells[(0, 1)]) / n
    pe = pa1 * pb1 + (1 - pa1) * (1 - pb1)
    kappa = (po - pe) / (1 - pe)
    row = QS["q283_cohen_kappa"].fn(spark, sf_dir).collect()[0]
    assert row.n == n
    assert (row.n11, row.n10, row.n01, row.n00) == (
        cells[(1, 1)], cells[(1, 0)], cells[(0, 1)], cells[(0, 0)],
    )
    assert math.isclose(row.observed_agreement, po, rel_tol=1e-12)
    assert math.isclose(row.kappa, kappa, rel_tol=1e-9)
    assert -1.0 <= row.kappa <= 1.0


def test_q284_weighted_jaccard_matches_python(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").select("source", "text").collect()
    freq = defaultdict(lambda: defaultdict(int))
    for r in docs:
        for w in r.text.split(" "):
            freq[r.source][w] += 1
    names = sorted(freq)
    got = {(r.source_a, r.source_b): r for r in
           QS["q284_weighted_jaccard"].fn(spark, sf_dir).collect()}
    for i, a in enumerate(names):
        for b in names[i + 1:]:
            smin = sum(min(f, freq[b].get(w, 0)) for w, f in freq[a].items())
            na, nb = sum(freq[a].values()), sum(freq[b].values())
            r = got[(a, b)]
            assert (r.tokens_a, r.tokens_b, r.sum_min) == (na, nb, smin)
            jw = smin / (na + nb - smin)
            assert math.isclose(r.weighted_jaccard, jw, rel_tol=1e-12)
            # bag similarity never exceeds 1 and is 0 only for disjoint bags
            assert 0.0 <= r.weighted_jaccard <= 1.0


def test_q285_quadratic_matches_numpy(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem").select("l_discount", "l_quantity").collect()
    xs = np.array([round(r.l_discount * 1000) for r in li], dtype=float)
    ys = np.array([int(math.floor(r.l_quantity + 0.5)) for r in li], dtype=float)
    c2, c1, c0 = np.polyfit(xs, ys, 2)
    row = QS["q285_quadratic_response"].fn(spark, sf_dir).collect()[0]
    assert row.n_lines == len(xs)
    assert math.isclose(row.a, c0, rel_tol=1e-6)
    assert math.isclose(row.b, c1, rel_tol=1e-6, abs_tol=1e-9)
    assert math.isclose(row.c, c2, rel_tol=1e-6, abs_tol=1e-12)
    assert math.isclose(row.vertex_permille, -c1 / (2 * c2), rel_tol=1e-5)


def test_q286_negbin_matches_python(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events").select("event_type", "user_id").collect()
    counts = defaultdict(lambda: defaultdict(int))
    for r in ev:
        counts[r.event_type][r.user_id] += 1
    got = {r.event_type: r for r in QS["q286_negbin_fit"].fn(spark, sf_dir).collect()}
    assert set(got) == set(counts)
    for et, users in counts.items():
        ks = list(users.values())
        n = len(ks)
        mu = sum(ks) / n
        var = (n * sum(k * k for k in ks) - sum(ks) ** 2) / (n * (n - 1))
        r = got[et]
        assert r.n == n
        assert math.isclose(r.mean_count, mu, rel_tol=1e-12)
        assert math.isclose(r.var_count, var, rel_tol=1e-12)
        assert math.isclose(r.dispersion_index, var / mu, rel_tol=1e-12)
        if var > mu:
            assert math.isclose(r.nb_r, mu * mu / (var - mu), rel_tol=1e-9)
            assert math.isclose(r.nb_p, mu / var, rel_tol=1e-12)
            # NB mean identity: r(1-p)/p == mu
            assert math.isclose(r.nb_r * (1 - r.nb_p) / r.nb_p, mu,
                                rel_tol=1e-9)
        else:
            assert r.nb_r is None and r.nb_p is None


def test_q287_multiple_testing_matches_python(spark, sf_dir):
    import hashlib

    from docling_api_spark.operators.analytics import CONV_MIN

    ev = load_table(spark, sf_dir, "events").select("user_id", "event_type").collect()
    c = {r.c_custkey: r.c_nationkey
         for r in load_table(spark, sf_dir, "customer").collect()}
    n = {r.n_nationkey: r.n_regionkey
         for r in load_table(spark, sf_dir, "nation").collect()}
    rg = {r.r_regionkey: r.r_name
          for r in load_table(spark, sf_dir, "region").collect()}
    pur = defaultdict(int)
    users = set()
    for r in ev:
        users.add(r.user_id)
        if r.event_type == "purchase":
            pur[r.user_id] += 1
    by_region = defaultdict(lambda: [0, 0, 0, 0])
    for u in users:
        if u not in c:
            continue
        region = rg[n[c[u]]]
        arm = int(hashlib.md5(str(u).encode()).hexdigest()[:8], 16) % 2
        conv = 1 if pur.get(u, 0) >= CONV_MIN else 0
        cell = by_region[region]
        cell[arm] += 1
        cell[2 + arm] += conv
    got = {r.region: r for r in
           QS["q287_multiple_testing"].fn(spark, sf_dir).collect()}
    for region, (na, nb, ca, cb) in by_region.items():
        if na == 0 or nb == 0 or ca + cb == 0 or ca + cb == na + nb:
            assert region not in got
            continue
        p = (ca + cb) / (na + nb)
        z = (ca / na - cb / nb) / math.sqrt(p * (1 - p) * (1 / na + 1 / nb))
        r = got[region]
        assert (r.n_a, r.n_b) == (na, nb)
        assert math.isclose(r.z_stat, z, rel_tol=1e-9)
        assert r.sig_raw == (1 if abs(z) > 1.959963984540054 else 0)
        assert r.sig_bonferroni == (1 if abs(z) > 2.5758293035489004 else 0)
        assert r.sig_bonferroni <= r.sig_raw  # stricter threshold


def test_q288_ltv_matches_python(spark, sf_dir):
    from docling_api_spark.operators.analytics import _LTV_R_CAP

    o = load_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderdate", "o_totalprice"
    ).collect()
    first = {}
    for r in o:
        mk = r.o_orderdate.year * 12 + r.o_orderdate.month
        if r.o_custkey not in first or mk < first[r.o_custkey]:
            first[r.o_custkey] = mk
    agg = defaultdict(lambda: [0, 0, set()])  # m0c, m1c, cohort custs at age0
    for r in o:
        m0 = first[r.o_custkey]
        mk = r.o_orderdate.year * 12 + r.o_orderdate.month
        q = m0 // 3
        cell = agg[q]
        if mk - m0 == 0:
            cell[0] += round(r.o_totalprice * 100)
            cell[2].add(r.o_custkey)
        elif mk - m0 == 1:
            cell[1] += round(r.o_totalprice * 100)
    got = {r.cohort_q: r for r in QS["q288_ltv_projection"].fn(spark, sf_dir).collect()}
    expect = {q for q, cell in agg.items() if cell[0] > 0}
    assert set(got) == expect
    for q in expect:
        m0c, m1c, custs = agg[q]
        rr = min(m1c / m0c, _LTV_R_CAP)
        ltv = (m0c / (100.0 * len(custs))) / (1 - rr)
        r = got[q]
        assert r.cohort_size == len(custs)
        assert math.isclose(r.month0_revenue, m0c / 100.0, rel_tol=1e-12)
        assert math.isclose(r.retention_r, rr, rel_tol=1e-12)
        assert math.isclose(r.ltv_per_customer, ltv, rel_tol=1e-12)
        assert r.ltv_per_customer > 0


def test_q289_double_fire_matches_python(spark, sf_dir):
    from docling_api_spark.operators.timeseries import _DF_WINDOW_S

    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_type", "event_id", "ts", "value"
    ).collect()
    rows = [
        (r.user_id, r.event_type, r.event_id, int(r.ts.timestamp() * 1e6),
         round(r.value * 100))
        for r in ev
    ]
    by_key = defaultdict(list)
    for u, et, eid, t, c in rows:
        by_key[(u, et)].append((t, eid, c))
    expect = {}
    for (u, et), items in by_key.items():
        items.sort()
        for i, (t1, e1, c1) in enumerate(items):
            for t2, e2, c2 in items[i + 1:]:
                if t2 - t1 > _DF_WINDOW_S * 1_000_000:
                    break
                if (t1, e1) < (t2, e2):
                    expect[(u, et, e1, e2)] = (
                        (t2 - t1) // 1_000_000, abs(c2 - c1),
                    )
    got = {
        (r.user_id, r.event_type, r.first_event, r.second_event):
        (r.gap_s, r.delta_cents)
        for r in QS["q289_double_fire_detector"].fn(spark, sf_dir).collect()
    }
    assert got == expect
    for gap, _ in got.values():
        assert 0 <= gap <= _DF_WINDOW_S


def test_q290_fairness_matches_python(spark, sf_dir):
    from docling_api_spark.operators.analytics import CAL_BUCKETS

    o = load_table(spark, sf_dir, "orders").select("o_custkey", "o_orderdate").collect()
    c = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_acctbal", "c_mktsegment"
    ).collect()
    y1 = max(r.o_orderdate.year for r in o) - 1
    actives = {r.o_custkey for r in o if r.o_orderdate.year == y1}
    ranked = sorted(c, key=lambda r: (r.c_acctbal, r.c_custkey))
    nm1 = len(ranked) - 1
    cells = defaultdict(lambda: [0, 0, 0, 0])  # n, sel, pos, selpos
    for r0, r in enumerate(ranked):
        sel = 1 if min(r0 * CAL_BUCKETS // nm1, CAL_BUCKETS - 1) >= 7 else 0
        yv = 1 if r.c_custkey in actives else 0
        cell = cells[r.c_mktsegment]
        cell[0] += 1
        cell[1] += sel
        cell[2] += yv
        cell[3] += sel * yv
    best_sel = max(s / n for n, s, _, _ in cells.values())
    best_tpr = max(sp / p for _, _, p, sp in cells.values())
    got = {r.segment: r for r in QS["q290_fairness_audit"].fn(spark, sf_dir).collect()}
    assert set(got) == set(cells)
    for seg, (n, sel, pos, selpos) in cells.items():
        r = got[seg]
        assert (r.n, r.n_sel, r.n_pos) == (n, sel, pos)
        assert math.isclose(r.selection_rate, sel / n, rel_tol=1e-12)
        assert math.isclose(r.tpr, selpos / pos, rel_tol=1e-12)
        assert math.isclose(r.parity_gap, best_sel - sel / n, rel_tol=1e-9,
                            abs_tol=1e-12)
        assert r.parity_gap >= -1e-12 and r.opportunity_gap >= -1e-12


def test_q291_capping_matches_python(spark, sf_dir):
    from docling_api_spark.operators.timeseries import _FC_CAP

    ev = load_table(spark, sf_dir, "events").select("user_id", "ts", "event_id").collect()
    per = defaultdict(list)
    for r in ev:
        t = int(r.ts.timestamp() * 1e6)
        per[(r.user_id, t // 86400000000)].append((t, r.event_id))
    days = defaultdict(lambda: [0, 0, set()])
    for (u, d), items in per.items():
        items.sort()
        cell = days[d]
        cell[0] += len(items)
        over = max(0, len(items) - _FC_CAP)
        cell[1] += over
        if over:
            cell[2].add(u)
    got = {r.day: r for r in QS["q291_frequency_capping"].fn(spark, sf_dir).collect()}
    assert set(got) == set(days)
    for d, (n, sup, users) in days.items():
        r = got[d]
        assert (r.n_events, r.n_suppressed, r.n_users_capped) == (
            n, sup, len(users),
        )
        assert math.isclose(r.suppressed_share, sup / n, rel_tol=1e-12)


def test_q292_neyman_matches_python(spark, sf_dir):
    from docling_api_spark.operators.sampling import _NEYMAN_BUDGET

    o = load_table(spark, sf_dir, "orders").select("o_custkey", "o_totalprice").collect()
    c = {r.c_custkey: r.c_nationkey
         for r in load_table(spark, sf_dir, "customer").collect()}
    n = {r.n_nationkey: r.n_regionkey
         for r in load_table(spark, sf_dir, "nation").collect()}
    rg = {r.r_regionkey: r.r_name
          for r in load_table(spark, sf_dir, "region").collect()}
    strata = defaultdict(list)
    for r in o:
        strata[rg[n[c[r.o_custkey]]]].append(int(math.floor(r.o_totalprice + 0.5)))
    sized = {}
    for region, vs in strata.items():
        nh = len(vs)
        sd = math.sqrt((nh * sum(v * v for v in vs) - sum(vs) ** 2)
                       / (nh * (nh - 1)))
        sized[region] = (nh, sd)
    ntot = sum(nh for nh, _ in sized.values())
    sum_nsd = sum(int(math.floor(nh * sd + 0.5)) for nh, sd in sized.values())
    got = {r.region: r for r in QS["q292_neyman_allocation"].fn(spark, sf_dir).collect()}
    assert set(got) == set(sized)
    for region, (nh, sd) in sized.items():
        r = got[region]
        assert r.nh == nh
        assert math.isclose(r.sd, sd, rel_tol=1e-9)
        assert r.neyman_n == int(math.floor(
            _NEYMAN_BUDGET * int(math.floor(nh * sd + 0.5)) / sum_nsd + 0.5))
        assert r.proportional_n == int(math.floor(
            _NEYMAN_BUDGET * nh / ntot + 0.5))


def test_q293_hub_removal_matches_python(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey").collect()
    pt = {r.p_partkey: r.p_brand for r in load_table(spark, sf_dir, "part").collect()}
    by_order = defaultdict(set)
    for r in li:
        by_order[r.l_orderkey].add(pt[r.l_partkey])
    support = defaultdict(int)
    for brs in by_order.values():
        srt = sorted(brs)
        for i, a in enumerate(srt):
            for b in srt[i + 1:]:
                support[(a, b)] += 1
    med = float(np.median(list(support.values())))
    edges = [e for e, s in support.items() if s > med]
    nbrs = defaultdict(set)
    for a, b in edges:
        nbrs[a].add(b)
        nbrs[b].add(a)
    hub = max(nbrs, key=lambda x: (len(nbrs[x]), x))

    def components(adj, skip=None):
        seen = set()
        sizes = []
        for start in adj:
            if start in seen or start == skip:
                continue
            stack = [start]
            seen.add(start)
            size = 0
            while stack:
                node = stack.pop()
                size += 1
                for nx in adj[node]:
                    if nx != skip and nx not in seen:
                        seen.add(nx)
                        stack.append(nx)
            sizes.append(size)
        return sizes

    before = components(nbrs)
    after = components(nbrs, skip=hub)
    row = QS["q293_hub_removal_impact"].fn(spark, sf_dir).collect()[0]
    assert row.hub == hub
    assert row.n_nodes == len(nbrs)
    assert row.largest_before == max(before)
    assert row.n_nodes_after == len(nbrs) - 1 - sum(
        1 for x in nbrs if x != hub and nbrs[x] <= {hub}
    )
    assert row.largest_after == max(after) if after else 0
    assert row.largest_drop == row.largest_before - row.largest_after


def test_q294_redaction_impact_matches_python(spark, sf_dir):
    import re

    from docling_api_spark.operators.datapipe import _EMAIL_RE, _PHONE_RE

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "source", "text"
    ).collect()
    agg = defaultdict(lambda: [0, 0, 0, 0])
    for r in docs:
        raw = (f"{r.text} contact user{r.doc_id}@example.com"
               f" or 555-0{100 + r.doc_id % 900}")
        red = re.sub(_PHONE_RE, "[PHONE]", re.sub(_EMAIL_RE, "[EMAIL]", raw))
        cell = agg[r.source]
        cell[0] += 1
        cell[1] += 1 if red != raw else 0
        cell[2] += len(raw) - len(red)
        cell[3] += len(raw.split(" ")) - len(red.split(" "))
    got = {r.source: r for r in QS["q294_redaction_impact"].fn(spark, sf_dir).collect()}
    assert set(got) == set(agg)
    for src, (n, t, ch, tok) in agg.items():
        r = got[src]
        assert (r.n_docs, r.n_touched, r.chars_removed, r.tokens_removed) == (
            n, t, ch, tok,
        )
        assert math.isclose(r.touched_share, t / n, rel_tol=1e-12)
        assert r.n_touched == n  # injection guarantees every doc redacts


def test_q295_minhash_audience_matches_python(spark, sf_dir):
    import hashlib

    from docling_api_spark.operators.sampling import _MH_PERMS

    ev = load_table(spark, sf_dir, "events").select("event_type", "user_id").collect()
    segs = defaultdict(set)
    for r in ev:
        segs[r.event_type].add(r.user_id)

    def h(p, u):
        return int(hashlib.md5(f"{p}:{u}".encode()).hexdigest()[:8], 16)

    sigs = {
        s: [min(h(p, u) for u in users) for p in range(_MH_PERMS)]
        for s, users in segs.items()
    }
    names = sorted(segs)
    got = {(r.seg_a, r.seg_b): r for r in
           QS["q295_minhash_audience"].fn(spark, sf_dir).collect()}
    for i, a in enumerate(names):
        for b in names[i + 1:]:
            agree = sum(1 for x, y in zip(sigs[a], sigs[b]) if x == y)
            exact = len(segs[a] & segs[b]) / len(segs[a] | segs[b])
            r = got[(a, b)]
            assert math.isclose(r.jaccard_est, agree / _MH_PERMS, rel_tol=1e-12)
            assert math.isclose(r.jaccard_exact, exact, rel_tol=1e-12)
            assert math.isclose(r.abs_error, abs(agree / _MH_PERMS - exact),
                                rel_tol=1e-9, abs_tol=1e-12)


def test_q296_watermark_matches_python(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events").select("event_id", "ts").collect()
    rows = sorted((r.event_id, int(r.ts.timestamp() * 1e6)) for r in ev)
    run = -1
    lates = []
    for _, t in rows:
        run = max(run, t)
        lates.append(run - t)
    row = QS["q296_watermark_advisor"].fn(spark, sf_dir).collect()[0]
    assert row.n_events == len(lates)
    assert row.n_late == sum(1 for x in lates if x > 0)
    for got, tau in ((row.p50_lateness_s, 50), (row.p95_lateness_s, 95),
                     (row.p99_lateness_s, 99)):
        exp = float(np.percentile(lates, tau, method="linear")) / 1e6
        assert math.isclose(got, exp, rel_tol=1e-9, abs_tol=1e-9)
    assert row.suggested_watermark_min == math.ceil(
        float(np.percentile(lates, 99, method="linear")) / 60e6
    )


def test_q297_mean_excess_matches_numpy(spark, sf_dir):
    vals = [round(r.o_totalprice * 100) for r in
            load_table(spark, sf_dir, "orders").select("o_totalprice").collect()]
    got = {r.tau: r for r in QS["q297_mean_excess"].fn(spark, sf_dir).collect()}
    assert set(got) == {0.90, 0.95, 0.99}
    prev = None
    for tau in (0.90, 0.95, 0.99):
        u = float(np.percentile(vals, tau * 100, method="linear"))
        exceed = [c for c in vals if c > u]
        me = sum(int(math.floor(c - u + 0.5)) for c in exceed) / (100.0 * len(exceed))
        r = got[tau]
        assert math.isclose(r.threshold, u / 100.0, rel_tol=1e-12)
        assert r.n_exceed == len(exceed)
        assert math.isclose(r.mean_excess, me, rel_tol=1e-9)
        prev = r.mean_excess


def test_q298_reciprocal_best_matches_python(spark, sf_dir):
    o = {r.o_orderkey: r.o_custkey
         for r in load_table(spark, sf_dir, "orders").collect()}
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey").collect()
    vol = defaultdict(int)
    for r in li:
        vol[(o[r.l_orderkey], r.l_suppkey)] += 1
    best_c = {}
    best_s = {}
    for (ck, sk), v in vol.items():
        key_c = (v, -(sk % 1000000))
        if ck not in best_c or key_c > best_c[ck][0]:
            best_c[ck] = (key_c, sk, v)
        key_s = (v, -(ck % 1000000))
        if sk not in best_s or key_s > best_s[sk][0]:
            best_s[sk] = (key_s, ck, v)
    expect = {
        (ck, sk): v for ck, (_, sk, v) in best_c.items()
        if best_s.get(sk, (None, None))[1] == ck
    }
    got = {(r.custkey, r.suppkey): r.n_lines
           for r in QS["q298_reciprocal_best"].fn(spark, sf_dir).collect()}
    assert got == expect


def test_q299_stationary_matches_python(spark, sf_dir):
    from docling_api_spark.operators.timeseries import _ABS_N, _PI_ROUNDS

    ev = load_table(spark, sf_dir, "events").select("user_id", "ts", "event_type").collect()
    per_user = defaultdict(list)
    for r in ev:
        per_user[r.user_id].append((r.ts, r.event_type))
    counts = defaultdict(int)
    for rows in per_user.values():
        rows.sort()
        for (_, a), (_, b) in zip(rows, rows[1:]):
            counts[(a, b)] += 1
    totals = defaultdict(int)
    for (a, _), c in counts.items():
        totals[a] += c
    pn = {xy: round(_ABS_N * c / totals[xy[0]]) for xy, c in counts.items()}
    k = len(totals)
    v = {s: _ABS_N // k for s in totals}
    for _ in range(_PI_ROUNDS):
        nv = defaultdict(int)
        for (x, y), p in pn.items():
            nv[y] += v.get(x, 0) * p
        v = {s: val // _ABS_N for s, val in nv.items()}
    got = {r.state: r.stationary_prob for r in
           QS["q299_stationary_distribution"].fn(spark, sf_dir).collect()}
    assert set(got) == set(v)
    for s, val in v.items():
        assert math.isclose(got[s], val / _ABS_N, abs_tol=2e-9)
    # a probability distribution (up to integer-division shrinkage)
    assert 0.98 <= sum(got.values()) <= 1.0 + 1e-9


def test_q300_silhouette_matches_numpy(spark, sf_dir):
    rows = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", "embedding", "label"
    ).collect()
    by_label = defaultdict(list)
    for r in rows:
        by_label[r.label].append(np.array(r.embedding, dtype=np.float64))
    protos = {}
    for lab, vs in by_label.items():
        m = np.stack(vs)
        protos[lab] = np.array([
            sum(round(float(x), 12) for x in m[:, j]) / len(vs)
            for j in range(m.shape[1])
        ])
    agg = defaultdict(lambda: [0, 0, 0])
    for r in rows:
        v = np.array(r.embedding, dtype=np.float64)
        a = float(np.sqrt(((v - protos[r.label]) ** 2).sum()))
        b = min(
            float(np.sqrt(((v - c) ** 2).sum()))
            for lab, c in protos.items() if lab != r.label
        )
        sil = (b - a) / max(a, b)
        cell = agg[r.label]
        cell[0] += 1
        cell[1] += int(math.floor(1e9 * sil + 0.5)) if sil >= 0 else -int(
            math.floor(-1e9 * sil + 0.5)
        )
        cell[2] += 1 if sil < 0 else 0
    got = {r.label: r for r in QS["q300_class_silhouette"].fn(spark, sf_dir).collect()}
    assert set(got) == set(agg)
    for lab, (n, ssum, neg) in agg.items():
        r = got[lab]
        assert r.n_vectors == n
        assert math.isclose(r.mean_silhouette, ssum / (1e9 * n),
                            rel_tol=1e-6, abs_tol=1e-9)
        assert math.isclose(r.negative_share, neg / n, rel_tol=1e-12)
        assert -1.0 <= r.mean_silhouette <= 1.0


def test_q301_vocab_growth_matches_python(spark, sf_dir):
    from docling_api_spark.operators.textstats import _VG_THRESH

    docs = sorted(
        load_table(spark, sf_dir, "documents").select("doc_id", "text").collect(),
        key=lambda r: r.doc_id,
    )
    firsts = {}
    pos = 0
    for r in docs:
        for t in r.text.split(" "):
            firsts.setdefault(t, pos)
            pos += 1
    got = {r.n_tokens_seen: r.distinct_terms for r in
           QS["q301_vocab_growth"].fn(spark, sf_dir).collect()}
    assert set(got) == set(_VG_THRESH)
    prev = 0
    for k in sorted(_VG_THRESH):
        exp = sum(1 for p in firsts.values() if p < k)
        assert got[k] == exp
        assert got[k] >= prev  # vocabulary growth is monotone
        prev = got[k]


def test_q302_learned_index_matches_numpy(spark, sf_dir):
    keys = sorted({r.o_orderkey for r in
                   load_table(spark, sf_dir, "orders").select("o_orderkey").collect()})
    xs = np.array(keys, dtype=float)
    ys = np.arange(len(keys), dtype=float)
    b, a = np.polyfit(xs, ys, 1)
    errs = [int(math.floor(abs(a + b * k - r) + 0.5))
            for k, r in zip(keys, range(len(keys)))]
    row = QS["q302_learned_index_audit"].fn(spark, sf_dir).collect()[0]
    assert row.n_keys == len(keys)
    assert math.isclose(row.slope, b, rel_tol=1e-6)
    assert row.epsilon_max == max(errs)
    assert math.isclose(
        row.epsilon_p99,
        float(np.percentile(errs, 99, method="linear")),
        rel_tol=1e-9, abs_tol=1e-9,
    )
    # the lookup window 2ε must be far below a full scan
    assert row.epsilon_max < len(keys) // 2


def test_q303_cdc_matches_python(spark, sf_dir):
    import hashlib

    from docling_api_spark.operators.textstats import _CDC_MOD

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text").collect()
    n_chunks = 0
    tok_total = 0
    bytes_total = 0
    digests = {}
    for r in docs:
        t = r.text.split(" ")
        flags = [
            1 if int(hashlib.md5(" ".join(t[i:i + 4]).encode()).hexdigest()[:15],
                     16) % _CDC_MOD == 0 else 0
            for i in range(len(t) - 3)
        ]
        chunks = defaultdict(list)
        cum = 0
        for j, tok in enumerate(t):
            if j >= 1 and j - 1 < len(flags):
                cum += flags[j - 1]
            chunks[cum].append(tok)
        for toks in chunks.values():
            text = " ".join(toks)
            d = hashlib.md5(text.encode()).hexdigest()
            n_chunks += 1
            tok_total += len(toks)
            bytes_total += len(text)
            digests.setdefault(d, len(text))
    row = QS["q303_cdc_chunking"].fn(spark, sf_dir).collect()[0]
    assert row.n_chunks == n_chunks
    assert row.n_distinct == len(digests)
    assert math.isclose(row.distinct_ratio, len(digests) / n_chunks,
                        rel_tol=1e-12)
    assert math.isclose(row.avg_chunk_tokens, tok_total / n_chunks,
                        rel_tol=1e-12)
    assert row.bytes_total == bytes_total
    assert row.bytes_after_dedup == sum(digests.values())
    assert row.bytes_after_dedup <= row.bytes_total


def test_q304_dominant_period_matches_numpy(spark, sf_dir):
    from docling_api_spark.operators.timeseries import _ACF_MAX_LAG

    v = _daily_dollars(spark, sf_dir)
    got = {r.lag: r for r in QS["q304_dominant_period"].fn(spark, sf_dir).collect()}
    assert set(got) == set(range(1, _ACF_MAX_LAG + 1))
    best = None
    for lag in range(1, _ACF_MAX_LAG + 1):
        a = np.array(v[:-lag], dtype=float)
        b = np.array(v[lag:], dtype=float)
        r_np = float(np.corrcoef(a, b)[0, 1])
        assert got[lag].n == len(a)
        assert math.isclose(got[lag].r, r_np, rel_tol=1e-9)
        if lag >= 2:
            key = (round(1e9 * r_np), -lag)
            if best is None or key > best[0]:
                best = (key, lag)
    for lag in got:
        assert got[lag].is_dominant == (1 if lag == best[1] else 0)


def test_q305_interim_looks_matches_python(spark, sf_dir):
    import hashlib

    from docling_api_spark.operators.analytics import CONV_MIN

    ev = load_table(spark, sf_dir, "events").select("user_id", "event_type").collect()
    pur = defaultdict(int)
    users = set()
    for r in ev:
        users.add(r.user_id)
        if r.event_type == "purchase":
            pur[r.user_id] += 1
    got = {r.look: r for r in QS["q305_interim_looks"].fn(spark, sf_dir).collect()}
    assert set(got) == {1, 2, 3}
    for look in (1, 2, 3):
        sel = [u for u in users if u % 3 < look]
        na = nb = ca = cb = 0
        for u in sel:
            arm = int(hashlib.md5(str(u).encode()).hexdigest()[:8], 16) % 2
            conv = 1 if pur.get(u, 0) >= CONV_MIN else 0
            if arm == 0:
                na += 1
                ca += conv
            else:
                nb += 1
                cb += conv
        p = (ca + cb) / (na + nb)
        z = (ca / na - cb / nb) / math.sqrt(
            p * (1 - p) * (1 / na + 1 / nb)
        )
        r = got[look]
        assert r.n_users == na + nb
        assert math.isclose(r.z_stat, z, rel_tol=1e-9)
        assert r.sig_naive == (1 if abs(z) > 1.959963984540054 else 0)
        assert r.sig_pocock == (1 if abs(z) > 2.289 else 0)
        assert r.sig_pocock <= r.sig_naive


def test_q306_ess_matches_python(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").select("source").collect()
    counts = defaultdict(int)
    for r in docs:
        counts[r.source] += 1
    sw = sww = 0
    for n in counts.values():
        wq = int(math.floor(1e6 * math.sqrt(n) / n + 0.5))
        sw += n * wq
        sww += n * wq * wq
    n_docs = sum(counts.values())
    row = QS["q306_effective_sample_size"].fn(spark, sf_dir).collect()[0]
    assert row.n_docs == n_docs
    assert math.isclose(row.ess, sw * sw / sww, rel_tol=1e-12)
    assert math.isclose(row.design_effect, n_docs * sww / (sw * sw),
                        rel_tol=1e-12)
    # Kish bound: 1 <= ESS <= n
    assert 1.0 <= row.ess <= n_docs + 1e-9
    assert row.design_effect >= 1.0 - 1e-12
