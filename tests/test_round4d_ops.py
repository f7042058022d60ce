"""Brute-force cross-checks for the round-4d operator classes
(q215-q218): each result recomputed by an independent pure-Python/numpy
path on the SAME rows must agree. The DuckDB oracle certifies engine
agreement; these certify the math and the semantics (notably q215, where
the Spark plan is the Lindley CLOSED FORM and the replay below is the
naive sequential clamp recursion it must equal)."""

from __future__ import annotations

import math
from collections import defaultdict

import numpy as np

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
