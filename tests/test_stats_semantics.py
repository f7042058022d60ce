"""Semantic cross-checks for the round-4 statistics operators: the same
statistic computed by an independent brute-force path (numpy / pure
Python) on the SAME data must agree. The DuckDB oracle only certifies
engine agreement; these tests certify the math itself."""

from __future__ import annotations

import math

import numpy as np
from pyspark.sql import functions as F

from docling_api_spark.plans import all_queries
from docling_api_spark.tables import load_table

QS = all_queries()


def _brute_mwu(a, b):
    """Textbook tie-corrected Mann–Whitney U via full joint ranking."""
    joint = sorted([(v, 0) for v in a] + [(v, 1) for v in b])
    n = len(joint)
    ranks = {}
    i = 0
    while i < n:
        j = i
        while j < n and joint[j][0] == joint[i][0]:
            j += 1
        avg = (i + 1 + j) / 2  # average of ranks i+1..j
        ranks[joint[i][0]] = avg
        i = j
    r_a = sum(ranks[v] for v in a)
    u_a = r_a - len(a) * (len(a) + 1) / 2
    ties = {}
    for v, _ in joint:
        ties[v] = ties.get(v, 0) + 1
    tie_cubes = sum(t**3 - t for t in ties.values())
    mu = len(a) * len(b) / 2
    var = (len(a) * len(b) / 12) * ((n + 1) - tie_cubes / (n * (n - 1)))
    z = (u_a - mu) / math.sqrt(var)
    return u_a, tie_cubes, z


def test_mwu_matches_brute_force_ranking(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    vals = (
        ev.where(F.col("event_type").isin("click", "purchase"))
        .select("event_type", F.floor(F.col("value") * 100).cast("bigint").alias("v"))
        .collect()
    )
    a = [r["v"] for r in vals if r["event_type"] == "click"]
    b = [r["v"] for r in vals if r["event_type"] == "purchase"]
    u_a, tie_cubes, z = _brute_mwu(a, b)

    row = QS["q164_mannwhitney_u"].fn(spark, sf_dir).collect()[0]
    assert row["n_a"] == len(a) and row["n_b"] == len(b)
    assert row["u2"] == int(2 * u_a)  # exact: u2 carries 2U
    assert row["tie_cubes"] == int(tie_cubes)
    assert abs(row["z_stat"] - z) < 1e-9


def test_weighted_median_matches_expansion(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    rows = li.select("l_returnflag", "l_quantity", "l_extendedprice").collect()
    got = {r["l_returnflag"]: r for r in QS["q160_weighted_median"].fn(spark, sf_dir).collect()}
    flags = {r["l_returnflag"] for r in rows}
    for flag in flags:
        pairs = sorted(
            (r["l_quantity"], r["l_extendedprice"]) for r in rows if r["l_returnflag"] == flag
        )
        tot = sum(w for _, w in pairs)
        # brute force: first value whose cumulative weight crosses the quantile
        def wq(frac):
            cum = 0.0
            for q, w in pairs:
                cum += w
                if cum >= frac * tot - 1e-6:
                    return q
            return pairs[-1][0]

        assert got[flag]["median_qty"] == wq(0.5)
        assert got[flag]["p90_qty"] == wq(0.9)


def test_gini_matches_pairwise_definition(spark, sf_dir):
    # recompute the bucketed values exactly as the operator declares them,
    # then evaluate Gini by the O(n²) mean-absolute-difference definition
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    rev = (
        orders.join(cust.select("c_custkey", "c_mktsegment"), orders.o_custkey == F.col("c_custkey"))
        .groupBy("c_mktsegment", "o_custkey")
        .agg(
            F.floor(
                F.sum(F.col("o_totalprice").cast("decimal(28,6)")).cast("double") / 1000
            )
            .cast("bigint")
            .alias("kb")
        )
        .collect()
    )
    got = {r["mktsegment"]: r["gini"] for r in QS["q165_gini_revenue"].fn(spark, sf_dir).collect()}
    segs = {r["c_mktsegment"] for r in rev}
    for seg in segs:
        xs = np.array([r["kb"] for r in rev if r["c_mktsegment"] == seg], dtype=np.int64)
        n = len(xs)
        mad = np.abs(xs[:, None] - xs[None, :]).sum()
        expect = mad / (2 * n * xs.sum())
        assert abs(got[seg] - expect) < 1e-12


def test_power_iteration_matches_numpy_simulation(spark, sf_dir):
    """Algorithmic fidelity: the distributed integer iterations must land
    EXACTLY where a numpy simulation of the same declared algorithm lands
    (quantize → v'=Xᵀ(Xv) → floor-renormalize, twice). Convergence to the
    true eigenvector is declared, not asserted — this corpus's Gram
    spectrum is nearly flat (λ1/λ2 ≈ 1.07), so direction isolation would
    need ~70 iterations; what the operator guarantees is the exact
    fixed-iteration result and monotone Rayleigh improvement."""
    emb = load_table(spark, sf_dir, "embeddings").select("embedding").collect()
    x = np.array([r["embedding"] for r in emb], dtype=np.float64)
    xq = np.round(x * 1000)  # the operator's declared quantization

    def step(v):
        w = xq.T @ (xq @ v)
        return np.floor(w / np.abs(w).max() * 1000)

    v0 = np.ones(64) * 1000
    expect = step(step(v0))

    rows = QS["q166_power_iteration"].fn(spark, sf_dir).collect()
    v = np.array(
        [w for _, w in sorted((r["dim"], r["weight"]) for r in rows)],
        dtype=np.float64,
    )
    assert np.array_equal(v, expect)

    # power iteration on a PSD matrix: the Rayleigh quotient must not
    # decrease from the flat start to the emitted vector
    gram = xq.T @ xq
    rq = lambda u: (u @ gram @ u) / (u @ u)
    assert rq(v) > rq(v0)


def test_theil_sen_matches_brute_force(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    daily = (
        ev.groupBy("event_type", F.date_trunc("day", "ts").cast("date").alias("d"))
        .agg(
            (
                F.sum(F.col("value").cast("decimal(28,6)")).cast("double")
                / F.count(F.lit(1))
            ).alias("m")
        )
        .collect()
    )
    got = {r["event_type"]: r["theil_sen_slope"] for r in QS["q161_theil_sen_trend"].fn(spark, sf_dir).collect()}
    types = {r["event_type"] for r in daily}
    for t in types:
        pts = sorted((r["d"], r["m"]) for r in daily if r["event_type"] == t)
        slopes = [
            (m2 - m1) / (d2 - d1).days
            for i, (d1, m1) in enumerate(pts)
            for (d2, m2) in pts[i + 1 :]
        ]
        expect = float(np.median(np.array(slopes)))
        assert abs(got[t] - expect) < 1e-9
