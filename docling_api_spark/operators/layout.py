"""Data-layout operators: multi-dimensional clustering for scan pruning.

Z-ordering (Morton-code interleaving) is THE data-layout lever for 100 TB
tables queried on more than one column: sorting by a single key gives
perfect min/max pruning on that key and none on any other, while sorting
by the interleaved bits of two keys gives useful pruning on BOTH — each
Z-bucket covers a small rectangle of the (x, y) space, so parquet
row-group stats bound both columns at once.

The Morton code is pure bit arithmetic (shift/and/or), so it is a
map-side expression in codegen, identical in Spark and DuckDB — the
bucket profile below is exactly oracle-replayable. At scale the layout
write is `repartitionByRange(zkey).sortWithinPartitions(zkey)` into
parquet; this query verifies the property that makes that write worth it
(per-bucket min/max rectangles are tight in both dimensions).
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import Window as W

from docling_api_spark.plans.registry import register
from docling_api_spark.tables import literal_df, load_table

_BITS = 8  # 8 bits per dimension → 16-bit Morton keys, 256 buckets of 256


def _morton_sql(x: str, y: str) -> str:
    """Interleave the low 8 bits of integer expressions x (even positions)
    and y (odd positions). Plain `>> << & +` — valid in Spark SQL and
    DuckDB with identical semantics on non-negative integers."""
    terms = []
    for i in range(_BITS):
        terms.append(f"((({x} >> {i}) & 1) << {2 * i})")
        terms.append(f"((({y} >> {i}) & 1) << {2 * i + 1})")
    return " + ".join(terms)


# x = customer mod 256, y = day-of-year mod 256: two independent,
# uniformly-hit predicate dimensions of the orders table.
_X = "(o_custkey % 256)"
_Y_SPARK = "(dayofyear(o_orderdate) % 256)"
_Y_DUCK = "(dayofyear(o_orderdate) % 256)"


@register(
    "q59_zorder_layout",
    tags=("layout", "zorder", "pruning"),
    oracle=f"""
        WITH keyed AS (
          SELECT CAST({_X} AS BIGINT) AS x,
                 CAST({_Y_DUCK} AS BIGINT) AS y,
                 CAST({_morton_sql(f"CAST({_X} AS BIGINT)", f"CAST({_Y_DUCK} AS BIGINT)")} AS BIGINT) AS zkey
          FROM orders
        )
        SELECT CAST(zkey // 256 AS BIGINT) AS zbucket,
               CAST(COUNT(*) AS BIGINT) AS n_rows,
               CAST(MIN(x) AS BIGINT) AS x_min, CAST(MAX(x) AS BIGINT) AS x_max,
               CAST(MIN(y) AS BIGINT) AS y_min, CAST(MAX(y) AS BIGINT) AS y_max
        FROM keyed
        GROUP BY 1
    """,
)
def q59_zorder_layout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order (Morton) clustering profile of orders on
    (customer mod 256, day-of-year mod 256): per Z-bucket row count and the
    min/max rectangle of both dimensions.

    Each bucket of 256 consecutive Morton keys covers a 16×16 rectangle of
    the key space — the bounded-in-both-dimensions property that makes
    parquet min/max stats prune scans on EITHER column after a
    `repartitionByRange(zkey)` layout write (single-key sorts prune only
    their own column). The Morton code itself is shift/and/add — map-side,
    whole-stage codegen, no UDF; the only shuffle is the keyed profile
    aggregation (in the layout write it would be the range partitioner).
    """
    keyed = load_table(spark, sf_dir, "orders").selectExpr(
        f"CAST({_X} AS BIGINT) AS x",
        f"CAST({_Y_SPARK} AS BIGINT) AS y",
    ).selectExpr(
        "x", "y", f"CAST({_morton_sql('x', 'y')} AS BIGINT) AS zkey"
    )
    return keyed.groupBy(
        F.expr("zkey div 256").cast("bigint").alias("zbucket")
    ).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_rows"),
        F.min("x").cast("bigint").alias("x_min"),
        F.max("x").cast("bigint").alias("x_max"),
        F.min("y").cast("bigint").alias("y_min"),
        F.max("y").cast("bigint").alias("y_max"),
    )


# ---------------------------------------------------------------------------
# q214 — partition-key advisor (physical-design audit for candidate keys)
# ---------------------------------------------------------------------------
@register(
    "q214_partition_advisor",
    tags=("layout", "physical-design", "audit"),
    oracle="""
        WITH keys AS (
          SELECT 'order_month' AS candidate_key,
                 strftime(CAST(date_trunc('month', o_orderdate) AS DATE),
                          '%Y-%m') AS part
          FROM orders
          UNION ALL
          SELECT 'order_priority', o_orderpriority FROM orders
          UNION ALL
          SELECT 'order_status', o_orderstatus FROM orders
        ),
        per_part AS (
          SELECT candidate_key, part, CAST(COUNT(*) AS BIGINT) AS n
          FROM keys GROUP BY 1, 2
        )
        SELECT candidate_key,
               CAST(COUNT(*) AS BIGINT) AS n_partitions,
               CAST(SUM(n) AS BIGINT) AS n_rows,
               CAST(MAX(n) AS BIGINT) AS max_partition_rows,
               CAST(MAX(n) AS DOUBLE) * COUNT(*) / SUM(n) AS skew_ratio,
               CAST(MIN(n) AS BIGINT) AS min_partition_rows
        FROM per_part GROUP BY candidate_key
    """,
)
def q214_partition_advisor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Physical-design advisor: for each candidate partition key of the
    orders table, the partition count, row distribution, and skew ratio
    (max partition / ideal even share) — the audit that decides what to
    PARTITION BY before a 100 TB table is laid down (too many tiny
    partitions ruin listing + small files; one hot partition ruins
    pruning; skew_ratio ~1 is the target). Completes the physical-design
    toolkit next to q59 (Z-order within files) and q167 (salt planning
    for joins).

    One pass per candidate (a union of label+key projections — column-
    pruned scans), one hash agg to per-partition counts, one tiny
    rollup per candidate. All counts exact; the skew ratio is the only
    float, from exact inputs. At 100 TB you run this on a sample or on
    footer-level metadata — the plan shape is identical."""
    o = load_table(spark, sf_dir, "orders")
    keys = (
        o.select(
            F.lit("order_month").alias("candidate_key"),
            F.date_format(
                F.date_trunc("month", "o_orderdate"), "yyyy-MM"
            ).alias("part"),
        )
        .unionByName(
            o.select(
                F.lit("order_priority").alias("candidate_key"),
                F.col("o_orderpriority").alias("part"),
            )
        )
        .unionByName(
            o.select(
                F.lit("order_status").alias("candidate_key"),
                F.col("o_orderstatus").alias("part"),
            )
        )
    )
    per_part = keys.groupBy("candidate_key", "part").agg(
        F.count(F.lit(1)).cast("bigint").alias("n")
    )
    return per_part.groupBy("candidate_key").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_partitions"),
        F.sum("n").cast("bigint").alias("n_rows"),
        F.max("n").cast("bigint").alias("max_partition_rows"),
        (
            F.max("n").cast("double")
            * F.count(F.lit(1))
            / F.sum("n")
        ).alias("skew_ratio"),
        F.min("n").cast("bigint").alias("min_partition_rows"),
    )


# ---------------------------------------------------------------------------
# q245 — optimizer-style selectivity estimation audit (equi-width histogram)
# ---------------------------------------------------------------------------
# The cardinality-estimation quality check that closes the physical-design
# toolkit (q181 audits JOIN size estimates; this audits RANGE-predicate
# estimates): build the 20-bucket equi-width histogram a catalog would
# keep for o_totalprice, estimate three range predicates' selectivity with
# uniform-within-bucket interpolation, and compare against the exact
# answer. The estimation error column is what tells you whether the
# optimizer's stats would have picked the right plan at 100 TB.
#
# All counts exact integers; interpolation fractions are correctly-rounded
# doubles from identical exact inputs; bucket bounds are integer dollars.
# One fact pass for the histogram, one for the exact counts (a real system
# reads the second from the query log instead).
_SEL_BUCKETS = 20
_SEL_PREDS = ((50_000, 150_000), (200_000, 300_000), (0, 600_000))


def _sel_pred_sql(alias: str) -> str:
    rows = ", ".join(f"({lo}, {hi})" for lo, hi in _SEL_PREDS)
    return f"(VALUES {rows}) AS {alias}(lo, hi)"


@register(
    "q245_selectivity_audit",
    tags=("physical-design", "stats", "estimation"),
    oracle=f"""
        WITH v AS (
          SELECT CAST(ROUND(o_totalprice) AS BIGINT) AS d FROM orders
        ),
        bounds AS (
          SELECT MIN(d) AS lo_all, MAX(d) + 1 AS hi_all,
                 CAST(COUNT(*) AS BIGINT) AS n
          FROM v
        ),
        hist AS (
          SELECT CAST(({_SEL_BUCKETS} * (v.d - b.lo_all))
                      // (b.hi_all - b.lo_all) AS BIGINT) AS bucket,
                 CAST(COUNT(*) AS BIGINT) AS c
          FROM v CROSS JOIN bounds b GROUP BY 1
        ),
        preds AS (SELECT * FROM {_sel_pred_sql('p')}),
        est AS (
          SELECT p.lo, p.hi,
                 CAST(SUM(CAST(ROUND(1000000.0 * h.c * (
                   least(CAST(p.hi AS DOUBLE),
                         b.lo_all + (h.bucket + 1)
                           * (CAST(b.hi_all - b.lo_all AS DOUBLE)
                              / {_SEL_BUCKETS}))
                   - greatest(CAST(p.lo AS DOUBLE),
                              b.lo_all + h.bucket
                                * (CAST(b.hi_all - b.lo_all AS DOUBLE)
                                   / {_SEL_BUCKETS}))
                 ) / (CAST(b.hi_all - b.lo_all AS DOUBLE) / {_SEL_BUCKETS}))
                 AS BIGINT)) AS BIGINT) AS est_millirows,
                 b.n AS n
          FROM preds p
          CROSS JOIN bounds b
          JOIN hist h
            ON b.lo_all + (h.bucket + 1) * (CAST(b.hi_all - b.lo_all AS DOUBLE)
                                            / {_SEL_BUCKETS}) > p.lo
           AND b.lo_all + h.bucket * (CAST(b.hi_all - b.lo_all AS DOUBLE)
                                      / {_SEL_BUCKETS}) < p.hi
          GROUP BY p.lo, p.hi, b.n
        ),
        actual AS (
          SELECT p.lo, p.hi, CAST(COUNT(CASE WHEN v.d >= p.lo AND v.d < p.hi
                                             THEN 1 END) AS BIGINT) AS act
          FROM preds p CROSS JOIN v GROUP BY p.lo, p.hi
        )
        SELECT e.lo AS pred_lo, e.hi AS pred_hi,
               CAST(ROUND(CAST(e.est_millirows AS DOUBLE) / 1000000.0)
                    AS BIGINT) AS est_rows,
               a.act AS actual_rows,
               CAST(e.est_millirows AS DOUBLE) / (1000000.0 * e.n)
                 AS est_selectivity,
               CAST(a.act AS DOUBLE) / e.n AS actual_selectivity
        FROM est e JOIN actual a ON e.lo = a.lo AND e.hi = a.hi
    """,
)
def q245_selectivity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range-predicate selectivity estimates from a 20-bucket equi-width
    histogram vs exact counts — the optimizer-stats quality audit (see
    block comment; micro-quantized interpolation, integer bounds)."""
    o = load_table(spark, sf_dir, "orders")
    v = o.select(F.round("o_totalprice").cast("bigint").alias("d"))
    # lazy cuts: the 1-row bounds feed the histogram build AND the
    # estimate expressions; the 20-row histogram feeds the interval join —
    # uncut, each reference re-scans the fact projection (4 scans/plan)
    bounds = v.agg(
        F.min("d").alias("lo_all"),
        (F.max("d") + 1).alias("hi_all"),
        F.count(F.lit(1)).cast("bigint").alias("n"),
    ).localCheckpoint(eager=False)
    hist = (
        v.crossJoin(F.broadcast(bounds))
        .selectExpr(
            f"CAST(({_SEL_BUCKETS} * (d - lo_all)) div (hi_all - lo_all)"
            " AS BIGINT) AS bucket"
        )
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
        .localCheckpoint(eager=False)
    )
    preds = literal_df(spark, list(_SEL_PREDS), "lo bigint, hi bigint")
    width = f"(CAST(hi_all - lo_all AS DOUBLE) / {_SEL_BUCKETS})"
    b_lo = f"lo_all + bucket * {width}"
    b_hi = f"lo_all + (bucket + 1) * {width}"
    est = (
        F.broadcast(preds)
        .crossJoin(F.broadcast(bounds))
        .join(
            hist,
            F.expr(f"{b_hi} > lo AND {b_lo} < hi"),
        )
        .groupBy("lo", "hi", "n")
        .agg(
            F.expr(
                "CAST(SUM(CAST(ROUND(1000000.0 * c * ("
                f"least(CAST(hi AS DOUBLE), {b_hi})"
                f" - greatest(CAST(lo AS DOUBLE), {b_lo})"
                f") / {width}) AS BIGINT)) AS BIGINT)"
            ).alias("est_millirows")
        )
    )
    actual = (
        F.broadcast(preds.selectExpr("lo AS alo", "hi AS ahi"))
        .crossJoin(v)
        .groupBy("alo", "ahi")
        .agg(
            F.count(
                F.when((F.col("d") >= F.col("alo")) & (F.col("d") < F.col("ahi")), 1)
            ).cast("bigint").alias("act")
        )
    )
    return est.join(
        actual, (est.lo == actual.alo) & (est.hi == actual.ahi)
    ).selectExpr(
        "lo AS pred_lo",
        "hi AS pred_hi",
        "CAST(ROUND(CAST(est_millirows AS DOUBLE) / 1000000.0) AS BIGINT)"
        " AS est_rows",
        "act AS actual_rows",
        "CAST(est_millirows AS DOUBLE) / (1000000.0 * n) AS est_selectivity",
        "CAST(act AS DOUBLE) / n AS actual_selectivity",
    )


# ---------------------------------------------------------------------------
# q258 — range-partition planner (repartitionByRange boundary advisor)
# ---------------------------------------------------------------------------
# The physical-design decision q214 (hash partition keys) doesn't cover:
# RANGE layout — time-travel pruning and ordered scans want
# repartitionByRange(orderdate), and the planner needs split boundaries
# that balance rows. Boundaries are the exact k-quantiles of the epoch-day
# key (the oracle-parity tax; Spark's own RangePartitioner samples — the
# audit here is what tells you sampled boundaries drift); the audit then
# bins the table with those boundaries and reports each target partition's
# fill against the ideal share (the q214 skew-ratio discipline). All
# integer days and counts.
_RANGE_PARTS = 16


@register(
    "q258_range_partition_planner",
    tags=("physical-design", "partitioning", "percentile"),
    oracle=f"""
        WITH v AS (
          SELECT date_diff('day', DATE '1970-01-01',
                           CAST(o_orderdate AS DATE)) AS d
          FROM orders
        ),
        cuts AS (
          SELECT unnest(quantile_disc(d, [{", ".join(str((i + 1) / _RANGE_PARTS) for i in range(_RANGE_PARTS - 1))}]))
                   AS cut,
                 generate_subscripts(quantile_disc(d, [{", ".join(str((i + 1) / _RANGE_PARTS) for i in range(_RANGE_PARTS - 1))}]), 1) AS idx
          FROM v
        ),
        assigned AS (
          SELECT v.d,
                 COALESCE((SELECT MIN(c.idx) FROM cuts c WHERE v.d <= c.cut),
                          {_RANGE_PARTS}) AS part
          FROM v
        ),
        stats AS (
          SELECT part, CAST(COUNT(*) AS BIGINT) AS n_rows,
                 CAST(MIN(d) AS BIGINT) AS min_day,
                 CAST(MAX(d) AS BIGINT) AS max_day
          FROM assigned GROUP BY part
        ),
        tot AS (SELECT CAST(SUM(n_rows) AS BIGINT) AS n FROM stats)
        SELECT CAST(s.part AS BIGINT) AS part, s.n_rows, s.min_day, s.max_day,
               CAST(s.n_rows AS DOUBLE) * {_RANGE_PARTS} / t.n AS fill_ratio
        FROM stats s CROSS JOIN tot t
    """,
)
def q258_range_partition_planner(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact 16-way range boundaries for orderdate plus the per-partition
    fill audit — the repartitionByRange planner (see block comment)."""
    o = load_table(spark, sf_dir, "orders")
    # lazy cut: the percentile probe, the distinct day domain, and the
    # final assignment all scan this projection (audit: 6 scans/plan uncut)
    v = o.select(
        F.datediff(
            F.col("o_orderdate").cast("date"), F.lit("1970-01-01").cast("date")
        ).cast("bigint").alias("d")
    ).localCheckpoint(eager=False)
    taus = [(i + 1) / _RANGE_PARTS for i in range(_RANGE_PARTS - 1)]
    cuts_row = v.agg(
        *[
            F.expr(f"percentile_disc({t}) WITHIN GROUP (ORDER BY d)").alias(
                f"c{i}"
            )
            for i, t in enumerate(taus)
        ]
    )
    cuts = cuts_row.selectExpr(
        "stack("
        + str(len(taus))
        + ", "
        + ", ".join(f"CAST({i + 1} AS BIGINT), c{i}" for i in range(len(taus)))
        + ") AS (idx, cut)"
    )
    # assign the DISTINCT day domain (~series-sized), then join rows to it
    # — the cut comparison never amplifies the fact table (q233 discipline)
    day_part = (
        v.distinct()
        .crossJoin(F.broadcast(cuts))
        .where(F.col("d") <= F.col("cut"))
        .groupBy("d")
        .agg(F.min("idx").alias("part"))
    )
    assigned = v.join(F.broadcast(day_part), "d", "left").select(
        "d", F.coalesce("part", F.lit(_RANGE_PARTS)).alias("part")
    )
    stats = assigned.groupBy("part").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_rows"),
        F.min("d").cast("bigint").alias("min_day"),
        F.max("d").cast("bigint").alias("max_day"),
    )
    tot = stats.agg(F.sum("n_rows").cast("bigint").alias("n"))
    return stats.crossJoin(F.broadcast(tot)).selectExpr(
        "CAST(part AS BIGINT) AS part",
        "n_rows",
        "min_day",
        "max_day",
        f"CAST(n_rows AS DOUBLE) * {_RANGE_PARTS} / n AS fill_ratio",
    )


# ---------------------------------------------------------------------------
# q280 — consistent-hashing rebalance audit (what moves when a node joins?)
# ---------------------------------------------------------------------------
# The distributed-systems design check for any sharded cache/store: with
# naive modulo placement, adding a node remaps ~everything; a consistent-
# hash ring with virtual nodes remaps ~1/(n+1). This audit builds both
# rings deterministically (md5 positions, 8 vnodes/node — the q91 hash
# idiom), assigns every customer key by ring successor (argmin of the
# clockwise distance — a broadcast of the ≤40-row vnode table + one
# min_by, q260's packed-key-free case since distances are unique mod 2³²
# with overwhelming margin and ties break by vnode id), and reports the
# moved-key fraction for modulo vs ring placement side by side.
_CH_NODES = 4
_CH_VNODES = 8
_CH_SPACE = 4294967296  # 2^32


def _ring_sql(n_nodes: int, alias: str) -> str:
    """DuckDB vnode ring: (node, vnode) -> md5 position in [0, 2^32)."""
    rows = ", ".join(
        f"({node}, {v})" for node in range(n_nodes) for v in range(_CH_VNODES)
    )
    return f"""(
      SELECT node,
             CAST(concat('0x', substring(md5(concat('n', CAST(node AS VARCHAR),
                 ':', CAST(v AS VARCHAR))), 1, 8)) AS BIGINT) AS pos
      FROM (VALUES {rows}) AS t(node, v)
    ) AS {alias}"""


@register(
    "q280_consistent_hashing",
    tags=("physical-design", "sharding", "distributed"),
    oracle=f"""
        WITH keys AS (
          SELECT c_custkey AS k,
                 CAST(concat('0x', substring(md5(CAST(c_custkey AS VARCHAR)),
                     1, 8)) AS BIGINT) AS kh
          FROM customer
        ),
        ring_a AS (
          SELECT keys.k,
                 min_by(r.node, ((r.pos - keys.kh) % {_CH_SPACE}
                                 + {_CH_SPACE}) % {_CH_SPACE} * 100 + r.node)
                   AS node
          FROM keys CROSS JOIN {_ring_sql(_CH_NODES, 'r')}
          GROUP BY keys.k
        ),
        ring_b AS (
          SELECT keys.k,
                 min_by(r.node, ((r.pos - keys.kh) % {_CH_SPACE}
                                 + {_CH_SPACE}) % {_CH_SPACE} * 100 + r.node)
                   AS node
          FROM keys CROSS JOIN {_ring_sql(_CH_NODES + 1, 'r')}
          GROUP BY keys.k
        ),
        stats AS (
          SELECT CAST(COUNT(*) AS BIGINT) AS n,
                 CAST(SUM(CASE WHEN a.node <> b.node THEN 1 ELSE 0 END)
                      AS BIGINT) AS ring_moved,
                 CAST(SUM(CASE WHEN a.k % {_CH_NODES}
                                    <> a.k % {_CH_NODES + 1}
                               THEN 1 ELSE 0 END) AS BIGINT) AS modulo_moved
          FROM ring_a a JOIN ring_b b ON a.k = b.k
        )
        SELECT n AS n_keys, ring_moved, modulo_moved,
               CAST(ring_moved AS DOUBLE) / n AS ring_moved_frac,
               CAST(modulo_moved AS DOUBLE) / n AS modulo_moved_frac
        FROM stats
    """,
)
def q280_consistent_hashing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Moved-key fraction when a 5th node joins: consistent-hash ring (8
    vnodes/node) vs naive modulo — the rebalance audit (see block
    comment; broadcast vnode table, deterministic md5 ring)."""
    c = load_table(spark, sf_dir, "customer")
    keys = c.selectExpr(
        "c_custkey AS k",
        "CAST(conv(substring(md5(CAST(CAST(c_custkey AS STRING) AS BINARY)),"
        " 1, 8), 16, 10) AS BIGINT) AS kh",
    )

    # r16: the vnode ring is a DETERMINISTIC CONSTANT (md5 of literal
    # 'n<node>:<v>' strings), so both assignments fold into per-row
    # least() chains over literal positions — same packed key
    # (ring-distance * 100 + node, node recovered as % 100) the min_by
    # used, but with no 32/40-way key explosion, no per-ring groupBy
    # exchange, and no a⋈b re-join (profile before: two 0.65s single-task
    # crossJoin+agg stages plus a join; after: one scan, one scalar agg).
    # hashlib.md5 of the same bytes is bit-identical to Spark's md5().
    def assign_expr(n_nodes: int) -> str:
        terms = [
            f"((({pos} - kh) % {_CH_SPACE} + {_CH_SPACE}) % {_CH_SPACE})"
            f" * 100 + {node}"
            for node in range(n_nodes)
            for v in range(_CH_VNODES)
            for pos in (
                int(hashlib.md5(f"n{node}:{v}".encode()).hexdigest()[:8], 16),
            )
        ]
        return f"CAST(least({', '.join(terms)}) % 100 AS BIGINT)"

    assigned = keys.selectExpr(
        "k",
        f"{assign_expr(_CH_NODES)} AS node_a",
        f"{assign_expr(_CH_NODES + 1)} AS node_b",
    )
    stats = assigned.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(
            F.when(F.col("node_a") != F.col("node_b"), 1).otherwise(0)
        ).cast("bigint").alias("ring_moved"),
        F.sum(
            F.when(
                F.col("k") % _CH_NODES != F.col("k") % (_CH_NODES + 1), 1
            ).otherwise(0)
        ).cast("bigint").alias("modulo_moved"),
    )
    return stats.selectExpr(
        "n AS n_keys",
        "ring_moved",
        "modulo_moved",
        "CAST(ring_moved AS DOUBLE) / n AS ring_moved_frac",
        "CAST(modulo_moved AS DOUBLE) / n AS modulo_moved_frac",
    )


# ---------------------------------------------------------------------------
# q302 — learned-index error audit (RMI layer-0 epsilon for orderkey)
# ---------------------------------------------------------------------------
# Learned indexes replace B-tree nodes with a model key → position; the
# number that decides feasibility is ε, the max |predicted − actual|
# (every lookup scans a 2ε window). This audit fits the layer-0 linear
# model by closed-form OLS and reports ε plus the p99 error for the
# orderkey column. Positions are computed scale-correctly with the q296
# blocked-ranking pattern: within-block rank windows (partitioned) plus a
# broadcast prefix count over the tiny block relation — no fact-sized
# global sort. Moments are exact integers; errors round to whole
# positions before the percentile.
_LI_BLOCK = 100_000  # key-range block width


@register(
    "q302_learned_index_audit",
    tags=("physical-design", "learned-index", "stats"),
    oracle=f"""
        WITH keys AS (
          SELECT DISTINCT o_orderkey AS k FROM orders
        ),
        blocked AS (
          SELECT k, k // {_LI_BLOCK} AS blk FROM keys
        ),
        inblock AS (
          SELECT k, blk,
                 ROW_NUMBER() OVER (PARTITION BY blk ORDER BY k) - 1 AS r_in
          FROM blocked
        ),
        bsizes AS (SELECT blk, CAST(COUNT(*) AS BIGINT) AS n FROM blocked GROUP BY blk),
        prefix AS (
          SELECT blk,
                 CAST(COALESCE(SUM(n) OVER (ORDER BY blk
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                   AS BIGINT) AS before
          FROM bsizes
        ),
        pos AS (
          SELECT i.k, p.before + i.r_in AS r
          FROM inblock i JOIN prefix p ON i.blk = p.blk
        ),
        mom AS (
          SELECT CAST(COUNT(*) AS BIGINT) AS n,
                 CAST(SUM(k) AS BIGINT) AS sx,
                 CAST(SUM(r) AS BIGINT) AS sy,
                 CAST(SUM(k * k) AS BIGINT) AS sxx,
                 CAST(SUM(k * r) AS BIGINT) AS sxy
          FROM pos
        ),
        fit AS (
          SELECT n,
                 (CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
                   / (CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx) AS b,
                 (CAST(sy AS DOUBLE)
                  - ((CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
                     / (CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx))
                    * sx) / n AS a
          FROM mom
        ),
        err AS (
          SELECT CAST(ROUND(abs(f.a + f.b * p.k - p.r)) AS BIGINT) AS e
          FROM pos p CROSS JOIN fit f
        )
        SELECT (SELECT n FROM fit) AS n_keys,
               (SELECT b FROM fit) AS slope,
               CAST(MAX(e) AS BIGINT) AS epsilon_max,
               quantile_cont(e, 0.99) AS epsilon_p99
        FROM err
    """,
)
def q302_learned_index_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Layer-0 learned-index fit for orderkey with max/p99 position error
    (blocked ranking, closed-form OLS — see block comment)."""
    o = load_table(spark, sf_dir, "orders")
    keys = o.select(F.col("o_orderkey").alias("k")).distinct()
    blocked = keys.select("k", F.expr(f"k div {_LI_BLOCK}").alias("blk"))
    inblock = blocked.select(
        "k",
        "blk",
        (
            F.row_number().over(W.partitionBy("blk").orderBy("k")) - 1
        ).alias("r_in"),
    )
    bsizes = blocked.groupBy("blk").agg(
        F.count(F.lit(1)).cast("bigint").alias("n")
    )
    prefix = bsizes.select(
        "blk",
        F.coalesce(
            F.sum("n").over(
                W.orderBy("blk").rowsBetween(W.unboundedPreceding, -1)
            ),
            F.lit(0),
        ).cast("bigint").alias("before"),
    )
    # lazy cut: the regression moments and the residual scan both consume
    # the rank relation (4 fact scans/plan uncut)
    pos = inblock.join(F.broadcast(prefix), "blk").select(
        "k", (F.col("before") + F.col("r_in")).alias("r")
    ).localCheckpoint(eager=False)
    mom = pos.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("k").cast("bigint").alias("sx"),
        F.sum("r").cast("bigint").alias("sy"),
        F.sum(F.col("k") * F.col("k")).cast("bigint").alias("sxx"),
        F.sum(F.col("k") * F.col("r")).cast("bigint").alias("sxy"),
    )
    fit = mom.selectExpr(
        "n",
        "(CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)"
        " / (CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx) AS b",
        "(CAST(sy AS DOUBLE)"
        " - ((CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)"
        "    / (CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx))"
        "   * sx) / n AS a",
    )
    err = pos.crossJoin(F.broadcast(fit)).selectExpr(
        "n", "b", "CAST(ROUND(abs(a + b * k - r)) AS BIGINT) AS e"
    )
    return err.agg(
        F.min("n").cast("bigint").alias("n_keys"),
        F.min("b").alias("slope"),
        F.max("e").cast("bigint").alias("epsilon_max"),
        F.expr("percentile(e, 0.99)").alias("epsilon_p99"),
    )
