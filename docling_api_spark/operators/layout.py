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

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from docling_api_spark.plans.registry import register
from docling_api_spark.tables import load_table

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
