"""Spatial operators: grid-blocked geographic joins.

The reference has no spatial surface, but a corpus with geo-tagged
records (store locators, geo-dedup, POI conflation) needs a nearest-
neighbor join that never goes all-pairs. The standard distributed shape
is GRID BLOCKING: bucket both sides into coarse cells, expand the small
side into its 3x3 cell neighborhood, equi-join on the cell key, and
resolve argmin inside the candidate set — a plain hash join whose cost
is cell occupancy, not |left| x |right|.

Coordinates here are derived deterministically from integer keys (the
test tables carry no geo columns) and kept in INTEGER centidegrees end
to end, so cell assignment and squared distances are exact in both
engines — the operator shape is the real one, only the coordinate
source is synthetic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from docling_api_spark.plans.registry import register
from docling_api_spark.tables import load_table

# centidegree grid: lat in [0, 12000), lon in [0, 36000), 15-degree cells
CELL = 1500


@register(
    "q186_geo_grid_join",
    tags=("spatial", "grid_join", "nearest"),
    bench=True,
    oracle=f"""
        WITH cust AS (
          SELECT c_custkey,
                 (c_custkey * 7919) % 12000 AS clat,
                 (c_custkey * 104729) % 36000 AS clon
          FROM customer
        ),
        supp AS (
          SELECT s_suppkey,
                 (s_suppkey * 6101) % 12000 AS slat,
                 (s_suppkey * 94907) % 36000 AS slon
          FROM supplier
        ),
        sgrid AS (
          SELECT s_suppkey, slat, slon,
                 slat // {CELL} + dy AS cy,
                 slon // {CELL} + dx AS cx
          FROM supp
          CROSS JOIN (SELECT unnest(range(-1, 2)) AS dy) a
          CROSS JOIN (SELECT unnest(range(-1, 2)) AS dx) b
        ),
        cand AS (
          SELECT c.c_custkey, s.s_suppkey,
                 (c.clat - s.slat) * (c.clat - s.slat)
                 + (c.clon - s.slon) * (c.clon - s.slon) AS d2
          FROM cust c JOIN sgrid s
            ON c.clat // {CELL} = s.cy AND c.clon // {CELL} = s.cx
        )
        SELECT c_custkey,
               s_suppkey AS nearest_suppkey,
               CAST(d2 AS BIGINT) AS d2_centideg
        FROM (
          SELECT *, ROW_NUMBER() OVER (
                   PARTITION BY c_custkey ORDER BY d2, s_suppkey) AS rk
          FROM cand
        ) t WHERE rk = 1
    """,
)
def q186_geo_grid_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grid-blocked spatial nearest-neighbor join: for every customer,
    the closest supplier within its 3x3 cell neighborhood (squared
    planar distance in centidegrees, ties broken by supplier key).

    Spark shape — the canonical distributed spatial join:
    - the SMALL side (suppliers) is exploded 9x into its neighbor cells
      and broadcast; the fact side stays un-exploded and computes its
      single cell key map-side, so the join is a broadcast hash join on
      the cell key with zero shuffle of the customer table;
    - candidates per customer = occupancy of one 3x3 neighborhood;
      argmin resolves in a per-customer window over that bounded set.
    At 100 TB the dim side shuffles instead of broadcasting, cell size
    is tuned to target occupancy, and dense-city skew is handled by AQE
    skew-join or finer cells — the plan shape is unchanged. Customers
    whose neighborhood holds no supplier drop out (bounded-radius
    semantics); longitude wrap-around is deliberately not stitched —
    both documented, both mirrored by the oracle.
    """
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey",
        ((F.col("c_custkey") * 7919) % 12000).alias("clat"),
        ((F.col("c_custkey") * 104729) % 36000).alias("clon"),
    )
    supp = load_table(spark, sf_dir, "supplier").select(
        "s_suppkey",
        ((F.col("s_suppkey") * 6101) % 12000).alias("slat"),
        ((F.col("s_suppkey") * 94907) % 36000).alias("slon"),
    )
    offs = F.sequence(F.lit(-1), F.lit(1))
    sgrid = (
        supp.select(
            "s_suppkey",
            "slat",
            "slon",
            F.explode(offs).alias("dy"),
        )
        .select(
            "s_suppkey",
            "slat",
            "slon",
            (F.expr(f"slat div {CELL}") + F.col("dy")).alias("cy"),
            F.explode(offs).alias("dx"),
        )
        .select(
            "s_suppkey",
            "slat",
            "slon",
            "cy",
            (F.expr(f"slon div {CELL}") + F.col("dx")).alias("cx"),
        )
    )
    cand = cust.join(
        F.broadcast(sgrid),
        (F.expr(f"clat div {CELL}") == F.col("cy"))
        & (F.expr(f"clon div {CELL}") == F.col("cx")),
    ).select(
        "c_custkey",
        "s_suppkey",
        (
            (F.col("clat") - F.col("slat")) * (F.col("clat") - F.col("slat"))
            + (F.col("clon") - F.col("slon"))
            * (F.col("clon") - F.col("slon"))
        ).alias("d2"),
    )
    wk = W.partitionBy("c_custkey").orderBy("d2", "s_suppkey")
    return (
        cand.withColumn("rk", F.row_number().over(wk))
        .where(F.col("rk") == 1)
        .select(
            "c_custkey",
            F.col("s_suppkey").alias("nearest_suppkey"),
            F.col("d2").cast("bigint").alias("d2_centideg"),
        )
    )
