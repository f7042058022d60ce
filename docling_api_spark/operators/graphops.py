"""Graph traversal operators over the relational tables.

The reference's data model has no graph engine, but a training-data
pipeline needs bounded graph reachability all the time (dedup-cluster
audits, related-item expansion, contamination blast-radius). q45 already
covers unbounded connected components; this module adds bounded-depth BFS
(k-hop reachability), the frontier-expansion primitive CC builds on.

Scale posture (100 TB):
- The edge relation is reduced FIRST (`select distinct(part, supplier)`)
  so the traversal joins move key pairs, never fact rows.
- Each hop is frontier ⋈ edges — work proportional to |frontier| × degree,
  not |graph|. The frontier is broadcast when small (AQE decides at
  runtime); `visited` is carried as a key-only DataFrame and anti-joined
  to keep the frontier from re-expanding into explored territory.
- `localCheckpoint` truncates lineage each round (same discipline as the
  q45 CC loop) so plan depth stays O(1) per hop instead of O(hops²).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from docling_api_spark.plans.registry import register
from docling_api_spark.tables import load_table

K_HOPS = 2
SEED_MOD = 500  # parts with p_partkey % 500 == 0 seed the traversal


@register(
    "q103_khop_reachability",
    tags=("graph", "bfs", "iterative"),
    oracle=f"""
        WITH e AS (
          SELECT DISTINCT l_partkey AS p, l_suppkey AS s FROM lineitem
        ),
        seeds AS (
          SELECT DISTINCT p FROM e WHERE p % {SEED_MOD} = 0
        ),
        n1 AS (
          SELECT DISTINCT e2.p
          FROM e e1 JOIN e e2 ON e1.s = e2.s
          WHERE e1.p IN (SELECT p FROM seeds)
        ),
        h1 AS (
          SELECT p FROM n1 WHERE p NOT IN (SELECT p FROM seeds)
        ),
        n2 AS (
          SELECT DISTINCT e2.p
          FROM e e1 JOIN e e2 ON e1.s = e2.s
          WHERE e1.p IN (SELECT p FROM h1)
        ),
        h2 AS (
          SELECT p FROM n2
          WHERE p NOT IN (SELECT p FROM seeds) AND p NOT IN (SELECT p FROM h1)
        )
        SELECT p AS part_key, 0 AS min_hops FROM seeds
        UNION ALL
        SELECT p AS part_key, 1 AS min_hops FROM h1
        UNION ALL
        SELECT p AS part_key, 2 AS min_hops FROM h2
    """,
)
def q103_khop_reachability(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K-hop BFS over the part—supplier co-sourcing graph.

    Two parts are adjacent iff some supplier ships both (distinct
    (l_partkey, l_suppkey) pairs from lineitem). Starting from a
    deterministic seed set, expand K=2 hops and report each reachable
    part's minimum hop distance.

    The bipartite expansion is done hop-by-hop THROUGH the supplier side
    (part → supplier → part) rather than by materializing the co-part
    adjacency: a supplier shipping d parts contributes d² adjacency pairs
    but only d bipartite edges, so the frontier join stays linear in the
    edge list where the closed form is quadratic. The oracle pays the
    quadratic join — affordable at sf0.01, exactly the tradeoff that makes
    the iterative form the 100 TB plan.
    """
    li = load_table(spark, sf_dir, "lineitem")
    edges = li.select(
        F.col("l_partkey").alias("p"), F.col("l_suppkey").alias("s")
    ).distinct()
    # materialize once: every hop joins against it twice
    edges = edges.localCheckpoint(eager=True)

    seeds = edges.select("p").where(F.col("p") % SEED_MOD == 0).distinct()
    frontier = seeds.localCheckpoint(eager=True)
    visited = frontier
    out = frontier.withColumn("min_hops", F.lit(0).cast("int"))

    for hop in range(1, K_HOPS + 1):
        via = edges.join(frontier, "p").select("s").distinct()
        nxt = (
            edges.join(via, "s")
            .select("p")
            .distinct()
            .join(visited, "p", "left_anti")
            .localCheckpoint(eager=True)
        )
        out = out.unionByName(nxt.withColumn("min_hops", F.lit(hop).cast("int")))
        visited = visited.unionByName(nxt).localCheckpoint(eager=True)
        frontier = nxt

    return out.select(F.col("p").alias("part_key"), "min_hops")
