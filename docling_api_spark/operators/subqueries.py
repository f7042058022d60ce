"""Subquery, lateral/explode, conditional-aggregate, and array-aggregate
operators — the SQL-surface corners not covered by the core relational set.

Expressed through spark.sql over registered temp views where SQL is the
clearer form (Catalyst produces identical plans either way); each has a
DuckDB twin differing only in dialect spellings.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from docling_api_spark.functions.numeric import sql_dsum
from docling_api_spark.plans.registry import register
from docling_api_spark.tables import load_table


# ---------------------------------------------------------------------------
# q08 — uncorrelated scalar subquery
# ---------------------------------------------------------------------------
@register(
    "q08_scalar_subquery",
    tags=("subquery", "scalar"),
    oracle="""
        SELECT c_custkey, c_name, c_acctbal
        FROM customer
        WHERE c_acctbal > (SELECT AVG(c_acctbal) * 1.5 FROM customer)
    """,
)
def q08_scalar_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customers 1.5× above the mean balance (scalar subquery → one-row
    broadcast, no per-row re-evaluation)."""
    load_table(spark, sf_dir, "customer").createOrReplaceTempView("customer")
    return spark.sql(
        """
        SELECT c_custkey, c_name, c_acctbal
        FROM customer
        WHERE c_acctbal > (SELECT AVG(c_acctbal) * 1.5 FROM customer)
        """
    )


# ---------------------------------------------------------------------------
# q09 — correlated EXISTS subquery
# ---------------------------------------------------------------------------
@register(
    "q09_correlated_exists",
    tags=("subquery", "exists"),
    oracle="""
        SELECT s_suppkey, s_name
        FROM supplier
        WHERE EXISTS (
          SELECT 1 FROM customer
          WHERE c_nationkey = s_nationkey AND c_acctbal > 9000.0
        )
    """,
)
def q09_correlated_exists(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Suppliers whose nation has a high-balance customer (correlated EXISTS
    — Catalyst rewrites to a semi join, no per-row subquery execution)."""
    load_table(spark, sf_dir, "supplier").createOrReplaceTempView("supplier")
    load_table(spark, sf_dir, "customer").createOrReplaceTempView("customer")
    return spark.sql(
        """
        SELECT s_suppkey, s_name
        FROM supplier
        WHERE EXISTS (
          SELECT 1 FROM customer
          WHERE c_nationkey = s_nationkey AND c_acctbal > 9000.0
        )
        """
    )


# ---------------------------------------------------------------------------
# q25 — explode / lateral word count
# ---------------------------------------------------------------------------
@register(
    "q25_explode_wordcount",
    tags=("explode", "lateral", "agg"),
    oracle="""
        SELECT word, COUNT(*) AS n, COUNT(DISTINCT p_partkey) AS n_parts
        FROM (
          SELECT p_partkey, unnest(string_split(p_name, ' ')) AS word FROM part
        ) t
        GROUP BY word
    """,
)
def q25_explode_wordcount(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Word frequencies over exploded part names (LATERAL VIEW shape)."""
    part = load_table(spark, sf_dir, "part")
    return (
        part.select("p_partkey", F.explode(F.split("p_name", " ")).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("n"), F.countDistinct("p_partkey").alias("n_parts"))
    )


# ---------------------------------------------------------------------------
# q26 — conditional aggregation (CASE inside aggregates)
# ---------------------------------------------------------------------------
@register(
    "q26_conditional_agg",
    tags=("agg", "conditional"),
    oracle=f"""
        SELECT
          user_id,
          COUNT(*) AS n_events,
          CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT)
            AS n_purchases,
          CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT)
            AS n_errors,
          {sql_dsum("CASE WHEN event_type = 'purchase' THEN value ELSE 0.0 END", 'purchase_value')},
          CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS DOUBLE)
            / COUNT(*) AS purchase_rate
        FROM events
        GROUP BY user_id
    """,
)
def q26_conditional_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user funnel counters in one pass (conditional aggregates instead
    of N filtered scans)."""
    ev = load_table(spark, sf_dir, "events")
    is_purchase = F.when(F.col("event_type") == "purchase", 1).otherwise(0)
    is_error = F.when(F.col("event_type") == "error", 1).otherwise(0)
    purchase_value = F.when(F.col("event_type") == "purchase", F.col("value")).otherwise(0.0)
    return ev.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(is_purchase).alias("n_purchases"),
        F.sum(is_error).alias("n_errors"),
        F.sum(purchase_value.cast("decimal(28,6)")).cast("double").alias("purchase_value"),
        (F.sum(is_purchase).cast("double") / F.count(F.lit(1))).alias("purchase_rate"),
    )


# ---------------------------------------------------------------------------
# q94 — MERGE INTO / upsert emulation (CDC apply without Delta)
# ---------------------------------------------------------------------------
@register(
    "q94_merge_upsert",
    tags=("merge", "cdc", "upsert"),
    oracle="""
        WITH updates AS (
          SELECT c_custkey, c_name, c_acctbal + 1000.0 AS c_acctbal
          FROM customer WHERE c_custkey % 10 = 0
        ),
        inserts AS (
          SELECT c_custkey + 1000000 AS c_custkey, c_name, 0.0 AS c_acctbal
          FROM customer WHERE c_custkey % 100 = 0
        ),
        changes AS (SELECT * FROM updates UNION ALL SELECT * FROM inserts)
        SELECT c_custkey, c_name, c_acctbal, TRUE AS from_change FROM changes
        UNION ALL
        SELECT c.c_custkey, c.c_name, c.c_acctbal, FALSE AS from_change
        FROM customer c
        WHERE NOT EXISTS (SELECT 1 FROM changes u WHERE u.c_custkey = c.c_custkey)
    """,
)
def q94_merge_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE INTO emulation on plain parquet: changes ∪ (target ANTI JOIN
    changes). Updated rows carry new values, unmatched changes insert, and
    untouched target rows pass through — the CDC-apply pattern when no
    Delta/Iceberg MERGE is available. The anti join broadcasts the (small)
    change set, so the target scans once with no shuffle."""
    customer = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", "c_acctbal"
    )
    updates = customer.filter(F.col("c_custkey") % 10 == 0).withColumn(
        "c_acctbal", F.col("c_acctbal") + 1000.0
    )
    inserts = customer.filter(F.col("c_custkey") % 100 == 0).select(
        (F.col("c_custkey") + 1_000_000).alias("c_custkey"),
        "c_name",
        F.lit(0.0).alias("c_acctbal"),
    )
    # lazy cut: the change set feeds both the broadcast anti-join probe and
    # the final union (audit: 5 target scans/plan uncut)
    changes = updates.unionByName(inserts).localCheckpoint(eager=False)
    untouched = customer.join(F.broadcast(changes), "c_custkey", "left_anti")
    return changes.withColumn("from_change", F.lit(True)).unionByName(
        untouched.withColumn("from_change", F.lit(False))
    )


# ---------------------------------------------------------------------------
# q96 — histogram via width_bucket
# ---------------------------------------------------------------------------
@register(
    "q96_histogram",
    tags=("agg", "histogram"),
    oracle="""
        SELECT
          CAST(
            CASE WHEN o_totalprice >= 500000.0 THEN 21
                 WHEN o_totalprice < 0.0 THEN 0
                 ELSE CAST(floor(o_totalprice / 25000.0) AS INTEGER) + 1 END
            AS INTEGER) AS bucket,
          COUNT(*) AS n_orders,
          MIN(o_totalprice) AS lo,
          MAX(o_totalprice) AS hi
        FROM orders
        GROUP BY 1
    """,
)
def q96_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """20-bucket equi-width histogram of order totals (width_bucket
    semantics: 0 = underflow, 21 = overflow). One map-side bucket expr +
    one tiny aggregation — the distribution profile at any scale."""
    orders = load_table(spark, sf_dir, "orders")
    bucket = F.expr("CAST(width_bucket(o_totalprice, 0.0, 500000.0, 20) AS INT)")
    return orders.groupBy(bucket.alias("bucket")).agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.min("o_totalprice").alias("lo"),
        F.max("o_totalprice").alias("hi"),
    )


# ---------------------------------------------------------------------------
# q46 — unpivot / stack (wide metrics → long rows)
# ---------------------------------------------------------------------------
@register(
    "q46_unpivot",
    tags=("unpivot", "stack"),
    oracle=f"""
        SELECT c_nationkey AS nationkey, 'customer_bal' AS metric,
               {sql_dsum('c_acctbal', 'value')}
        FROM customer GROUP BY c_nationkey
        UNION ALL
        SELECT s_nationkey AS nationkey, 'supplier_bal' AS metric,
               {sql_dsum('s_acctbal', 'value')}
        FROM supplier GROUP BY s_nationkey
    """,
)
def q46_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wide per-nation balance columns unpivoted to (metric, value) rows via
    `stack` — the long-format transform (oracle is the UNION ALL identity)."""
    from docling_api_spark.functions.numeric import dsum

    cust = (
        load_table(spark, sf_dir, "customer")
        .groupBy(F.col("c_nationkey").alias("nationkey"))
        .agg(dsum("c_acctbal", "customer_bal"))
    )
    supp = (
        load_table(spark, sf_dir, "supplier")
        .groupBy(F.col("s_nationkey").alias("nationkey"))
        .agg(dsum("s_acctbal", "supplier_bal"))
    )
    wide = cust.join(supp, "nationkey", "full_outer")
    return wide.selectExpr(
        "nationkey",
        "stack(2, 'customer_bal', customer_bal, 'supplier_bal', supplier_bal) AS (metric, value)",
    ).filter(F.col("value").isNotNull())


# ---------------------------------------------------------------------------
# q27 — array aggregation (collect_set as sorted array)
# ---------------------------------------------------------------------------
@register(
    "q27_array_agg",
    tags=("agg", "array"),
    oracle="""
        SELECT
          user_id,
          array_to_string(list_sort(list(DISTINCT event_type)), chr(31)) AS event_types,
          CAST(len(list(DISTINCT event_type)) AS INTEGER) AS n_types
        FROM events
        GROUP BY user_id
    """,
)
def q27_array_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct event types per user as a sorted array (collect_set +
    sort_array); emitted joined on \\x1f (unit separator — cannot appear in
    event_type values, so the encoding round-trips unambiguously) because
    the driver's pandas canonicalizer cannot sort rows containing raw
    array cells."""
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("user_id").agg(
        F.array_join(F.sort_array(F.collect_set("event_type")), "\x1f").alias("event_types"),
        F.size(F.collect_set("event_type")).cast("int").alias("n_types"),
    )


# ---------------------------------------------------------------------------
# q173 — k-anonymity audit over quasi-identifiers (privacy risk gate)
# ---------------------------------------------------------------------------
KANON_K = 5  # groups smaller than this are re-identification risks
_BAL_BAND = 5000  # acctbal quasi-identifier coarsening, dollars


@register(
    "q173_k_anonymity",
    tags=("privacy", "quality", "audit"),
    oracle=f"""
        WITH g AS (
          SELECT c_mktsegment, c_nationkey,
                 CAST(FLOOR(c_acctbal / {_BAL_BAND}) AS BIGINT) AS bal_band,
                 CAST(COUNT(*) AS BIGINT) AS n_members
          FROM customer
          GROUP BY 1, 2, 3
        ),
        k AS (SELECT CAST(MIN(n_members) AS BIGINT) AS corpus_k FROM g)
        SELECT g.c_mktsegment, g.c_nationkey, g.bal_band, g.n_members,
               k.corpus_k
        FROM g, k
        WHERE g.n_members < {KANON_K}
    """,
)
def q173_k_anonymity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity audit: every quasi-identifier combination (market
    segment × nation × $5000 balance band) whose group has fewer than K
    members — the cells where a joined external dataset could
    re-identify individuals — plus the corpus-wide k (the smallest
    group anywhere) on every row.

    One keyed aggregation to the QI-cell relation (bounded by the
    attribute DOMAIN — segments × nations × bands, not the customer
    count), a scalar min broadcast back, and a selective filter. The
    release gate a privacy pipeline runs before publishing microdata;
    the generalization knobs (band width, dropped attributes) are the
    remediation when the audit fails.
    """
    cust = load_table(spark, sf_dir, "customer")
    g = cust.groupBy(
        "c_mktsegment",
        "c_nationkey",
        F.floor(F.col("c_acctbal") / _BAL_BAND).cast("bigint").alias("bal_band"),
    ).agg(F.count(F.lit(1)).cast("bigint").alias("n_members"))
    k = g.agg(F.min("n_members").cast("bigint").alias("corpus_k"))
    return (
        g.crossJoin(F.broadcast(k))
        .where(F.col("n_members") < KANON_K)
        .select("c_mktsegment", "c_nationkey", "bal_band", "n_members", "corpus_k")
    )
