"""Deterministic sampling and data-profiling operators.

Training-data pipelines need REPRODUCIBLE sampling: `df.sample()` depends on
partitioning and seed plumbing, but a content-hash predicate gives the same
sample on any cluster layout, any engine, any day — and it's the only way an
oracle can agree with us. md5 is the cross-engine hash (Spark xxhash64 has
no DuckDB twin).

Scale notes: hash-sampling is a map-side filter (pushes nothing to the scan
but costs one hash per row); stratified top-n per group is one window; the
profile operator is one pass of aggregates per profiled column set.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from docling_api_spark.functions.numeric import sql_davg, sql_dsum, davg, dsum
from docling_api_spark.plans.registry import register
from docling_api_spark.tables import load_table


def hash_bucket(col, n_buckets: int = 100):
    """Deterministic [0, n_buckets) bucket from the md5 of a key's string
    form — identical in any engine that can md5 a UTF-8 string."""
    return F.conv(F.substring(F.md5(F.col(col).cast("string").cast("binary")), 1, 8), 16, 10).cast(
        "bigint"
    ) % n_buckets


def sql_hash_bucket(expr: str, n_buckets: int = 100) -> str:
    """DuckDB twin of :func:`hash_bucket`."""
    return (
        f"CAST(concat('0x', substring(md5(CAST({expr} AS VARCHAR)), 1, 8)) AS BIGINT) "
        f"% {n_buckets}"
    )


# ---------------------------------------------------------------------------
# q90 — column profiling (the `describe` pass of a data-quality gate)
# ---------------------------------------------------------------------------
@register(
    "q90_profile_orders",
    tags=("profile", "quality", "agg"),
    oracle=f"""
        SELECT
          COUNT(*) AS n_rows,
          COUNT(DISTINCT o_custkey) AS n_customers,
          COUNT(DISTINCT o_orderstatus) AS n_statuses,
          CAST(SUM(CASE WHEN o_totalprice IS NULL THEN 1 ELSE 0 END) AS BIGINT)
            AS null_totalprice,
          MIN(o_totalprice) AS min_price,
          MAX(o_totalprice) AS max_price,
          {sql_davg('o_totalprice', 'avg_price')},
          strftime(MIN(o_orderdate), '%Y-%m-%d') AS first_order,
          strftime(MAX(o_orderdate), '%Y-%m-%d') AS last_order
        FROM orders
    """,
)
def q90_profile_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-pass table profile: cardinalities, null counts, ranges, mean."""
    orders = load_table(spark, sf_dir, "orders")
    return orders.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.countDistinct("o_custkey").alias("n_customers"),
        F.countDistinct("o_orderstatus").alias("n_statuses"),
        F.sum(F.when(F.col("o_totalprice").isNull(), 1).otherwise(0)).alias(
            "null_totalprice"
        ),
        F.min("o_totalprice").alias("min_price"),
        F.max("o_totalprice").alias("max_price"),
        davg("o_totalprice", "avg_price"),
        F.date_format(F.min("o_orderdate"), "yyyy-MM-dd").alias("first_order"),
        F.date_format(F.max("o_orderdate"), "yyyy-MM-dd").alias("last_order"),
    )


# ---------------------------------------------------------------------------
# q91 — deterministic hash sample (reproducible corpus subsetting)
# ---------------------------------------------------------------------------
@register(
    "q91_hash_sample",
    tags=("sampling", "dedup"),
    oracle=f"""
        SELECT doc_id, lang, n_chars
        FROM documents
        WHERE {sql_hash_bucket('doc_id')} < 10
    """,
)
def q91_hash_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """~10% sample selected by content-hash bucket — the same rows come back
    on any engine/partitioning (unlike df.sample), so downstream runs and
    holdout splits are reproducible."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.filter(hash_bucket("doc_id") < 10).select("doc_id", "lang", "n_chars")


# ---------------------------------------------------------------------------
# q92 — stratified deterministic sample (per-language quota)
# ---------------------------------------------------------------------------
@register(
    "q92_stratified_sample",
    tags=("sampling", "window"),
    oracle=f"""
        SELECT doc_id, lang
        FROM (
          SELECT doc_id, lang,
                 ROW_NUMBER() OVER (
                   PARTITION BY lang
                   ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
                 ) AS rn
          FROM documents
        ) t
        WHERE rn <= 20
    """,
)
def q92_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """20 documents per language, chosen by hash order — a deterministic
    stratified sample that rebalances skewed language distributions (the
    standard move when assembling a mixing recipe for training corpora)."""
    docs = load_table(spark, sf_dir, "documents")
    w = W.partitionBy("lang").orderBy(
        F.md5(F.col("doc_id").cast("string").cast("binary")), F.col("doc_id")
    )
    return (
        docs.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 20)
        .select("doc_id", "lang")
    )


# ---------------------------------------------------------------------------
# q93 — weighted source mixing (training-mix assembly)
# ---------------------------------------------------------------------------
@register(
    "q93_weighted_mix",
    tags=("sampling", "mixing"),
    oracle=f"""
        WITH weights(src_prefix, pct) AS (VALUES ('src0', 100), ('src1', 50), ('src2', 10))
        SELECT d.doc_id, d.source, w.pct
        FROM documents d
        JOIN weights w ON d.source = w.src_prefix
        WHERE {sql_hash_bucket('d.doc_id')} < w.pct
    """,
)
def q93_weighted_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source sampling rates (100%/50%/10%) applied with the
    deterministic hash predicate — the corpus-mixing recipe as one
    broadcast join + filter, no shuffle of the corpus."""
    docs = load_table(spark, sf_dir, "documents")
    weights = spark.createDataFrame(
        [("src0", 100), ("src1", 50), ("src2", 10)], "src_prefix string, pct int"
    )
    return (
        docs.join(F.broadcast(weights), docs.source == weights.src_prefix)
        .filter(hash_bucket("doc_id") < F.col("pct"))
        .select("doc_id", "source", "pct")
    )
