"""Co-located bucketed joins: the write-time partitioning contract.

Pins the scale-critical property: a join between two tables bucketed on
the join key reads pre-partitioned buckets and performs NO shuffle —
`Exchange` must not appear in the executed plan — while producing exactly
the same result as the shuffled join."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from docling_api_spark.sources.bucketed import bucketed_table, write_bucketed
from docling_api_spark.tables import load_table


@pytest.fixture(scope="module")
def bucketed_pair(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_quantity", "l_extendedprice"
    )
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority", "o_totalprice"
    )
    write_bucketed(li, "li_by_orderkey", ["l_orderkey"], 8, ["l_orderkey"])
    write_bucketed(orders, "ord_by_orderkey", ["o_orderkey"], 8, ["o_orderkey"])
    yield "li_by_orderkey", "ord_by_orderkey"
    spark.sql("DROP TABLE IF EXISTS li_by_orderkey")
    spark.sql("DROP TABLE IF EXISTS ord_by_orderkey")


def _joined(spark, li_name, ord_name):
    li = bucketed_table(spark, li_name)
    orders = bucketed_table(spark, ord_name)
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            F.sum(F.col("l_quantity").cast("decimal(28,6)")).cast("double").alias("qty"),
        )
    )


def test_bucketed_join_has_no_exchange(spark, sf_dir, bucketed_pair):
    li_name, ord_name = bucketed_pair
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        df = _joined(spark, li_name, ord_name)
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        # the whole point: co-located buckets, zero shuffle on the join
        join_part = plan.split("HashAggregate")[-1]  # below the final agg
        assert "Exchange" not in join_part, plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_bucketed_join_matches_shuffled_join(spark, sf_dir, bucketed_pair):
    li_name, ord_name = bucketed_pair
    bucketed = {tuple(r) for r in _joined(spark, li_name, ord_name).collect()}
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    plain = {
        tuple(r)
        for r in (
            li.join(orders, li.l_orderkey == orders.o_orderkey)
            .groupBy("o_orderpriority")
            .agg(
                F.count(F.lit(1)).alias("n_lines"),
                F.sum(F.col("l_quantity").cast("decimal(28,6)"))
                .cast("double")
                .alias("qty"),
            )
            .collect()
        )
    }
    assert bucketed == plain
