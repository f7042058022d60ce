"""Connector coverage: CSV/JSON roundtrips with declared schemas, corrupt-row
capture, partitioned writes with partition pruning, and bucketed tables
joining without a shuffle."""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql import types as T

from docling_api_spark.sources.files import read_csv, read_json, write_partitioned
from docling_api_spark.tables import load_table

DOC_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("lang", T.StringType()),
        T.StructField("source", T.StringType()),
        T.StructField("n_chars", T.LongType()),
    ]
)


def test_csv_json_roundtrip(spark, sf_dir, tmp_path):
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "lang", "source", "n_chars"
    )
    csv_dir, json_dir = str(tmp_path / "csv"), str(tmp_path / "json")
    docs.write.option("header", "true").csv(csv_dir)
    docs.write.json(json_dir)

    back_csv = read_csv(spark, csv_dir, DOC_SCHEMA)
    back_json = read_json(spark, json_dir, DOC_SCHEMA)
    n = docs.count()
    assert back_csv.count() == n
    assert back_json.count() == n
    # (querying only _corrupt_record is disallowed by Spark — inspect rows)
    assert all(r["_corrupt_record"] is None for r in back_csv.collect())
    # values identical after roundtrip
    a = {r["doc_id"]: (r["lang"], r["source"], r["n_chars"]) for r in docs.collect()}
    b = {
        r["doc_id"]: (r["lang"], r["source"], r["n_chars"])
        for r in back_json.drop("_corrupt_record").collect()
    }
    assert a == b


def test_corrupt_rows_are_captured_not_fatal(spark, tmp_path):
    p = tmp_path / "bad.json"
    p.write_text('{"doc_id": 1, "lang": "en"}\n{not json at all}\n{"doc_id": 2}\n')
    df = read_json(spark, str(p), DOC_SCHEMA)
    rows = df.collect()
    assert len(rows) == 3
    corrupt = [r for r in rows if r["_corrupt_record"] is not None]
    assert len(corrupt) == 1 and "{not json" in corrupt[0]["_corrupt_record"]


def test_partitioned_write_prunes_partitions(spark, sf_dir, tmp_path):
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "lang", "n_chars")
    out = str(tmp_path / "by_lang")
    write_partitioned(docs, out, ["lang"])
    back = spark.read.parquet(out)
    assert back.count() == docs.count()
    plan = (
        back.filter(F.col("lang") == "en")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # directory-level partition pruning, not a data filter
    assert "PartitionFilters: [isnotnull(lang" in plan


def test_bucketed_tables_join_without_shuffle(spark, sf_dir, tmp_path):
    """Bucketing both join sides on the key pre-co-locates them: the join
    plan has NO Exchange — the shuffle was paid once at write time (the
    100 TB pattern for repeatedly-joined fact tables)."""
    warehouse = spark.conf.get("spark.sql.warehouse.dir", "")
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_quantity", "l_extendedprice"
    )
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    spark.sql("DROP TABLE IF EXISTS li_b")
    spark.sql("DROP TABLE IF EXISTS ord_b")
    li.write.bucketBy(8, "l_orderkey").sortBy("l_orderkey").saveAsTable("li_b")
    orders.write.bucketBy(8, "o_orderkey").sortBy("o_orderkey").saveAsTable("ord_b")
    prev_threshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        # force the non-broadcast path: the point is that the SHUFFLE is gone
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        joined = spark.table("li_b").join(
            spark.table("ord_b"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
        plan = joined._jdf.queryExecution().explainString(mode)
        assert "Exchange" not in plan
        assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan
        assert joined.count() == li.count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev_threshold)
        spark.sql("DROP TABLE IF EXISTS li_b")
        spark.sql("DROP TABLE IF EXISTS ord_b")
        assert warehouse is not None  # keep linters honest


def test_orc_roundtrip_with_pushdown(spark, sf_dir, tmp_path):
    from docling_api_spark.sources.files import read_orc, write_orc
    from docling_api_spark.tables import load_table

    nation = load_table(spark, sf_dir, "nation")
    path = str(tmp_path / "nation_orc")
    write_orc(nation, path)

    back = read_orc(spark, path)
    assert back.count() == nation.count()
    assert {f.name for f in back.schema.fields} == {
        f.name for f in nation.schema.fields
    }
    # columnar scan: the filter reaches the ORC reader as a pushed filter
    plan = (
        back.filter(back.n_nationkey == 3)
        .select("n_name")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "PushedFilters: [" in plan and "n_nationkey" in plan
