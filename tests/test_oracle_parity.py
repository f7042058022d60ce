"""Run every registered query against its DuckDB oracle — the local twin of
the driver's t2 correctness gate, with exact value comparison."""

from __future__ import annotations

import pytest

from docling_api_spark.plans import all_queries
from tests.conftest import compare_to_oracle

QUERIES = all_queries()
ORACLE_CHECKED = sorted(n for n, q in QUERIES.items() if q.oracle)
ROWS_ONLY = sorted(n for n, q in QUERIES.items() if not q.oracle)


@pytest.mark.parametrize("name", ORACLE_CHECKED)
def test_query_matches_oracle(spark, sf_dir, oracle_con, name):
    q = QUERIES[name]
    df = q.fn(spark, sf_dir)
    compare_to_oracle(df, oracle_con, q.oracle)


@pytest.mark.parametrize("name", ROWS_ONLY)
def test_rows_only_query_runs(spark, sf_dir, name):
    q = QUERIES[name]
    df = q.fn(spark, sf_dir)
    assert df.count() >= 0
    assert len(df.schema.fields) > 0


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() > 0
    names = set(e.queries())
    oracles = e.oracle_sql()
    assert set(oracles) <= names
