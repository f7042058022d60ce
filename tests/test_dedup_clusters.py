"""Connected-components semantics on synthetic graphs (pins q45's engine)."""

from __future__ import annotations

from docling_api_spark.operators.dedup import connected_components


def _components(spark, edges):
    df = spark.createDataFrame(edges, "src long, dst long")
    return {r["node"]: r["component"] for r in connected_components(df).collect()}


def test_chain_collapses_to_min(spark):
    comp = _components(spark, [(1, 2), (2, 3), (3, 4)])
    assert comp == {1: 1, 2: 1, 3: 1, 4: 1}


def test_disjoint_components_stay_apart(spark):
    comp = _components(spark, [(1, 2), (10, 11), (11, 12)])
    assert comp == {1: 1, 2: 1, 10: 10, 11: 10, 12: 10}


def test_direction_is_ignored(spark):
    comp = _components(spark, [(5, 3), (4, 5)])
    assert comp == {3: 3, 4: 3, 5: 3}


def test_long_chain_converges(spark):
    n = 12
    comp = _components(spark, [(i, i + 1) for i in range(n)])
    assert set(comp.values()) == {0}
