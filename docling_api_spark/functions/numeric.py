"""Exact-decimal aggregation helpers for oracle-parity float math.

Double-precision SUM/AVG are accumulation-order dependent, so a Spark
parallel sum and a DuckDB sequential sum can differ in the last ulps — enough
to break a value-hash comparison. Routing the aggregation through
DECIMAL(28,6) makes it exact and order-independent in both engines:

    Spark : CAST(SUM(CAST(x AS DECIMAL(28,6))) AS DOUBLE)
    DuckDB: CAST(SUM(CAST(x AS DECIMAL(28,6))) AS DOUBLE)

The per-row cast double→decimal(…,6) rounds identically in both engines
(IEEE double has an exact decimal expansion; both round half-up at 6
fractional digits), the decimal sum is exact integer math, and the final
decimal→double cast is deterministic. Scale 6 covers every monetary/ratio
column in the test schema; precision 28 leaves 22 integral digits of
headroom (a 100 TB lineitem is ~1e11 rows × ~1e5 → 1e16 ≪ 1e22).

These helpers are for *oracle-checked* outputs. Plain `F.sum` on doubles is
fine when exact cross-engine equality isn't required.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

DEC = "decimal(28,6)"


def dsum(col: Column | str, name: str) -> Column:
    """Order-independent exact sum of a double column, returned as double."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast(DEC)).cast("double").alias(name)


def davg(col: Column | str, name: str) -> Column:
    """avg = exact decimal sum / count, computed in double at the end.

    (DuckDB's AVG(decimal) returns DOUBLE via a different path, so we avoid
    native AVG and divide the exact sum ourselves on both sides.)
    """
    c = F.col(col) if isinstance(col, str) else col
    return (F.sum(c.cast(DEC)).cast("double") / F.count(c)).alias(name)


def sql_dsum(expr: str, name: str) -> str:
    """DuckDB-side twin of :func:`dsum` (also valid Spark SQL)."""
    return f"CAST(SUM(CAST({expr} AS DECIMAL(28,6))) AS DOUBLE) AS {name}"


def sql_davg(expr: str, name: str) -> str:
    """DuckDB-side twin of :func:`davg` (also valid Spark SQL)."""
    return f"CAST(SUM(CAST({expr} AS DECIMAL(28,6))) AS DOUBLE) / COUNT({expr}) AS {name}"
