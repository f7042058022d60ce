"""Dry-run of the grading driver's t2 correctness pass.

Runs every `__spark_entry__.queries()` entry at sf0.01 from a plain
SparkSession, compares row count + sorted-column value hash against the
DuckDB oracle, and prints one line per query plus a summary. Run it from
anywhere (foreign cwd is part of the point):

    python /root/repo/tools/driver_dryrun.py [sf_dir] [query_prefix...]

CRITICAL parity detail: the driver canonicalizes BOTH result sets through
pandas (`rel.df()` on the DuckDB side, a pandas frame of the Spark rows on
the Spark side) and `sort_values` over every column. That coerces DuckDB
HUGEINT (e.g. any bare `SUM` over INTEGER) to float64 — `5.0` vs Spark's
bigint `5` — and dies outright on unhashable cells (array columns). A
`fetchall`-based dryrun hides both failure classes (round-1 lesson: q26,
q80, q90 were green locally, red with the driver), so this tool fetches via
pandas on both sides.
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

# Oracle-cost budget (VERDICT r11 Next #9): the r11 oracle-cost policy
# (SCALING.md "Round-11: oracle cost policy") accepts oracles up to
# ~tens of seconds at grading scale — q257's DTW recursive-CTE replay
# measured ~17s and was the accepted ceiling; q43_xxh's ~73s
# transpilation was rejected. The budget below turns that written policy
# into a dryrun gate instead of a memory: any single oracle exceeding it
# FAILS the dryrun (exit 1) so a creeping oracle cost is caught the
# round it lands, not when a grading sweep starts taking minutes.
# 40s = the accepted 17s ceiling x the worst box-noise factor measured
# on this host (~x1.4 inflated q257 to 24.2s in the r12 dryrun) with
# headroom, still well under the rejected 73s data point. Pinned by
# tests/test_dryrun_contract.py.
ORACLE_BUDGET_S = 40.0


def norm(v) -> str:
    if v is None:
        return "<NULL>"
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, float):
        return repr(v)
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(norm(x) for x in v) + "]"
    if hasattr(v, "item"):
        return norm(v.item())
    return str(v)


def canon(pdf) -> list[tuple[str, ...]]:
    """Mimic the driver: lowercase-sorted columns, pandas sort_values over
    all columns (raises on unhashable cells, exactly like the driver's
    canonicalizer), then per-cell normalization."""
    cols = sorted(pdf.columns, key=lambda c: c.lower())
    pdf = pdf[cols]
    if len(pdf):
        pdf = pdf.sort_values(by=cols, kind="mergesort")
    return [tuple(norm(v) for v in row) for row in pdf.itertuples(index=False, name=None)]


def main() -> None:
    import warnings

    warnings.filterwarnings("ignore")
    import duckdb
    from pyspark.sql import SparkSession

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    prefixes = tuple(sys.argv[2:])
    spark = (
        SparkSession.builder.master(os.environ.get("SPARK_GRAFT_TEST_MASTER", "local[8]"))
        .config("spark.ui.showConsoleProgress", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as entrymod

    qs, oracles = entrymod.queries(), entrymod.oracle_sql()
    con = duckdb.connect()
    for t in [
        "region", "nation", "customer", "supplier", "part",
        "orders", "lineitem", "events", "documents", "embeddings",
    ]:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    n_match = n_rows_only = n_fail = 0
    over_budget: list[tuple[str, float]] = []
    for name in qs:
        if prefixes and not name.startswith(prefixes):
            continue
        t0 = time.perf_counter()
        try:
            df = qs[name](spark, sf_dir)
            s_pdf = df.toPandas()
            s_rows = canon(s_pdf)
            dt = time.perf_counter() - t0
            if name not in oracles:
                n_rows_only += 1
                print(f"ROWS-ONLY {name}: {len(s_rows)} rows  [{dt:.1f}s]")
                continue
            # the ORACLE's own wall time is the policy-gated number
            # (VERDICT r11 Next #9): time the DuckDB execution separately
            # from the Spark side so creeping oracle cost is visible and
            # budget-enforced per round
            ot0 = time.perf_counter()
            o_pdf = con.sql(oracles[name]).df()
            odt = time.perf_counter() - ot0
            if odt > ORACLE_BUDGET_S:
                over_budget.append((name, odt))
            o_rows = canon(o_pdf)
            s_cols = sorted(c.lower() for c in s_pdf.columns)
            o_cols = sorted(c.lower() for c in o_pdf.columns)
            ok_schema = s_cols == o_cols
            ok_count = len(s_rows) == len(o_rows)
            ok_hash = s_rows == o_rows
            if ok_schema and ok_count and ok_hash:
                n_match += 1
                print(
                    f"MATCH     {name}: {len(s_rows)} rows  "
                    f"[{dt:.1f}s, oracle {odt:.1f}s]"
                )
            else:
                n_fail += 1
                print(
                    f"MISMATCH  {name}: schema={ok_schema} count={ok_count} "
                    f"({len(s_rows)} vs {len(o_rows)}) hash={ok_hash}"
                )
                if not ok_schema:
                    print(f"  spark cols:  {s_cols}")
                    print(f"  oracle cols: {o_cols}")
                elif not ok_hash:
                    for a, b in zip(s_rows, o_rows):
                        if a != b:
                            print(f"  first diff:\n    spark:  {a}\n    oracle: {b}")
                            break
        except Exception as exc:  # noqa: BLE001
            n_fail += 1
            print(f"ERROR     {name}: {type(exc).__name__}: {str(exc)[:300]}")

    print(f"\nsummary: {n_match} match, {n_rows_only} rows-only, {n_fail} FAIL")
    for name, odt in over_budget:
        print(
            f"ORACLE-OVER-BUDGET {name}: {odt:.1f}s > {ORACLE_BUDGET_S:.0f}s "
            "(oracle-cost policy, SCALING.md r11)"
        )
    spark.stop()
    sys.exit(1 if (n_fail or over_budget) else 0)


if __name__ == "__main__":
    main()
