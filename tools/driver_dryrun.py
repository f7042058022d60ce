"""Dry-run of the grading driver's t2 correctness pass.

Runs every `__spark_entry__.queries()` entry at sf0.01 from a plain
SparkSession, compares row count + sorted-column value hash against the
DuckDB oracle, and prints one line per query plus a summary. Run it from
anywhere (foreign cwd is part of the point):

    python /root/repo/tools/driver_dryrun.py [sf_dir]
"""

from __future__ import annotations

import hashlib
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


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


def value_hash(rows) -> str:
    h = hashlib.sha256()
    for row in sorted(rows):
        h.update("\x1f".join(row).encode())
        h.update(b"\x1e")
    return h.hexdigest()[:16]


def main() -> None:
    import warnings

    warnings.filterwarnings("ignore")
    import duckdb
    from pyspark.sql import SparkSession

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
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
    for name in sorted(qs):
        t0 = time.perf_counter()
        try:
            df = qs[name](spark, sf_dir)
            cols = sorted(c.lower() for c in df.columns)
            s_rows = [
                tuple(norm(row[df.columns.index(c2)]) for c2 in sorted(df.columns, key=str.lower))
                for row in df.collect()
            ]
            dt = time.perf_counter() - t0
            if name not in oracles:
                n_rows_only += 1
                print(f"ROWS-ONLY {name}: {len(s_rows)} rows  [{dt:.1f}s]")
                continue
            rel = con.sql(oracles[name])
            o_cols_sorted = sorted(rel.columns, key=str.lower)
            o_rel = rel.select(*[f'"{c}"' for c in o_cols_sorted])
            o_rows = [tuple(norm(v) for v in row) for row in o_rel.fetchall()]
            ok_schema = cols == [c.lower() for c in o_cols_sorted]
            ok_count = len(s_rows) == len(o_rows)
            ok_hash = value_hash(s_rows) == value_hash(o_rows)
            if ok_schema and ok_count and ok_hash:
                n_match += 1
                print(f"MATCH     {name}: {len(s_rows)} rows  [{dt:.1f}s]")
            else:
                n_fail += 1
                print(
                    f"MISMATCH  {name}: schema={ok_schema} count={ok_count} "
                    f"({len(s_rows)} vs {len(o_rows)}) hash={ok_hash}"
                )
        except Exception as exc:  # noqa: BLE001
            n_fail += 1
            print(f"ERROR     {name}: {type(exc).__name__}: {str(exc)[:200]}")

    print(f"\nsummary: {n_match} match, {n_rows_only} rows-only, {n_fail} FAIL")
    spark.stop()
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
