"""Local twin of the driver's correctness gate.

Runs every ``__spark_entry__.queries()`` entry on Spark and its
``oracle_sql()`` twin on DuckDB at the given sf dir, then compares
row count, schema shape, and order-insensitive values. The Spark
session is created WITHOUT the engine's preferred confs (like the
driver's own session would be) so `ensure_conf` coverage is exercised.

Usage:  python tools/oracle_check.py [sf_dir] [query ...]
"""

from __future__ import annotations

import sys
import time
import traceback

import duckdb
import pandas as pd

TABLES = ("region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings")


def duck_connect(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{sf_dir}/{t}.parquet')")
    return con


def canon(df: pd.DataFrame) -> pd.DataFrame:
    """Sort columns by name, canonicalize values to strings, sort rows."""
    df = df.reindex(sorted(df.columns), axis=1)

    def cell(v):
        if v is None or v != v:
            return "<null>"
        if isinstance(v, float):
            return repr(v)
        if isinstance(v, (list, tuple)) or type(v).__name__ == "ndarray":
            return "[" + ",".join(cell(x) for x in v) + "]"
        return str(v)

    out = df.apply(lambda c: c.map(cell))
    if len(out):
        out = out.sort_values(by=list(out.columns)).reset_index(drop=True)
    return out


def compare(name: str, spark_df, sql: str | None,
            con: duckdb.DuckDBPyConnection) -> dict:
    t0 = time.time()
    sp = spark_df.toPandas()
    t_spark = time.time() - t0
    res = {"name": name, "rows_spark": len(sp), "secs": round(t_spark, 2)}
    if sql is None:
        res["status"] = "rows-only"
        return res
    dk = con.execute(sql).df()
    res["rows_duck"] = len(dk)
    if sorted(sp.columns) != sorted(dk.columns):
        res["status"] = "COLUMNS-MISMATCH"
        res["spark_cols"] = sorted(sp.columns)
        res["duck_cols"] = sorted(dk.columns)
        return res
    if len(sp) != len(dk):
        res["status"] = "ROWS-MISMATCH"
        return res
    a, b = canon(sp), canon(dk)
    if a.equals(b):
        res["status"] = "OK"
    else:
        res["status"] = "VALUES-MISMATCH"
        neq = (a != b).any(axis=1)
        res["first_diffs"] = []
        for i in a.index[neq][:3]:
            res["first_diffs"].append(
                {"spark": a.loc[i].to_dict(), "duck": b.loc[i].to_dict()})
    return res


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    from pyspark.sql import SparkSession
    spark = (SparkSession.builder.master("local[8]")
             .appName("oracle_check")
             .config("spark.ui.enabled", "false")
             .getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")

    sys.path.insert(0, ".")
    import __spark_entry__ as e

    qs, sqls = e.queries(), e.oracle_sql()
    con = duck_connect(sf_dir)
    failures = 0
    if not only:
        n = e.entry(spark).count()
        ok = n > 0
        failures += 0 if ok else 1
        print(("✓" if ok else "✗"), "entry()", f"{n} rows")
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            r = compare(name, fn(spark, sf_dir), sqls.get(name), con)
        except Exception:
            r = {"name": name, "status": "ERROR",
                 "error": traceback.format_exc(limit=20)}
        ok = r["status"] in ("OK", "rows-only")
        failures += 0 if ok else 1
        print(("✓" if ok else "✗"), r["name"], r["status"],
              {k: v for k, v in r.items() if k not in ("name", "status")})
    print(f"\n{'ALL GREEN' if not failures else f'{failures} FAILURES'}")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
