"""Local replay of the driver's DuckDB-oracle correctness gate.

Runs every registered query on Spark and (when an oracle exists) the
twin SQL on DuckDB at the given scale factor, then compares
row-count, column names, and order-insensitive values.

Usage: python tools/selfcheck.py [sf_dir] [query ...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import pandas as pd

from apachebeamkmeans_spark.registry import all_queries
from apachebeamkmeans_spark.session import get_spark
from apachebeamkmeans_spark.sources.io import TABLES


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # canonical row order + string form (mirrors an order-insensitive
    # value hash): stringify everything, sort rows
    s = df.astype(str)
    return s.sort_values(by=list(s.columns)).reset_index(drop=True)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    spark = get_spark("selfcheck")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    failures = 0
    for name, (fn, sql) in sorted(all_queries().items()):
        if only and name not in only:
            continue
        t0 = time.perf_counter()
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {name}: spark error: {e}")
            failures += 1
            continue
        spark_t = time.perf_counter() - t0
        if sql is None:
            print(f"rows  {name}: {len(sdf)} rows (rows-only, {spark_t:.1f}s)")
            continue
        try:
            ddf = con.execute(sql).df()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {name}: duckdb error: {str(e)[:300]}")
            failures += 1
            continue
        a, b = _canon(sdf), _canon(ddf)
        if list(a.columns) != list(b.columns):
            print(f"FAIL  {name}: columns {list(a.columns)} vs {list(b.columns)}")
            failures += 1
        elif len(a) != len(b):
            print(f"FAIL  {name}: rows {len(a)} vs {len(b)}")
            failures += 1
        elif not a.equals(b):
            neq = (a != b).any(axis=1)
            print(f"FAIL  {name}: {int(neq.sum())}/{len(a)} differing rows")
            print("  spark :", a[neq].head(3).to_dict("records"))
            print("  duckdb:", b[neq].head(3).to_dict("records"))
            failures += 1
        else:
            print(f"OK    {name}: {len(a)} rows match ({spark_t:.1f}s)")
    print("FAILURES:", failures)
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
