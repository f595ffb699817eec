"""Driver-session-shape gate: the strongest pre-driver correctness
check (verify skill, step 4).

Replays the FULL oracle comparison on a DEFAULT SparkSession —
`local[16]`, UTC, and nothing else, so shuffle partitions are Spark's
default 200 with no AQE/Arrow overrides from `session.get_spark` —
which catches summation-order / partitioning sensitivity in avg- and
trainer-based oracles that tools/selfcheck.py (tuned session factory)
cannot. Runs with an out-of-repo cwd to catch pickle-by-reference and
cwd-relative-path assumptions (the r5 fake_decode bug class).

Usage: python tools/driver_gate.py [sf_dir] [query ...]
Exit 0 = every oracle-backed query hash-matches.
"""

from __future__ import annotations

import os
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import duckdb

from apachebeamkmeans_spark.registry import all_queries
from apachebeamkmeans_spark.sources.io import TABLES

# one canonicalization contract for both gates — a fix to selfcheck's
# _canon must reach this gate too (r6 review)
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from selfcheck import _canon  # noqa: E402


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    # out-of-repo cwd: from inside the repo, executor Python workers
    # accidentally resolve the package via cwd and by-reference pickling
    # bugs hide
    os.chdir(tempfile.gettempdir())

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[16]")
        .config("spark.sql.session.timeZone", "UTC")
        .getOrCreate()
    )
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    fails = 0
    n_ok = 0
    t0 = time.time()
    for name, (fn, sql) in sorted(all_queries().items()):
        if only and name not in only:
            continue
        try:
            a = _canon(fn(spark, sf_dir).toPandas())
            if sql is None:
                n_ok += 1
                continue
            b = _canon(con.execute(sql).df())
            if a.equals(b):
                n_ok += 1
            else:
                fails += 1
                print(f"FAIL  {name}: {len(a)} spark rows vs {len(b)} oracle rows")
        except Exception as e:  # noqa: BLE001
            fails += 1
            print(f"FAIL  {name}: {type(e).__name__}: {str(e)[:150]}")
    print(f"driver gate: {n_ok} ok, {fails} failed in {time.time() - t0:.0f}s")
    return 1 if fails else 0


if __name__ == "__main__":
    sys.exit(main())
