"""Skew stress bench: the pair-join / iterative queries on a hot-key
fixture (tools/gen_skew.py) ~10x the sf0.1 volume.

For each target query this runs the plan once with a per-partition
row-count summary on top, so a single execution yields:

- wall seconds (the join dominates; the summary agg is noise),
- output rows (hot buckets make pair outputs grow quadratically — the
  *work* is real, so runtime is judged per output row, not just per
  input row),
- whether AQE's skew-join split engaged (``skew=true`` markers in the
  final adaptive plan),
- the post-AQE output-partition row balance (max/mean — a monster
  partition that AQE failed to split shows up here).

Prints ONE JSON line. Compare against BENCH_r{N}.json at sf0.1 and the
linear-scaling analysis in SCALE.md §"Skew stress".

Usage: python bench/skew_bench.py [fixture_dir] [query ...]
       (generates the fixture on first use)
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F

from apachebeamkmeans_spark.registry import all_queries
from apachebeamkmeans_spark.session import get_spark

TARGETS = [
    "dedup_minhash_pairs",
    "dedup_simhash_pairs",
    "dedup_embedding_pairs",
    "dedup_clusters",
    "events_range_join",
    "events_sessions",
]


def run_one(spark, fn, sf_dir: str) -> dict:
    # timer wraps fn() as well: iterative queries (dedup_clusters) run
    # eager per-round actions during construction, not at collect time
    t0 = time.perf_counter()
    df = fn(spark, sf_dir)
    summary = df.groupBy(F.spark_partition_id().alias("pid")).agg(
        F.count(F.lit(1)).alias("rows")
    )
    parts = summary.collect()
    sec = round(time.perf_counter() - t0, 3)
    plan = summary._jdf.queryExecution().executedPlan().toString()
    rows = [int(r["rows"]) for r in parts] or [0]
    return {
        "sec": sec,
        "rows_out": int(sum(rows)),
        "n_partitions": len(rows),
        "max_partition_rows": max(rows),
        "mean_partition_rows": round(sum(rows) / len(rows), 1),
        "aqe_skew_split": "skew=true" in plan or "skewed" in plan.lower(),
    }


def main() -> None:
    args = sys.argv[1:]
    sf_dir = args[0] if args else os.path.join(REPO, "bench", "skewdata")
    only = set(args[1:])
    if not os.path.exists(os.path.join(sf_dir, "documents.parquet")):
        subprocess.run(
            [sys.executable, os.path.join(REPO, "tools", "gen_skew.py"), sf_dir],
            check=True,
        )
    spark = get_spark("skew_bench")
    spark.range(1000).selectExpr("sum(id)").collect()  # warm the JVM
    queries = all_queries()
    out: dict[str, dict] = {}
    for name in TARGETS:
        if only and name not in only:
            continue
        print(f"running {name} ...", file=sys.stderr, flush=True)
        out[name] = run_one(spark, queries[name][0], sf_dir)
        print(f"  {name}: {out[name]}", file=sys.stderr, flush=True)
        spark.catalog.clearCache()
    print(json.dumps({"metric": "skew_stress", "dir": sf_dir, "queries": out}))


if __name__ == "__main__":
    main()
