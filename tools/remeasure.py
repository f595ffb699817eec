"""Quiet re-measure of specific bench queries, N repetitions each,
bench-identical methodology (warmup pass, clearCache, noop sink).
Usage: python tools/remeasure.py [reps=3] query [query...]
(reps may be omitted; a non-integer first arg is taken as a query name)
"""
from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from apachebeamkmeans_spark.registry import all_queries
from apachebeamkmeans_spark.session import get_spark


def main() -> None:
    args = sys.argv[1:]
    if not args:
        sys.exit(__doc__.strip())
    try:
        reps, names = int(args[0]), args[1:]
    except ValueError:  # first arg is a query name — default reps
        reps, names = 3, args
    if reps < 1:
        sys.exit("reps must be >= 1")
    if not names:
        sys.exit(__doc__.strip())
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("remeasure")
    queries = all_queries()
    spark.range(1000).selectExpr("sum(id)").collect()
    out: dict[str, list[float]] = {}
    for name in names:
        fn, _ = queries[name]
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        spark.catalog.clearCache()
        runs = []
        for _ in range(reps):
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            runs.append(round(time.perf_counter() - t0, 3))
            spark.catalog.clearCache()
            # drop leftover localCheckpoint blocks (bench.py's sweep —
            # clearCache() only clears SQL-cached relations)
            for _rdd in list(
                spark.sparkContext._jsc.getPersistentRDDs().values()
            ):
                _rdd.unpersist(False)
            spark._jvm.System.gc()
        out[name] = runs
    print(json.dumps(out))


if __name__ == "__main__":
    main()
