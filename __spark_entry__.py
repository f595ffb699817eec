"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

All real logic lives in the ``apachebeamkmeans_spark`` package; this
module is a thin adapter over its query registry.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from apachebeamkmeans_spark.registry import all_queries  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: MLlib KMeans over a DataFrame (the BASELINE.json
    spark_approach) on sf0.001 embeddings → per-point assignments. The
    engine's own seeded Lloyd/init implementations back the
    oracle-checked queries()."""
    from apachebeamkmeans_spark.operators.kmeans.mllib import mllib_kmeans_fit
    from apachebeamkmeans_spark.sources import io

    pts = io.load_points(spark, "/root/testdata/sf0.001")
    _, assigned = mllib_kmeans_fit(pts, k=4, seed=42, max_iter=20)
    return assigned.select("id", "center_id", "label")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: fn for name, (fn, _) in all_queries().items()}


def oracle_sql() -> dict[str, str]:
    return {name: sql for name, (_, sql) in all_queries().items() if sql is not None}
