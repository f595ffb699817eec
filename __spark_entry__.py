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
    """Flagship: seeded K-Means fit (the reference's core capability,
    MLlib-shaped params) on sf0.001 embeddings → per-point assignments.
    """
    from apachebeamkmeans_spark.operators.kmeans import KMeans, KMeansParams
    from apachebeamkmeans_spark.sources import io

    pts = io.load_points(spark, "/root/testdata/sf0.001")
    model = KMeans(KMeansParams(k=4, seed=42, max_iter=10, init="plusplus")).fit(pts)
    return model.transform(pts, keep_dist=True).select("id", "center_id", "dist")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: fn for name, (fn, _) in all_queries().items()}


def oracle_sql() -> dict[str, str]:
    return {name: sql for name, (_, sql) in all_queries().items() if sql is not None}
