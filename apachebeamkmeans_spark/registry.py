"""Central query registry: name → (spark_fn, oracle_sql | None).

Aggregates every query module's QUERIES dict. `__spark_entry__.py`
exposes this to the driver; `bench.py` times the headline subset;
`tools/selfcheck.py` replays the oracle comparison locally.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QuerySpec = tuple[Callable[[SparkSession, str], DataFrame], str | None]


def all_queries() -> dict[str, QuerySpec]:
    from apachebeamkmeans_spark import queries_kmeans

    modules = [queries_kmeans]
    for name in [
        "queries_relational",
        "queries_events",
        "queries_text",
        "queries_dedup",
        "queries_similarity",
        "queries_multimodal",
        "queries_advanced",
    ]:
        try:
            import importlib

            modules.append(importlib.import_module(f"apachebeamkmeans_spark.{name}"))
        except ImportError:
            pass  # module not built yet

    out: dict[str, QuerySpec] = {}
    for m in modules:
        for k, v in m.QUERIES.items():
            if k in out:
                raise ValueError(f"duplicate query name: {k}")
            out[k] = v
    return out
