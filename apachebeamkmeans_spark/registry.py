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
    # Unconditional imports: a transitive ImportError inside a query
    # module must fail loudly — silently dropping a module would remove
    # its queries from the correctness gate and the bench.
    from apachebeamkmeans_spark import (
        queries_advanced,
        queries_dedup,
        queries_events,
        queries_kmeans,
        queries_multimodal,
        queries_relational,
        queries_similarity,
        queries_text,
    )

    modules = [
        queries_kmeans,
        queries_relational,
        queries_events,
        queries_text,
        queries_dedup,
        queries_similarity,
        queries_multimodal,
        queries_advanced,
    ]

    out: dict[str, QuerySpec] = {}
    for m in modules:
        for k, v in m.QUERIES.items():
            if k in out:
                raise ValueError(f"duplicate query name: {k}")
            out[k] = v
    return out
