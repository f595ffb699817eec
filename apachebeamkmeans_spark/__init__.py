"""apachebeamkmeans_spark — a PySpark-native analytics engine.

Clean-room re-expression of the capabilities of the reference repo
``keeper-jie/ApacheBeamKmeans`` (K-Means clustering over distributed
dataflows, six centroid-initialization strategies, text point IO),
built Spark-first: DataFrame/SQL logical plans, Catalyst/Tungsten
physical execution, no RDD-level code.

Beyond the reference's surface the engine ships the operator set a
large-scale (100 TB) training-data pipeline needs: relational OLAP
queries, deduplication (exact / MinHash-LSH / SimHash / n-gram
Jaccard / embedding-cosine), similarity search (brute-force + IVF),
multimodal binary-column plumbing, text analysis, and event-time
windowing (batch + Structured Streaming).

Design rules (see SURVEY.md §7):
- every operator is a declarative DataFrame/SQL plan — Catalyst does
  pushdown/pruning/join-selection; no hand-scheduled execution;
- no row-at-a-time Python UDFs in hot paths; higher-order functions
  or unrolled column expressions keep work JVM-side and codegen'd;
- driver traffic is O(k) (centers) — never O(n) collects;
- every random choice flows from an explicit seed through a
  cross-engine-reproducible hash (functions.hashing) so the DuckDB
  oracle can replay it exactly.
"""

from __future__ import annotations

__version__ = "0.1.0"

# Public library surface (r9 verdict item 4), resolved lazily
# (PEP 562) so `import apachebeamkmeans_spark` stays cheap and free
# of import-order coupling with the submodules.
_PUBLIC = {
    "AnnIndex": "apachebeamkmeans_spark.ann",
    "CurationPipeline": "apachebeamkmeans_spark.pipeline",
    "KMeans": "apachebeamkmeans_spark.operators.kmeans",
    "KMeansParams": "apachebeamkmeans_spark.operators.kmeans",
    "KMeansModel": "apachebeamkmeans_spark.operators.kmeans",
    "get_spark": "apachebeamkmeans_spark.session",
    "main": "apachebeamkmeans_spark.cli",
}

__all__ = sorted(_PUBLIC) + ["__version__"]


def __getattr__(name: str):
    if name in _PUBLIC:
        import importlib

        return getattr(importlib.import_module(_PUBLIC[name]), name)
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")
