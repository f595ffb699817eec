"""Scoped release of localCheckpoint storage blocks (r17 verdict
"What's wrong" #1 / r18 item 3).

Operators checkpoint intermediates (`localCheckpoint`) to cut lineage
and share materializations; the blocks are RDD-level persists that
`spark.catalog.clearCache()` never touches and that the GC-driven
ContextCleaner releases only when the driver-side object happens to be
collected. A long-lived session — the 100 TB posture — accumulates
them (measured r17: 4-6× late-suite inflation across 197 queries in
one JVM before the bench-side sweep). The ENGINE owns the fix now:
every checkpoint whose consumers all materialize before its operator
returns is released explicitly via `release_blocks` in a try/finally;
checkpoints that feed a RETURNED lazy plan cannot be released by the
engine (unpersisting a lineage-truncated frame before its consumer
runs would lose the data) and remain the ContextCleaner's/harness's
job.

`release_blocks` finds the checkpoint's RDD through the analyzed
plan's LogicalRDD leaves — the only handle PySpark exposes; `df.rdd`
would build a NEW conversion RDD, not the persisted one.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def release_blocks(df: DataFrame | None) -> None:
    """Unpersist the storage blocks behind a localCheckpointed
    DataFrame whose consumers have ALL materialized. After this the
    frame cannot be recomputed (its lineage was truncated at
    checkpoint time) — callers must be completely done with it.
    No-op on None, on never-materialized lazy checkpoints (nothing
    persisted yet is still registered — unpersist is idempotent), and
    on errors (release is an optimization, never a correctness
    dependency)."""
    if df is None:
        return
    try:
        leaves = df._jdf.queryExecution().analyzed().collectLeaves()
        it = leaves.iterator()
        while it.hasNext():
            leaf = it.next()
            if leaf.getClass().getSimpleName() == "LogicalRDD":
                leaf.rdd().unpersist(False)
    except Exception:  # noqa: BLE001 — best-effort by design
        pass
