"""Text-index delete/upsert scaling — completing the r14 maintenance
series (build/append/compact) with the r15 lifecycle verbs.

Per scale point: build the segmented index over the gen_scale docs
(untimed), append one FIXED 500-doc batch (untimed — its law is the
r14 series' flat row), then time each verb on its OWN copy of the
index (verbs mutate; a shared layout would measure interactions):

- delete: 250 of the appended batch's ids — the production shape
  (deletes target recent batch-sized segments before compaction), so
  the survivor rewrite is BATCH-sized. Expected flat in corpus size.
- delete_base: 250 ids spread through the BASE segment — the worst
  case (the corpus-sized segment rewrites in full). Expected linear,
  the documented Lucene merge-on-delete trade.
- upsert: a 500-doc batch, half replacements of appended ids, half
  new ids — delete half (batch-sized) + append half. Expected flat.

REPS repetitions, all readings reported (min is the quiet figure).

Usage: python bench/text_index_maintenance_scale.py [mults...]  # default 1 3 10
Reads .scaledata/x{mult}/documents.parquet (tools/gen_scale.py).
Prints one JSON line:
  {"mults": {"1": {"n": .., "delete": [..], "delete_base": [..],
                   "upsert": [..]}, ...}}
"""
from __future__ import annotations

import json
import os
import shutil
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

from apachebeamkmeans_spark.operators import textindex as TI
from apachebeamkmeans_spark.session import get_spark  # noqa: E402

REPS = int(os.environ.get("MAINT_SCALE_REPS", "2"))
BATCH = 500
APPEND_BASE_ID = 10_000_000  # appended doc_ids: disjoint from base


def main() -> None:
    mults = [int(m) for m in (sys.argv[1:] or ["1", "3", "10"])]
    spark = get_spark("text-index-maintenance-scale")
    spark.range(1000).selectExpr("sum(id)").collect()
    work = os.path.join(REPO, ".scratch", "text_maint_scale")
    shutil.rmtree(work, ignore_errors=True)
    out: dict[str, dict] = {}
    for mult in mults:
        src = os.path.join(REPO, ".scaledata", f"x{mult}",
                           "documents.parquet")
        docs = spark.read.parquet(src).select("doc_id", "text")
        # deterministic id-range batch (NOT limit(): two independent
        # limits give no cross-plan row identity, and the upsert
        # below must target exactly the ids this append added)
        batch = (
            docs.filter(F.col("doc_id") < BATCH)
            .select((F.col("doc_id") + APPEND_BASE_ID).alias("doc_id"),
                    "text")
        )
        proto = os.path.join(work, f"x{mult}", "proto")
        TI.bm25_index_build(docs, proto)       # untimed amortized stage
        TI.bm25_index_append(batch, proto)     # untimed (r14 flat row)
        n = docs.count()
        del_batch_ids = [APPEND_BASE_ID + i for i in range(0, BATCH, 2)]
        del_base_ids = list(range(0, n, max(1, n // 250)))[:250]
        upsert_docs = (
            docs.filter(F.col("doc_id") < BATCH)
            .select(
                F.when(F.col("doc_id") % 2 == 0,
                       F.col("doc_id") + APPEND_BASE_ID)
                .otherwise(F.col("doc_id") + 2 * APPEND_BASE_ID)
                .alias("doc_id"),
                "text",
            )
        )
        point: dict[str, object] = {"n": n}
        for label, verb in (
            ("delete", lambda p: TI.bm25_index_delete(
                spark, p, doc_ids=del_batch_ids)),
            ("delete_base", lambda p: TI.bm25_index_delete(
                spark, p, doc_ids=del_base_ids)),
            # r16 tombstone tier: the same worst-case base-segment
            # delete with NO survivor rewrite — expected to flatten
            # the linear row (serving stays exact; compact applies)
            ("delete_base_tombstone", lambda p: TI.bm25_index_delete(
                spark, p, doc_ids=del_base_ids, mode="tombstone")),
            ("upsert", lambda p: TI.bm25_index_upsert(upsert_docs, p)),
        ):
            times = []
            for rep in range(REPS):
                copy = os.path.join(work, f"x{mult}", f"{label}_{rep}")
                shutil.copytree(proto, copy)
                spark.catalog.clearCache()
                t0 = time.perf_counter()
                verb(copy)
                times.append(round(time.perf_counter() - t0, 3))
                shutil.rmtree(copy, ignore_errors=True)
            point[label] = times
        out[str(mult)] = point
        print(f"x{mult}: {point}", file=sys.stderr)
    shutil.rmtree(work, ignore_errors=True)
    print(json.dumps({"mults": out}))


if __name__ == "__main__":
    main()
