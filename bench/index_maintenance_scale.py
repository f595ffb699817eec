"""AnnIndex maintenance-verb scaling: delete / upsert / compact /
retrain vs corpus size.

The serve-path series (SCALE.md §9 r13) measures the amortized SEARCH
cost; the maintenance verbs ride the untimed warmup pass there, so
their own time-vs-n law stays argued unless measured directly. This
harness builds a fresh index per scale point (untimed), applies one
append (untimed — its law is the lifecycle series'), then times each
maintenance verb on its own copy of the layout:

- delete: every 10th id — the partition-scoped rewrite (cells
  containing matches only).
- upsert: every 20th id re-embedded as its reversed vector — the
  id-join delete half + append half.
- compact: the one-shuffle one-file-per-cell rewrite.
- retrain: Lloyd over the full corpus + full layout rewrite (the
  expensive verb by design — expected linear-with-floor, the
  lifecycle law).

Each verb runs on a COPY of the post-append layout (verbs mutate; a
shared layout would measure verb interactions, not verbs), `REPS`
repetitions, median reported. Expected laws: delete/upsert touch a
bounded cell subset but every cell contains matches under these
uniform predicates, so they bound the worst case (≈ compact's full
rewrite + the match scan); retrain adds the training passes.

Usage: python bench/index_maintenance_scale.py [mults...]   # default 1 3 10
Reads .scaledata/x{mult}/embeddings.parquet (tools/gen_scale.py).
Prints one JSON line:
  {"mults": {"1": {"n": .., "delete": [..], "upsert": [..],
                   "compact": [..], "retrain": [..]}, ...}}
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

from apachebeamkmeans_spark.ann import AnnIndex  # noqa: E402
from apachebeamkmeans_spark.session import get_spark  # noqa: E402

REPS = int(os.environ.get("MAINT_SCALE_REPS", "2"))
K_CELLS = 8
ITERS = 3


def main() -> None:
    mults = [int(m) for m in (sys.argv[1:] or ["1", "3", "10"])]
    spark = get_spark("index-maintenance-scale")
    spark.range(1000).selectExpr("sum(id)").collect()
    out: dict[str, dict] = {}
    work = os.path.join(REPO, ".scratch", "maint_scale")
    shutil.rmtree(work, ignore_errors=True)
    for m in mults:
        sf_dir = os.path.join(REPO, ".scaledata", f"x{m}")
        emb = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
        n = emb.count()
        base = os.path.join(work, f"x{m}", "base")
        idx = AnnIndex.train(spark, emb, base, k=K_CELLS, n_iters=ITERS)
        idx.append(
            emb.filter(F.col("vec_id") % 20 == 3).withColumn(
                "vec_id", F.col("vec_id") + F.lit(10_000_000)
            )
        )
        del_batch = None
        ups_batch = emb.filter(F.col("vec_id") % 20 == 7).select(
            "vec_id", F.reverse(F.col("embedding")).alias("embedding")
        ).localCheckpoint()
        point = {"n": n}
        for verb in ("delete", "upsert", "compact", "retrain"):
            runs = []
            for rep in range(REPS):
                copy = os.path.join(work, f"x{m}", f"{verb}_{rep}")
                shutil.copytree(base, copy)
                h = AnnIndex.load(spark, copy)
                t0 = time.perf_counter()
                if verb == "delete":
                    h.delete("vec_id % 10 = 4")
                elif verb == "upsert":
                    h.upsert(ups_batch)
                elif verb == "compact":
                    h.compact()
                else:
                    h.retrain(k=K_CELLS, n_iters=ITERS)
                runs.append(round(time.perf_counter() - t0, 3))
                shutil.rmtree(copy, ignore_errors=True)
                spark.catalog.clearCache()
                spark._jvm.System.gc()
            point[verb] = runs
        out[str(m)] = point
        _ = del_batch
    shutil.rmtree(work, ignore_errors=True)
    print(json.dumps({"mults": out, "reps": REPS, "k": K_CELLS}))


if __name__ == "__main__":
    main()
