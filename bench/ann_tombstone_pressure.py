"""Vector-side serve cost vs tombstone-sidecar count (r17) — the
AnnIndex twin of `bm25_tombstone_pressure.py`. Each
`delete(mode="tombstone")` adds one sidecar parquet dir; every serve
reads all of them and pays a broadcast anti-join over the dead set.
This measures how fast that creeps and what `compact_on_pressure`
buys back. Serve results asserted IDENTICAL at every point except
across delete boundaries (deletes legitimately change the top-k).

Usage: python bench/ann_tombstone_pressure.py [counts...]  # default 0 10 50 100
Env: ATSPRESS_SF_DIR (default /root/testdata/sf0.1), ATSPRESS_REPS (2)
Prints one JSON line:
  {"sf_dir": .., "n_vecs": .., "serve_sec": {"0": .., ...},
   "compacted_sec": .., "compact_reason": "tombstone_sidecars"}
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
from apachebeamkmeans_spark.sources import io  # noqa: E402

REPS = int(os.environ.get("ATSPRESS_REPS", "2"))
QUERIES = [
    [0.1 * ((i * 7 + j) % 5 - 2) for j in range(64)] for i in range(5)
]


def main() -> None:
    counts = sorted(int(c) for c in (sys.argv[1:] or ["0", "10", "50", "100"]))
    sf_dir = os.environ.get("ATSPRESS_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("ann-tombstone-pressure")
    spark.range(1000).selectExpr("sum(id)").collect()
    emb = io.read_table(spark, sf_dir, "embeddings").select(
        "vec_id", "embedding"
    )
    n_vecs = emb.count()
    path = os.path.join(REPO, ".scratch", "atspress_idx")
    shutil.rmtree(path, ignore_errors=True)
    idx = AnnIndex.train(spark, emb, path)
    # victims: highest vec_ids — far from the fixed query directions'
    # top-k so the serves stay comparable across the series
    victims = [
        r["vec_id"]
        for r in emb.select("vec_id").orderBy(F.desc("vec_id"))
        .limit(max(counts)).collect()
    ]

    def serve_sec() -> tuple[float, list]:
        best, rows = None, None
        for _ in range(REPS):
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            rows = idx.topk(QUERIES, k=10, nprobe=4).collect()
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        return round(best, 3), sorted(map(tuple, rows))

    out: dict[str, float] = {}
    done = 0
    for target in counts:
        for d in victims[done:target]:
            idx.delete(f"vec_id = {int(d)}", mode="tombstone")
        done = target
        assert len(idx._ts_entries()) == target
        sec, rows = serve_sec()
        out[str(target)] = sec
        print(f"sidecars={target}: serve {sec}s "
              f"({len(rows)} result rows)", file=sys.stderr)
    pre = rows
    reason = idx.compact_on_pressure(tombstone_sidecars=0)
    csec, crows = serve_sec()
    assert crows == pre, "compact changed serve results"
    print(f"compacted ({reason}): serve {csec}s", file=sys.stderr)
    print(json.dumps({
        "sf_dir": sf_dir, "n_vecs": n_vecs, "serve_sec": out,
        "compacted_sec": csec, "compact_reason": reason,
    }))
    shutil.rmtree(path, ignore_errors=True)


if __name__ == "__main__":
    main()
