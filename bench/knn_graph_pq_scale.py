"""sim_knn_graph_pq beyond x10 (r15 verdict item 6): confirm the
per-cell-membership bound empirically at x30 — the heaviest remaining
registered job — with the recall@3 floor held.

The registered query trains its quantizer at TRAIN_SF_DIR; here the
build runs the OPERATOR directly over the .scaledata embeddings (the
same call shape `q_sim_knn_graph_pq` makes), with cells/nprobe derived
from n exactly as the registered query derives them, and codebooks
PQ-trained on the scale corpus itself (the production posture: train
where you build). Recall@3 is checked on a 200-node sample against a
numpy brute-force over the FULL corpus (sampling the probes, never
the corpus — exactness of the reference side is what the floor
means).

Usage: python bench/knn_graph_pq_scale.py [mults...]   # default 30
Prints one JSON line:
  {"mults": {"30": {"n": .., "secs": [..], "recall3": ..}}}
"""
from __future__ import annotations

import json
import os

import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import numpy as np  # noqa: E402

from apachebeamkmeans_spark.operators import ann_train as ANN  # noqa: E402
from apachebeamkmeans_spark.operators import similarity as SIM  # noqa: E402
from apachebeamkmeans_spark.operators.ann_train import knn_cells  # noqa: E402
from apachebeamkmeans_spark.operators.ann_train import knn_refine  # noqa: E402
from apachebeamkmeans_spark.queries_similarity import (  # noqa: E402
    DIM,
    KNN_K,
    KNNPQ_KSUB,
    KNNPQ_M,
    KNN_TRAIN_ITERS,
    knn_nprobe,
)

# the floor the derived dials must hold at EVERY scale point — the
# r16 finding was exactly this assert failing at x30 with the then-
# fixed refine=100 (recall@3 0.73); the knn_refine rule restores it
RECALL3_FLOOR = 0.9
from apachebeamkmeans_spark.sources import io  # noqa: E402
from apachebeamkmeans_spark.session import get_spark  # noqa: E402

REPS = int(os.environ.get("KNNPQ_SCALE_REPS", "2"))
SAMPLE = 200  # recall probe nodes


def main() -> None:
    mults = [int(m) for m in (sys.argv[1:] or ["30"])]
    spark = get_spark("knn-graph-pq-scale")
    spark.range(1000).selectExpr("sum(id)").collect()
    out: dict[str, dict] = {}
    for mult in mults:
        sf_dir = os.path.join(REPO, ".scaledata", f"x{mult}")
        ids, mat = ANN.normalized_embeddings_np(sf_dir)
        n = len(ids)
        cells = knn_cells(n)
        nprobe = int(os.environ.get("KNNPQ_NPROBE", "0")) or knn_nprobe(cells)
        derived_dials = not (
            os.environ.get("KNNPQ_NPROBE") or os.environ.get("KNNPQ_REFINE")
        )
        refine = (
            int(os.environ.get("KNNPQ_REFINE", "0"))
            or knn_refine(n, nprobe, cells)
        )
        centers = ANN.round_mat(
            ANN.ivf_train_np(ids, mat, cells, KNN_TRAIN_ITERS, "knn")
        )
        res, _ = ANN.residuals_np(mat, centers)
        books = [
            ANN.round_mat(b)
            for b in ANN.pq_train_np(
                ids, res, KNNPQ_M, KNNPQ_KSUB, KNN_TRAIN_ITERS, "knnpq"
            )
        ]
        base = ANN.l2_normalize(io.load_points(spark, sf_dir)).localCheckpoint()
        times = []
        edges = None
        for _ in range(REPS):
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            g = SIM.knn_graph_pq(
                base, centers, books, KNN_K, nprobe, refine, dim=DIM
            )
            edges = g.collect()
            times.append(round(time.perf_counter() - t0, 3))
        # recall@3 on a deterministic node sample vs full brute force
        rng = np.random.default_rng(7)
        probe_idx = rng.choice(n, size=min(SAMPLE, n), replace=False)
        id_arr = np.asarray(ids)
        got: dict[int, list[int]] = {}
        for r in edges:
            got.setdefault(r["vec_id"], []).append((r["rank"], r["nbr_id"]))
        hits = total = 0
        for pi in probe_idx:
            q = mat[pi]
            sims = mat @ q
            sims[pi] = -np.inf
            true3 = set(id_arr[np.argpartition(-sims, 3)[:3]].tolist())
            mine = {
                nbr for rk, nbr in sorted(got.get(int(id_arr[pi]), []))[:3]
            }
            hits += len(true3 & mine)
            total += 3
        recall3 = round(hits / total, 4)
        out[str(mult)] = {
            "n": n, "cells": cells, "nprobe": nprobe, "refine": refine,
            "secs": times, "recall3": recall3,
        }
        print(f"x{mult}: {out[str(mult)]}", file=sys.stderr)
        if derived_dials:
            assert recall3 >= RECALL3_FLOOR, (
                f"x{mult}: recall@3 {recall3} < {RECALL3_FLOOR} at the "
                f"fully-derived dials (cells={cells}, nprobe={nprobe}, "
                f"refine={refine}) — the knn_refine rule no longer holds "
                f"the floor"
            )
    print(json.dumps({"mults": out}))


if __name__ == "__main__":
    main()
