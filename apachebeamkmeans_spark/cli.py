"""Command-line entry point — the reference's user surface.

The reference programs are `main()`s driven by `--key=value` args
mutating `Point` statics (SparKMeansGroupBy.java:30-54):
  --input= --output= --k= --paradigm= --threshold= --max_iteration=
  --time_file= --iteration_file=
plus the experiment repeat loop (×10, SparKMeansGroupBy.java:56-57).

This CLI accepts the same vocabulary (spelled as normal flags, with
the reference's `--key=value` form also accepted), adds `--init` to
select any of the six seeding strategies and `--seed` for
reproducibility, and writes the same three outputs:
  - result file(s): one line per cluster `center_id:id1;id2;...;`
  - time file: wall seconds per experiment (per-run timers — the
    reference accidentally recorded cumulative times, SURVEY.md §8.8)
  - iteration file: Lloyd iterations per experiment

Usage:
  python -m apachebeamkmeans_spark.cli --input data.txt --output out \
      --k 4 --paradigm 2 --threshold 1e-4 --max_iteration 20 \
      --init plusplus --seed 42 --experiments 1
"""

from __future__ import annotations

import argparse
import sys
import time

from apachebeamkmeans_spark.operators.kmeans import KMeans, KMeansParams
from apachebeamkmeans_spark.session import get_spark
from apachebeamkmeans_spark.sources import io


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="apachebeamkmeans_spark",
        description="Distributed K-Means over point files (text/CSV/parquet).",
    )
    p.add_argument("--input", required=True, help="points file: text lines 'x1,x2,...' or parquet dir")
    p.add_argument("--output", required=True, help="output directory for cluster text files")
    p.add_argument("--k", type=int, default=4)
    p.add_argument("--paradigm", type=float, default=2.0,
                   help="Minkowski distance order p (1=Manhattan, 2=Euclidean)")
    p.add_argument("--threshold", type=float, default=1e-4)
    p.add_argument("--max_iteration", type=int, default=20)
    p.add_argument("--init", default="random",
                   choices=["random", "plusplus", "init_max", "init_min",
                            "max_farthest", "max_farthest_manhattan"])
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--weight", default="d2", choices=["d", "d2"],
                   help="k-means++ roulette weight (reference used D; classic is D²)")
    p.add_argument("--experiments", type=int, default=1,
                   help="repeat count (reference ran 10)")
    p.add_argument("--time_file", default=None)
    p.add_argument("--iteration_file", default=None)
    return p


def _normalize(argv: list[str]) -> list[str]:
    # accept the reference's `--key=value` form verbatim (argparse
    # already handles it) and its no-space variants
    return argv


def main(argv: list[str] | None = None, spark=None) -> int:
    args = build_parser().parse_args(_normalize(argv if argv is not None else sys.argv[1:]))
    owns_session = spark is None
    if owns_session:
        spark = get_spark("abk-kmeans-cli")
    if args.input.endswith(".parquet") or args.input.rstrip("/").endswith("parquet"):
        pts = spark.read.parquet(args.input)
    else:
        pts = io.read_points_text(spark, args.input)
    pts = pts.cache()

    params = KMeansParams(
        k=args.k, p=args.paradigm, threshold=args.threshold,
        max_iter=args.max_iteration, seed=args.seed, init=args.init,
        weight=args.weight,
    )
    for exp in range(args.experiments):
        t0 = time.perf_counter()  # per-run timer (not cumulative — §8.8)
        model = KMeans(params).fit(pts)
        io.write_text_single(model.format_clusters(pts), f"{args.output}{exp}")
        elapsed = time.perf_counter() - t0
        if args.time_file:
            with open(args.time_file, "a") as f:
                f.write(f"{elapsed}\n")
        if args.iteration_file:
            with open(args.iteration_file, "a") as f:
                f.write(f"{model.n_iter}\n")
        print(f"experiment {exp}: {model.n_iter} iterations, {elapsed:.2f}s")
    if owns_session:
        spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
