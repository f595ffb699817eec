"""Stopword-grade serving cost on the persisted BM25 index — the one
honestly unbounded serve case, measured (r14 verdict item 5).

`bm25_index_build`'s docstring documents that a stopword query scans a
corpus-sized slice of the index (a stopword's posting list is
corpus-sized by definition; exact BM25 — Lucene included — pays this,
and the industry escalation is impact-ordered early termination /
Block-Max WAND, which trades exactness for bounded scans). SCALE.md
carried that bound in prose only; this harness puts a number beside
the flat typical-term rows so the Block-Max WAND trigger is
quantified.

Fixture subtlety: tools/gen_scale.py draws ~60 words/doc uniformly
from a 31-word vocabulary, so EVERY fixture term is stopword-grade
(df ≈ 0.86·n — P(absent) = (30/31)^60). To get a controlled contrast
on one index, each doc gets one extra synthetic long-tail token
`rare{doc_id % 5000}` appended at build time: term `rare42` then
appears in exactly `mult` docs (df = 1 at x1, 30 at x30 — the
selective-term profile of a realistic vocabulary), while `the` keeps
its corpus-sized postings. Same index, same plan shape, same session;
the measured difference is purely the pruned scan's posting-list
volume — the quantity the bound is about.

Timed per scale point (warm session, one untimed warmup serve, REPS
repetitions, all readings reported; index build untimed):
- selective: bm25_indexed_topk over the 1-term query ["rare42"]
- stopword:  bm25_indexed_topk over the 1-term query ["the"]
- stopword_pruned: the same stopword query with impact-ordered early
  termination (prune_df_frac=0.5, prune_min_impact=PRUNE_R0) — the
  Block-Max analogue's measured payoff: the corpus-sized posting run
  is row-group-skipped below the impact cutoff, with the provable
  per-query error bound reported beside the timing

Usage: python bench/stopword_serve_scale.py [mults...]  # default 1 10 30
Reads .scaledata/x{mult}/documents.parquet (tools/gen_scale.py).
Prints one JSON line:
  {"mults": {"1": {"n_docs": .., "df_rare": .., "df_stop": ..,
                   "selective": [..], "stopword": [..]}, ...}}
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

REPS = int(os.environ.get("STOPWORD_SCALE_REPS", "3"))
RARE_MOD = 5_000  # rare-term family size: df of each rareK == mult
PRUNE_R0 = 0.05   # impact cutoff: keep rows where tf/dl >= 5% (the
#                   fixture's mean stopword tf/dl is ~1/31 ≈ 0.032,
#                   so the cutoff keeps the dense top-impact tail)


def main() -> None:
    mults = [int(m) for m in (sys.argv[1:] or ["1", "10", "30"])]
    spark = get_spark("stopword-serve-scale")
    spark.range(1000).selectExpr("sum(id)").collect()
    work = os.path.join(REPO, ".scratch", "stopword_scale")
    shutil.rmtree(work, ignore_errors=True)
    out: dict[str, dict] = {}
    for mult in mults:
        src = os.path.join(REPO, ".scaledata", f"x{mult}", "documents.parquet")
        docs = (
            spark.read.parquet(src)
            .select(
                "doc_id",
                F.concat(
                    F.col("text"), F.lit(" rare"),
                    (F.col("doc_id") % RARE_MOD).cast("string"),
                ).alias("text"),
            )
        )
        idx = os.path.join(work, f"x{mult}")
        TI.bm25_index_build(docs, idx)  # untimed: the amortized stage

        def serve(terms: list[str], **kw) -> int:
            return TI.bm25_indexed_topk(
                spark, idx, [terms], k=10, **kw
            ).count()

        def serve_wand(terms: list[str]) -> int:
            return TI.bm25_indexed_topk_wand(
                spark, idx, [terms], k=10,
                prune_df_frac=0.5, prune_min_impact=PRUNE_R0,
            ).count()

        serve(["rare42"])  # warmup: plan + commit/df reads cached paths
        serve(["the"])
        serve(["the"], prune_df_frac=0.5, prune_min_impact=PRUNE_R0)
        serve_wand(["the"])
        point: dict[str, object] = {"n_docs": docs.count()}
        dfl = (
            spark.read.parquet(f"{idx}/df")
            .filter(F.col("term").isin(["rare42", "the"]))
            .groupBy("term").agg(F.sum("df").alias("df")).collect()
        )
        dmap = {r["term"]: int(r["df"]) for r in dfl}
        point["df_rare"], point["df_stop"] = dmap["rare42"], dmap["the"]
        for label, terms, kw in (
            ("selective", ["rare42"], {}),
            ("stopword", ["the"], {}),
            ("stopword_pruned", ["the"],
             {"prune_df_frac": 0.5, "prune_min_impact": PRUNE_R0}),
            # r16: EXACT Block-Max WAND (θ-pass + candidate rescore) —
            # bit-identical to the exact serve; the measured question
            # is where its two-job protocol crosses under the exact
            # serve's corpus-sized single-job scan+agg
            ("stopword_wand", ["the"], {"wand": True}),
        ):
            times = []
            for _ in range(REPS):
                spark.catalog.clearCache()
                t0 = time.perf_counter()
                if kw.get("wand"):
                    serve_wand(terms)
                else:
                    serve(terms, **kw)
                times.append(round(time.perf_counter() - t0, 3))
            point[label] = times
        point["prune_bound"] = round(TI.bm25_prune_error_bound(
            spark, idx, [["the"]], 0.5, PRUNE_R0)[0], 4)
        point["rows_kept_pruned"] = (
            spark.read.parquet(f"{idx}/postings")
            .filter((F.col("term") == "the")
                    & (F.col("impact_key") >= PRUNE_R0)).count()
        )
        out[str(mult)] = point
        print(f"x{mult}: {point}", file=sys.stderr)
    shutil.rmtree(work, ignore_errors=True)
    print(json.dumps({"mults": out}))


if __name__ == "__main__":
    main()
