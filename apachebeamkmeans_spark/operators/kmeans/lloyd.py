"""Lloyd iteration primitives: assign → recenter → converge.

Reference semantics (SURVEY.md §2.3-2.4, §3.1):

- assign = broadcast nested-loop argmin over the current centers
  (`mapToPair` closing over the broadcast list with an inner for-loop,
  SparKMeansGroupBy.java:77-98). Here the centers are a *plan-time
  literal* (k×dim doubles): each point evaluates k unrolled distance
  expressions and takes the argmin — zero join, zero shuffle, fully
  whole-stage-codegen'd. At 100 TB this is a pure map stage.
- recenter = per-cluster element-wise mean. The reference shuffles every
  point string through `groupByKey` with no map-side combine
  (SparKMeansGroupBy.java:102-114). Here: one `groupBy(center_id)` with
  `dim` scalar `avg` aggregates → Catalyst HashAggregate with partial
  (map-side) aggregation, so only k×dim partial sums cross the shuffle.
- convergence = max movement between *index-matched* old/new centers
  (textbook; the reference's any-match + index bug, SURVEY.md §8.1-8.2,
  is deliberately not reproduced).

Centers live on the driver as a k×dim Python list (≤ a few KB) —
the only data that ever crosses to the driver.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from apachebeamkmeans_spark.functions import distance as D


def _dist_col(features, center: list[float], p: float):
    """Distance expression point↔literal-center. For p=2 the *squared*
    distance is used (same argmin, avoids k sqrts per row)."""
    if p == 2:
        return D.l2_sq_unrolled(features, center)
    if p == 1:
        return D.l1_unrolled(features, center)
    return D.minkowski(features, D.lit_vec(center), p)


def _hof_dist_fn(feats, p: float):
    if p == 2:
        return lambda c: F.aggregate(
            F.zip_with(feats, c, lambda x, y: (x - y) * (x - y)),
            F.lit(0.0), lambda a, v: a + v,
        )
    if p == 1:
        return lambda c: F.aggregate(
            F.zip_with(feats, c, lambda x, y: F.abs(x - y)),
            F.lit(0.0), lambda a, v: a + v,
        )
    pw = float(p)
    return lambda c: (
        F.aggregate(
            F.zip_with(feats, c, lambda x, y: F.abs(x - y) ** pw),
            F.lit(0.0), lambda a, v: a + v,
        )
        ** (1.0 / pw)
    )


def assign(df: DataFrame, centers: list[list[float]], p: float = 2.0,
           features_col: str = "features", keep_dist: bool = False,
           mode: str = "unrolled") -> DataFrame:
    """Add `center_id` (argmin over literal centers; ties → lowest id).

    J1 in SURVEY.md §2.3 — the reference's only "join", expressed as a
    narrow map over a plan-time center literal; zero join, zero shuffle.

    Two physical forms with identical results (same left-to-right
    summation order):
    - `unrolled`: k×dim explicit expressions — maximal codegen, and the
      structural twin of the generated oracle SQL (single-step queries).
    - `hof`: one nested ARRAY<ARRAY<DOUBLE>> literal + transform/
      zip_with — a compact plan whose generated code is identical
      across changing center values, so the iterative Lloyd loop pays
      no per-iteration codegen recompile (~4× faster per iteration).
    """
    feats = F.col(features_col)
    if mode == "hof":
        dfn = _hof_dist_fn(feats, p)
        best = F.array_min(
            F.transform(
                F.lit([list(map(float, c)) for c in centers]),
                lambda c, i: F.struct(dfn(c).alias("dist"), i.cast("int").alias("idx")),
            )
        )
        out = df.withColumn("center_id", best["idx"])
        if keep_dist:
            out = out.withColumn("dist", best["dist"])
        return out
    dists = F.array(*[_dist_col(feats, c, p) for c in centers])
    out = df.withColumn("__dists", dists).withColumn(
        "center_id",
        (F.array_position(F.col("__dists"), F.array_min(F.col("__dists"))) - 1).cast("int"),
    )
    if keep_dist:
        out = out.withColumn("dist", F.array_min(F.col("__dists")))
    return out.drop("__dists")


def recenter(assigned: DataFrame, dim: int, features_col: str = "features") -> DataFrame:
    """New centroid per cluster: groupBy(center_id) + dim scalar avgs +
    count. One shuffle, map-side partial aggregation, k rows out."""
    feats = F.col(features_col)
    aggs = [F.avg(feats[j]).alias(f"c{j}") for j in range(dim)] + [
        F.count(F.lit(1)).alias("size")
    ]
    return assigned.groupBy("center_id").agg(*aggs)


def recenter_to_list(assigned: DataFrame, dim: int, k: int,
                     features_col: str = "features") -> tuple[list[list[float] | None], list[int]]:
    """Collect the k new centers (k rows — O(k·dim) driver traffic).
    Returns (centers, sizes); empty clusters yield None / 0."""
    rows = recenter(assigned, dim, features_col).collect()
    centers: list[list[float] | None] = [None] * k
    sizes = [0] * k
    for r in rows:
        cid = r["center_id"]
        centers[cid] = [r[f"c{j}"] for j in range(dim)]
        sizes[cid] = r["size"]
    return centers, sizes


def min_dist_col(features, centers: list[list[float]], p: float = 2.0,
                 mode: str = "unrolled"):
    """min over current centers of distance(point, center) — seeding's
    D(x) quantity (SparKMeansGroupByPlusPlus.java:82-96)."""
    if mode == "hof":
        dfn = _hof_dist_fn(features, p)
        return F.array_min(
            F.transform(F.lit([list(map(float, c)) for c in centers]), dfn)
        )
    return F.array_min(F.array(*[_dist_col(features, c, p) for c in centers]))


def farthest_point(df: DataFrame, centers: list[list[float]], p: float = 2.0,
                   features_col: str = "features") -> list[float]:
    """argmax_x min_c dist(x, c) — Gonzalez scattering step and the
    empty-cluster re-seed. orderBy+limit(1) is TakeOrdered (per-partition
    top-1 then driver merge), not a full sort."""
    row = (
        df.select(F.col("id"), F.col(features_col).alias("f"),
                  min_dist_col(F.col(features_col), centers, p, mode="hof").alias("d"))
        .orderBy(F.desc("d"), F.asc("id"))
        .limit(1)
        .collect()[0]
    )
    return list(row["f"])


def movement(old: list[list[float]], new: list[list[float]], p: float = 2.0) -> float:
    """Max index-matched center movement under the Minkowski-p metric."""
    worst = 0.0
    for a, b in zip(old, new):
        if p == 1:
            d = sum(abs(x - y) for x, y in zip(a, b))
        elif p == 2:
            d = math.sqrt(sum((x - y) ** 2 for x, y in zip(a, b)))
        else:
            d = sum(abs(x - y) ** p for x, y in zip(a, b)) ** (1.0 / p)
        worst = max(worst, d)
    return worst


def sse(assigned_with_dist: DataFrame) -> float:
    """Total within-cluster squared error (expects `dist` = squared L2)."""
    return assigned_with_dist.agg(F.sum("dist").alias("sse")).collect()[0]["sse"]


def sql_assign_expr(centers: list[list[float]], p: float,
                    features_col: str = "features"):
    """Argmin center id as ONE parsed SQL expression (ties → lowest id).

    Same result as `assign(mode='hof')` but built with a single
    `F.expr` call instead of hundreds of py4j lambda round-trips —
    the fit loop rebuilds this every iteration, and on a driver the
    expression-construction cost is pure per-iteration overhead.
    For argmin the Minkowski root is skipped (monotone transform)."""
    c_sql = "array(" + ", ".join(
        "array(" + ", ".join(f"{float(x)!r}D" for x in c) + ")" for c in centers
    ) + ")"
    if p == 2:
        term = "(x - y) * (x - y)"
    elif p == 1:
        term = "abs(x - y)"
    else:
        term = f"pow(abs(x - y), {float(p)!r}D)"
    return F.expr(
        f"array_min(transform({c_sql}, (c, i) -> struct("
        f"aggregate(zip_with({features_col}, c, (x, y) -> {term}), 0.0D,"
        " (a, v) -> a + v) AS dist, CAST(i AS INT) AS idx)))"
    )["idx"]


def lloyd_fit(df: DataFrame, init_centers: list[list[float]], p: float,
              threshold: float, max_iter: int,
              features_col: str = "features",
              sse_log: list[float] | None = None) -> tuple[list[list[float]], int]:
    """The dynamic driver loop (SURVEY.md §2.6 C5): assign → recenter →
    converge, centers re-literalized each iteration.

    Because each iteration's plan is rebuilt from the cached base frame
    + literal centers, there is no lineage growth — no checkpointing
    needed (the reference accidentally achieved the same by collecting
    every iteration).

    Loop physical strategy (~3× per-iteration speedup over the naive
    loop, measured at sf0.1):
    - assign via `sql_assign_expr` — one parsed expression, and the
      generated code is structurally identical across iterations
      (complex-type literals land in the codegen reference array, not
      the source), so whole-stage codegen compiles once;
    - recenter via MLlib `Summarizer.mean` over a vector column — a
      single partial-aggregating vector aggregate instead of `dim`
      scalar avgs, so plan analysis is O(1) in dimensionality. The
      per-dimension `avg` form (`recenter`) remains the oracle-exact
      twin for the single-step queries; the fit loop is rows-only
      checked, where summation-order differences are immaterial.

    Empty clusters are re-seeded from the current farthest point
    (documented divergence from the reference, which silently shrank k —
    SURVEY.md §8.3).

    `sse_log`: pass a list to receive the per-iteration SSE (sum over
    points of the min distance to the CURRENT centers, measured at the
    assignment step — squared for p=2, matching `sse()`); the extra
    sum rides the same per-iteration aggregate, no extra job. Used by
    the `kmeans_fit_clusters` property oracle (Lloyd's monotonic
    descent is a theorem, so a non-increasing log certifies the loop).
    """
    from pyspark.ml.functions import array_to_vector
    from pyspark.ml.stat import Summarizer

    k = len(init_centers)
    centers = [list(c) for c in init_centers]
    vpts = df.withColumn("__fvec", array_to_vector(features_col)).cache()
    aggs = [
        Summarizer.mean(F.col("__fvec")).alias("mean"),
        F.count(F.lit(1)).alias("size"),
    ]
    n_iter = 0
    from apachebeamkmeans_spark.session import driver_loop_conf

    try:
        # AQE off for the iteration loop: each iteration's k-row
        # aggregate otherwise schedules as two jobs (see
        # session.driver_loop_conf; r18)
        with driver_loop_conf(df.sparkSession):
            for _ in range(max_iter):
                n_iter += 1
                frame = vpts.withColumn(
                    "center_id", sql_assign_expr(centers, p, features_col)
                )
                ag = aggs
                if sse_log is not None:
                    frame = frame.withColumn(
                        "__md",
                        min_dist_col(F.col(features_col), centers, p, mode="hof"),
                    )
                    ag = aggs + [F.sum("__md").alias("__sse")]
                rows = frame.groupBy("center_id").agg(*ag).collect()
                if sse_log is not None:
                    sse_log.append(float(sum(r["__sse"] for r in rows)))
                by_id = {r["center_id"]: list(r["mean"]) for r in rows}
                new_centers: list[list[float] | None] = [by_id.get(i) for i in range(k)]
                for i in range(k):
                    if new_centers[i] is None:
                        new_centers[i] = farthest_point(
                            df,
                            [c for c in new_centers if c is not None] or centers,
                            p,
                            features_col,
                        )
                delta = movement(centers, new_centers, p)  # matched pairs, not any-match
                centers = new_centers
                if delta <= threshold:
                    break
    finally:
        vpts.unpersist()
    return centers, n_iter
