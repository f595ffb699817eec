"""Similarity search over embeddings: brute-force cosine top-k and an
IVF (inverted-file) variant (north-star ops).

Brute-force is the correctness baseline: one narrow pass computing
cosine(query, v) per row, then TakeOrdered top-k — per query, O(n)
work and k-row driver traffic.

IVF is the scale path: vectors are coarse-quantized to their nearest
centroid (the same literal-center argmin as K-Means assignment); a
query probes only its own centroid's partition(s). At 100 TB the table
would be written partitioned by `coarse_id`, so the probe is a
partition-pruned scan touching 1/k of the data; `nprobe` trades recall
for scan cost exactly like FAISS IVF.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from apachebeamkmeans_spark.functions import distance as D
from apachebeamkmeans_spark.operators.kmeans import lloyd


def cosine_topk(vecs: DataFrame, queries: list[list[float]], k: int = 10,
                id_col: str = "id", features_col: str = "features") -> DataFrame:
    """Exact top-k by cosine for every literal query vector in ONE scan:
    the query matrix is a nested-array literal, each row computes all
    cosines via a single higher-order transform (query norms folded at
    plan time), posexplode fans out (qid, cosine), and a per-qid window
    ranks. Arithmetic structure matches the unrolled/oracle form
    (same left-to-right sums), so values are bit-identical."""
    dim = len(queries[0])
    f = F.col(features_col)
    qnorms = [sum(float(v) * float(v) for v in q) ** 0.5 for q in queries]
    vnorm = F.sqrt(
        F.aggregate(F.transform(f, lambda x: x * x), F.lit(0.0), lambda a, v: a + v)
    )
    cos_arr = F.transform(
        F.lit([list(map(float, q)) for q in queries]),
        lambda q, i: D.dot(f, q) / (vnorm * F.element_at(F.lit(qnorms), i + 1)),
    )
    exploded = vecs.select(
        F.col(id_col).alias("vec_id"), F.posexplode(cos_arr).alias("qid", "_c")
    )
    w = Window.partitionBy("qid").orderBy(F.desc("_c"), F.asc("vec_id"))
    return (
        exploded.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("qid", "vec_id", F.round("_c", 6).alias("cosine"), "rank")
    )


def nearest_center(q: list[float], centers: list[list[float]]) -> int:
    """Plan-time coarse-quantizer probe for a literal query vector."""
    best, best_d = 0, float("inf")
    for i, c in enumerate(centers):
        d = sum((x - y) ** 2 for x, y in zip(q, c))
        if d < best_d:
            best, best_d = i, d
    return best


def ivf_topk(vecs: DataFrame, queries: list[list[float]],
             centers: list[list[float]], k: int = 5,
             id_col: str = "id", features_col: str = "features") -> DataFrame:
    """IVF search: filter to the query's coarse cell, then exact cosine
    within it. The coarse assignment reuses the K-Means argmin map."""
    assigned = lloyd.assign(
        vecs.select(F.col(id_col).alias("vec_id"), F.col(features_col).alias("f")),
        centers, 2.0, features_col="f", mode="hof",
    ).withColumnRenamed("center_id", "coarse_id")
    f = F.col("f")
    vnorm = F.sqrt(
        F.aggregate(F.transform(f, lambda x: x * x), F.lit(0.0), lambda a, v: a + v)
    )
    out = None
    for qid, q in enumerate(queries):
        probe = nearest_center(q, centers)
        qnorm = sum(float(v) * float(v) for v in q) ** 0.5
        cos = D.dot(f, D.lit_vec(q)) / (vnorm * F.lit(qnorm))
        top = (
            assigned.filter(F.col("coarse_id") == probe)
            .select(
                F.lit(qid).alias("qid"),
                F.lit(probe).alias("probe_cell"),
                F.col("vec_id"),
                cos.alias("_c"),
            )
            .orderBy(F.desc("_c"), F.asc("vec_id"))
            .limit(k)
        )
        ranked = top.withColumn(
            "rank",
            F.row_number().over(
                Window.partitionBy("qid").orderBy(F.desc("_c"), F.asc("vec_id"))
            ),
        ).select("qid", "probe_cell", "vec_id", F.round("_c", 6).alias("cosine"), "rank")
        out = ranked if out is None else out.unionByName(ranked)
    return out
