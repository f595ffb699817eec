"""Distributed PageRank over an undirected pair graph.

The step after near-dup detection in a curation pipeline that wants
more than keep/drop: rank documents by how central they are in the
similarity graph (hub pages, boilerplate families, template spam all
surface as high-rank nodes). Fixed-iteration power method — the same
discipline that made the ANN trainers oracle-checkable
(`operators/ann_train.py`): no convergence test, no RNG, so a DuckDB
twin replays the identical arithmetic.

Scale shape (the canonical large-graph PageRank): one shuffle join +
one aggregate per iteration over the EDGE list, rank state is one row
per node, `localCheckpoint` truncates the per-iteration lineage
(SURVEY §7.5 iterative hazard), and the only driver traffic is the
node count. Generalizes the reference's iterate-join-aggregate Lloyd
loop (/root/reference/SparKMeansGroupBy.java:73-151) to graph state.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DAMPING = 0.85
ITERATIONS = 5


def pagerank(
    pairs: DataFrame,
    damping: float = DAMPING,
    iterations: int = ITERATIONS,
) -> DataFrame:
    """PageRank over undirected (doc_a, doc_b) pairs, restricted to
    nodes that appear in at least one pair (so the symmetric graph has
    no dangling nodes — every node's outgoing mass lands somewhere).

    Output: (doc_id, rank) with rank rounded to 6 (summation order
    across engines differs below that).
    """
    edges = (
        pairs.select(F.col("doc_a").alias("src"), F.col("doc_b").alias("dst"))
        .unionByName(
            pairs.select(F.col("doc_b").alias("src"), F.col("doc_a").alias("dst"))
        )
        .distinct()
        .localCheckpoint()
    )
    # Like duplicate_clusters: the verified pair graph is far smaller
    # than the corpus, so partition by edge count, not session default.
    n_parts = max(1, min(edges.count() // 100_000 + 1, 200))
    edges = edges.coalesce(n_parts).localCheckpoint()

    deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    nodes = deg.select(F.col("src").alias("doc_id"))
    n = nodes.count()  # scalar driver traffic only
    if n == 0:
        return nodes.withColumn("rank", F.lit(0.0))

    base = (1.0 - damping) / n
    ranks = nodes.withColumn("rank", F.lit(1.0 / n)).coalesce(n_parts).localCheckpoint()
    for _ in range(iterations):
        contribs = (
            edges.join(ranks, edges.src == ranks.doc_id)
            .join(deg, "src")
            .select("dst", (F.col("rank") / F.col("deg")).alias("c"))
        )
        ranks = (
            contribs.groupBy(F.col("dst").alias("doc_id"))
            .agg((F.lit(base) + F.lit(damping) * F.sum("c")).alias("rank"))
            .coalesce(n_parts)
            .localCheckpoint(eager=False)
        )
    return ranks.select("doc_id", F.round("rank", 6).alias("rank"))


def pagerank_oracle_sql(
    edges_cte: str,
    damping: float = DAMPING,
    iterations: int = ITERATIONS,
) -> str:
    """The DuckDB twin: identical fixed-iteration arithmetic generated
    from the same parameters, as chained CTEs over an `edges`(src,
    dst) CTE named by `edges_cte` (must already be symmetric)."""
    its = [
        f"""deg AS (SELECT src, CAST(count(*) AS DOUBLE) AS deg FROM {edges_cte} GROUP BY src),
nn AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM deg),
r0 AS (SELECT src AS doc_id, 1.0 / (SELECT n FROM nn) AS rank FROM deg)"""
    ]
    for i in range(1, iterations + 1):
        its.append(
            f"""r{i} AS (
  SELECT e.dst AS doc_id,
         (1.0 - {damping}) / (SELECT n FROM nn)
           + {damping} * sum(r.rank / d.deg) AS rank
  FROM {edges_cte} e
  JOIN r{i - 1} r ON e.src = r.doc_id
  JOIN deg d ON e.src = d.src
  GROUP BY e.dst)"""
        )
    return (
        ",\n".join(its)
        + f"\nSELECT doc_id, round(rank, 6) AS rank FROM r{iterations}"
    )
