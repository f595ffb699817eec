"""Oracle-checked similarity-search queries (north-star ANN ops)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from apachebeamkmeans_spark import fixtures, oraclegen as OG
from apachebeamkmeans_spark.operators import similarity as SIM
from apachebeamkmeans_spark.sources import io

DIM = fixtures.EMBEDDING_DIM
QUERY_VECS = fixtures.query_vectors(5)
CENTERS = fixtures.fixed_centers()
TOPK = 10
IVF_K = 5

_E2 = "(SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings)"


def q_sim_topk_bruteforce(spark: SparkSession, sf_dir: str) -> DataFrame:
    return SIM.cosine_topk(io.load_points(spark, sf_dir), QUERY_VECS, TOPK)


def _oracle_topk() -> str:
    parts = []
    for qid, q in enumerate(QUERY_VECS):
        cos = OG.sql_cosine_lit("e", q, DIM)
        parts.append(
            f"SELECT {qid} AS qid, vec_id, round(c, 6) AS cosine, rank FROM ("
            f"  SELECT vec_id, c, CAST(row_number() OVER (ORDER BY c DESC, vec_id ASC) AS INTEGER) AS rank"
            f"  FROM (SELECT vec_id, {cos} AS c FROM {_E2} t)"
            f") WHERE rank <= {TOPK}"
        )
    return " UNION ALL ".join(parts)


ORACLE_SIM_TOPK = _oracle_topk()


def q_sim_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    return SIM.ivf_topk(io.load_points(spark, sf_dir), QUERY_VECS, CENTERS, IVF_K)


def _oracle_ivf() -> str:
    dists = [f"{OG.sql_l2_sq('e', c)} AS d{i}" for i, c in enumerate(CENTERS)]
    argmin = OG.sql_argmin_case([f"d{i}" for i in range(len(CENTERS))], "coarse_id")
    parts = []
    for qid, q in enumerate(QUERY_VECS):
        probe = SIM.nearest_center(q, CENTERS)
        cos = OG.sql_cosine_lit("e", q, DIM)
        parts.append(
            f"SELECT {qid} AS qid, {probe} AS probe_cell, vec_id, round(c, 6) AS cosine, rank FROM ("
            f"  SELECT vec_id, c, CAST(row_number() OVER (ORDER BY c DESC, vec_id ASC) AS INTEGER) AS rank"
            f"  FROM (SELECT vec_id, {cos} AS c FROM ("
            f"    SELECT vec_id, e, {argmin} FROM "
            f"    (SELECT vec_id, e, {', '.join(dists)} FROM {_E2} t)"
            f"  ) WHERE coarse_id = {probe})"
            f") WHERE rank <= {IVF_K}"
        )
    return " UNION ALL ".join(parts)


ORACLE_SIM_IVF = _oracle_ivf()


QUERIES = {
    "sim_topk_bruteforce": (q_sim_topk_bruteforce, ORACLE_SIM_TOPK),
    "sim_ivf_topk": (q_sim_ivf_topk, ORACLE_SIM_IVF),
}
