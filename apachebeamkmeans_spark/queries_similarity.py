"""Oracle-checked similarity-search queries (north-star ANN ops)."""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from apachebeamkmeans_spark import fixtures, oraclegen as OG
from apachebeamkmeans_spark.operators import similarity as SIM
from apachebeamkmeans_spark.sources import io

DIM = fixtures.EMBEDDING_DIM
QUERY_VECS = fixtures.query_vectors(5)
CENTERS = fixtures.fixed_centers()
TOPK = 10
IVF_K = 5
IVF_NPROBE = 2

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


def _ivf_index_path(sf_dir: str) -> str:
    """Materialized-index scratch dir inside the repo (one per sf)."""
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    return os.path.join(repo, ".ivf_index", os.path.basename(sf_dir.rstrip("/")))


def q_sim_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Build the coarse-partitioned IVF layout, then search it: the
    probe is a partition-pruned read (`coarse_id IN (...)` reaches
    PartitionFilters — locked by tests/test_plans.py), all queries in
    one plan, nprobe=2 cells per query."""
    path = _ivf_index_path(sf_dir)
    SIM.build_ivf_index(io.load_points(spark, sf_dir), CENTERS, path)
    return SIM.ivf_topk_indexed(spark, path, QUERY_VECS, CENTERS, IVF_K, IVF_NPROBE)


def _oracle_ivf() -> str:
    dists = [f"{OG.sql_l2_sq('e', c)} AS d{i}" for i, c in enumerate(CENTERS)]
    argmin = OG.sql_argmin_case([f"d{i}" for i in range(len(CENTERS))], "coarse_id")
    parts = []
    for qid, q in enumerate(QUERY_VECS):
        probes = SIM.nearest_centers(q, CENTERS, IVF_NPROBE)
        in_list = ", ".join(str(p) for p in probes)
        cos = OG.sql_cosine_lit("e", q, DIM)
        parts.append(
            f"SELECT {qid} AS qid, probe_cell, vec_id, round(c, 6) AS cosine, rank FROM ("
            f"  SELECT coarse_id AS probe_cell, vec_id, c,"
            f"    CAST(row_number() OVER (ORDER BY c DESC, vec_id ASC) AS INTEGER) AS rank"
            f"  FROM (SELECT vec_id, coarse_id, {cos} AS c FROM ("
            f"    SELECT vec_id, e, {argmin} FROM "
            f"    (SELECT vec_id, e, {', '.join(dists)} FROM {_E2} t)"
            f"  ) WHERE coarse_id IN ({in_list}))"
            f") WHERE rank <= {IVF_K}"
        )
    return " UNION ALL ".join(parts)


ORACLE_SIM_IVF = _oracle_ivf()


MIN_COS_RANGE = 0.35


def q_sim_range_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Retrieval by threshold (the dual of top-k): every vector with
    cosine ≥ 0.35 of each query, single scan, no window/sort — a pure
    narrow map over the embedding scan."""
    return SIM.cosine_range_search(io.load_points(spark, sf_dir), QUERY_VECS, MIN_COS_RANGE)


def _oracle_range() -> str:
    parts = []
    for qid, q in enumerate(QUERY_VECS):
        cos = OG.sql_cosine_lit("e", q, DIM)
        parts.append(
            f"SELECT {qid} AS qid, vec_id, round(c, 6) AS cosine"
            f" FROM (SELECT vec_id, {cos} AS c FROM {_E2} t)"
            f" WHERE round(c, 6) >= {MIN_COS_RANGE}"
        )
    return " UNION ALL ".join(parts)


ORACLE_SIM_RANGE = _oracle_range()


PQ_CODEBOOKS = fixtures.pq_codebooks()
PQ_M = len(PQ_CODEBOOKS)
PQ_KSUB = len(PQ_CODEBOOKS[0])
PQ_DSUB = len(PQ_CODEBOOKS[0][0])
PQ_K = 5


def q_sim_pq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantization ANN: encode every embedding to 8 codes
    (nearest-of-16 per 8-dim subspace, literal codebooks), then ADC
    top-5 per query via lookup-table sums — encode + search in ONE
    plan, zero shuffle until the final k-row window. The 100 TB story:
    the serving scan reads m bytes per vector instead of the raw
    embedding, and the same codes feed the IVF layout (IVF-PQ)."""
    return SIM.pq_adc_topk(
        SIM.pq_encode(io.load_points(spark, sf_dir), PQ_CODEBOOKS),
        QUERY_VECS, PQ_CODEBOOKS, PQ_K,
    )


def _oracle_pq() -> str:
    dcols = []
    for s in range(PQ_M):
        for c in range(PQ_KSUB):
            terms = " + ".join(
                f"(e[{s * PQ_DSUB + j + 1}] - ({float(v)!r}))"
                f"*(e[{s * PQ_DSUB + j + 1}] - ({float(v)!r}))"
                for j, v in enumerate(PQ_CODEBOOKS[s][c])
            )
            dcols.append(f"({terms}) AS d_{s}_{c}")
    argmins = [
        OG.sql_argmin_case([f"d_{s}_{c}" for c in range(PQ_KSUB)], f"c{s}")
        for s in range(PQ_M)
    ]
    parts = []
    for qid, q in enumerate(QUERY_VECS):
        lut = SIM.pq_adc_lut(q, PQ_CODEBOOKS)
        adc = " + ".join(f"({OG.dlist(lut[s])})[c{s} + 1]" for s in range(PQ_M))
        parts.append(
            f"SELECT {qid} AS qid, vec_id, round(d, 6) AS adc_dist, rank FROM ("
            f"  SELECT vec_id, d, CAST(row_number() OVER (ORDER BY d ASC, vec_id ASC) AS INTEGER) AS rank"
            f"  FROM (SELECT vec_id, ({adc}) AS d FROM codes)"
            f") WHERE rank <= {PQ_K}"
        )
    return (
        "WITH d AS (SELECT vec_id, " + ", ".join(dcols) + f" FROM {_E2} t), "
        "codes AS (SELECT vec_id, " + ", ".join(argmins) + " FROM d) "
        + " UNION ALL ".join(parts)
    )


ORACLE_SIM_PQ = _oracle_pq()


def q_sim_quantize_int8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Int8 quantization codes via a scalar Arrow pandas_udf —
    integer-exact, so fully oracle-checked despite the Python hop.
    The result surface is all-scalar (`codes_csv` instead of the raw
    ARRAY<INT>): the driver's canonicalizer sorts every output column
    with pandas, which cannot hash list values (r03 failure)."""
    from pyspark.sql import functions as F

    return SIM.quantize_int8(io.load_points(spark, sf_dir)).select(
        "vec_id",
        F.array_join("codes", ",").alias("codes_csv"),
        "code_sum",
    )


ORACLE_SIM_QUANTIZE = f"""
SELECT vec_id,
       list_aggregate(list_transform(e, x -> CAST(CAST(floor(least(greatest(x, -1.0), 1.0) * 127)
                                                       AS INTEGER) AS VARCHAR)),
                      'string_agg', ',') AS codes_csv,
       CAST(list_reduce(list_transform(e, x -> CAST(floor(least(greatest(x, -1.0), 1.0) * 127)
                                                    AS INTEGER)),
                        (a, v) -> a + v) AS BIGINT) AS code_sum
FROM {_E2} t
"""


QUERIES = {
    "sim_topk_bruteforce": (q_sim_topk_bruteforce, ORACLE_SIM_TOPK),
    "sim_ivf_topk": (q_sim_ivf_topk, ORACLE_SIM_IVF),
    "sim_pq_topk": (q_sim_pq_topk, ORACLE_SIM_PQ),
    "sim_range_search": (q_sim_range_search, ORACLE_SIM_RANGE),
    "sim_quantize_int8": (q_sim_quantize_int8, ORACLE_SIM_QUANTIZE),
}
