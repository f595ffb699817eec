"""r14 staged serving paths (registration planned for r15): ANN-pruned
MaxSim rerank, persisted sign-code Hamming screen, batch query-table
BM25 over the persisted index."""

from __future__ import annotations

from pyspark.sql import functions as F

from apachebeamkmeans_spark.ann import AnnIndex
from apachebeamkmeans_spark.operators import similarity as SIM
from apachebeamkmeans_spark.operators import textindex as TI
from apachebeamkmeans_spark.sources import io

MAXSIM_QUERIES = [
    [[0.1 * ((j + i) % 5 - 2) for j in range(16)] for i in range(3)],
    [[0.05 * ((j * (i + 2)) % 7 - 3) for j in range(16)] for i in range(2)],
]


def test_maxsim_all_candidates_equals_full_scan(spark, sf_dir):
    """With a candidate set covering every (qid, vec_id) pair, the
    pruned path must reproduce the full scan exactly."""
    vecs = io.load_points(spark, sf_dir)
    ids = vecs.select(F.col("id").alias("vec_id"))
    cand = None
    for qid in range(len(MAXSIM_QUERIES)):
        part = ids.select(F.lit(qid).alias("qid"), "vec_id")
        cand = part if cand is None else cand.unionByName(part)
    full = sorted(
        map(tuple, SIM.maxsim_topk(vecs, MAXSIM_QUERIES, k=7, dim=64).collect())
    )
    pruned = sorted(
        map(
            tuple,
            SIM.maxsim_topk(
                vecs, MAXSIM_QUERIES, k=7, dim=64, candidates=cand
            ).collect(),
        )
    )
    assert pruned == full and full


def test_maxsim_pruned_scores_match_full(spark, sf_dir, tmp_path):
    """ANN-shortlisted rerank: every pair the pruned path ranks carries
    the SAME maxsim score as the full scan (the candidate join changes
    the candidate set, never the arithmetic), and each query's ranked
    ids are a subset of its shortlist."""
    vecs = io.load_points(spark, sf_dir)
    idx = AnnIndex.train(
        spark, io.read_table(spark, sf_dir, "embeddings"),
        str(tmp_path / "msidx"), k=4,
    )
    # any deterministic full-width probes do — this test checks the
    # candidates= mechanics (score equality + shortlist subset),
    # not probe quality (the registration-bound token-level design
    # and its recall floor live in test_staged_queries.py)
    coarse = [
        [0.1 * ((j + qi) % 5 - 2) for j in range(64)]
        for qi in range(len(MAXSIM_QUERIES))
    ]
    cand = idx.topk(coarse, k=30, nprobe=2).select("qid", "vec_id")
    short = {
        (r["qid"], r["vec_id"]) for r in cand.collect()
    }
    pruned = SIM.maxsim_topk(
        vecs, MAXSIM_QUERIES, k=7, dim=64, candidates=cand
    ).collect()
    full_scores = {
        (r["qid"], r["vec_id"]): r["maxsim"]
        for r in SIM.maxsim_topk(vecs, MAXSIM_QUERIES, k=10**9, dim=64).collect()
    }
    assert len(pruned) == 2 * 7
    for r in pruned:
        assert (r["qid"], r["vec_id"]) in short
        assert r["maxsim"] == full_scores[(r["qid"], r["vec_id"])]


def test_binary_hamming_persisted_codes_equal_inplan(spark, sf_dir, tmp_path):
    """Screening from the PERSISTED sign-codes table must reproduce
    the in-plan derivation exactly, and the screen side of the plan
    must read only the 16 B/row codes columns (no features)."""
    vecs = io.load_points(spark, sf_dir)
    codes_path = str(tmp_path / "codes")
    SIM.sign_codes(vecs, 64).write.parquet(codes_path)
    codes = spark.read.parquet(codes_path)
    q = [0.07 * ((j % 11) - 5) for j in range(64)]
    inplan = sorted(
        map(tuple, SIM.binary_hamming_topk(vecs, [q], k=5, shortlist=20).collect())
    )
    persisted = sorted(
        map(
            tuple,
            SIM.binary_hamming_topk(
                vecs, [q], k=5, shortlist=20, codes=codes
            ).collect(),
        )
    )
    assert persisted == inplan and inplan


def test_bm25_table_equals_literal(spark, tmp_path):
    """Batch query-table serving equals the literal form when each
    query's terms are sorted (the table form folds in sorted-term
    order)."""
    docs = spark.createDataFrame(
        [
            (1, "spark join the hash table fast"),
            (2, "slow scan of the big table"),
            (3, "hash hash hash join"),
            (4, "stream window agg"),
        ],
        "doc_id long, text string",
    )
    idx = str(tmp_path / "bm25idx")
    TI.bm25_index_build(docs, idx)
    queries = [["hash", "join"], ["scan", "table"], ["stream"]]
    qdf = spark.createDataFrame(
        [(qid, t) for qid, q in enumerate(queries) for t in q],
        "qid int, term string",
    )
    lit = sorted(
        map(tuple, TI.bm25_indexed_topk(spark, idx, queries, k=10).collect())
    )
    tab = sorted(
        map(tuple, TI.bm25_indexed_topk_table(spark, idx, qdf, k=10).collect())
    )
    assert tab == lit and lit
