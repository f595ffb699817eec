"""KNN graph via the IVF-PQ stack (`similarity.knn_graph_pq`) — the
r9-verdict escalation path, wired in r10.

Done-criteria from the r9 verdict item 5, checked here:

(a) the residual-codebook trainer equals its numpy twin after
    `round_param` rounding at the registered (m, ksub, iters, seed)
    config — the contract that lets the driver oracle embed
    numpy-trained literals;
(b) recall@3 of the PQ build vs exact brute force is >= 0.8 at
    sf0.01 (the driver's correctness sf; sf0.001's ~60-vector corpus
    is below the blocking floor) — AND not meaningfully below the
    flat build's recall on the same corpus (<= 0.1 gap): switching a
    graph consumer from flat to PQ must not silently change quality
    class;
(c) both builds consume the IDENTICAL shared quantizer artifact, so
    their candidate universes match by construction;
(d) with refine >= every candidate count the PQ build's edges equal
    brute force restricted to its candidate universe — i.e. the ONLY
    recall loss with a full-width shortlist is blocking, not the ADC
    stage (the degenerate-exactness check, twin of
    test_ann_train's (c)).
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from apachebeamkmeans_spark import queries_similarity as QS
from apachebeamkmeans_spark.operators import ann_train as ANN
from apachebeamkmeans_spark.operators import similarity as SIM
from apachebeamkmeans_spark.sources import io

SF = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def np_corpus():
    return ANN.normalized_embeddings_np(SF)


@pytest.fixture(scope="module")
def true_top3(np_corpus):
    _, mat = np_corpus
    g = mat @ mat.T
    np.fill_diagonal(g, -np.inf)
    return np.argsort(-g, axis=1, kind="stable")[:, :3]


@pytest.fixture(scope="module")
def norm_points(spark):
    return ANN.l2_normalize(io.load_points(spark, SF)).localCheckpoint()


def test_residual_codebooks_match_numpy_twin(spark, norm_points, np_corpus):
    ids, mat = np_corpus
    res_np, _ = ANN.residuals_np(mat, QS.KNN_TRAINED_CENTERS)
    np_books = [
        ANN.round_mat(b)
        for b in ANN.pq_train_np(
            ids, res_np, QS.KNNPQ_M, QS.KNNPQ_KSUB, QS.KNN_TRAIN_ITERS, "knnpq"
        )
    ]
    spark_books = [
        ANN.round_mat(b)
        for b in ANN.pq_train(
            ANN.coarse_residuals(norm_points, QS.KNN_TRAINED_CENTERS),
            QS.KNNPQ_M, QS.KNNPQ_KSUB, QS.KNN_TRAIN_ITERS, "knnpq",
        )
    ]
    assert spark_books == np_books


def _recall_at_3(edges_df, true3) -> float:
    by_vec: dict[int, set[int]] = {}
    for r in edges_df.collect():
        by_vec.setdefault(r["vec_id"], set()).add(r["nbr_id"])
    hits = sum(
        len(by_vec.get(i, set()) & set(map(int, true3[i])))
        for i in range(len(true3))
    )
    return hits / (3 * len(true3))


def test_pq_graph_recall_floor_vs_flat(spark, true_top3):
    flat = QS.q_sim_knn_graph(spark, SF)
    pq = QS.q_sim_knn_graph_pq(spark, SF)
    r_flat = _recall_at_3(flat, true_top3)
    r_pq = _recall_at_3(pq, true_top3)
    assert r_pq >= 0.8, f"PQ-graph recall@3 {r_pq:.3f} below floor"
    assert r_pq >= r_flat - 0.1, (
        f"PQ-graph recall {r_pq:.3f} more than 0.1 below flat {r_flat:.3f}"
    )


def test_both_builds_share_the_quantizer_artifact(spark, norm_points):
    n = norm_points.count()
    k = QS.knn_cells(n)
    # the flat build populated the artifact during the recall test (or
    # populates it now); the PQ query's lookup must return the SAME
    # object — one training, two consumers
    c1 = QS._knn_quantizer(norm_points, SF, k)
    c2 = QS._knn_quantizer(norm_points, SF, k)
    assert c1 is c2


def test_full_width_shortlist_degenerates_to_blocked_exact(
    spark, norm_points, np_corpus, true_top3
):
    """refine >= any candidate count ⇒ the ADC shortlist keeps every
    blocked candidate, so the exact re-rank sees the full candidate
    universe and the output equals brute force restricted to pairs
    sharing a probed cell — computed independently in numpy."""
    ids, mat = np_corpus
    n = len(ids)
    k = QS.knn_cells(n)
    nprobe = QS.knn_nprobe(k)
    centers = QS._knn_quantizer(norm_points, SF, k)
    books = QS._knnpq_codebooks(norm_points, SF, centers)
    out = SIM.knn_graph_pq(
        norm_points, centers, books, QS.KNN_K, nprobe, refine=n, dim=QS.DIM
    )
    got = {
        (r["vec_id"], r["rank"]): r["nbr_id"] for r in out.collect()
    }
    # numpy twin of the candidate universe + exact ranking
    cmat = np.asarray(centers)
    d2c = ((mat[:, None, :] - cmat[None, :, :]) ** 2).sum(axis=2)
    order = np.argsort(d2c, axis=1, kind="stable")
    probes = [set(map(int, order[i, :nprobe])) for i in range(n)]
    g = np.round(mat @ mat.T, 6)
    id_of = {i: int(v) for i, v in enumerate(ids)}
    pos_of = {int(v): i for i, v in enumerate(ids)}
    for i in range(n):
        cand = [j for j in range(n) if j != i and probes[i] & probes[j]]
        ranked = sorted(cand, key=lambda j: (-g[i, j], id_of[j]))[: QS.KNN_K]
        for rk, j in enumerate(ranked, start=1):
            assert got.get((id_of[i], rk)) == id_of[j], (
                f"vec {id_of[i]} rank {rk}: got {got.get((id_of[i], rk))}, "
                f"want {id_of[j]}"
            )


def test_pq_encode_lut_consistent_with_pq_encode(spark, norm_points):
    """pq_encode_lut is pq_encode + the distance matrix the codes were
    argmin'd from: codes must EQUAL the single-role encoder's (same
    rows, same codebooks), and each row's code must be the argmin of
    its own lut row (first minimum on ties) with lut[s][codes[s]] ==
    min(lut[s]) — the invariant ADC scoring relies on."""
    books = QS.KNNPQ_TRAINED_BOOKS[:8]  # any valid (m, ksub, dsub) shape
    base = norm_points.limit(40)
    plain = {
        r["vec_id"]: list(r["codes"])
        for r in SIM.pq_encode(base, books, id_col="id").collect()
    }
    rich = SIM.pq_encode_lut(base, books, id_col="id").collect()
    assert {r["vec_id"]: list(r["codes"]) for r in rich} == plain
    for r in rich:
        for s, code in enumerate(r["codes"]):
            lut_s = r["lut"][s]
            assert lut_s[code] == min(lut_s)
            assert code == lut_s.index(min(lut_s))  # first-minimum tie rule


def test_pq_encode_lut_arrow_bit_identical_to_hof(spark, norm_points):
    """The Arrow/numpy encoder (`pq_encode_lut_arrow`, the r17 fan-out
    fast path used by knn_graph_pq) must be BIT-identical to the HOF
    form — same codes, same lut doubles (the column-order accumulation
    replays the fold's left-to-right IEEE additions exactly), same
    carry passthrough."""
    books = QS.KNNPQ_TRAINED_BOOKS[:8]
    base = norm_points.limit(60).withColumn("tag", F.col("id") % 3)
    a = {
        r["vec_id"]: (list(r["codes"]), [list(x) for x in r["lut"]], r["tag"])
        for r in SIM.pq_encode_lut(
            base, books, id_col="id", carry=("tag",)
        ).collect()
    }
    b = {
        r["vec_id"]: (list(r["codes"]), [list(x) for x in r["lut"]], r["tag"])
        for r in SIM.pq_encode_lut_arrow(
            base, books, id_col="id", carry=("tag",)
        ).collect()
    }
    assert set(a) == set(b) and len(a) == 60
    for vid in a:
        assert a[vid][0] == b[vid][0], f"codes differ for {vid}"
        assert a[vid][1] == b[vid][1], f"lut doubles differ for {vid}"
        assert a[vid][2] == b[vid][2]
