"""Degenerate-input sweep: EVERY registered query against a zero-row
copy of all ten tables, plus single-doc and k>n edge cases.

Contract: on empty input a query either returns a well-defined frame
(usually empty; global aggregates may emit one null/zero row) or — for
the operators whose semantics genuinely require data (k-means seeding
and fitting: there is no "center of no points") — raises a clear
`ValueError`, never an IndexError/Py4J crash deep in a plan.
"""

from __future__ import annotations

import pytest

from apachebeamkmeans_spark.registry import all_queries
from apachebeamkmeans_spark.sources import io

# Queries whose semantics need >= 1 point: seeding / fitting. These must
# raise the documented ValueError on an empty frame.
NEEDS_DATA = {
    "kmeans_gonzalez_seeds",
    "kmeans_plusplus_seeds",
    "kmeans_plusplus_seeds_dweight",
    "kmeans_fit_clusters",
    "mllib_kmeans",
    # ANN trainers / fixed-iteration fit are Lloyd fits: no
    # centers/codebooks of no points.
    "sim_ivf_train",
    "sim_pq_train",
    "kmeans_fit_fixed",
    # r6: the KNN graph trains its coarse quantizer in-query (cells
    # derived from n), so it inherits the trainer contract.
    "sim_knn_graph",
    # r10: the PQ-stack graph build shares that quantizer and trains
    # residual codebooks in-query; the PCA basis is likewise a
    # trained parameter (no covariance of no points).
    "sim_knn_graph_pq",
    "sim_pca_train",
    # r10: no classifier of no documents (MLlib fit needs >= 1 row)
    "quality_classifier",
    # r6: SemDeDup and coverage sampling cluster in-query with the
    # same trainer.
    "semantic_dedup",
    "sim_coverage_sample",
    "sim_curation_pipeline",
    # r7: consumes the kNN graph, so it inherits the same contract.
    "sim_label_propagation",
    # r11: the AnnIndex lifecycle trains its coarse quantizer in-query
    # (ivf_train's ValueError); the facade model gate fits the
    # classifier in-query (fit_quality_model's ValueError); the
    # PCA-space pipeline trains its reduced-space quantizer in-query.
    "ann_index_roundtrip",
    "ann_index_pq_roundtrip",
    "curation_model_gate",
    "sim_pca_ivf_topk",
    # r12: the amortized serving queries build their persisted index
    # in-query on a fingerprint miss (train + append), so an empty
    # corpus hits the same trainer ValueError before any serving
    "ann_index_batch_search",
    "ann_index_compact_search",
    "ann_index_cell_stats",
    # r13: same build-in-query contract (train + append + maintain)
    "ann_index_retrain_search",
    "ann_index_filtered_search",
    "ann_index_delete_search",
    "ann_index_upsert_search",
    # r13 second wave: the indexed hybrid's vector side serves the
    # same in-query-built fingerprint-keyed index
    "hybrid_search_indexed",
    # r15: the filtered hybrid and the token-level MaxSim index train
    # their serve-side quantizers in-query on a fingerprint miss —
    # same ivf_train contract
    "hybrid_search_filtered",
    "sim_maxsim_indexed",
    # r16: the batch hybrid's vector side trains the same serve-side
    # quantizer in-query — same ivf_train contract
    "hybrid_search_batch",
    # r17: the tombstone-tier serve builds the same fingerprint-keyed
    # serve index in-query (train + append + tombstone delete)
    "ann_index_tombstone_search",
}

QUERIES = all_queries()


@pytest.fixture(scope="module")
def empty_sf_dir(spark, tmp_path_factory):
    """Zero-row twins of every table, exact same schemas (written by
    reading the smallest sf's schema and limiting to 0 rows)."""
    out = tmp_path_factory.mktemp("sf_empty")
    for name in io.TABLES:
        df = io.read_table(spark, "/root/testdata/sf0.001", name).limit(0)
        df.write.mode("overwrite").parquet(str(out / f"{name}.parquet"))
    return str(out)


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_on_empty_tables(spark, empty_sf_dir, name):
    fn = QUERIES[name][0]
    if name in NEEDS_DATA:
        with pytest.raises(ValueError, match="non-empty points frame"):
            fn(spark, empty_sf_dir).collect()
        return
    rows = fn(spark, empty_sf_dir).collect()
    assert isinstance(rows, list)  # completed without crashing


def test_single_doc_corpus(spark, tmp_path):
    """A one-document corpus: every dedup family returns no pairs and
    one-row verdicts/sketches — no degenerate self-join output."""
    from apachebeamkmeans_spark.operators import dedup as DD

    docs = spark.createDataFrame(
        [(1, "the quick brown fox jumps over the lazy dog")],
        "doc_id long, text string",
    )
    assert DD.exact_dedup(docs).count() == 1
    assert DD.lsh_candidate_pairs(docs).count() == 0
    assert DD.simhash(docs).count() == 1
    assert DD.simhash_pairs(docs).count() == 0
    assert DD.duplicate_clusters(DD.lsh_candidate_pairs(docs)).count() == 0


def test_k_greater_than_n(spark):
    """k > n points: the empty-cluster reseed keeps returning k centers
    (duplicates of the n points) rather than silently shrinking k —
    the documented divergence from the reference (SURVEY.md §8.3)."""
    from apachebeamkmeans_spark.operators.kmeans import KMeans, KMeansParams

    pts = spark.createDataFrame(
        [(0, [0.0, 0.0]), (1, [10.0, 10.0])], "id long, features array<double>"
    )
    m = KMeans(KMeansParams(k=4, init="random", seed=7, max_iter=5)).fit(pts)
    assert len(m.centers) == 4
    assert all(c is not None and len(c) == 2 for c in m.centers)


def test_empty_stream(spark, tmp_path):
    """Zero-row events stream: the watermarked windowed aggregation
    completes with an empty result table."""
    from apachebeamkmeans_spark.streaming import events as SE

    src = str(tmp_path / "events.parquet")
    io.read_table(spark, "/root/testdata/sf0.001", "events").limit(0).write.parquet(src)
    out = SE.run_hourly_stream_to_table(spark, str(tmp_path), name="t_empty_stream")
    assert out.count() == 0
