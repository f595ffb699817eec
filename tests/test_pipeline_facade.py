"""CurationPipeline facade (r8 verdict item 8): the public builder
must compose the SAME operators the engine certifies individually —
so each stage is checked against an independent recomputation via the
underlying operator, and the full ≥4-stage composition end-to-end."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from apachebeamkmeans_spark.operators import dedup as DD
from apachebeamkmeans_spark.operators import textstats as TX
from apachebeamkmeans_spark.pipeline import CurationPipeline
from apachebeamkmeans_spark.sources import io


def _docs(spark, sf_dir):
    return io.read_table(spark, sf_dir, "documents")


def test_input_validation(spark):
    with pytest.raises(ValueError, match="doc_id"):
        CurationPipeline(spark.range(3))


def test_stages_match_underlying_operators(spark, sf_dir):
    docs = _docs(spark, sf_dir)

    # exact_dedup stage == anti-join of the operator's is_dup verdicts
    got = CurationPipeline(docs).exact_dedup().df()
    keep = {
        r["doc_id"]
        for r in DD.exact_dedup(docs).filter(~F.col("is_dup")).collect()
    }
    assert {r["doc_id"] for r in got.select("doc_id").collect()} == keep

    # near_dedup stage == cluster keepers of verified LSH pairs
    got2 = CurationPipeline(docs).near_dedup(threshold=0.5).df()
    pairs = DD.jaccard_verify(
        docs, DD.lsh_candidate_pairs(docs, 8, 3), 3, 0.5
    ).select("doc_a", "doc_b")
    losers = {
        r["doc_id"]
        for r in DD.duplicate_clusters(pairs)
        .filter(F.col("doc_id") != F.col("cluster_id"))
        .collect()
    }
    all_ids = {r["doc_id"] for r in docs.select("doc_id").collect()}
    assert (
        {r["doc_id"] for r in got2.select("doc_id").collect()}
        == all_ids - losers
    )


def test_full_composition_end_to_end(spark, sf_dir):
    """load → exact_dedup → near_dedup → quality_gate → pack: four
    stages composed lazily, executed once."""
    docs = _docs(spark, sf_dir)
    n0 = docs.count()
    p = (
        CurationPipeline(docs)
        .exact_dedup()
        .near_dedup(threshold=0.5)
        .quality_gate(min_chars=30, langs=("en",))
    )
    survivors = p.df()
    n = survivors.count()
    assert 0 < n < n0  # every gate stage pruned something at sf0.001
    # survivors keep the input's ride-along columns
    assert set(docs.columns) <= set(survivors.columns)
    # all survivors satisfy the gate predicates
    assert survivors.filter(F.length("text") < 30).count() == 0

    packed = p.pack(ctx_len=256, n_shards=4)
    assert set(packed.columns) == {"doc_id", "shard", "n_tokens", "bin_id"}
    assert packed.count() == n
    # packing matches the operator applied to the same survivor set
    want = TX.pack_sequences(survivors, 256, 4)
    assert sorted(map(tuple, packed.collect())) == sorted(
        map(tuple, want.collect())
    )

    # summary reflects the survivor corpus exactly
    total = p.summary().agg(
        F.sum("n_docs").alias("d"), F.sum("sum_chars").alias("c")
    ).collect()[0]
    assert total["d"] == n
    assert total["c"] == survivors.agg(
        F.sum(F.length("text"))
    ).collect()[0][0]


def test_purge_substrings_ground_truth(spark, tmp_path):
    """The purge stage on a planted corpus (same construction as
    test_dedup_text's ground-truth fixture): copied spans cut, unique
    docs untouched, n_chars recomputed."""
    from tests.test_dedup_text import _uniq

    M = _uniq("shared-block", 60)
    x_head, x_tail = _uniq("x-head", 60), _uniq("x-tail", 60)
    rows = [
        (1, x_head + M[:52] + x_tail),
        (2, _uniq("w-head", 55) + M + _uniq("w-tail", 55)),
        (3, _uniq("v-solo", 200)),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string").withColumn(
        "n_chars", F.length("text").cast("long")
    )
    out = {
        r["doc_id"]: r
        for r in CurationPipeline(docs).purge_substrings().df().collect()
    }
    # doc 1's M[:52] and the matching 52-char prefix span of doc 2's M
    # are cross-doc runs; doc 3 is untouched
    assert out[1]["text"] == x_head + x_tail
    assert out[1]["chars_cut"] == 52
    assert out[1]["n_runs_cut"] == 1
    assert out[3]["text"] == rows[2][1]
    assert out[3]["chars_cut"] == 0
    for r in out.values():
        assert r["n_chars"] == len(r["text"])


def test_semantic_dedup_stage_matches_operator(spark, sf_dir):
    """semantic_dedup stage == anti-join of semantic_prune verdicts
    over the same inline-trained √n-cell quantizer (seeded Lloyd —
    deterministic, so two independent trainings agree)."""
    from apachebeamkmeans_spark.operators import ann_train as ANN
    from apachebeamkmeans_spark.operators.similarity import semantic_prune
    from apachebeamkmeans_spark.queries_similarity import knn_cells

    docs = _docs(spark, sf_dir)
    emb = io.read_table(spark, sf_dir, "embeddings")
    got = CurationPipeline(docs).semantic_dedup(emb, tau=0.35).df()

    vecs = ANN.l2_normalize(
        emb.select(
            F.col("vec_id").alias("id"),
            F.col("embedding").cast("array<double>").alias("features"),
        )
    )
    centers = ANN.ivf_train(vecs, knn_cells(vecs.count()))
    pruned = {
        r["vec_id"]
        for r in semantic_prune(vecs, centers, 0.35)
        .filter(F.col("pruned"))
        .collect()
    }
    all_ids = {r["doc_id"] for r in docs.select("doc_id").collect()}
    assert (
        {r["doc_id"] for r in got.select("doc_id").collect()}
        == all_ids - pruned
    )


def test_contamination_gate_matches_operator(spark, sf_dir):
    """contamination_gate == anti-join of the operator's contaminated
    set; seeding the benchmark with the corpus's own texts guarantees
    non-trivial overlap (a doc shares every n-gram with itself)."""
    docs = _docs(spark, sf_dir)
    bench = docs.orderBy("doc_id").limit(5).select("doc_id", "text")
    got = CurationPipeline(docs).contamination_gate(bench).df()
    bad = {
        r["doc_id"]
        for r in TX.ngram_contamination(docs, bench, 3)
        .filter(F.col("n_shared_ngrams") > 0)
        .collect()
    }
    assert bad  # self-overlap: the seeded bench docs contaminate
    all_ids = {r["doc_id"] for r in docs.select("doc_id").collect()}
    assert {
        r["doc_id"] for r in got.select("doc_id").collect()
    } == all_ids - bad


def test_purge_substrings_repeat_keeps_unique_columns(spark, sf_dir):
    """A second purge (or a pre-annotated input) must replace the cut-
    accounting columns, not duplicate them into ambiguous references."""
    docs = _docs(spark, sf_dir)
    out = CurationPipeline(docs).purge_substrings().purge_substrings().df()
    assert len(out.columns) == len(set(out.columns))
    out.select("n_runs_cut", "chars_cut").collect()  # resolvable


def test_coverage_select_stage_matches_operator(spark, sf_dir):
    """coverage_select == semi-join of coverage_sample's keep set over
    the same inline-trained quantizer (seeded → deterministic)."""
    from apachebeamkmeans_spark.operators import ann_train as ANN
    from apachebeamkmeans_spark.operators.similarity import coverage_sample
    from apachebeamkmeans_spark.queries_similarity import knn_cells

    docs = _docs(spark, sf_dir)
    emb = io.read_table(spark, sf_dir, "embeddings")
    got = CurationPipeline(docs).coverage_select(emb, per_cell=2).df()

    vecs = ANN.l2_normalize(
        emb.select(
            F.col("vec_id").alias("id"),
            F.col("embedding").cast("array<double>").alias("features"),
        )
    )
    k = knn_cells(vecs.count())
    keep = {
        r["vec_id"]
        for r in coverage_sample(vecs, ANN.ivf_train(vecs, k), 2).collect()
    }
    assert keep  # non-trivial selection at sf0.001
    got_ids = {r["doc_id"] for r in got.select("doc_id").collect()}
    assert got_ids == keep & {
        r["doc_id"] for r in docs.select("doc_id").collect()
    }
    # coreset size follows the clustering: at most k * per_cell
    assert len(got_ids) <= k * 2


def test_near_dedup_accepts_staged_verified_pairs(spark, sf_dir):
    """verified_pairs= skips the in-plan LSH join; survivors must
    equal the inline path's (same pair semantics either way)."""
    docs = _docs(spark, sf_dir)
    staged = DD.jaccard_verify(
        docs, DD.lsh_candidate_pairs(docs, 8, 3), 3, 0.5
    ).select("doc_a", "doc_b")
    got = (
        CurationPipeline(docs)
        .near_dedup(verified_pairs=staged)
        .df()
        .select("doc_id")
        .collect()
    )
    want = (
        CurationPipeline(docs)
        .near_dedup(threshold=0.5)
        .df()
        .select("doc_id")
        .collect()
    )
    assert {r["doc_id"] for r in got} == {r["doc_id"] for r in want}


def test_staged_pairs_keeper_absence_hazard(spark, sf_dir):
    """The `near_dedup(verified_pairs=)` docstring's hazard, made
    concrete: pairs staged over the FULL corpus, then consumed after
    an id-dropping stage removed a cluster's min-id keeper, leave
    that cluster with ZERO representatives — every surviving member
    is anti-joined away as a loser of the now-absent keeper. The
    inline (recompute) path never does this: its components are built
    over the current frame only, so each semantic cluster keeps its
    (new) min-id member. This is why the docstring says stage pairs
    BEFORE id-dropping stages, or recompute."""
    docs = _docs(spark, sf_dir)
    staged = DD.jaccard_verify(
        docs, DD.lsh_candidate_pairs(docs, 8, 3), 3, 0.5
    ).select("doc_a", "doc_b").localCheckpoint()
    by_cluster: dict[int, set[int]] = {}
    for r in DD.duplicate_clusters(staged).collect():
        by_cluster.setdefault(r["cluster_id"], set()).add(r["doc_id"])
    cid, members = next(
        (c, m) for c, m in sorted(by_cluster.items()) if len(m) >= 2
    )
    assert cid == min(members)  # keeper IS the min id, by construction

    # an upstream stage drops the keeper (any id-dropping stage does)
    upstream = docs.filter(F.col("doc_id") != cid)

    stale = (
        CurationPipeline(upstream)
        .near_dedup(verified_pairs=staged)
        .df()
        .select("doc_id")
        .collect()
    )
    stale_ids = {r["doc_id"] for r in stale}
    # the hazard: the whole cluster vanishes — no member survives
    assert not (members & stale_ids)

    fresh = (
        CurationPipeline(upstream)
        .near_dedup(threshold=0.5)
        .df()
        .select("doc_id")
        .collect()
    )
    fresh_ids = {r["doc_id"] for r in fresh}
    # recomputed components are subsets of the staged ones restricted
    # to the live frame, so each sub-component's min id survives —
    # the cluster keeps at least one representative
    assert (members - {cid}) & fresh_ids


def test_embedding_stages_share_trained_quantizer(spark, sf_dir):
    """centers= from train_quantizer reproduces each stage's own
    training exactly (seeded Lloyd) while training only once."""
    docs = _docs(spark, sf_dir)
    emb = io.read_table(spark, sf_dir, "embeddings")
    centers = CurationPipeline.train_quantizer(emb)
    shared = (
        CurationPipeline(docs)
        .semantic_dedup(emb, centers=centers)
        .coverage_select(emb, centers=centers)
        .df()
        .select("doc_id")
        .collect()
    )
    per_stage = (
        CurationPipeline(docs)
        .semantic_dedup(emb)
        .coverage_select(emb)
        .df()
        .select("doc_id")
        .collect()
    )
    assert {r["doc_id"] for r in shared} == {r["doc_id"] for r in per_stage}
