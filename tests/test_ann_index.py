"""AnnIndex facade: train/save/load/append/topk must compose the SAME
certified operators a user would call directly, with the sidecar
making the index usable from a session that never trained it."""

from __future__ import annotations

import os

from apachebeamkmeans_spark.ann import AnnIndex
from apachebeamkmeans_spark.operators import ann_train as ANN
from apachebeamkmeans_spark.operators import similarity as SIM
from apachebeamkmeans_spark.sources import io

QUERIES = [
    [0.1 * ((i * 7 + j) % 5 - 2) for j in range(64)] for i in range(3)
]
# the facade normalizes queries itself (ann._norm_vec); inline-operator
# comparisons must hand the operator the SAME normalized vectors
from apachebeamkmeans_spark.ann import _norm_vec  # noqa: E402

NQUERIES = [_norm_vec(q) for q in QUERIES]


def _emb(spark, sf_dir):
    return io.read_table(spark, sf_dir, "embeddings")


def test_train_topk_matches_inline_ivf(spark, sf_dir, tmp_path):
    path = str(tmp_path / "idx")
    idx = AnnIndex.train(spark, _emb(spark, sf_dir), path, k=4)
    assert os.path.isdir(os.path.join(path, "_ann_params"))
    got = sorted(map(tuple, idx.topk(QUERIES, k=5, nprobe=2).collect()))
    vecs = ANN.l2_normalize(
        _emb(spark, sf_dir).selectExpr(
            "vec_id AS id", "CAST(embedding AS array<double>) AS features"
        )
    )
    want = sorted(
        map(
            tuple,
            SIM.ivf_topk(vecs, NQUERIES, idx.centers, k=5, nprobe=2).collect(),
        )
    )
    assert got == want and got


def test_load_searches_without_retraining(spark, sf_dir, tmp_path):
    path = str(tmp_path / "idx2")
    trained = AnnIndex.train(spark, _emb(spark, sf_dir), path, k=4)
    loaded = AnnIndex.load(spark, path)
    assert loaded.centers == trained.centers
    assert sorted(map(tuple, loaded.topk(QUERIES, k=3).collect())) == sorted(
        map(tuple, trained.topk(QUERIES, k=3).collect())
    )


def test_append_equals_rebuild(spark, sf_dir, tmp_path):
    from pyspark.sql import functions as F

    emb = _emb(spark, sf_dir)
    first = emb.filter(F.col("vec_id") % 2 == 0)
    rest = emb.filter(F.col("vec_id") % 2 == 1)

    p1 = str(tmp_path / "grow")
    idx = AnnIndex.train(spark, first, p1, k=4)
    idx.append(rest)

    p2 = str(tmp_path / "full")
    # same centers (trained on `first`) over the full corpus: rebuild twin
    vecs = ANN.l2_normalize(
        emb.selectExpr(
            "vec_id AS id", "CAST(embedding AS array<double>) AS features"
        )
    )
    SIM.build_ivf_index(vecs, idx.centers, p2)
    got = sorted(map(tuple, idx.topk(QUERIES, k=5, nprobe=2).collect()))
    want = sorted(
        map(
            tuple,
            SIM.ivf_topk_indexed(
                spark, p2, NQUERIES, idx.centers, k=5, nprobe=2
            ).collect(),
        )
    )
    assert got == want


def test_load_missing_sidecar_is_descriptive(spark, tmp_path):
    import pytest

    with pytest.raises(ValueError, match="_ann_params"):
        AnnIndex.load(spark, str(tmp_path / "never_trained"))


def test_load_corrupt_sidecar_is_descriptive(spark, tmp_path):
    """A partially-written sidecar (non-JSON bytes) must surface as a
    clear ValueError, not a bare JSONDecodeError (ADVICE r10)."""
    import pytest

    path = str(tmp_path / "half_written")
    side = os.path.join(path, "_ann_params")
    os.makedirs(side)
    with open(os.path.join(side, "part-00000.txt"), "w") as f:
        f.write("{not json")
    with pytest.raises(ValueError, match="corrupt"):
        AnnIndex.load(spark, path)


def test_load_rejects_unknown_version(spark, sf_dir, tmp_path):
    """train() stamps version=1; a sidecar from a future format must
    fail loudly on load instead of being misread (ADVICE r10)."""
    import json

    import pytest

    path = str(tmp_path / "future")
    AnnIndex.train(spark, _emb(spark, sf_dir), path, k=4)
    payload = json.dumps({"centers": [[0.0] * 64], "version": 99})
    spark.createDataFrame([(payload,)], "v string").coalesce(1).write.mode(
        "overwrite"
    ).text(os.path.join(path, "_ann_params"))
    with pytest.raises(ValueError, match="version"):
        AnnIndex.load(spark, path)


def test_topk_table_matches_literal_topk(spark, sf_dir, tmp_path):
    """The batch (query-table) search must return exactly what the
    literal path returns for the same vectors: take 4 embeddings as
    the query table, run topk_table, and compare against topk with
    those vectors inlined as literals (qids remapped by position)."""
    from pyspark.sql import functions as F

    path = str(tmp_path / "batch_idx")
    emb = _emb(spark, sf_dir)
    idx = AnnIndex.train(spark, emb, path, k=4)

    qrows = (
        emb.filter(F.col("vec_id") % 100 == 3)
        .orderBy("vec_id")
        .limit(4)
        .collect()
    )
    assert len(qrows) == 4
    qtab = spark.createDataFrame(
        [(r["vec_id"], [float(v) for v in r["embedding"]]) for r in qrows],
        "qid long, qvec array<double>",
    )
    got = {
        (r["qid"], r["vec_id"], r["cosine"], r["rank"], r["probe_cell"])
        for r in idx.topk_table(qtab, k=5, nprobe=2).collect()
    }
    lit = idx.topk([[float(v) for v in r["embedding"]] for r in qrows],
                   k=5, nprobe=2)
    qid_map = {i: r["vec_id"] for i, r in enumerate(qrows)}
    want = {
        (qid_map[r["qid"]], r["vec_id"], r["cosine"], r["rank"], r["probe_cell"])
        for r in lit.collect()
    }
    assert got == want and got


def test_batch_topk_plan_is_single_join_no_python(spark, sf_dir, tmp_path):
    """The batch search is ONE join between the layout scan and the
    exploded probe table — no Python nodes (all HOF folds), no
    cartesian product."""
    from pyspark.sql import functions as F

    from apachebeamkmeans_spark.plans import explain as X

    path = str(tmp_path / "plan_idx")
    emb = _emb(spark, sf_dir)
    idx = AnnIndex.train(spark, emb, path, k=4)
    qtab = emb.limit(8).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qvec")
    )
    plan = X.formatted_plan(idx.topk_table(qtab, k=3, nprobe=2))
    assert "Cartesian" not in plan
    assert "MapInPandas" not in plan and "BatchEvalPython" not in plan
    assert plan.count("Join") >= 1


def test_pq_tier_lifecycle_and_pruning(spark, sf_dir, tmp_path):
    """AnnIndex PQ tier: train(pq_m) -> v2 sidecar -> load (version
    dispatch, codebooks restored) -> append -> topk equals the inline
    ivfpq_topk over the union with the same trained params, and the
    probe scan stays partition-pruned."""
    from pyspark.sql import functions as F

    from apachebeamkmeans_spark.plans import explain as X

    path = str(tmp_path / "pq_idx")
    emb = _emb(spark, sf_dir)
    first = emb.filter(F.col("vec_id") % 2 == 0)
    rest = emb.filter(F.col("vec_id") % 2 == 1)
    trained = AnnIndex.train(spark, first, path, k=4, pq_m=8, pq_ksub=16)
    assert trained.codebooks is not None
    idx = AnnIndex.load(spark, path)
    assert idx.codebooks == trained.codebooks
    idx.append(rest)

    res = idx.topk(QUERIES, k=5, nprobe=2, refine=30)
    plan = X.formatted_plan(res)
    after = plan.split("PartitionFilters", 1)
    assert len(after) == 2 and "coarse_id" in after[1][:200]

    vecs = ANN.l2_normalize(
        emb.selectExpr(
            "vec_id AS id", "CAST(embedding AS array<double>) AS features"
        )
    )
    want = sorted(map(tuple, SIM.ivfpq_topk(
        vecs, NQUERIES, idx.centers, idx.codebooks,
        k=5, nprobe=2, refine=30,
    ).collect()))
    got = sorted(map(tuple, res.collect()))
    assert got == want and got


def test_pq_tier_topk_table_matches_literal(spark, sf_dir, tmp_path):
    """The PQ tier's batch (query-table) search must report the same
    (qid, vec_id, cosine, rank) rows as the literal PQ path for
    identical query vectors — since r12 both refine stages score
    cosine = dot / |f| (ADVICE r11 unified the convention), so the
    VALUES must agree at the emitted 6-dp rounding, not just ranks."""
    from pyspark.sql import functions as F

    path = str(tmp_path / "pq_idx_tab")
    emb = _emb(spark, sf_dir)
    idx = AnnIndex.train(spark, emb, path, k=4, pq_m=8, pq_ksub=16)
    qrows = (
        emb.filter(F.col("vec_id") % 100 == 7)
        .orderBy("vec_id").limit(3).collect()
    )
    qtab = spark.createDataFrame(
        [(r["vec_id"], [float(v) for v in r["embedding"]]) for r in qrows],
        "qid long, qvec array<double>",
    )
    got = {
        (r["qid"], r["vec_id"], r["cosine"], r["rank"])
        for r in idx.topk_table(qtab, k=5, nprobe=2, refine=30).collect()
    }

    # raw vectors both ways: the facade normalizes literal queries,
    # the batch path fold-normalizes rows — identical doubles
    lits = [[float(v) for v in r["embedding"]] for r in qrows]
    lit = idx.topk(lits, k=5, nprobe=2, refine=30).collect()
    qid_map = {i: r["vec_id"] for i, r in enumerate(qrows)}
    want = {
        (qid_map[r["qid"]], r["vec_id"], r["cosine"], r["rank"]) for r in lit
    }
    assert got == want and got


def test_serve_index_builds_once_and_serves(spark, sf_dir):
    """The amortized serving artifact (`ann_index_search`'s build-once
    publish): the first _ensure_serve_index call trains+appends and
    atomically publishes; a second call must short-circuit on the
    `_serve_ready` marker without touching the layout (same inode
    mtimes), and the served result equals the roundtrip lifecycle's
    search over the identical corpus."""
    from apachebeamkmeans_spark import queries_similarity as QS

    path = QS._ensure_serve_index(spark, sf_dir, pq=False)
    assert os.path.exists(os.path.join(path, "_serve_ready"))
    mt = {
        f: os.path.getmtime(os.path.join(path, f))
        for f in os.listdir(path)
    }
    path2 = QS._ensure_serve_index(spark, sf_dir, pq=False)
    assert path2 == path
    assert {
        f: os.path.getmtime(os.path.join(path, f))
        for f in os.listdir(path)
    } == mt

    idx = AnnIndex.load(spark, path)
    got = idx.topk(
        QS.QUERY_VECS, k=QS.IVFPQ_TOPK, nprobe=QS.IVFPQ_NPROBE
    ).collect()
    want = QS.q_ann_index_roundtrip(spark, sf_dir).collect()
    assert sorted(
        [(r["qid"], r["vec_id"], r["cosine"], r["rank"]) for r in got]
    ) == sorted(
        [(r["qid"], r["vec_id"], r["cosine"], r["rank"]) for r in want]
    )


def test_batch_prune_scan_is_semantically_transparent(spark, sf_dir, tmp_path):
    """The r12 probed-cell pushdown only removes partitions the join
    would discard anyway: ivf_batch_topk with prune_scan=False must
    return exactly the rows the pruned (default) path returns."""
    from pyspark.sql import functions as F

    path = str(tmp_path / "prune_equiv_idx")
    emb = _emb(spark, sf_dir)
    idx = AnnIndex.train(spark, emb, path, k=4)
    qtab = emb.filter(F.col("vec_id") % 100 == 13).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qvec")
    )
    index = spark.read.schema(SIM.INDEX_SCHEMA).parquet(path)
    pruned = SIM.ivf_batch_topk(index, qtab, idx.centers, k=5, nprobe=2)
    unpruned = SIM.ivf_batch_topk(
        index, qtab, idx.centers, k=5, nprobe=2, prune_scan=False
    )
    assert sorted(map(tuple, pruned.collect())) == sorted(
        map(tuple, unpruned.collect())
    )
    assert pruned.count() > 0


def test_compact_merges_small_files_and_preserves_results(
    spark, sf_dir, tmp_path
):
    """AnnIndex.compact: after several appends a cell directory holds
    many small files; compaction rewrites to ~one file per cell, the
    sidecar survives (loadable), and search results are identical."""
    from pyspark.sql import functions as F

    path = str(tmp_path / "compact_idx")
    emb = _emb(spark, sf_dir)
    idx = AnnIndex.train(spark, emb, path, k=4)
    for r in (3, 7, 11):
        idx.append(
            emb.filter(F.col("vec_id") % 20 == r).withColumn(
                "vec_id", F.col("vec_id") + F.lit(1_000_000 * r)
            )
        )
    before = idx.topk(QUERIES, k=5, nprobe=4).collect()

    def files_per_cell():
        out = {}
        for d in os.listdir(path):
            if d.startswith("coarse_id="):
                out[d] = len(
                    [
                        f
                        for f in os.listdir(os.path.join(path, d))
                        if f.endswith(".parquet")
                    ]
                )
        return out

    assert max(files_per_cell().values()) > 1  # appends fragmented it
    idx.compact()
    assert max(files_per_cell().values()) == 1
    reloaded = AnnIndex.load(spark, path)  # sidecar survived the swap
    after = reloaded.topk(QUERIES, k=5, nprobe=4).collect()
    assert sorted(map(tuple, after)) == sorted(map(tuple, before)) and after


def test_compact_pq_tier_preserves_codes_and_results(spark, sf_dir, tmp_path):
    """compact() on the PQ (v2) tier: the rewrite must carry the
    `codes` column through the shuffle, re-attach a v2 sidecar
    (codebooks survive a reload), and leave ADC+refine search results
    identical (r12 review: only the flat tier was covered)."""
    from pyspark.sql import functions as F

    path = str(tmp_path / "compact_pq_idx")
    emb = _emb(spark, sf_dir)
    idx = AnnIndex.train(spark, emb, path, k=4, pq_m=8, pq_ksub=16)
    idx.append(
        emb.filter(F.col("vec_id") % 20 == 5).withColumn(
            "vec_id", F.col("vec_id") + F.lit(5_000_000)
        )
    )
    before = idx.topk(QUERIES, k=5, nprobe=4, refine=30).collect()
    idx.compact()
    reloaded = AnnIndex.load(spark, path)
    assert reloaded.codebooks == idx.codebooks  # v2 sidecar survived
    after = reloaded.topk(QUERIES, k=5, nprobe=4, refine=30).collect()
    assert sorted(map(tuple, after)) == sorted(map(tuple, before)) and after


def test_compact_rejects_remote_paths(spark):
    import pytest

    idx = AnnIndex(spark, "hdfs://ns/idx", [[0.0] * 64])
    with pytest.raises(ValueError, match="remote filesystem"):
        idx.compact()


def test_cell_stats_reads_no_vector_bytes(spark, sf_dir, tmp_path):
    """cell_stats counts from the partition column alone: the scan's
    ReadSchema must be EMPTY (coarse_id comes from directory names),
    and the counts must equal a full-read groupBy."""
    from pyspark.sql import functions as F

    from apachebeamkmeans_spark.plans import explain as X

    path = str(tmp_path / "stats_idx")
    emb = _emb(spark, sf_dir)
    idx = AnnIndex.train(spark, emb, path, k=4)
    stats = idx.cell_stats()
    plan = X.formatted_plan(stats)
    assert "ReadSchema: struct<>" in plan  # zero data columns read
    got = {(r["coarse_id"], r["n_rows"]) for r in stats.collect()}
    full = spark.read.schema(SIM.INDEX_SCHEMA).parquet(path)
    want = {
        (r["coarse_id"], r["n"])
        for r in full.groupBy("coarse_id").agg(F.count("*").alias("n")).collect()
    }
    assert got == want and sum(n for _, n in got) == emb.count()
