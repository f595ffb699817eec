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
    from apachebeamkmeans_spark import queries_sim_serving as QS

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
    from apachebeamkmeans_spark import queries_sim_serving as QSS
    want = QSS.q_ann_index_roundtrip(spark, sf_dir).collect()
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


def test_pq_batch_prune_scan_is_semantically_transparent(
    spark, sf_dir, tmp_path
):
    """ADVICE r12: the PQ-tier prunes (ivfpq_batch_topk's pre-encode
    corpus filter and ivfpq_batch_topk_indexed's IN pushdown over both
    layout reads) get the same direct pruned-vs-unpruned assertion the
    flat tier has."""
    from pyspark.sql import functions as F

    path = str(tmp_path / "pq_prune_equiv_idx")
    emb = _emb(spark, sf_dir)
    idx = AnnIndex.train(spark, emb, path, k=4, pq_m=8, pq_ksub=16)
    qtab = emb.filter(F.col("vec_id") % 100 == 13).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qvec")
    )
    # indexed form: the IN pushdown over both layout reads
    kw = dict(k=5, nprobe=2, refine=30)
    pruned = SIM.ivfpq_batch_topk_indexed(
        spark, path, qtab, idx.centers, idx.codebooks, **kw
    )
    unpruned = SIM.ivfpq_batch_topk_indexed(
        spark, path, qtab, idx.centers, idx.codebooks,
        prune_scan=False, **kw
    )
    rows = sorted(map(tuple, pruned.collect()))
    assert rows == sorted(map(tuple, unpruned.collect())) and rows
    # inline form: the pre-encode corpus filter
    vecs = ANN.l2_normalize(
        emb.selectExpr(
            "vec_id AS id", "CAST(embedding AS array<double>) AS features"
        )
    )
    pruned_i = SIM.ivfpq_batch_topk(
        vecs, qtab, idx.centers, idx.codebooks, **kw
    )
    unpruned_i = SIM.ivfpq_batch_topk(
        vecs, qtab, idx.centers, idx.codebooks, prune_scan=False, **kw
    )
    rows_i = sorted(map(tuple, pruned_i.collect()))
    assert rows_i == sorted(map(tuple, unpruned_i.collect())) and rows_i
    # the layout-backed and inline forms agree with each other too
    assert rows == rows_i


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


def test_rename_publish_rejects_remote_paths(spark):
    import pytest

    idx = AnnIndex(spark, "hdfs://ns/idx", [[0.0] * 64])
    with pytest.raises(ValueError, match="remote filesystem"):
        idx.compact(strategy="rename")


def test_compact_accepts_file_scheme_uri(spark, sf_dir, tmp_path):
    """ADVICE r12: a file:// URI used to pass the remote guard and then
    fail at os.rename only AFTER the full rewrite. The rename publish
    must normalize file:-scheme URIs to plain local paths up front."""
    from pyspark.sql import functions as F

    plain = str(tmp_path / "file_uri_idx")
    emb = _emb(spark, sf_dir)
    AnnIndex.train(spark, emb, plain, k=4)
    idx = AnnIndex.load(spark, f"file://{plain}")
    idx.append(
        emb.filter(F.col("vec_id") % 20 == 3).withColumn(
            "vec_id", F.col("vec_id") + F.lit(3_000_000)
        )
    )
    before = idx.topk(QUERIES, k=5, nprobe=4).collect()
    idx.compact()  # auto → rename (file:// IS driver-local)
    after = idx.topk(QUERIES, k=5, nprobe=4).collect()
    assert sorted(map(tuple, after)) == sorted(map(tuple, before)) and after
    # swapped in place, no orphaned siblings
    sibs = [d for d in os.listdir(tmp_path) if d.startswith("file_uri_idx")]
    assert sibs == ["file_uri_idx"]


def test_failed_rename_swap_cleans_staged_dir(spark, sf_dir, tmp_path, monkeypatch):
    """ADVICE r12: a failed swap must remove the fully-written staged
    sibling (no orphaned full copy) AND restore the original layout."""
    import pytest

    path = str(tmp_path / "failswap_idx")
    emb = _emb(spark, sf_dir)
    idx = AnnIndex.train(spark, emb, path, k=4)
    before = idx.topk(QUERIES, k=5, nprobe=4).collect()

    real_rename = os.rename
    calls = {"n": 0}

    def failing_rename(src, dst):
        calls["n"] += 1
        if calls["n"] == 2:  # the tmp -> path swap
            raise OSError("simulated swap failure")
        return real_rename(src, dst)

    monkeypatch.setattr(os, "rename", failing_rename)
    with pytest.raises(OSError, match="simulated swap failure"):
        idx.compact()
    monkeypatch.undo()
    # original restored, staged sibling gone
    sibs = [d for d in os.listdir(tmp_path) if d.startswith("failswap_idx")]
    assert sibs == ["failswap_idx"]
    after = AnnIndex.load(spark, path).topk(QUERIES, k=5, nprobe=4).collect()
    assert sorted(map(tuple, after)) == sorted(map(tuple, before)) and after


def test_compact_pointer_strategy_flips_generation(spark, sf_dir, tmp_path):
    """The catalog-pointer publish (the remote-filesystem maintenance
    path, exercised on a local root): compaction writes a gen-* child,
    flips _ann_current, reclaims the superseded root layout — and
    search results are identical through a RELOADED handle."""
    from pyspark.sql import functions as F

    path = str(tmp_path / "ptr_idx")
    emb = _emb(spark, sf_dir)
    idx = AnnIndex.train(spark, emb, path, k=4)
    idx.append(
        emb.filter(F.col("vec_id") % 20 == 7).withColumn(
            "vec_id", F.col("vec_id") + F.lit(7_000_000)
        )
    )
    before = idx.topk(QUERIES, k=5, nprobe=4).collect()
    idx.compact(strategy="pointer")
    entries = sorted(os.listdir(path))
    gens = [d for d in entries if d.startswith("gen-")]
    assert len(gens) == 1 and "_ann_current" in entries
    # superseded root layout reclaimed (no coarse_id= dirs, no stale
    # root sidecar left behind)
    assert not [d for d in entries if d.startswith("coarse_id=")]
    assert "_ann_params" not in entries
    reloaded = AnnIndex.load(spark, path)
    assert reloaded.data_root == os.path.join(path, gens[0])
    after = reloaded.topk(QUERIES, k=5, nprobe=4).collect()
    assert sorted(map(tuple, after)) == sorted(map(tuple, before)) and after
    # a second pointer-mode pass reclaims the first generation
    reloaded.compact(strategy="pointer")
    gens2 = [d for d in os.listdir(path) if d.startswith("gen-")]
    assert len(gens2) == 1 and gens2 != gens
    again = AnnIndex.load(spark, path).topk(QUERIES, k=5, nprobe=4).collect()
    assert sorted(map(tuple, again)) == sorted(map(tuple, before))


def test_pointer_publish_is_fenced_and_versioned(spark, sf_dir, tmp_path):
    """r16: the local pointer flip rides the shared versioned commit
    protocol (`operators/indexcommit.py`) — the versioned commit wins
    over a stale legacy `_ann_current` mirror, and a publish based on
    a stale fence raises AnnCommitConflict instead of silently
    replacing the winner's generation."""
    import pytest

    from apachebeamkmeans_spark.ann import AnnCommitConflict
    from apachebeamkmeans_spark.operators import indexcommit as IC

    path = str(tmp_path / "fenced_ptr")
    emb = _emb(spark, sf_dir)
    idx = AnnIndex.train(spark, emb, path, k=4)
    before = idx.topk(QUERIES, k=5, nprobe=4).collect()
    idx.compact(strategy="pointer")
    commit, fence = IC.read_commit(path)
    gen = commit["gen"]
    assert os.path.isdir(os.path.join(path, gen))
    # the versioned commit is the source of truth: corrupt the legacy
    # mirror and the index still resolves the committed generation
    mirror = os.path.join(path, "_ann_current")
    for f in os.listdir(mirror):
        if f.startswith("part-"):
            with open(os.path.join(mirror, f), "w") as fh:
                fh.write("gen-stale-mirror\n")
    reloaded = AnnIndex.load(spark, path)
    assert reloaded.data_root == os.path.join(path, gen)
    after = reloaded.topk(QUERIES, k=5, nprobe=4).collect()
    assert sorted(map(tuple, after)) == sorted(map(tuple, before))
    # lost-update fence: a competing writer publishes first; the
    # stale-fence publish must conflict and leave the winner current
    IC.write_commit(path, {"gen": gen}, expect=fence,
                    conflict_cls=AnnCommitConflict)
    with pytest.raises(AnnCommitConflict):
        IC.write_commit(path, {"gen": "gen-loser"}, expect=fence,
                        conflict_cls=AnnCommitConflict)
    assert IC.read_commit(path)[0] == {"gen": gen}


def test_retrain_equals_fresh_train_on_union(spark, sf_dir, tmp_path):
    """retrain(): after appends, the rebuilt index must serve exactly
    what a from-scratch train over the union corpus serves — same
    retrained centers (the stored vectors ARE the normalized corpus),
    same layout, same search results — and the handle serves the new
    quantizer immediately."""
    from pyspark.sql import functions as F

    emb = _emb(spark, sf_dir)
    batch = emb.filter(F.col("vec_id") % 20 == 9).withColumn(
        "vec_id", F.col("vec_id") + F.lit(9_000_000)
    )
    path = str(tmp_path / "retrain_idx")
    idx = AnnIndex.train(spark, emb, path, k=4)
    idx.append(batch)
    old_centers = [list(c) for c in idx.centers]
    idx.retrain(k=6)
    assert len(idx.centers) == 6 and idx.centers != old_centers

    fresh_path = str(tmp_path / "fresh_idx")
    fresh = AnnIndex.train(
        spark, emb.unionByName(batch), fresh_path, k=6
    )
    assert idx.centers == fresh.centers
    got = sorted(map(tuple, idx.topk(QUERIES, k=5, nprobe=3).collect()))
    want = sorted(map(tuple, fresh.topk(QUERIES, k=5, nprobe=3).collect()))
    assert got == want and got
    # the sidecar survived the swap: a fresh session load serves the
    # retrained quantizer
    assert AnnIndex.load(spark, path).centers == fresh.centers


def test_retrain_pq_tier_retrains_codebooks(spark, sf_dir, tmp_path):
    """retrain() on the v2 tier retrains BOTH quantizers over the grown
    corpus and equals a fresh PQ train on the union."""
    from pyspark.sql import functions as F

    emb = _emb(spark, sf_dir)
    batch = emb.filter(F.col("vec_id") % 20 == 13).withColumn(
        "vec_id", F.col("vec_id") + F.lit(13_000_000)
    )
    path = str(tmp_path / "retrain_pq_idx")
    idx = AnnIndex.train(spark, emb, path, k=4, pq_m=8, pq_ksub=16)
    idx.append(batch)
    idx.retrain(k=4)
    fresh = AnnIndex.train(
        spark, emb.unionByName(batch), str(tmp_path / "fresh_pq_idx"),
        k=4, pq_m=8, pq_ksub=16,
    )
    assert idx.centers == fresh.centers
    assert idx.codebooks == fresh.codebooks
    got = sorted(map(tuple,
                     idx.topk(QUERIES, k=5, nprobe=3, refine=30).collect()))
    want = sorted(map(tuple,
                      fresh.topk(QUERIES, k=5, nprobe=3, refine=30).collect()))
    assert got == want and got


def test_retrain_default_k_uses_sqrt_rule_on_grown_corpus(
    spark, sf_dir, tmp_path
):
    from pyspark.sql import functions as F

    from apachebeamkmeans_spark.operators.ann_train import knn_cells

    emb = _emb(spark, sf_dir)
    path = str(tmp_path / "retrain_sqrt_idx")
    idx = AnnIndex.train(spark, emb, path, k=4)
    idx.append(
        emb.filter(F.col("vec_id") % 4 == 1).withColumn(
            "vec_id", F.col("vec_id") + F.lit(4_000_000)
        )
    )
    n = (
        spark.read.schema(SIM.INDEX_SCHEMA).parquet(path).count()
    )
    idx.retrain()
    assert idx.n_cells == knn_cells(n)


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


# ------------------------------- metadata columns + filtered search (r13)


def test_meta_index_filtered_topk_matches_inline(spark, sf_dir, tmp_path):
    """A label-carrying index searched with `where="label = ..."` must
    equal the inline IVF search over the PRE-FILTERED corpus (filter-
    then-rank semantics), and an unfiltered search must be unaffected
    by the extra column."""
    from pyspark.sql import functions as F

    path = str(tmp_path / "meta_idx")
    emb = _emb(spark, sf_dir)
    idx = AnnIndex.train(spark, emb, path, k=4, meta_cols=("label",))
    assert idx.meta == [("label", "int")]

    vecs = ANN.l2_normalize(
        emb.selectExpr(
            "vec_id AS id", "CAST(embedding AS array<double>) AS features",
            "label",
        ),
        carry=("label",),
    )
    got = sorted(map(tuple, idx.topk(
        QUERIES, k=5, nprobe=2, where="label = 1"
    ).collect()))
    want = sorted(map(tuple, SIM.ivf_topk(
        vecs.filter(F.col("label") == 1), NQUERIES, idx.centers,
        k=5, nprobe=2,
    ).collect()))
    assert got == want and got
    # unfiltered search on a meta index == search on a meta-less twin
    plain = AnnIndex.train(spark, emb, str(tmp_path / "plain_idx"), k=4)
    assert sorted(map(tuple, idx.topk(QUERIES, k=5, nprobe=2).collect())) \
        == sorted(map(tuple, plain.topk(QUERIES, k=5, nprobe=2).collect()))


def test_meta_index_filtered_pq_tier(spark, sf_dir, tmp_path):
    """Filtered search on the v2 tier: the predicate reaches both the
    codes scan and the refine fetch; results equal the inline IVF-PQ
    over the pre-filtered corpus."""
    from pyspark.sql import functions as F

    path = str(tmp_path / "meta_pq_idx")
    emb = _emb(spark, sf_dir)
    idx = AnnIndex.train(
        spark, emb, path, k=4, pq_m=8, pq_ksub=16, meta_cols=("label",)
    )
    vecs = ANN.l2_normalize(
        emb.selectExpr(
            "vec_id AS id", "CAST(embedding AS array<double>) AS features",
            "label",
        ),
        carry=("label",),
    )
    got = sorted(map(tuple, idx.topk(
        QUERIES, k=5, nprobe=3, refine=30, where="label = 2"
    ).collect()))
    want = sorted(map(tuple, SIM.ivfpq_topk(
        vecs.filter(F.col("label") == 2), NQUERIES, idx.centers,
        idx.codebooks, k=5, nprobe=3, refine=30,
    ).collect()))
    assert got == want and got


def test_meta_index_filtered_topk_table(spark, sf_dir, tmp_path):
    """`where` on the batch path (topk_table) — same filter-then-rank
    contract as the literal path."""
    from pyspark.sql import functions as F

    path = str(tmp_path / "meta_batch_idx")
    emb = _emb(spark, sf_dir)
    idx = AnnIndex.train(spark, emb, path, k=4, meta_cols=("label",))
    qtab = emb.filter(F.col("vec_id") % 100 == 17).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qvec")
    )
    got = sorted(map(tuple, idx.topk_table(
        qtab, k=5, nprobe=2, where="label >= 2"
    ).collect()))
    vecs = ANN.l2_normalize(
        emb.selectExpr(
            "vec_id AS id", "CAST(embedding AS array<double>) AS features",
            "label",
        ),
        carry=("label",),
    ).filter(F.col("label") >= 2)
    index = SIM.coarse_assign(vecs, idx.centers, carry=("label",))
    want = sorted(map(tuple, SIM.ivf_batch_topk(
        index, qtab, idx.centers, k=5, nprobe=2
    ).collect()))
    assert got == want and got


def test_meta_survives_append_load_and_maintenance(spark, sf_dir, tmp_path):
    """meta columns ride through the whole lifecycle: append (with the
    same meta), reload (sidecar carries the meta schema), compact and
    retrain (carry through the rewrite) — filtered search stays
    correct at every step."""
    from pyspark.sql import functions as F

    path = str(tmp_path / "meta_life_idx")
    emb = _emb(spark, sf_dir)
    idx = AnnIndex.train(spark, emb, path, k=4, meta_cols=("label",))
    idx.append(
        emb.filter(F.col("vec_id") % 20 == 15).withColumn(
            "vec_id", F.col("vec_id") + F.lit(15_000_000)
        )
    )
    loaded = AnnIndex.load(spark, path)
    assert loaded.meta == [("label", "int")]
    before = loaded.topk(QUERIES, k=5, nprobe=4, where="label = 0").collect()
    assert before
    loaded.compact()
    mid = loaded.topk(QUERIES, k=5, nprobe=4, where="label = 0").collect()
    assert sorted(map(tuple, mid)) == sorted(map(tuple, before))
    loaded.retrain(k=4)
    reloaded = AnnIndex.load(spark, path)
    assert reloaded.meta == [("label", "int")]
    # post-retrain filtered results equal a fresh meta train on the
    # union (centers retrained over the grown corpus)
    batch = emb.filter(F.col("vec_id") % 20 == 15).withColumn(
        "vec_id", F.col("vec_id") + F.lit(15_000_000)
    )
    fresh = AnnIndex.train(
        spark, emb.unionByName(batch), str(tmp_path / "meta_fresh_idx"),
        k=4, meta_cols=("label",),
    )
    got = sorted(map(tuple, reloaded.topk(
        QUERIES, k=5, nprobe=4, where="label = 0"
    ).collect()))
    want = sorted(map(tuple, fresh.topk(
        QUERIES, k=5, nprobe=4, where="label = 0"
    ).collect()))
    assert got == want and got


def test_meta_cols_reject_reserved_names(spark, sf_dir, tmp_path):
    import pytest

    emb = _emb(spark, sf_dir).withColumn("codes", _F_lit0())
    with pytest.raises(ValueError, match="collide"):
        AnnIndex.train(
            spark, emb, str(tmp_path / "bad_idx"), k=4, meta_cols=("codes",)
        )


def _F_lit0():
    from pyspark.sql import functions as F

    return F.lit(0)


# ----------------------------------------------- delete verb (r13)


def test_delete_removes_rows_and_preserves_untouched_cells(
    spark, sf_dir, tmp_path
):
    """delete(): matching rows gone, survivors intact, search equals a
    fresh index built from the filtered corpus, and cell directories
    with no matching rows keep their files byte-identical (the
    partition-scoped rewrite contract)."""
    from pyspark.sql import functions as F

    path = str(tmp_path / "del_idx")
    emb = _emb(spark, sf_dir)
    idx = AnnIndex.train(spark, emb, path, k=4)
    n_before = spark.read.schema(SIM.INDEX_SCHEMA).parquet(path).count()

    # snapshot per-cell file listings before the delete
    def cell_files():
        out = {}
        for d in os.listdir(path):
            if d.startswith("coarse_id="):
                full = os.path.join(path, d)
                out[d] = sorted(
                    (f, os.path.getmtime(os.path.join(full, f)))
                    for f in os.listdir(full) if f.endswith(".parquet")
                )
        return out

    before_files = cell_files()
    # which cells contain the to-be-deleted ids?
    hit_cells = {
        r["coarse_id"]
        for r in spark.read.schema(SIM.INDEX_SCHEMA).parquet(path)
        .filter("vec_id % 10 = 4").select("coarse_id").distinct().collect()
    }
    assert hit_cells and len(hit_cells) <= 4

    n_del = idx.delete("vec_id % 10 = 4")
    rest = spark.read.schema(SIM.INDEX_SCHEMA).parquet(path)
    assert n_del > 0
    assert rest.count() == n_before - n_del
    assert rest.filter("vec_id % 10 = 4").count() == 0

    after_files = cell_files()
    for d, files in before_files.items():
        cell = int(d.split("=")[1])
        if cell not in hit_cells:
            assert after_files[d] == files, f"untouched cell {d} rewritten"

    # search equality vs a fresh index over the filtered corpus under
    # the SAME centers
    fresh = str(tmp_path / "del_fresh_idx")
    vecs = ANN.l2_normalize(
        emb.filter(~(F.col("vec_id") % 10 == 4)).selectExpr(
            "vec_id AS id", "CAST(embedding AS array<double>) AS features"
        )
    )
    SIM.build_ivf_index(vecs, idx.centers, fresh)
    got = sorted(map(tuple, idx.topk(QUERIES, k=5, nprobe=4).collect()))
    want = sorted(map(tuple, SIM.ivf_topk_indexed(
        spark, fresh, NQUERIES, idx.centers, k=5, nprobe=4
    ).collect()))
    assert got == want and got


def test_delete_empties_whole_cell(spark, sf_dir, tmp_path):
    """Deleting every row of a cell must remove its directory (dynamic
    overwrite can't write an empty partition), and searches keep
    working with the emptied cell simply absent."""
    path = str(tmp_path / "del_cell_idx")
    emb = _emb(spark, sf_dir)
    idx = AnnIndex.train(spark, emb, path, k=4)
    layout = spark.read.schema(SIM.INDEX_SCHEMA).parquet(path)
    target = layout.groupBy("coarse_id").count().orderBy("count").first()
    n_del = idx.delete(f"coarse_id = {target['coarse_id']}")
    assert n_del == target["count"]
    assert f"coarse_id={target['coarse_id']}" not in os.listdir(path)
    assert idx.topk(QUERIES, k=3, nprobe=4).count() > 0


def test_delete_is_idempotent_and_zero_match_is_noop(
    spark, sf_dir, tmp_path
):
    path = str(tmp_path / "del_idem_idx")
    emb = _emb(spark, sf_dir)
    idx = AnnIndex.train(spark, emb, path, k=4)
    assert idx.delete("vec_id = -1") == 0  # no match: no-op
    first = idx.delete("vec_id % 7 = 2")
    assert first > 0
    assert idx.delete("vec_id % 7 = 2") == 0  # re-run deletes nothing


def test_delete_by_metadata_on_pq_tier(spark, sf_dir, tmp_path):
    """delete() by a metadata predicate on the v2 tier: codes column
    survives the partition rewrite, filtered rows gone, PQ search
    equals a fresh PQ index over the filtered corpus."""
    from pyspark.sql import functions as F

    path = str(tmp_path / "del_pq_idx")
    emb = _emb(spark, sf_dir)
    idx = AnnIndex.train(
        spark, emb, path, k=4, pq_m=8, pq_ksub=16, meta_cols=("label",)
    )
    n_del = idx.delete("label = 5")
    assert n_del == emb.filter(F.col("label") == 5).count()
    got = sorted(map(tuple,
                     idx.topk(QUERIES, k=5, nprobe=4, refine=30).collect()))
    vecs = ANN.l2_normalize(
        emb.filter(F.col("label") != 5).selectExpr(
            "vec_id AS id", "CAST(embedding AS array<double>) AS features"
        )
    )
    want = sorted(map(tuple, SIM.ivfpq_topk(
        vecs, NQUERIES, idx.centers, idx.codebooks,
        k=5, nprobe=4, refine=30,
    ).collect()))
    assert got == want and got


def test_pointer_generation_retention_window(spark, sf_dir, tmp_path):
    """retain=1 keeps the just-superseded generation as a reader grace
    window (snapshot-retention convention): the first flip keeps the
    root layout, the second keeps exactly one prior generation and
    reclaims the root, the third slides the window."""
    from pyspark.sql import functions as F

    path = str(tmp_path / "retain_idx")
    emb = _emb(spark, sf_dir)
    idx = AnnIndex.train(spark, emb, path, k=4)

    def gens():
        return sorted(d for d in os.listdir(path) if d.startswith("gen-"))

    def root_parts():
        return [d for d in os.listdir(path) if d.startswith("coarse_id=")]

    idx.compact(strategy="pointer", retain=1)
    g1 = gens()
    assert len(g1) == 1 and root_parts(), "root layout is the grace gen"
    idx.compact(strategy="pointer", retain=1)
    g2 = gens()
    assert len(g2) == 2 and not root_parts(), "window slid past the root"
    assert g1[0] in g2
    idx.compact(strategy="pointer", retain=1)
    g3 = gens()
    assert len(g3) == 2 and g1[0] not in g3, "oldest gen reclaimed"
    # the served generation is always the pointer's target
    served = AnnIndex.load(spark, path)
    assert os.path.basename(served.data_root) in g3
    assert served.topk(QUERIES, k=3, nprobe=4).count() > 0


def test_upsert_replaces_rows_and_moves_cells(spark, sf_dir, tmp_path):
    """upsert(): rows with batch ids are REPLACED (the new vector's
    row lands in whatever cell the new embedding quantizes to), new
    ids append, and the result equals a fresh index over
    (corpus \\ ids) ∪ batch under the same centers."""
    from pyspark.sql import functions as F

    path = str(tmp_path / "upsert_idx")
    emb = _emb(spark, sf_dir)
    idx = AnnIndex.train(spark, emb, path, k=4)
    n0 = spark.read.schema(SIM.INDEX_SCHEMA).parquet(path).count()

    # update: existing ids (%20==7) get REVERSED embeddings (direction
    # change -> possibly a different cell); plus two brand-new ids
    updates = emb.filter(F.col("vec_id") % 20 == 7).select(
        "vec_id", F.reverse(F.col("embedding")).alias("embedding")
    )
    news = emb.filter(F.col("vec_id") % 100 == 11).select(
        (F.col("vec_id") + F.lit(77_000_000)).alias("vec_id"), "embedding"
    )
    batch = updates.unionByName(news)
    n_upd = updates.count()
    n_new = news.count()

    replaced = idx.upsert(batch)
    assert replaced == n_upd
    layout = spark.read.schema(SIM.INDEX_SCHEMA).parquet(path)
    assert layout.count() == n0 + n_new  # replaced in place, news added
    assert layout.select("vec_id").distinct().count() == n0 + n_new

    fresh_path = str(tmp_path / "upsert_fresh")
    target = emb.filter(~(F.col("vec_id") % 20 == 7)).select(
        "vec_id", "embedding"
    ).unionByName(batch)
    vecs = ANN.l2_normalize(
        target.selectExpr(
            "vec_id AS id", "CAST(embedding AS array<double>) AS features"
        )
    )
    SIM.build_ivf_index(vecs, idx.centers, fresh_path)
    got = sorted(map(tuple, idx.topk(QUERIES, k=5, nprobe=4).collect()))
    want = sorted(map(tuple, SIM.ivf_topk_indexed(
        spark, fresh_path, NQUERIES, idx.centers, k=5, nprobe=4
    ).collect()))
    assert got == want and got
    # idempotent: re-upserting the same batch replaces the batch itself
    assert idx.upsert(batch) == batch.count()
    layout2 = spark.read.schema(SIM.INDEX_SCHEMA).parquet(path)
    assert layout2.count() == n0 + n_new


def test_upsert_all_new_ids_is_pure_append(spark, sf_dir, tmp_path):
    from pyspark.sql import functions as F

    path = str(tmp_path / "upsert_new_idx")
    emb = _emb(spark, sf_dir)
    idx = AnnIndex.train(spark, emb, path, k=4)
    n0 = spark.read.schema(SIM.INDEX_SCHEMA).parquet(path).count()
    batch = emb.limit(7).select(
        (F.col("vec_id") + F.lit(88_000_000)).alias("vec_id"), "embedding"
    )
    assert idx.upsert(batch) == 0
    assert spark.read.schema(SIM.INDEX_SCHEMA).parquet(path).count() == n0 + 7


def test_tombstone_delete_serves_like_rewrite(spark, sf_dir, tmp_path):
    """r16 vector tombstone tier: delete(mode='tombstone') removes no
    cell files (mtimes identical) yet serving — literal topk, batch
    topk_table, filtered search, cell_stats — equals an index whose
    rows were physically deleted; re-deleting tombstoned rows is a
    no-op in both modes."""
    from pyspark.sql import functions as F

    emb = _emb(spark, sf_dir)
    p1 = str(tmp_path / "ts_idx")
    p2 = str(tmp_path / "ts_twin")
    idx = AnnIndex.train(spark, emb, p1, k=4)
    twin = AnnIndex.train(spark, emb, p2, k=4)

    def _mtimes(root):
        out = {}
        for r, _d, fs in os.walk(root):
            if "_ann_tombstones" in r or "_commits" in r:
                continue
            for f in fs:
                if f.startswith("_segments") or f.endswith(".json"):
                    continue
                p = os.path.join(r, f)
                out[p] = os.path.getmtime(p)
        return out

    before = _mtimes(p1)
    n = idx.delete("vec_id % 10 = 4", mode="tombstone")
    assert n > 0
    assert _mtimes(p1) == before  # zero cell rewrites
    assert twin.delete("vec_id % 10 = 4") == n  # physical twin
    got = sorted(map(tuple, idx.topk(QUERIES, k=5, nprobe=4).collect()))
    want = sorted(map(tuple, twin.topk(QUERIES, k=5, nprobe=4).collect()))
    assert got == want and got
    qtab = emb.filter(F.col("vec_id") % 50 == 3).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qvec")
    )
    got_t = sorted(map(tuple, idx.topk_table(qtab, k=5, nprobe=4).collect()))
    want_t = sorted(map(tuple, twin.topk_table(qtab, k=5, nprobe=4).collect()))
    assert got_t == want_t and got_t
    got_s = sorted(map(tuple, idx.cell_stats().collect()))
    want_s = sorted(map(tuple, twin.cell_stats().collect()))
    assert got_s == want_s
    # idempotence across modes
    assert idx.delete("vec_id % 10 = 4", mode="tombstone") == 0
    assert idx.delete("vec_id % 10 = 4") == 0


def test_tombstone_upsert_resurrects_and_compact_applies(
    spark, sf_dir, tmp_path,
):
    """Upserting a tombstoned id clears its tombstone (the new row
    serves); compact applies the remaining tombstones physically and
    clears the sidecar; serving is identical before and after."""
    from pyspark.sql import functions as F

    emb = _emb(spark, sf_dir)
    path = str(tmp_path / "ts_life")
    idx = AnnIndex.train(spark, emb, path, k=4)
    victims = [r["vec_id"] for r in emb.select("vec_id")
               .orderBy("vec_id").limit(2).collect()]
    assert idx.delete(f"vec_id IN ({victims[0]}, {victims[1]})",
                      mode="tombstone") == 2
    # resurrect victim 0 with a reversed vector
    batch = emb.filter(F.col("vec_id") == victims[0]).select(
        "vec_id", F.reverse("embedding").alias("embedding")
    )
    assert idx.upsert(batch) >= 1
    ids_served = {
        r["vec_id"] for r in idx.topk(QUERIES, k=500, nprobe=4).collect()
    }
    assert victims[0] in ids_served and victims[1] not in ids_served
    before = sorted(map(tuple, idx.topk(QUERIES, k=5, nprobe=4).collect()))
    idx.compact()
    assert idx._ts_names() == []  # sidecar cleared by the publish
    layout_ids = {
        r["vec_id"] for r in idx._layout().select("vec_id").collect()
    }
    assert victims[1] not in layout_ids  # applied physically
    reloaded = AnnIndex.load(spark, path)
    after = sorted(map(tuple,
                       reloaded.topk(QUERIES, k=5, nprobe=4).collect()))
    assert after == before


def test_mirror_failure_does_not_destroy_committed_generation(
    spark, sf_dir, tmp_path, monkeypatch,
):
    """r17 (ADVICE r16 high): once the versioned commit lands, the
    legacy `_ann_current` mirror write is advisory — its failure must
    neither unwind the publish nor delete the generation dir the
    commit references. Pre-fix, the except handler _fs_delete'd the
    committed generation, leaving every later load resolving to a
    missing directory."""
    from pyspark.sql.readwriter import DataFrameWriter

    emb = _emb(spark, sf_dir)
    path = str(tmp_path / "mirror_fail")
    idx = AnnIndex.train(spark, emb, path, k=4)
    want = sorted(map(tuple, idx.topk(QUERIES, k=5, nprobe=4).collect()))

    pointer = os.path.join(path, AnnIndex._POINTER)
    fired = []
    real_text = DataFrameWriter.text

    def failing_text(self, p, *a, **kw):
        if os.path.abspath(str(p)) == os.path.abspath(pointer):
            fired.append(p)
            raise RuntimeError("injected mirror-write failure")
        return real_text(self, p, *a, **kw)

    monkeypatch.setattr(DataFrameWriter, "text", failing_text)
    idx.compact(strategy="pointer")  # must NOT raise
    assert fired  # the injected failure actually hit the mirror write
    monkeypatch.setattr(DataFrameWriter, "text", real_text)

    reloaded = AnnIndex.load(spark, path)
    got = sorted(map(tuple, reloaded.topk(QUERIES, k=5, nprobe=4).collect()))
    assert got == want and got


def test_upsert_conflict_leaves_id_deleted_not_resurrected(
    spark, sf_dir, tmp_path, monkeypatch,
):
    """r17 (ADVICE r16 medium): the tombstone-clearing commit now
    publishes AFTER the physical replace+append. A failure at that
    commit leaves the id logically DELETED (new row hidden behind the
    still-active tombstone) — never the old pre-delete row serving —
    and the never-committed survivor sidecar is unlinked, not
    orphaned. Re-running the upsert completes the resurrection."""
    import pytest
    from pyspark.sql import functions as F

    from apachebeamkmeans_spark import ann as ann_mod
    from apachebeamkmeans_spark.ann import AnnCommitConflict
    from apachebeamkmeans_spark.operators import indexcommit as IC

    emb = _emb(spark, sf_dir)
    path = str(tmp_path / "upsert_conflict")
    idx = AnnIndex.train(spark, emb, path, k=4)
    victims = [r["vec_id"] for r in emb.select("vec_id")
               .orderBy("vec_id").limit(2).collect()]
    assert idx.delete(f"vec_id IN ({victims[0]}, {victims[1]})",
                      mode="tombstone") == 2
    committed_sidecars = set(idx._ts_names())

    batch = emb.filter(F.col("vec_id") == victims[0]).select(
        "vec_id", F.reverse("embedding").alias("embedding")
    )

    real_write = IC.write_commit

    def conflicting_write(*a, **kw):
        raise kw.get("conflict_cls", AnnCommitConflict)(
            "injected commit conflict"
        )

    monkeypatch.setattr(ann_mod.IC, "write_commit", conflicting_write)
    with pytest.raises(AnnCommitConflict):
        idx.upsert(batch)
    monkeypatch.setattr(ann_mod.IC, "write_commit", real_write)

    # still logically deleted: neither stale nor new row serves
    served = {r["vec_id"]
              for r in idx.topk(QUERIES, k=500, nprobe=4).collect()}
    assert victims[0] not in served and victims[1] not in served
    # the losing survivor sidecar was unlinked, not orphaned
    ts_root = os.path.join(path, AnnIndex._TOMBSTONES)
    on_disk = {d for d in os.listdir(ts_root)
               if d.startswith("ts-")} if os.path.isdir(ts_root) else set()
    assert on_disk == committed_sidecars

    # re-run completes: id 0 resurrects with the NEW vector, id 1 stays dead
    idx.upsert(batch)
    served = {r["vec_id"]
              for r in idx.topk(QUERIES, k=500, nprobe=4).collect()}
    assert victims[0] in served and victims[1] not in served


def test_delete_count_modes_agree_with_duplicate_rows(
    spark, sf_dir, tmp_path,
):
    """r17 (ADVICE r16 low): delete() reports DISTINCT vec_ids in both
    modes, so an index carrying duplicate vec_id rows gives the same
    total for the same predicate whichever tier runs — while the
    rewrite still drops every physical row."""
    from pyspark.sql import functions as F

    emb = _emb(spark, sf_dir)
    dup = emb.filter(F.col("vec_id") % 10 == 7)
    n_ids = dup.select("vec_id").distinct().count()
    assert n_ids > 0
    twins = []
    for nm in ("dupcount_a", "dupcount_b"):
        idx = AnnIndex.train(spark, emb, str(tmp_path / nm), k=4)
        idx.append(dup)  # duplicate rows for every matching id
        twins.append(idx)
    n_rw = twins[0].delete("vec_id % 10 = 7")
    n_ts = twins[1].delete("vec_id % 10 = 7", mode="tombstone")
    assert n_rw == n_ts == n_ids
    # the rewrite removed BOTH physical copies
    left = twins[0]._layout().filter(F.col("vec_id") % 10 == 7).count()
    assert left == 0


def test_compact_sweeps_aged_orphan_ts_dir(spark, sf_dir, tmp_path):
    """r17 (ADVICE r16 low): compact reaps aged ts-* sidecar dirs that
    no commit references (crashed or race-lost writers), while
    committed sidecars are applied+cleared by the publish as before."""
    import time

    emb = _emb(spark, sf_dir)
    path = str(tmp_path / "ts_sweep")
    idx = AnnIndex.train(spark, emb, path, k=4)
    assert idx.delete("vec_id % 10 = 1", mode="tombstone") > 0

    orphan = os.path.join(path, AnnIndex._TOMBSTONES, "ts-deadbeef0000")
    os.makedirs(orphan)
    with open(os.path.join(orphan, "part-orphan.parquet"), "w") as f:
        f.write("junk")
    old = time.time() - 7200
    os.utime(os.path.join(orphan, "part-orphan.parquet"), (old, old))
    os.utime(orphan, (old, old))

    idx.compact()
    assert not os.path.isdir(orphan)  # aged orphan reaped
    assert idx._ts_names() == []  # committed tombstones applied+cleared


def test_ann_compact_on_pressure(spark, sf_dir, tmp_path):
    """r17: the vector twin of the text index's tombstone-pressure
    trigger — sidecar-count / dead-row / dead-fraction dimensions
    read the counted commit entries; tripping compacts (tombstones
    applied + cleared), serving bit-identical; under threshold it's a
    no-op. Pre-r17 bare-name entries still count as sidecars."""
    from pyspark.sql import functions as F

    from apachebeamkmeans_spark.operators import indexcommit as IC

    emb = _emb(spark, sf_dir)
    path = str(tmp_path / "ann_press")
    idx = AnnIndex.train(spark, emb, path, k=4)
    for r in (1, 2, 3):  # one sidecar per delete
        assert idx.delete(f"vec_id % 50 = {r}", mode="tombstone") > 0
    entries = idx._ts_entries()
    assert len(entries) == 3 and all(e["n"] > 0 for e in entries)
    dead = sum(e["n"] for e in entries)
    before = sorted(map(tuple, idx.topk(QUERIES, k=5, nprobe=4).collect()))
    # under every threshold: no-op
    assert idx.compact_on_pressure(
        tombstone_sidecars=5, tombstone_rows=dead,
        tombstone_frac=0.9,
    ) is None
    assert len(idx._ts_entries()) == 3
    # sidecar dimension trips
    assert idx.compact_on_pressure(
        tombstone_sidecars=2) == "tombstone_sidecars"
    assert idx._ts_entries() == []
    after = sorted(map(tuple, idx.topk(QUERIES, k=5, nprobe=4).collect()))
    assert after == before and before
    # dead-row / fraction dimensions on a fresh delete
    assert idx.delete("vec_id % 50 = 4", mode="tombstone") > 0
    n_new = idx._ts_entries()[0]["n"]
    assert idx.compact_on_pressure(tombstone_rows=n_new) is None
    assert idx.compact_on_pressure(
        tombstone_rows=n_new - 1) == "tombstone_rows"
    assert idx.delete("vec_id % 50 = 5", mode="tombstone") > 0
    assert idx.compact_on_pressure(tombstone_frac=0.9) is None
    assert idx.compact_on_pressure(
        tombstone_frac=0.001) == "tombstone_frac"
    assert idx._ts_entries() == []
    # legacy bare-name entry: counts as a sidecar, 0 dead rows
    local = path
    commit, fence = IC.read_commit(local, missing_ok=True)
    commit = dict(commit or {})
    commit["tombstones"] = ["ts-legacyname000"]
    IC.write_commit(local, commit, expect=fence)
    assert idx._ts_entries() == [{"file": "ts-legacyname000", "n": 0}]
    assert idx.compact_pressure(tombstone_rows=0) is None
    assert idx.compact_pressure(
        tombstone_sidecars=0) == "tombstone_sidecars"
