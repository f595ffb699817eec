"""Persisted BM25 serving index (r14): build/serve equivalence with
the live scorer, partition pruning, and the nDCG eval's determinism
contract."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from apachebeamkmeans_spark.operators import textindex as TI
from apachebeamkmeans_spark.operators import textstats as TX

DOCS = [
    (1, "spark join the hash table fast"),
    (2, "slow scan of the big table"),
    (3, "hash hash hash join"),
    (4, "stream window agg"),
    (5, "the the the"),
]
QUERIES = [["hash", "join"], ["table", "scan"], ["stream"]]


def _docs(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


def test_indexed_equals_live_bm25(spark, tmp_path):
    """The serve path must reproduce the live scorer bit-for-bit:
    same (qid, doc_id) set, same rounded scores, same ranks."""
    docs = _docs(spark)
    idx = str(tmp_path / "bm25idx")
    TI.bm25_index_build(docs, idx)
    live = {
        (r["qid"], r["doc_id"]): (r["bm25"], r["rank"])
        for r in TX.bm25_topk(docs, QUERIES, k=10).collect()
    }
    served = {
        (r["qid"], r["doc_id"]): (r["bm25"], r["rank"])
        for r in TI.bm25_indexed_topk(spark, idx, QUERIES, k=10).collect()
    }
    assert served == live and len(live) > 0


def test_indexed_topk_partition_pruned(spark, tmp_path):
    """The serve plan reads only the tbuckets of the query terms
    (PartitionFilters) with the term equality pushed into the scan,
    and never touches the corpus (no tokenize regex, no explode)."""
    docs = _docs(spark)
    idx = str(tmp_path / "bm25idx")
    TI.bm25_index_build(docs, idx)
    res = TI.bm25_indexed_topk(spark, idx, [["hash"]], k=5)
    plan = res._sc._jvm.PythonSQLUtils.explainString(
        res._jdf.queryExecution(), "formatted"
    )
    after = plan.split("PartitionFilters", 1)
    assert len(after) == 2 and "tbucket" in after[1][:200]
    # segment pruning: only COMMITTED segments are scanned (the seg
    # isin filter reaches the scan as a partition filter too)
    assert "seg" in "".join(plan.split("PartitionFilters")[1:])
    # no corpus tokenize in the serve plan: the only scan is the
    # postings layout (the createDataFrame corpus would surface as a
    # LocalTableScan and its tokenize as split/lower expressions)
    assert "LocalTableScan" not in plan
    assert "split(" not in plan and "lower(" not in plan
    assert "BatchEvalPython" not in plan


def test_index_bucket_matches_spark_crc32(spark):
    """zlib.crc32 (serve-time pruning) and F.crc32 (build-time
    partition column) must agree on every term."""
    terms = ["hash", "join", "stream", "the", "zebra"]
    rows = (
        spark.createDataFrame([(t,) for t in terms], "term string")
        .select("term", (F.crc32("term") % TI.BM25_INDEX_BUCKETS).alias("b"))
        .collect()
    )
    for r in rows:
        assert TI.bm25_index_bucket(r["term"]) == r["b"]


def test_ndcg_hand_computed(spark):
    """nDCG on a planted corpus equals the hand computation: query
    ["hash","join"] has relevant docs {1,3}; both rank in the top-k,
    so DCG sums the discounts at their ranks and IDCG the first two."""
    docs = _docs(spark)
    res = {
        r["qid"]: r for r in TX.retrieval_ndcg(docs, QUERIES, k=10).collect()
    }
    hits = {
        (r["qid"], r["doc_id"]): r["rank"]
        for r in TX.bm25_topk(docs, QUERIES, k=10).collect()
    }
    disc = TX.ndcg_discounts(10)
    # query 0: docs 1 and 3 contain both terms
    r0 = res[0]
    assert r0["n_relevant"] == 2
    d = disc[hits[(0, 1)] - 1] + disc[hits[(0, 3)] - 1]
    ideal = disc[0] + disc[1]
    assert abs(r0["dcg"] - round(d, 6)) < 1e-9
    assert abs(r0["idcg"] - round(ideal, 6)) < 1e-9
    assert abs(r0["ndcg"] - round(d / ideal, 6)) < 1e-9
    # recall@k: both relevant docs rank inside the top-k
    assert r0["n_hits"] == 2 and r0["recall"] == 1.0


def test_ndcg_perfect_ranking_is_one(spark):
    """A query whose relevant docs exactly head the ranking scores
    ndcg == 1.0 (query ["stream"]: doc 4 is the only relevant doc and
    must rank first among score>0 docs)."""
    docs = _docs(spark)
    res = {
        r["qid"]: r for r in TX.retrieval_ndcg(docs, QUERIES, k=10).collect()
    }
    assert res[2]["n_relevant"] == 1
    assert res[2]["ndcg"] == 1.0


def test_ndcg_discount_literals():
    disc = TX.ndcg_discounts(3)
    assert disc == [1.0 / math.log2(r + 1) for r in (1, 2, 3)]


def test_filtered_serving_prunes_candidates_global_stats(spark, tmp_path):
    """`where=` on the serve path restricts CANDIDATES while keeping
    GLOBAL corpus stats (Lucene filtered-query semantics): every
    served score equals the unfiltered score for that doc, and the
    ranking is the unfiltered ranking restricted to matching docs."""
    docs = spark.createDataFrame(
        [
            (1, "spark join the hash table fast", "web"),
            (2, "slow scan of the big table", "web"),
            (3, "hash hash hash join", "book"),
            (4, "join hash stream", "book"),
        ],
        "doc_id long, text string, source string",
    )
    idx = str(tmp_path / "bm25idx_meta")
    TI.bm25_index_build(docs, idx, meta_cols=("source",))
    unfiltered = TI.bm25_indexed_topk(spark, idx, [["hash", "join"]], k=10)
    filtered = TI.bm25_indexed_topk(
        spark, idx, [["hash", "join"]], k=10, where="source = 'book'"
    )
    all_scores = {r["doc_id"]: r["bm25"] for r in unfiltered.collect()}
    got = filtered.collect()
    assert {r["doc_id"] for r in got} == {3, 4}
    want = sorted(
        ((all_scores[d], d) for d in (3, 4)), key=lambda p: (-p[0], p[1])
    )
    for rank, (s, d) in enumerate(want, start=1):
        row = [r for r in got if r["doc_id"] == d][0]
        assert row["rank"] == rank and row["bm25"] == s


def test_meta_column_pruned_from_unfiltered_scan(spark, tmp_path):
    """An unfiltered serve must not pay for the denormalized metadata:
    the postings ReadSchema carries no `source` column."""
    docs = spark.createDataFrame(
        [(1, "hash join", "web"), (2, "scan table", "book")],
        "doc_id long, text string, source string",
    )
    idx = str(tmp_path / "bm25idx_meta2")
    TI.bm25_index_build(docs, idx, meta_cols=("source",))
    res = TI.bm25_indexed_topk(spark, idx, [["hash"]], k=5)
    plan = res._sc._jvm.PythonSQLUtils.explainString(
        res._jdf.queryExecution(), "formatted"
    )
    scan = plan.split("ReadSchema", 1)[1].split("\n", 1)[0]
    assert "source" not in scan


def test_stopword_grade_term_serves_exactly(spark, tmp_path):
    """A term present in EVERY doc (corpus-sized posting list) must
    still serve exactly — the pivot/rank path has no posting-length
    assumption — and the sharded build write leaves more than one
    file in a hot term's bucket partition."""
    import glob

    docs = spark.createDataFrame(
        [(i, "the " + ("hash " if i % 2 else "join ") * (1 + i % 3))
         for i in range(40)],
        "doc_id long, text string",
    )
    idx = str(tmp_path / "bm25idx_hot")
    # AQE's small-partition coalescing hides the sharded writers on a
    # toy corpus (it merges the sub-advisory-size shards back into one
    # task); disable it for the build so the file layout shows the
    # at-scale behavior, where shards exceed the advisory size anyway
    coalesce_key = "spark.sql.adaptive.coalescePartitions.enabled"
    prev = spark.conf.get(coalesce_key, "true")
    spark.conf.set(coalesce_key, "false")
    try:
        TI.bm25_index_build(docs, idx)
    finally:
        spark.conf.set(coalesce_key, prev)
    live = sorted(
        map(tuple, TX.bm25_topk(docs, [["the"], ["the", "hash"]], k=50).collect())
    )
    served = sorted(
        map(tuple,
            TI.bm25_indexed_topk(spark, idx, [["the"], ["the", "hash"]],
                                 k=50).collect())
    )
    assert served == live and len(live) > 40
    hot_bucket = TI.bm25_index_bucket("the")
    files = glob.glob(
        f"{idx}/postings/seg=0/tbucket={hot_bucket}/*.parquet"
    )
    assert len(files) > 1  # sharded writers, not one task per bucket


def test_append_equals_rebuild(spark, tmp_path):
    """build(A) + append(B) serves bit-identically to build(A ∪ B):
    n/Σdl/df all sum exactly across segments."""
    a = spark.createDataFrame(DOCS, "doc_id long, text string")
    b = spark.createDataFrame(
        [(10, "merge join fast"), (11, "the stream table scan")],
        "doc_id long, text string",
    )
    grown = str(tmp_path / "grown")
    TI.bm25_index_build(a, grown)
    TI.bm25_index_append(b, grown)
    rebuilt = str(tmp_path / "rebuilt")
    TI.bm25_index_build(a.unionByName(b), rebuilt)
    q = QUERIES + [["merge", "fast"]]
    got = sorted(map(tuple, TI.bm25_indexed_topk(spark, grown, q, k=20).collect()))
    want = sorted(
        map(tuple, TI.bm25_indexed_topk(spark, rebuilt, q, k=20).collect())
    )
    assert got == want and got
    # ...and both equal the live scorer over the union corpus
    live = sorted(
        map(tuple, TX.bm25_topk(a.unionByName(b), q, k=20).collect())
    )
    assert got == live


def test_uncommitted_segment_is_invisible(spark, tmp_path):
    """A crashed append (segment files on disk, commit not swapped)
    must not change serving — the commit file is the read boundary."""
    docs = _docs(spark)
    idx = str(tmp_path / "crashy")
    TI.bm25_index_build(docs, idx)
    before = sorted(
        map(tuple, TI.bm25_indexed_topk(spark, idx, QUERIES, k=10).collect())
    )
    # simulate the crash: write segment 1's data but SKIP the commit
    batch = spark.createDataFrame(
        [(99, "hash join hash join")], "doc_id long, text string"
    )
    commit = TI._bm25_read_commit(idx)
    TI._bm25_write_segment(batch, idx, 1, commit["n_buckets"], (), False)
    after = sorted(
        map(tuple, TI.bm25_indexed_topk(spark, idx, QUERIES, k=10).collect())
    )
    assert after == before
    # the real append commits and the batch becomes visible
    TI.bm25_index_append(
        spark.createDataFrame([(100, "stream stream window")],
                              "doc_id long, text string"), idx
    )
    rows = TI.bm25_indexed_topk(spark, idx, [["stream"]], k=10).collect()
    assert 100 in {r["doc_id"] for r in rows}


def test_append_respects_recorded_meta_cols(spark, tmp_path):
    """Appending to a meta-carrying index keeps the metadata column on
    the new segment's postings (the commit file records meta_cols), so
    filtered serving sees appended docs."""
    a = spark.createDataFrame(
        [(1, "hash join", "web")], "doc_id long, text string, source string"
    )
    b = spark.createDataFrame(
        [(2, "hash scan", "book")], "doc_id long, text string, source string"
    )
    idx = str(tmp_path / "meta_grow")
    TI.bm25_index_build(a, idx, meta_cols=("source",))
    TI.bm25_index_append(b, idx)
    rows = TI.bm25_indexed_topk(
        spark, idx, [["hash"]], k=10, where="source = 'book'"
    ).collect()
    assert {r["doc_id"] for r in rows} == {2}


def test_compact_preserves_serving_and_reclaims(spark, tmp_path):
    """compact merges segments into one: serving is bit-identical
    before and after, the commit holds a single summed entry, and the
    superseded segment dirs are reclaimed."""
    import os

    a = spark.createDataFrame(DOCS, "doc_id long, text string")
    b = spark.createDataFrame(
        [(10, "merge join fast"), (11, "the stream table scan")],
        "doc_id long, text string",
    )
    idx = str(tmp_path / "compactme")
    TI.bm25_index_build(a, idx)
    TI.bm25_index_append(b, idx)
    before = sorted(
        map(tuple, TI.bm25_indexed_topk(spark, idx, QUERIES, k=20).collect())
    )
    TI.bm25_index_compact(spark, idx)
    commit = TI._bm25_read_commit(idx)
    assert len(commit["segments"]) == 1
    assert commit["segments"][0]["n"] == len(DOCS) + 2
    after = sorted(
        map(tuple, TI.bm25_indexed_topk(spark, idx, QUERIES, k=20).collect())
    )
    assert after == before and before
    assert not os.path.isdir(f"{idx}/postings/seg=0")
    assert not os.path.isdir(f"{idx}/postings/seg=1")
    # idempotent: a single-segment index is a no-op
    TI.bm25_index_compact(spark, idx)
    assert len(TI._bm25_read_commit(idx)["segments"]) == 1


def test_compact_after_crashed_append_is_exact(spark, tmp_path):
    """compact at a segment id where a crashed (uncommitted) append
    left orphan files must clear them first — otherwise the orphan
    postings/dfs merge into the committed segment (inflated df, leaked
    docs)."""
    a = spark.createDataFrame(DOCS, "doc_id long, text string")
    b = spark.createDataFrame(
        [(10, "merge join fast")], "doc_id long, text string"
    )
    idx = str(tmp_path / "compact_crash")
    TI.bm25_index_build(a, idx)
    TI.bm25_index_append(b, idx)
    want = sorted(
        map(tuple, TI.bm25_indexed_topk(spark, idx, QUERIES, k=20).collect())
    )
    # crashed append at the NEXT seg id (= the id compact will use)
    commit = TI._bm25_read_commit(idx)
    crash = spark.createDataFrame(
        [(99, "hash join hash join")], "doc_id long, text string"
    )
    TI._bm25_write_segment(crash, idx, 2, commit["n_buckets"], (), False)
    TI.bm25_index_compact(spark, idx)
    got = sorted(
        map(tuple, TI.bm25_indexed_topk(spark, idx, QUERIES, k=20).collect())
    )
    assert got == want
    assert 99 not in {t[1] for t in got}


def test_delete_equals_rebuild(spark, tmp_path):
    """delete-then-serve ≡ rebuild-over-survivors (the
    test_append_equals_rebuild pattern for the r15 delete verb):
    n/Σdl/per-term df all recount exactly, so every BM25 score is
    bit-identical to an index never containing the deleted docs —
    and to the live scorer over the survivor corpus."""
    a = spark.createDataFrame(DOCS, "doc_id long, text string")
    b = spark.createDataFrame(
        [(10, "merge join fast"), (11, "the stream table scan")],
        "doc_id long, text string",
    )
    idx = str(tmp_path / "delme")
    TI.bm25_index_build(a, idx)
    TI.bm25_index_append(b, idx)
    n = TI.bm25_index_delete(spark, idx, doc_ids=[2, 10])
    assert n == 2
    rebuilt = str(tmp_path / "rebuilt")
    survivors = a.unionByName(b).filter(~F.col("doc_id").isin([2, 10]))
    TI.bm25_index_build(survivors, rebuilt)
    q = QUERIES + [["merge", "fast"]]
    got = sorted(
        map(tuple, TI.bm25_indexed_topk(spark, idx, q, k=20).collect())
    )
    want = sorted(
        map(tuple, TI.bm25_indexed_topk(spark, rebuilt, q, k=20).collect())
    )
    assert got == want and got
    live = sorted(map(tuple, TX.bm25_topk(survivors, q, k=20).collect()))
    assert got == live
    assert not {2, 10} & {t[1] for t in got}


def test_delete_rewrites_only_affected_segments(spark, tmp_path):
    """A delete touching only the appended segment must leave the base
    segment's files byte-identical (untouched on disk) and reclaim the
    affected segment's dirs after the swap."""
    import os

    a = spark.createDataFrame(DOCS, "doc_id long, text string")
    b = spark.createDataFrame(
        [(10, "merge join fast")], "doc_id long, text string"
    )
    idx = str(tmp_path / "scoped")
    TI.bm25_index_build(a, idx)

    def _mtimes(seg):
        base = f"{idx}/postings/seg={seg}"
        return {
            os.path.join(r, f): os.path.getmtime(os.path.join(r, f))
            for r, _d, fs in os.walk(base) for f in fs
        }

    TI.bm25_index_append(b, idx)
    before = _mtimes(0)
    assert TI.bm25_index_delete(spark, idx, doc_ids=[10]) == 1
    assert _mtimes(0) == before, "unaffected segment was rewritten"
    assert not os.path.isdir(f"{idx}/postings/seg=1")
    commit = TI._bm25_read_commit(idx)
    assert sum(s["n"] for s in commit["segments"]) == len(DOCS)
    rows = TI.bm25_indexed_topk(spark, idx, [["merge"]], k=5).collect()
    assert rows == []


def test_delete_where_predicate_over_meta(spark, tmp_path):
    """`where=` deletes doc-level over the denormalized metadata:
    every posting row of a matching doc goes, filtered and unfiltered
    serving both reflect it."""
    docs = spark.createDataFrame(
        [(1, "hash join", "web"), (2, "hash scan", "book"),
         (3, "join scan", "web")],
        "doc_id long, text string, source string",
    )
    idx = str(tmp_path / "metadel")
    TI.bm25_index_build(docs, idx, meta_cols=("source",))
    assert TI.bm25_index_delete(spark, idx, where="source = 'web'") == 2
    rows = TI.bm25_indexed_topk(
        spark, idx, [["hash"], ["join"], ["scan"]], k=10
    ).collect()
    assert {r["doc_id"] for r in rows} == {2}
    # stats recount: df('join') must now be 0 docs → no rank for qid 1
    assert not [r for r in rows if r["qid"] == 1]


def test_delete_carries_replay_tags(spark, tmp_path):
    """A streamed batch re-delivered AFTER its docs were deleted must
    stay a no-op: the survivor segment inherits the affected segments'
    replay-protection tags (otherwise checkpoint recovery would
    resurrect deleted docs)."""
    a = spark.createDataFrame(DOCS, "doc_id long, text string")
    batch = spark.createDataFrame(
        [(50, "hash hash hash")], "doc_id long, text string"
    )
    idx = str(tmp_path / "tagdel")
    TI.bm25_index_build(a, idx)
    TI.bm25_index_append(batch, idx, batch_tag="b-50")
    assert TI.bm25_index_delete(spark, idx, doc_ids=[50]) == 1
    # re-delivery of the same micro-batch: must be a no-op
    TI.bm25_index_append(batch, idx, batch_tag="b-50")
    rows = TI.bm25_indexed_topk(spark, idx, [["hash"]], k=10).collect()
    assert 50 not in {r["doc_id"] for r in rows}


def test_delete_requires_exactly_one_selector(spark, tmp_path):
    import pytest

    docs = _docs(spark)
    idx = str(tmp_path / "selector")
    TI.bm25_index_build(docs, idx)
    with pytest.raises(ValueError, match="exactly one"):
        TI.bm25_index_delete(spark, idx)
    with pytest.raises(ValueError, match="exactly one"):
        TI.bm25_index_delete(spark, idx, doc_ids=[1], where="doc_id = 1")
    # no matches: commit untouched, 0 returned
    assert TI.bm25_index_delete(spark, idx, doc_ids=[999]) == 0


def test_commit_conflict_fences_lost_update(spark, tmp_path):
    """The single-writer fence (ADVICE r14): a verb that read the
    commit, then lost the race to another writer's swap, must raise
    Bm25CommitConflict instead of silently clobbering the other
    writer's segment list."""
    import pytest

    docs = _docs(spark)
    idx = str(tmp_path / "fence")
    TI.bm25_index_build(docs, idx)
    stale, raw = TI._bm25_read_commit_raw(idx)
    # another writer commits in between
    TI.bm25_index_append(
        spark.createDataFrame([(77, "merge fast")],
                              "doc_id long, text string"), idx,
    )
    with pytest.raises(TI.Bm25CommitConflict):
        TI._bm25_write_commit(idx, stale, expect=raw)
    # the winning append's segment survived
    assert len(TI._bm25_read_commit(idx)["segments"]) == 2


def test_compact_reclaims_orphans_even_when_single_segment(spark, tmp_path):
    """ADVICE r14: a crash between a prior compact's swap and its
    rmtree loop leaves superseded dirs no commit references; rerunning
    compact on the now-single-segment index must still sweep them
    (the early return used to fire first — disk leak). The sweep is
    AGED-ONLY (orphan_grace_sec): a seconds-old uncommitted dir may be
    an in-flight append in a violated-schedule interleaving, and
    sweeping it would silently destroy that append's files — so the
    default-grace compact must leave the fresh orphan alone."""
    import os

    docs = _docs(spark)
    idx = str(tmp_path / "orphans")
    TI.bm25_index_build(docs, idx)
    # orphan: an uncommitted segment (crashed append / unreclaimed
    # superseded dir — same on-disk shape)
    TI._bm25_write_segment(
        spark.createDataFrame([(99, "hash join")],
                              "doc_id long, text string"),
        idx, 7, TI._bm25_read_commit(idx)["n_buckets"], (), False,
    )
    assert os.path.isdir(f"{idx}/postings/seg=7")
    before = sorted(
        map(tuple, TI.bm25_indexed_topk(spark, idx, QUERIES, k=10).collect())
    )
    # default grace: the fresh "orphan" (indistinguishable from an
    # in-flight append) survives
    TI.bm25_index_compact(spark, idx)
    assert os.path.isdir(f"{idx}/postings/seg=7")
    # aged past the grace window (grace 0 here): reclaimed, even
    # though the single-segment early return still fires
    TI.bm25_index_compact(spark, idx, orphan_grace_sec=0.0)
    assert not os.path.isdir(f"{idx}/postings/seg=7")
    assert not os.path.isdir(f"{idx}/df/seg=7")
    after = sorted(
        map(tuple, TI.bm25_indexed_topk(spark, idx, QUERIES, k=10).collect())
    )
    assert after == before


def test_orphan_sweep_ages_by_newest_tree_mtime(spark, tmp_path):
    """ADVICE r15: the sweep must judge an uncommitted segment by the
    NEWEST mtime anywhere under it, not the dir's own mtime — a
    long-running in-flight writer only touches leaf files after the
    partition dirs are created, so a dir-level check would sweep any
    segment whose write outlasts the grace window. Simulated: age the
    dir mtimes past the cutoff but keep one leaf file fresh → the
    segment survives; age everything → reclaimed."""
    import os

    docs = _docs(spark)
    idx = str(tmp_path / "agedtree")
    TI.bm25_index_build(docs, idx)
    TI._bm25_write_segment(
        spark.createDataFrame([(99, "hash join")],
                              "doc_id long, text string"),
        idx, 7, TI._bm25_read_commit(idx)["n_buckets"], (), False,
    )
    old = (0.0, 0.0)
    paths = []
    for layout in ("postings", "df"):
        seg = f"{idx}/{layout}/seg=7"
        for r, ds, fs in os.walk(seg):
            paths.extend(os.path.join(r, x) for x in ds + fs)
        paths.append(seg)
    for p in paths:
        os.utime(p, old)
    # one fresh leaf file = an in-flight writer mid-write
    leaf = next(
        p for p in paths
        if p.startswith(f"{idx}/postings/") and p.endswith(".parquet")
    )
    os.utime(leaf)
    TI.bm25_index_compact(spark, idx, orphan_grace_sec=60.0)
    assert os.path.isdir(f"{idx}/postings/seg=7")  # survived
    os.utime(leaf, old)
    TI.bm25_index_compact(spark, idx, orphan_grace_sec=60.0)
    assert not os.path.isdir(f"{idx}/postings/seg=7")
    assert not os.path.isdir(f"{idx}/df/seg=7")


def test_writer_verifies_segment_dirs_before_commit(spark, tmp_path):
    """ADVICE r15: a writer whose freshly-written segment dirs were
    reclaimed under it (a racing compact's sweep) must raise
    Bm25CommitConflict at commit time, never publish a segment with
    missing files."""
    import shutil

    import pytest

    docs = _docs(spark)
    idx = str(tmp_path / "verifyme")
    TI.bm25_index_build(docs, idx)
    present = TI._bm25_segment_dirs_present(idx, [0])
    assert len(present) == 2  # postings + df for the built segment
    TI._bm25_verify_segment_dirs(idx, present)  # intact: no raise
    shutil.rmtree(f"{idx}/postings/seg=0")
    with pytest.raises(TI.Bm25CommitConflict, match="orphan_grace_sec"):
        TI._bm25_verify_segment_dirs(idx, present)
    # an all-empty batch snapshots no dirs and must not self-conflict
    assert TI._bm25_segment_dirs_present(idx, [42]) == []
    TI._bm25_verify_segment_dirs(idx, [])


def test_upsert_equals_rebuild(spark, tmp_path):
    """upsert (replace doc 2, insert doc 20) serves bit-identically to
    a rebuild over the updated corpus — and publishes atomically (one
    commit swap covers both the delete half and the insert half)."""
    a = spark.createDataFrame(DOCS, "doc_id long, text string")
    batch = spark.createDataFrame(
        [(2, "window agg window"), (20, "merge join fast")],
        "doc_id long, text string",
    )
    idx = str(tmp_path / "upsertme")
    TI.bm25_index_build(a, idx)
    assert TI.bm25_index_upsert(batch, idx) == 1  # doc 2 replaced
    rebuilt = str(tmp_path / "rebuilt_up")
    updated = a.filter(F.col("doc_id") != 2).unionByName(batch)
    TI.bm25_index_build(updated, rebuilt)
    q = QUERIES + [["merge", "fast"], ["window", "agg"]]
    got = sorted(
        map(tuple, TI.bm25_indexed_topk(spark, idx, q, k=20).collect())
    )
    want = sorted(
        map(tuple, TI.bm25_indexed_topk(spark, rebuilt, q, k=20).collect())
    )
    assert got == want and got
    live = sorted(map(tuple, TX.bm25_topk(updated, q, k=20).collect()))
    assert got == live


def test_upsert_replay_tag_noops(spark, tmp_path):
    """A re-delivered upsert batch (same batch_tag) must be a no-op —
    the whole verb, not just the append half."""
    a = spark.createDataFrame(DOCS, "doc_id long, text string")
    batch = spark.createDataFrame(
        [(2, "window agg window")], "doc_id long, text string"
    )
    idx = str(tmp_path / "uptag")
    TI.bm25_index_build(a, idx)
    assert TI.bm25_index_upsert(batch, idx, batch_tag="u-1") == 1
    before = sorted(
        map(tuple, TI.bm25_indexed_topk(spark, idx, QUERIES, k=20).collect())
    )
    commit_before = TI._bm25_read_commit(idx)
    assert TI.bm25_index_upsert(batch, idx, batch_tag="u-1") == 0
    assert TI._bm25_read_commit(idx) == commit_before
    after = sorted(
        map(tuple, TI.bm25_indexed_topk(spark, idx, QUERIES, k=20).collect())
    )
    assert after == before


def test_upsert_pure_insert_matches_append(spark, tmp_path):
    """An upsert whose ids are all new degenerates to an append:
    nothing rewritten, serving equals the appended index."""
    a = spark.createDataFrame(DOCS, "doc_id long, text string")
    batch = spark.createDataFrame(
        [(30, "merge join fast")], "doc_id long, text string"
    )
    up, ap = str(tmp_path / "upnew"), str(tmp_path / "apnew")
    TI.bm25_index_build(a, up)
    TI.bm25_index_build(a, ap)
    assert TI.bm25_index_upsert(batch, up) == 0
    TI.bm25_index_append(batch, ap)
    q = QUERIES + [["merge"]]
    got = sorted(
        map(tuple, TI.bm25_indexed_topk(spark, up, q, k=20).collect())
    )
    want = sorted(
        map(tuple, TI.bm25_indexed_topk(spark, ap, q, k=20).collect())
    )
    assert got == want and got


def test_batch_table_duplicate_qid_term_rows_dedup(spark, tmp_path):
    """ADVICE r14: a query table carrying a duplicate (qid, term) row
    (a query with a repeated term) must not double-count that term's
    contribution — the join dedups, matching the literal form."""
    docs = _docs(spark)
    idx = str(tmp_path / "dupterms")
    TI.bm25_index_build(docs, idx)
    clean = spark.createDataFrame(
        [(0, "hash"), (0, "join")], "qid int, term string"
    )
    dup = spark.createDataFrame(
        [(0, "hash"), (0, "hash"), (0, "join")], "qid int, term string"
    )
    want = sorted(map(tuple, TI.bm25_indexed_topk_table(
        spark, idx, clean, k=10).collect()))
    got = sorted(map(tuple, TI.bm25_indexed_topk_table(
        spark, idx, dup, k=10).collect()))
    assert got == want and want


def test_pruned_serve_noop_threshold_is_exact(spark, tmp_path):
    """prune_min_impact=0 keeps every row — the pruned code path must
    reproduce the exact serve bit-for-bit."""
    docs = _docs(spark)
    idx = str(tmp_path / "prune0")
    TI.bm25_index_build(docs, idx)
    exact = sorted(
        map(tuple, TI.bm25_indexed_topk(spark, idx, QUERIES, k=10).collect())
    )
    pruned = sorted(map(tuple, TI.bm25_indexed_topk(
        spark, idx, QUERIES, k=10,
        prune_df_frac=0.5, prune_min_impact=0.0,
    ).collect()))
    assert pruned == exact and exact


def test_pruned_serve_understates_within_bound(spark, tmp_path):
    """Impact-ordered early termination: retained (qid, doc) scores
    understate the exact serve by at most `bm25_prune_error_bound`
    (never overstate), selective terms stay exact, and the impact
    predicate reaches the postings scan as a pushed filter."""
    docs = _docs(spark)
    idx = str(tmp_path / "pruneb")
    TI.bm25_index_build(docs, idx)
    q = [["the", "table"], ["the"], ["hash", "join"]]
    frac, r0 = 0.5, 0.5  # df(the)=3 >= 0.5*5 → pruned; others exact
    exact = {
        (r["qid"], r["doc_id"]): r["bm25"]
        for r in TI.bm25_indexed_topk(spark, idx, q, k=10).collect()
    }
    res = TI.bm25_indexed_topk(
        spark, idx, q, k=10, prune_df_frac=frac, prune_min_impact=r0,
    )
    plan = res._sc._jvm.PythonSQLUtils.explainString(
        res._jdf.queryExecution(), "formatted"
    )
    assert "impact_key" in plan.split("PushedFilters", 1)[1][:400]
    pruned = {(r["qid"], r["doc_id"]): r["bm25"] for r in res.collect()}
    bound = TI.bm25_prune_error_bound(spark, idx, q, frac, r0)
    assert bound[0] > 0 and bound[1] > 0 and bound[2] == 0.0
    assert pruned, "pruned serve returned nothing"
    for key, s in pruned.items():
        assert key in exact
        diff = exact[key] - s
        # rounding to 6 dp on both sides → 2e-6 slack
        assert -2e-6 <= diff <= bound[key[0]] + 2e-6, (key, diff, bound)
    # a doc dropped entirely understates from its exact score by at
    # most the bound too (its retained contribution was 0 < exact ≤
    # retained + bound) — verify the strongest case: the pure-stopword
    # query's exact scores all fit under the bound OR the doc survived
    for (qid, doc), s in exact.items():
        if qid == 1 and (qid, doc) not in pruned:
            assert s <= bound[1] + 2e-6
    # the selective-only query is untouched
    assert {k: v for k, v in pruned.items() if k[0] == 2} == \
        {k: v for k, v in exact.items() if k[0] == 2}


def test_pruned_serve_survives_compact_and_delete(spark, tmp_path):
    """The impact_key column (and with it the pruned mode) must
    survive the rewriting verbs: append → delete → compact, then a
    pruned serve still runs and stays within its bound."""
    a = spark.createDataFrame(DOCS, "doc_id long, text string")
    b = spark.createDataFrame(
        [(10, "the the table the"), (11, "table scan")],
        "doc_id long, text string",
    )
    idx = str(tmp_path / "prunelife")
    TI.bm25_index_build(a, idx)
    TI.bm25_index_append(b, idx)
    TI.bm25_index_delete(spark, idx, doc_ids=[11])
    TI.bm25_index_compact(spark, idx)
    q = [["the", "table"]]
    exact = {
        (r["qid"], r["doc_id"]): r["bm25"]
        for r in TI.bm25_indexed_topk(spark, idx, q, k=10).collect()
    }
    pruned = {
        (r["qid"], r["doc_id"]): r["bm25"]
        for r in TI.bm25_indexed_topk(
            spark, idx, q, k=10, prune_df_frac=0.5, prune_min_impact=0.5,
        ).collect()
    }
    bound = TI.bm25_prune_error_bound(spark, idx, q, 0.5, 0.5)
    assert pruned
    for key, s in pruned.items():
        assert -2e-6 <= exact[key] - s <= bound[0] + 2e-6


def test_pruned_batch_table_matches_pruned_literal(spark, tmp_path):
    """The batch query-table serve honours the same impact cutoff as
    the literal form: same retained (qid, doc) set, same ranks (the
    two forms' fold orders coincide on sorted 2-term queries)."""
    docs = _docs(spark)
    idx = str(tmp_path / "pruneq")
    TI.bm25_index_build(docs, idx)
    q = [["table", "the"]]  # sorted; 'the' is stopword-grade (df 3/5)
    kw = {"prune_df_frac": 0.5, "prune_min_impact": 0.5}
    lit = sorted(map(tuple, TI.bm25_indexed_topk(
        spark, idx, q, k=10, **kw).collect()))
    qdf = spark.createDataFrame(
        [(0, t) for t in q[0]], "qid int, term string"
    )
    tab = sorted(map(tuple, TI.bm25_indexed_topk_table(
        spark, idx, qdf, k=10, **kw).collect()))
    assert tab == lit and lit


def test_delete_and_upsert_on_empty_built_index(spark, tmp_path):
    """An empty-corpus build writes only the commit (no segment dirs):
    delete must no-op cleanly, and upsert must degrade to a pure
    insert — neither may crash on postings-schema inference."""
    empty = spark.createDataFrame([], "doc_id long, text string")
    idx = str(tmp_path / "emptyidx")
    TI.bm25_index_build(empty, idx)
    assert TI.bm25_index_delete(spark, idx, doc_ids=[1]) == 0
    batch = spark.createDataFrame(
        [(1, "hash join fast")], "doc_id long, text string"
    )
    assert TI.bm25_index_upsert(batch, idx) == 0  # nothing replaced
    rows = TI.bm25_indexed_topk(spark, idx, [["hash"]], k=5).collect()
    assert {r["doc_id"] for r in rows} == {1}


def test_upsert_rejects_duplicate_batch_ids(spark, tmp_path):
    """An intra-batch duplicate doc_id (two CDC versions in one
    micro-batch) must raise loudly — staging both rows would inflate
    n/Σdl/df and leave two versions competing in the pivot."""
    import pytest

    docs = _docs(spark)
    idx = str(tmp_path / "dupup")
    TI.bm25_index_build(docs, idx)
    dup = spark.createDataFrame(
        [(2, "v1 hash"), (2, "v2 hash join")], "doc_id long, text string"
    )
    with pytest.raises(ValueError, match="duplicate doc_ids"):
        TI.bm25_index_upsert(dup, idx)


def test_delete_where_removes_doc_from_every_segment(spark, tmp_path):
    """Doc-everywhere completeness: when a doc_id's copies straddle
    segments (the duplicate-id state upsert exists to repair) and the
    WHERE predicate only matches rows in ONE of them, the delete must
    still remove the doc from BOTH — the match selects ids, a second
    semi-join finds every posting of those ids."""
    a = spark.createDataFrame(
        [(1, "alpha beta"), (5, "target alpha")],
        "doc_id long, text string",
    )
    dup = spark.createDataFrame(
        [(5, "beta gamma")], "doc_id long, text string"
    )
    idx = str(tmp_path / "everywhere")
    TI.bm25_index_build(a, idx)
    # contract-violating append: doc 5 again, different text, no
    # 'target' row — the predicate below matches only seg 0's copy
    TI.bm25_index_append(dup, idx)
    assert TI.bm25_index_delete(spark, idx, where="term = 'target'") == 1
    rows = TI.bm25_indexed_topk(
        spark, idx, [["alpha"], ["beta"], ["gamma"]], k=10
    ).collect()
    assert 5 not in {r["doc_id"] for r in rows}
    assert {r["doc_id"] for r in rows} == {1}


def test_delete_by_ids_prunes_match_scan_to_range_segments(spark, tmp_path):
    """The doc_ids= match scan reads only segments whose recorded
    [dmin, dmax] range can contain the requested ids — the untouched
    out-of-range segment keeps its files byte-identical AND is never
    read (plan-level: its seg value is absent from the scan filter)."""
    import os

    a = spark.createDataFrame(DOCS, "doc_id long, text string")
    b = spark.createDataFrame(
        [(1000, "merge join"), (1001, "scan table")],
        "doc_id long, text string",
    )
    idx = str(tmp_path / "rangedel")
    TI.bm25_index_build(a, idx)
    TI.bm25_index_append(b, idx)
    commit = TI._bm25_read_commit(idx)
    assert commit["segments"][0]["dmin"] == 1
    assert commit["segments"][1]["dmax"] == 1001
    cand = TI._bm25_segs_in_doc_range(commit, 1000, 1000, [1000])
    assert cand == [1]  # the base segment [1,5] is range-pruned

    def _mtimes(seg):
        base = f"{idx}/postings/seg={seg}"
        return {
            os.path.join(r, f): os.path.getmtime(os.path.join(r, f))
            for r, _d, fs in os.walk(base) for f in fs
        }

    before = _mtimes(0)
    assert TI.bm25_index_delete(spark, idx, doc_ids=[1000]) == 1
    assert _mtimes(0) == before
    rows = TI.bm25_indexed_topk(spark, idx, [["merge"], ["scan"]],
                                k=10).collect()
    ids = {r["doc_id"] for r in rows}
    assert 1000 not in ids and 1001 in ids and 2 in ids


def _make_segments_legacy(spark, idx, segs):
    """Rewrite the given segments to the PRE-r15 layout: strip the
    impact_key column from their posting files and the r16 `impact`
    marker from their commit entries — the faithful simulation of an
    index built before the impact layout existed."""
    import shutil

    posts = spark.read.parquet(f"{idx}/postings")
    keep = posts.filter(~F.col("seg").isin(segs))
    legacy = posts.filter(F.col("seg").isin(segs)).drop("impact_key")
    keep_rows, legacy_rows = keep.collect(), legacy.collect()
    shutil.rmtree(f"{idx}/postings")
    if keep_rows:
        (
            spark.createDataFrame(keep_rows, keep.schema)
            .write.partitionBy("seg", "tbucket").parquet(f"{idx}/postings")
        )
    (
        spark.createDataFrame(legacy_rows, legacy.schema)
        .write.mode("append")
        .partitionBy("seg", "tbucket").parquet(f"{idx}/postings")
    )
    commit, fence = TI._bm25_read_commit_raw(idx)
    for s in commit["segments"]:
        if s["id"] in set(segs):
            s.pop("impact", None)
    TI._bm25_write_commit(idx, commit, expect=fence)


def test_compact_upgrades_pre_impact_layout(spark, tmp_path):
    """A pure pre-r15 index (no impact_key column, no commit marker)
    must serve the pruned mode EXACTLY through the derived tf/dl path
    (never an unresolved-column error, never a silent drop), and
    compacting it upgrades to the physical impact layout + marker so
    the pushed-filter fast path applies afterwards."""
    a = spark.createDataFrame(DOCS, "doc_id long, text string")
    b = spark.createDataFrame(
        [(10, "the the table")], "doc_id long, text string"
    )
    idx = str(tmp_path / "legacy")
    TI.bm25_index_build(a, idx)
    TI.bm25_index_append(b, idx)
    _make_segments_legacy(spark, idx, [0, 1])
    bound = TI.bm25_prune_error_bound(spark, idx, [["the"]], 0.5, 0.5)
    exact = {
        (r["qid"], r["doc_id"]): r["bm25"]
        for r in TI.bm25_indexed_topk(spark, idx, [["the"]], k=5).collect()
    }

    def _check_pruned():
        pruned = TI.bm25_indexed_topk(
            spark, idx, [["the"]], k=5,
            prune_df_frac=0.5, prune_min_impact=0.5,
        ).collect()
        assert pruned
        for r in pruned:
            diff = exact[(r["qid"], r["doc_id"])] - r["bm25"]
            assert -2e-6 <= diff <= bound[0] + 2e-6

    _check_pruned()  # derived-expression path, before any upgrade
    exact_before = sorted(map(tuple, TI.bm25_indexed_topk(
        spark, idx, QUERIES, k=10).collect()))
    TI.bm25_index_compact(spark, idx, orphan_grace_sec=0.0)
    assert sorted(map(tuple, TI.bm25_indexed_topk(
        spark, idx, QUERIES, k=10).collect())) == exact_before
    # upgraded: marker present, physical-column fast path (pushed)
    assert TI._bm25_all_impact_marked(TI._bm25_read_commit(idx))
    res = TI.bm25_indexed_topk(
        spark, idx, [["the"]], k=5,
        prune_df_frac=0.5, prune_min_impact=0.5,
    )
    plan = res._sc._jvm.PythonSQLUtils.explainString(
        res._jdf.queryExecution(), "formatted"
    )
    assert "impact_key" in plan.split("PushedFilters", 1)[1][:400]
    _check_pruned()


def test_mixed_impact_layout_pruned_serve_is_exact(spark, tmp_path):
    """ADVICE r15 (medium): appending with the r15+ writer onto a
    pre-impact index makes a MIXED layout; the pruned serve must keep
    every legacy posting that meets the cutoff — the NULL-impact
    comparison would silently drop a legacy stopword posting and
    understate unboundedly. Doc 5 ("the the the", tf/dl = 1 ≥ r0)
    lives only in the legacy segment and MUST rank. Maintenance
    rewrites (upsert here, compact below) must normalize the mix."""
    a = spark.createDataFrame(DOCS, "doc_id long, text string")
    idx = str(tmp_path / "mixed")
    TI.bm25_index_build(a, idx)
    _make_segments_legacy(spark, idx, [0])
    b = spark.createDataFrame(
        [(10, "the the table")], "doc_id long, text string"
    )
    TI.bm25_index_append(b, idx)  # r16 writer: marked + physical column
    bound = TI.bm25_prune_error_bound(spark, idx, [["the"]], 0.5, 0.5)
    exact = {
        (r["qid"], r["doc_id"]): r["bm25"]
        for r in TI.bm25_indexed_topk(spark, idx, [["the"]], k=5).collect()
    }
    pruned = {
        (r["qid"], r["doc_id"]): r["bm25"]
        for r in TI.bm25_indexed_topk(
            spark, idx, [["the"]], k=5,
            prune_df_frac=0.5, prune_min_impact=0.5,
        ).collect()
    }
    # the legacy-only all-stopword doc survives the cutoff (tf/dl = 1)
    assert (0, 5) in pruned
    for key, s in pruned.items():
        assert -2e-6 <= exact[key] - s <= bound[0] + 2e-6
    # compact normalizes the mix: merged segment is full impact layout
    # with NO null impact keys (the legacy rows were coalesced)
    TI.bm25_index_compact(spark, idx, orphan_grace_sec=0.0)
    assert TI._bm25_all_impact_marked(TI._bm25_read_commit(idx))
    merged = spark.read.parquet(f"{idx}/postings")
    assert merged.filter(F.col("impact_key").isNull()).count() == 0
    pruned2 = {
        (r["qid"], r["doc_id"]): r["bm25"]
        for r in TI.bm25_indexed_topk(
            spark, idx, [["the"]], k=5,
            prune_df_frac=0.5, prune_min_impact=0.5,
        ).collect()
    }
    assert pruned2 == pruned


def test_wand_bit_identical_to_exact(spark, tmp_path):
    """Exact Block-Max WAND (r16): same (qid, doc_id, bm25, rank)
    tuples as the exact serve on the planted corpus — including a
    stopword-grade term, a selective-only query, and a mixed query —
    across cutoffs loose and tight."""
    docs = _docs(spark)
    idx = str(tmp_path / "wand")
    TI.bm25_index_build(docs, idx)
    q = [["the", "table"], ["the"], ["hash", "join"], ["stream"]]
    exact = sorted(map(tuple, TI.bm25_indexed_topk(
        spark, idx, q, k=10).collect()))
    for r0 in (0.05, 0.3, 0.5):
        got = sorted(map(tuple, TI.bm25_indexed_topk_wand(
            spark, idx, q, k=10,
            prune_df_frac=0.5, prune_min_impact=r0,
        ).collect()))
        assert got == exact and exact, (r0, got, exact)


def test_wand_bit_identical_on_stopword_heavy_corpus(spark, tmp_path):
    """A 60-doc corpus where 'the' appears in every doc with varying
    tf/dl (so the impact cutoff genuinely splits head from tail):
    WAND must reproduce the exact serve bit-for-bit, and with k
    beyond the positive-doc count the per-query fallback must fire
    and still agree."""
    docs = spark.createDataFrame(
        [(i, ("the " * (1 + i % 7)) + ("hash " if i % 3 == 0 else "scan "))
         for i in range(60)],
        "doc_id long, text string",
    )
    idx = str(tmp_path / "wandhot")
    TI.bm25_index_build(docs, idx)
    q = [["the"], ["the", "hash"], ["scan"]]
    for k in (5, 10, 100):  # 100 > positive docs → θ undefined → fallback
        exact = sorted(map(tuple, TI.bm25_indexed_topk(
            spark, idx, q, k=k).collect()))
        got = sorted(map(tuple, TI.bm25_indexed_topk_wand(
            spark, idx, q, k=k,
            prune_df_frac=0.5, prune_min_impact=0.2,
        ).collect()))
        assert got == exact and exact, k


def test_wand_degenerate_paths(spark, tmp_path):
    """No stopword-grade term → direct exact path; b=0 → exact path
    (no bound exists); empty index → typed empty frame."""
    docs = _docs(spark)
    idx = str(tmp_path / "wanddeg")
    TI.bm25_index_build(docs, idx)
    q = [["hash", "join"]]
    exact = sorted(map(tuple, TI.bm25_indexed_topk(
        spark, idx, q, k=5).collect()))
    got = sorted(map(tuple, TI.bm25_indexed_topk_wand(
        spark, idx, q, k=5, prune_df_frac=0.9,  # nothing stopword-grade
        prune_min_impact=0.5).collect()))
    assert got == exact
    got_b0 = sorted(map(tuple, TI.bm25_indexed_topk_wand(
        spark, idx, q, k=5, b=0.0).collect()))
    exact_b0 = sorted(map(tuple, TI.bm25_indexed_topk(
        spark, idx, q, k=5, b=0.0).collect()))
    assert got_b0 == exact_b0
    empty = str(tmp_path / "wandempty")
    TI.bm25_index_build(
        spark.createDataFrame([], "doc_id long, text string"), empty
    )
    res = TI.bm25_indexed_topk_wand(spark, empty, q, k=5)
    assert res.collect() == [] and res.columns == [
        "qid", "doc_id", "bm25", "rank"
    ]


def test_tombstone_delete_equals_rebuild(spark, tmp_path):
    """Tombstone-tier delete (r16): serving after
    `bm25_index_delete(mode="tombstone")` is bit-identical to a
    rebuild over the survivors — n/Σdl subtract from the sidecar,
    per-term dfs subtract the semi-join counts, tombstoned docs never
    rank — across the exact, pruned, WAND, and batch-table serve
    paths; the base segment's files stay byte-identical (no rewrite)."""
    import os

    a = spark.createDataFrame(DOCS, "doc_id long, text string")
    b = spark.createDataFrame(
        [(10, "merge join fast"), (11, "the stream table scan")],
        "doc_id long, text string",
    )
    idx = str(tmp_path / "tsdel")
    TI.bm25_index_build(a, idx)
    TI.bm25_index_append(b, idx)

    def _mtimes():
        out = {}
        for root in (f"{idx}/postings", f"{idx}/df"):
            for r, _d, fs in os.walk(root):
                for f_ in fs:
                    p = os.path.join(r, f_)
                    out[p] = os.path.getmtime(p)
        return out

    before = _mtimes()
    assert TI.bm25_index_delete(
        spark, idx, doc_ids=[2, 10], mode="tombstone"
    ) == 2
    assert _mtimes() == before  # no segment rewrite at all
    rebuilt = str(tmp_path / "tsreb")
    survivors = a.unionByName(b).filter(~F.col("doc_id").isin([2, 10]))
    TI.bm25_index_build(survivors, rebuilt)
    q = QUERIES + [["merge", "fast"], ["the", "table"]]
    want = sorted(map(tuple, TI.bm25_indexed_topk(
        spark, rebuilt, q, k=20).collect()))
    got = sorted(map(tuple, TI.bm25_indexed_topk(
        spark, idx, q, k=20).collect()))
    assert got == want and got
    assert not {2, 10} & {t[1] for t in got}
    kw = {"prune_df_frac": 0.5, "prune_min_impact": 0.05}
    got_p = sorted(map(tuple, TI.bm25_indexed_topk(
        spark, idx, q, k=20, **kw).collect()))
    want_p = sorted(map(tuple, TI.bm25_indexed_topk(
        spark, rebuilt, q, k=20, **kw).collect()))
    assert got_p == want_p
    got_w = sorted(map(tuple, TI.bm25_indexed_topk_wand(
        spark, idx, q, k=20, **kw).collect()))
    assert got_w == want
    qdf = spark.createDataFrame(
        [(0, "the"), (0, "table")], "qid int, term string"
    )
    got_t = sorted(map(tuple, TI.bm25_indexed_topk_table(
        spark, idx, qdf, k=20).collect()))
    want_t = sorted(map(tuple, TI.bm25_indexed_topk_table(
        spark, rebuilt, qdf, k=20).collect()))
    assert got_t == want_t
    # re-deleting a tombstoned doc is a no-op in both modes
    assert TI.bm25_index_delete(spark, idx, doc_ids=[2],
                                mode="tombstone") == 0
    assert TI.bm25_index_delete(spark, idx, doc_ids=[2]) == 0
    # compact applies the tombstones physically and clears them
    TI.bm25_index_compact(spark, idx, orphan_grace_sec=0.0)
    commit = TI._bm25_read_commit(idx)
    assert commit.get("tombstones") == []
    assert not os.path.isdir(f"{idx}/tombstones") or not os.listdir(
        f"{idx}/tombstones"
    )
    posts = spark.read.parquet(f"{idx}/postings")
    assert posts.filter(F.col("doc_id").isin([2, 10])).count() == 0
    got2 = sorted(map(tuple, TI.bm25_indexed_topk(
        spark, idx, q, k=20).collect()))
    assert got2 == want


def test_tombstone_compact_on_single_segment(spark, tmp_path):
    """A single-segment index with pending tombstones must NOT take
    compact's early return — physical removal is compact's job."""
    docs = _docs(spark)
    idx = str(tmp_path / "tsone")
    TI.bm25_index_build(docs, idx)
    assert TI.bm25_index_delete(
        spark, idx, where="doc_id = 5", mode="tombstone"
    ) == 1
    TI.bm25_index_compact(spark, idx, orphan_grace_sec=0.0)
    commit = TI._bm25_read_commit(idx)
    assert commit.get("tombstones") == [] and len(commit["segments"]) == 1
    rebuilt = str(tmp_path / "tsone_reb")
    TI.bm25_index_build(
        spark.createDataFrame(DOCS, "doc_id long, text string").filter(
            F.col("doc_id") != 5
        ),
        rebuilt,
    )
    got = sorted(map(tuple, TI.bm25_indexed_topk(
        spark, idx, QUERIES, k=20).collect()))
    want = sorted(map(tuple, TI.bm25_indexed_topk(
        spark, rebuilt, QUERIES, k=20).collect()))
    assert got == want and got


def test_tombstone_cleared_by_upsert_resurrection(spark, tmp_path):
    """CDC semantics: upserting a tombstoned doc_id brings the NEW
    revision to life (the tombstone clears under the same fenced
    swap) — serving equals a rebuild over (survivors ∪ new revision);
    the other tombstones stay in force."""
    a = spark.createDataFrame(DOCS, "doc_id long, text string")
    idx = str(tmp_path / "tsres")
    TI.bm25_index_build(a, idx)
    assert TI.bm25_index_delete(
        spark, idx, doc_ids=[2, 5], mode="tombstone"
    ) == 2
    batch = spark.createDataFrame(
        [(2, "merge join window")], "doc_id long, text string"
    )
    TI.bm25_index_upsert(batch, idx)
    rebuilt = str(tmp_path / "tsres_reb")
    TI.bm25_index_build(
        a.filter(~F.col("doc_id").isin([2, 5])).unionByName(batch), rebuilt
    )
    q = QUERIES + [["merge", "join"]]
    got = sorted(map(tuple, TI.bm25_indexed_topk(
        spark, idx, q, k=20).collect()))
    want = sorted(map(tuple, TI.bm25_indexed_topk(
        spark, rebuilt, q, k=20).collect()))
    assert got == want and got
    ids = {t[1] for t in got}
    assert 2 in ids and 5 not in ids


def test_tombstone_composes_with_filtered_serving(spark, tmp_path):
    """Tombstones and `where=` filtered retrieval compose: candidates
    prune by the predicate AND the tombstone set, while global stats
    reflect only the tombstone subtraction (the filter keeps stats
    global — Lucene semantics). Equality against a rebuild over the
    survivors served with the same filter."""
    docs = spark.createDataFrame(
        [
            (1, "spark join the hash table fast", "web"),
            (2, "slow scan of the big table", "web"),
            (3, "hash hash hash join", "book"),
            (4, "join hash stream", "book"),
            (5, "the the the hash", "book"),
        ],
        "doc_id long, text string, source string",
    )
    idx = str(tmp_path / "tsfilter")
    TI.bm25_index_build(docs, idx, meta_cols=("source",))
    assert TI.bm25_index_delete(
        spark, idx, doc_ids=[3], mode="tombstone"
    ) == 1
    rebuilt = str(tmp_path / "tsfilter_reb")
    TI.bm25_index_build(
        docs.filter(F.col("doc_id") != 3), rebuilt, meta_cols=("source",)
    )
    q = [["hash", "join"], ["the"]]
    got = sorted(map(tuple, TI.bm25_indexed_topk(
        spark, idx, q, k=10, where="source = 'book'").collect()))
    want = sorted(map(tuple, TI.bm25_indexed_topk(
        spark, rebuilt, q, k=10, where="source = 'book'").collect()))
    assert got == want and got
    assert 3 not in {t[1] for t in got}


def test_wand_table_bit_identical_to_table_serve(spark, tmp_path):
    """The batch-table exact WAND must reproduce
    `bm25_indexed_topk_table` bit-for-bit: stopword + selective mixed
    queries, duplicate term rows, non-contiguous qids, and k beyond
    the positive-doc count (per-query fallback)."""
    docs = spark.createDataFrame(
        [(i, ("the " * (1 + i % 7)) + ("hash " if i % 3 == 0 else "scan "))
         for i in range(60)],
        "doc_id long, text string",
    )
    idx = str(tmp_path / "wandtab")
    TI.bm25_index_build(docs, idx)
    qdf = spark.createDataFrame(
        [(0, "the"), (0, "hash"), (0, "hash"),   # dup term row
         (3, "the"),                              # pure stopword
         (7, "scan")],                            # selective
        "qid int, term string",
    )
    for k in (5, 10, 100):
        want = sorted(map(tuple, TI.bm25_indexed_topk_table(
            spark, idx, qdf, k=k).collect()))
        got = sorted(map(tuple, TI.bm25_indexed_topk_table_wand(
            spark, idx, qdf, k=k,
            prune_df_frac=0.5, prune_min_impact=0.2).collect()))
        assert got == want and want, k
    # empty query table → typed empty frame
    empty = TI.bm25_indexed_topk_table_wand(
        spark, idx, spark.createDataFrame([], "qid int, term string"), k=5
    )
    assert empty.collect() == [] and empty.columns == [
        "qid", "doc_id", "bm25", "rank"
    ]


def test_wand_candidate_cap_falls_back_bit_identical(spark, tmp_path):
    """r17 (judge r16 item 4): a tie-dense corpus — every doc
    identical, so every doc clears the θ bound — trips the
    `max_candidates` cap and the query falls back PER-QUERY to the
    exact serve, bit-identically; a selective query in the same batch
    stays on the WAND path. With the default (generous) cap the same
    serve also stays bit-identical."""
    docs = spark.createDataFrame(
        [(i, "the common text of every doc") for i in range(40)]
        + [(100 + i, "rare needle " + ("pad " * (i + 1))) for i in range(6)],
        "doc_id long, text string",
    )
    idx = str(tmp_path / "wandcap")
    TI.bm25_index_build(docs, idx)
    q = [["the", "common"], ["needle"]]
    exact = sorted(map(tuple, TI.bm25_indexed_topk(
        spark, idx, q, k=5).collect()))
    for cap in (3, 10_000):
        got = sorted(map(tuple, TI.bm25_indexed_topk_wand(
            spark, idx, q, k=5,
            prune_df_frac=0.5, prune_min_impact=0.2,
            max_candidates=cap,
        ).collect()))
        assert got == exact and exact, (cap, got, exact)


def test_compact_pressure_dimensions():
    """r17 (judge r16 item 3): the pressure heuristic trips on any of
    segment count, tombstone sidecar count, or tombstoned fraction —
    and pre-r17 tombstone entries (no dead count) degrade gracefully
    to the sidecar dimension."""
    seg = lambda n: {"id": 0, "n": n, "sdl": n * 5.0}  # noqa: E731
    c = {"segments": [seg(100)] * 3,
         "tombstones": [{"file": "ts-a", "n": 10}, {"file": "ts-b", "n": 15}]}
    P = TI.bm25_compact_pressure
    assert P(c) is None  # nothing watched
    assert P(c, segment_threshold=2) == "segments"
    assert P(c, segment_threshold=3) is None
    assert P(c, tombstone_sidecars=1) == "tombstone_sidecars"
    assert P(c, tombstone_sidecars=2) is None
    # dead 25 / 300 docs ≈ 0.083
    assert P(c, tombstone_frac=0.05) == "tombstone_frac"
    assert P(c, tombstone_frac=0.1) is None
    # precedence: first tripped dimension wins
    assert P(c, segment_threshold=2, tombstone_sidecars=0) == "segments"
    # legacy entries without counts: frac sees 0 dead, sidecars still count
    legacy = {"segments": [seg(100)],
              "tombstones": [{"file": "ts-old"}] * 5}
    assert P(legacy, tombstone_frac=0.01) is None
    assert P(legacy, tombstone_sidecars=4) == "tombstone_sidecars"
    # no tombstones at all: frac dimension inert
    assert P({"segments": [seg(10)], "tombstones": []},
             tombstone_frac=0.01) is None


def test_compact_on_pressure_clears_tombstones_serving_identical(
    spark, tmp_path,
):
    """r17 (judge r16 item 3): many small tombstone deletes grow the
    sidecar count with the segment count stuck at 1 — exactly the
    pressure the r16 segment-only trigger missed. The standalone
    pressure compact trips on the sidecar dimension, applies the
    tombstones physically, clears the sidecar list, and serving is
    bit-identical before and after."""
    docs = _docs(spark)
    idx = str(tmp_path / "tspress")
    TI.bm25_index_build(docs, idx)
    victims = [r["doc_id"] for r in docs.select("doc_id")
               .orderBy("doc_id").limit(3).collect()]
    for d in victims:  # one sidecar per delete
        assert TI.bm25_index_delete(
            spark, idx, doc_ids=[d], mode="tombstone") == 1
    commit = TI._bm25_read_commit(idx)
    assert len(commit["segments"]) == 1  # segment dimension blind
    assert len(commit["tombstones"]) == 3
    assert all(t["n"] == 1 for t in commit["tombstones"])
    q = [["the", "table"], ["hash", "join"]]
    before = sorted(map(tuple, TI.bm25_indexed_topk(
        spark, idx, q, k=10).collect()))
    # under the sidecar threshold: no-op
    assert TI.bm25_index_compact_on_pressure(
        spark, idx, tombstone_sidecars=5) is None
    assert len(TI._bm25_read_commit(idx)["tombstones"]) == 3
    # over it: compacts, tombstones applied + cleared
    assert TI.bm25_index_compact_on_pressure(
        spark, idx, tombstone_sidecars=2) == "tombstone_sidecars"
    commit = TI._bm25_read_commit(idx)
    assert commit.get("tombstones", []) == []
    after = sorted(map(tuple, TI.bm25_indexed_topk(
        spark, idx, q, k=10).collect()))
    assert after == before and before
    # pressure relieved: a re-run is a no-op
    assert TI.bm25_index_compact_on_pressure(
        spark, idx, tombstone_sidecars=2, tombstone_frac=0.01) is None


def test_compact_on_pressure_tombstone_frac(spark, tmp_path):
    """The FRACTION dimension (dead docs / committed docs, counted
    from the commit entries alone) trips even when the deletes landed
    in a single sidecar."""
    docs = _docs(spark)
    idx = str(tmp_path / "tsfrac")
    TI.bm25_index_build(docs, idx)
    victims = [r["doc_id"] for r in docs.select("doc_id")
               .orderBy("doc_id").limit(2).collect()]  # 2/5 = 0.4 dead
    assert TI.bm25_index_delete(
        spark, idx, doc_ids=victims, mode="tombstone") == len(victims)
    assert TI.bm25_index_compact_on_pressure(
        spark, idx, tombstone_sidecars=5, tombstone_frac=0.5) is None
    assert TI.bm25_index_compact_on_pressure(
        spark, idx, tombstone_frac=0.25) == "tombstone_frac"
    assert TI._bm25_read_commit(idx).get("tombstones", []) == []


def test_wand_on_tombstoned_index_bit_identical(spark, tmp_path):
    """r17: WAND on an index with PENDING tombstones — the θ-pass rides
    `_bm25_pruned_postings` (anti-joined, stats corrected) and phase 2
    only reads candidate doc_ids, so logically-deleted docs can never
    rank. Results must equal the exact serve on the same index AND a
    rebuild over the survivors, bit-for-bit — including deleting docs
    that ranked top-1."""
    docs = spark.createDataFrame(
        [(i, ("the " * (1 + i % 7)) + ("hash " if i % 3 == 0 else "scan "))
         for i in range(60)],
        "doc_id long, text string",
    )
    idx = str(tmp_path / "wandts")
    TI.bm25_index_build(docs, idx)
    q = [["the"], ["the", "hash"], ["scan"]]
    top = {r["doc_id"] for r in TI.bm25_indexed_topk(
        spark, idx, q, k=3).collect()}
    victims = sorted(top)[:3] + [7, 11]
    assert TI.bm25_index_delete(
        spark, idx, doc_ids=victims, mode="tombstone") == len(set(victims))
    exact = sorted(map(tuple, TI.bm25_indexed_topk(
        spark, idx, q, k=8).collect()))
    got = sorted(map(tuple, TI.bm25_indexed_topk_wand(
        spark, idx, q, k=8,
        prune_df_frac=0.5, prune_min_impact=0.2,
    ).collect()))
    assert got == exact and exact
    assert not {t[1] for t in got} & set(victims)
    rebuilt = str(tmp_path / "wandts_rebuilt")
    TI.bm25_index_build(
        docs.filter(~docs.doc_id.isin(victims)), rebuilt
    )
    want = sorted(map(tuple, TI.bm25_indexed_topk(
        spark, rebuilt, q, k=8).collect()))
    assert got == want
