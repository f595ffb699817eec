"""The persisted corpus gate state (r9 verdict item 1): the streaming
ingest gate's standing-corpus signatures + shingle sets were re-sketched
per session (the only >2× driver-bench readings); they are now a
content-fingerprint-keyed parquet artifact. A cold session must READ
the state back; regenerated-identical data must read through; changed
data must rebuild, never serve stale state. And with a fold
`state_store`, a RESTARTED stream must refold committed batches — the
restart-refold caveat the r9 verdict asked to close."""

from __future__ import annotations

import os
import time

from pyspark.sql import functions as F


def _write_documents(spark, d, n=40, tag="v1"):
    rows = [(i, f"doc {tag} number {i} " + ("common filler text " * 5)) for i in range(n)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    df.coalesce(1).write.mode("overwrite").parquet(
        os.path.join(str(d), "documents.parquet")
    )


def test_gate_state_artifact_cold_read_through_and_staleness(
    spark, tmp_path, monkeypatch
):
    import apachebeamkmeans_spark.queries_dedup as QD
    from apachebeamkmeans_spark.operators import dedup as DD

    sf_dir = str(tmp_path / "sfg")
    os.makedirs(sf_dir)
    _write_documents(spark, sf_dir)

    calls = {"n": 0}
    real = DD.corpus_gate_state

    def counting(*a, **kw):
        calls["n"] += 1
        return real(*a, **kw)

    monkeypatch.setattr(DD, "corpus_gate_state", counting)

    sigs1, sets1 = QD._gate_state_artifact(spark, sf_dir)
    assert calls["n"] == 1

    # the staged frames equal a direct recomputation over the same
    # corpus split (parquet round-trip is semantically transparent)
    corpus = (
        spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
        .select("doc_id", "text")
        .filter(F.col("doc_id") % 10 != 0)
    )
    want_sigs, want_sets = real(corpus, QD.BANDS, QD.SHINGLE)
    assert sorted(map(tuple, sigs1.collect())) == sorted(
        map(tuple, want_sigs.collect())
    )
    assert {r["doc_id"]: sorted(r["sh"]) for r in sets1.collect()} == {
        r["doc_id"]: sorted(r["sh"]) for r in want_sets.collect()
    }

    # cold session (nothing memoized in the helper): pure read-through
    sigs2, _sets2 = QD._gate_state_artifact(spark, sf_dir)
    assert calls["n"] == 1
    assert sorted(map(tuple, sigs2.collect())) == sorted(
        map(tuple, sigs1.collect())
    )

    # regenerated with IDENTICAL content at a newer mtime (the per-
    # round driver scenario) → fingerprint unchanged → read-through
    t = time.time() + 10
    p = os.path.join(sf_dir, "documents.parquet")
    for root, _dirs, files in os.walk(p):
        for fn in files:
            os.utime(os.path.join(root, fn), (t, t))
    QD._gate_state_artifact(spark, sf_dir)
    assert calls["n"] == 1

    # regenerated with DIFFERENT content → fingerprint miss → rebuild
    _write_documents(spark, sf_dir, tag="v2")
    sigs3, _ = QD._gate_state_artifact(spark, sf_dir)
    assert calls["n"] == 2
    assert sorted(map(tuple, sigs3.collect())) != sorted(
        map(tuple, sigs1.collect())
    )


def test_fold_state_store_survives_restart(spark, sf_dir, tmp_path):
    """Kill the folding stream after batch 1 commits, restart with the
    same checkpoint + state_store: batch 3's verbatim copies of docs
    batch 1 ACCEPTED must still be rejected at Jaccard 1.0 — the
    restarted stream refolded the persisted increments instead of
    forgetting them (without the store, the fold state dies with the
    first run and every copy sails through)."""
    from apachebeamkmeans_spark.sources import io
    from apachebeamkmeans_spark.streaming.ingest import run_ingest_gate_stream

    src_dir, out_dir, ckpt, store = (
        str(tmp_path / d) for d in ("src", "out", "ckpt", "state")
    )
    docs = io.read_table(spark, sf_dir, "documents").select("doc_id", "text")
    corpus = docs.filter(F.col("doc_id") % 10 != 0)
    new = docs.filter(F.col("doc_id") % 10 == 0).withColumn(
        "ts", F.to_timestamp(F.lit("2025-01-01 00:00:00"))
    )
    b1 = new.filter(F.col("doc_id") % 20 == 0)
    b3 = b1.withColumn("doc_id", F.col("doc_id") + F.lit(10_000_000))
    b1.coalesce(1).write.mode("append").parquet(src_dir)

    def start(name):
        return run_ingest_gate_stream(
            spark, corpus, src_dir, b1.schema, out_dir, ckpt,
            8, 3, 0.5, max_files_per_trigger=1, name=name,
            fold_accepted=True, state_store=store,
        )

    q1 = start("refold_p1")
    try:
        q1.processAllAvailable()
    finally:
        q1.stop()
        q1.awaitTermination(60)
    # batch 0 committed AND its fold increment persisted
    assert os.path.exists(os.path.join(store, "batch=0", "sigs", "_SUCCESS"))

    # the copies arrive only after the restart — a fresh run that
    # rebuilt state from `corpus` alone would accept them all
    b3.coalesce(1).write.mode("append").parquet(src_dir)
    q2 = start("refold_p2")
    try:
        q2.processAllAvailable()
    finally:
        q2.stop()

    got = {
        r["doc_id"]: (r["max_jaccard"], r["accept"])
        for r in spark.read.option("basePath", out_dir)
        .parquet(f"{out_dir}/batch=*")
        .collect()
    }
    originals = [r["doc_id"] for r in b1.select("doc_id").collect()]
    checked = 0
    for oid in originals:
        if got[oid][1]:  # original accepted → its copy must hit it
            assert got[oid + 10_000_000] == (1.0, False), oid
            checked += 1
    assert checked, "no accepted batch-1 doc to verify the refold with"


def test_replayed_batch_does_not_self_match(spark, sf_dir, tmp_path):
    """Crash window: the sink commits a batch's verdicts AND its fold
    increment, but the process dies before the STREAMING checkpoint
    commits — on restart Spark replays the batch. Without the
    committed-increment skip, the replayed batch is gated against its
    own folded signatures (stream-start refold unions the increment
    in), every previously-accepted doc self-matches at Jaccard 1.0,
    and the verdict parquet is silently overwritten with rejects.
    Simulated by restarting with a FRESH checkpoint over the same
    src/out/state dirs: the first trigger re-delivers the same file
    as batch 0 while its increment already sits committed in the
    store — from the sink's point of view, exactly the replay a
    pre-checkpoint-commit crash produces (checkpoint surgery is not
    an option: Spark 4's state-store commit validation rejects a
    truncated commits/ log)."""
    from apachebeamkmeans_spark.sources import io
    from apachebeamkmeans_spark.streaming.ingest import run_ingest_gate_stream

    src_dir, out_dir, ckpt1, ckpt2, store = (
        str(tmp_path / d) for d in ("src", "out", "ckpt1", "ckpt2", "state")
    )
    docs = io.read_table(spark, sf_dir, "documents").select("doc_id", "text")
    corpus = docs.filter(F.col("doc_id") % 10 != 0)
    new = docs.filter(F.col("doc_id") % 10 == 0).withColumn(
        "ts", F.to_timestamp(F.lit("2025-01-01 00:00:00"))
    )
    new.coalesce(1).write.mode("append").parquet(src_dir)

    def start(name, ckpt):
        return run_ingest_gate_stream(
            spark, corpus, src_dir, new.schema, out_dir, ckpt,
            8, 3, 0.5, name=name, fold_accepted=True, state_store=store,
        )

    q1 = start("replay_p1", ckpt1)
    try:
        q1.processAllAvailable()
    finally:
        q1.stop()
        q1.awaitTermination(60)
    assert os.path.exists(os.path.join(store, "batch=0", "sigs", "_SUCCESS"))
    first = {
        r["doc_id"]: (r["max_jaccard"], r["accept"])
        for r in spark.read.parquet(f"{out_dir}/batch=0").collect()
    }
    assert any(a for _mj, a in first.values()), "fixture accepted nothing"

    # Same LINEAGE resumed with fresh offsets — the faithful replay
    # shape: Spark's query id lives in <checkpoint>/metadata and
    # survives a pre-commit crash, so the restart presents the SAME id
    # while the offset log re-delivers the batch. Simulated by copying
    # the metadata (id) into a fresh checkpoint dir; without it the
    # r11 lineage marker would (correctly) refuse the alias at start.
    import shutil

    os.makedirs(ckpt2, exist_ok=True)
    shutil.copy(os.path.join(ckpt1, "metadata"), os.path.join(ckpt2, "metadata"))
    q2 = start("replay_p2", ckpt2)
    try:
        q2.processAllAvailable()
    finally:
        q2.stop()
        q2.awaitTermination(60)

    replayed = {
        r["doc_id"]: (r["max_jaccard"], r["accept"])
        for r in spark.read.parquet(f"{out_dir}/batch=0").collect()
    }
    assert replayed == first


def test_batch_id_alias_from_stale_state_store_fails_loudly(
    spark, sf_dir, tmp_path
):
    """The replay skip is only valid within one checkpoint lineage: a
    FRESH checkpoint reusing an old run's state_store aliases batch 0,
    and a batch of NEW documents would be silently drained (verdicts
    never written) if the skip fired on the id alone. The gate must
    instead detect that the incoming doc_id set does not match the
    committed verdicts and fail with the lineage message (ADVICE r10
    medium)."""
    import pytest

    from apachebeamkmeans_spark.sources import io
    from apachebeamkmeans_spark.streaming.ingest import run_ingest_gate_stream

    src1, src2, out_dir, ckpt1, ckpt2, store = (
        str(tmp_path / d)
        for d in ("src1", "src2", "out", "ckpt1", "ckpt2", "state")
    )
    docs = io.read_table(spark, sf_dir, "documents").select("doc_id", "text")
    corpus = docs.filter(F.col("doc_id") % 10 != 0)
    ts = F.to_timestamp(F.lit("2025-01-01 00:00:00"))
    first = docs.filter(F.col("doc_id") % 10 == 0).withColumn("ts", ts)
    first.coalesce(1).write.mode("append").parquet(src1)

    def start(name, src, ckpt):
        return run_ingest_gate_stream(
            spark, corpus, src, first.schema, out_dir, ckpt,
            8, 3, 0.5, name=name, fold_accepted=True, state_store=store,
        )

    q1 = start("alias_p1", src1, ckpt1)
    try:
        q1.processAllAvailable()
    finally:
        q1.stop()
        q1.awaitTermination(60)
    assert os.path.exists(os.path.join(store, "batch=0", "sigs", "_SUCCESS"))

    # a DIFFERENT batch arrives as batch 0 under a fresh checkpoint:
    # the old run's committed increment must not drain it silently.
    # Since r11 the store's _lineage marker refuses the FRESH
    # checkpoint at stream start — before any batch can alias.
    second = docs.filter(F.col("doc_id") % 10 == 5).withColumn("ts", ts)
    second.coalesce(1).write.mode("append").parquet(src2)
    with pytest.raises(Exception, match="ALIAS|lineage"):
        q2 = start("alias_p2", src2, ckpt2)
        try:
            q2.processAllAvailable()
        finally:
            q2.stop()
            q2.awaitTermination(60)


def test_markerless_store_alias_caught_per_batch(spark, sf_dir, tmp_path):
    """A store WITHOUT a _lineage marker (pre-r11 store, or a crash
    between .start() and the marker write) can't be refused at stream
    start — the per-batch doc_id-set comparison is the remaining
    guard and must still raise on an aliased batch of NEW docs."""
    import pytest

    from apachebeamkmeans_spark.sources import io
    from apachebeamkmeans_spark.streaming.ingest import run_ingest_gate_stream

    src1, src2, out_dir, ckpt1, ckpt2, store = (
        str(tmp_path / d)
        for d in ("src1", "src2", "out", "ckpt1", "ckpt2", "state")
    )
    docs = io.read_table(spark, sf_dir, "documents").select("doc_id", "text")
    corpus = docs.filter(F.col("doc_id") % 10 != 0)
    ts = F.to_timestamp(F.lit("2025-01-01 00:00:00"))
    first = docs.filter(F.col("doc_id") % 10 == 0).withColumn("ts", ts)
    first.coalesce(1).write.mode("append").parquet(src1)

    def start(name, src, ckpt):
        return run_ingest_gate_stream(
            spark, corpus, src, first.schema, out_dir, ckpt,
            8, 3, 0.5, name=name, fold_accepted=True, state_store=store,
        )

    q1 = start("ml_alias_p1", src1, ckpt1)
    try:
        q1.processAllAvailable()
    finally:
        q1.stop()
        q1.awaitTermination(60)
    os.remove(os.path.join(store, "_lineage"))  # the markerless store

    second = docs.filter(F.col("doc_id") % 10 == 5).withColumn("ts", ts)
    second.coalesce(1).write.mode("append").parquet(src2)
    q2 = start("ml_alias_p2", src2, ckpt2)
    with pytest.raises(Exception, match="ALIAS"):
        try:
            q2.processAllAvailable()
        finally:
            q2.stop()
            q2.awaitTermination(60)
