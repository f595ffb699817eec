"""`ann` CLI subcommand: the AnnIndex facade as a shell surface
(r11 verdict item 7). Each verb must equal the library call it claims
to be — train persists a loadable index, append grows it, search
writes the same rows `topk_table` returns."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from apachebeamkmeans_spark import cli
from apachebeamkmeans_spark.ann import AnnIndex
from apachebeamkmeans_spark.sources import io


def _emb_path(sf_dir: str) -> str:
    return os.path.join(sf_dir, "embeddings.parquet")


def test_ann_train_then_search_matches_library(spark, sf_dir, tmp_path):
    idx_path = str(tmp_path / "cli_idx")
    rc = cli.main(
        [
            "ann", "train",
            "--embeddings", _emb_path(sf_dir),
            "--index-path", idx_path,
            "--k", "4",
        ],
        spark=spark,
    )
    assert rc == 0
    # the CLI-trained index is a plain AnnIndex: loadable, searchable
    idx = AnnIndex.load(spark, idx_path)
    assert idx.n_cells == 4 and idx.codebooks is None

    emb = io.read_table(spark, sf_dir, "embeddings")
    qsrc = str(tmp_path / "queries")
    emb.filter(F.col("vec_id") % 100 == 7).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qvec")
    ).write.parquet(qsrc)
    out = str(tmp_path / "hits")
    rc = cli.main(
        [
            "ann", "search",
            "--index-path", idx_path,
            "--queries", qsrc,
            "--output", out,
            "--k", "3", "--nprobe", "2",
        ],
        spark=spark,
    )
    assert rc == 0
    got = sorted(map(tuple, spark.read.parquet(out).collect()))
    want = sorted(
        map(
            tuple,
            idx.topk_table(
                spark.read.parquet(qsrc), k=3, nprobe=2
            ).collect(),
        )
    )
    assert got == want and got


def test_ann_append_grows_the_index(spark, sf_dir, tmp_path):
    idx_path = str(tmp_path / "cli_grow_idx")
    emb = io.read_table(spark, sf_dir, "embeddings")
    base_src = str(tmp_path / "base")
    emb.filter(F.col("vec_id") % 2 == 0).write.parquet(base_src)
    add_src = str(tmp_path / "add")
    emb.filter(F.col("vec_id") % 2 == 1).write.parquet(add_src)

    assert cli.main(
        ["ann", "train", "--embeddings", base_src,
         "--index-path", idx_path, "--k", "4"],
        spark=spark,
    ) == 0
    assert cli.main(
        ["ann", "append", "--embeddings", add_src,
         "--index-path", idx_path],
        spark=spark,
    ) == 0
    # appended ids are servable: search with an odd-id row as query
    idx = AnnIndex.load(spark, idx_path)
    row = emb.filter(F.col("vec_id") % 2 == 1).orderBy("vec_id").first()
    hits = idx.topk([[float(v) for v in row["embedding"]]], k=1, nprobe=4)
    top = hits.collect()[0]
    assert top["vec_id"] == row["vec_id"] and top["cosine"] == 1.0


def test_ann_train_pq_tier(spark, sf_dir, tmp_path):
    idx_path = str(tmp_path / "cli_pq_idx")
    rc = cli.main(
        [
            "ann", "train",
            "--embeddings", _emb_path(sf_dir),
            "--index-path", idx_path,
            "--k", "4", "--pq-m", "8", "--pq-ksub", "16",
        ],
        spark=spark,
    )
    assert rc == 0
    idx = AnnIndex.load(spark, idx_path)
    assert idx.codebooks is not None and len(idx.codebooks) == 8


def test_ann_compact_verb(spark, sf_dir, tmp_path):
    idx_path = str(tmp_path / "cli_compact_idx")
    emb = io.read_table(spark, sf_dir, "embeddings")
    base_src = str(tmp_path / "cbase")
    emb.write.parquet(base_src)
    add_src = str(tmp_path / "cadd")
    emb.filter(F.col("vec_id") % 10 == 1).selectExpr(
        "vec_id + 9000000 AS vec_id", "embedding"
    ).write.parquet(add_src)
    assert cli.main(
        ["ann", "train", "--embeddings", base_src,
         "--index-path", idx_path, "--k", "4"], spark=spark,
    ) == 0
    assert cli.main(
        ["ann", "append", "--embeddings", add_src,
         "--index-path", idx_path], spark=spark,
    ) == 0
    assert cli.main(
        ["ann", "compact", "--index-path", idx_path], spark=spark,
    ) == 0
    for d in os.listdir(idx_path):
        if d.startswith("coarse_id="):
            n = len(
                [f for f in os.listdir(os.path.join(idx_path, d))
                 if f.endswith(".parquet")]
            )
            assert n == 1, (d, n)
    assert AnnIndex.load(spark, idx_path).topk(
        [[0.1] * 64], k=1, nprobe=4
    ).count() == 1


def test_ann_retrain_verb(spark, sf_dir, tmp_path):
    """`ann retrain` equals the library verb: cells rebuilt to --k,
    the sidecar serves the retrained quantizer on a fresh load."""
    idx_path = str(tmp_path / "cli_retrain_idx")
    assert cli.main(
        ["ann", "train", "--embeddings", _emb_path(sf_dir),
         "--index-path", idx_path, "--k", "4"],
        spark=spark,
    ) == 0
    assert cli.main(
        ["ann", "retrain", "--index-path", idx_path, "--k", "6"],
        spark=spark,
    ) == 0
    idx = AnnIndex.load(spark, idx_path)
    assert idx.n_cells == 6
    assert idx.topk([[0.1] * 64], k=3, nprobe=2).count() == 3


def test_ann_retrain_pointer_strategy(spark, sf_dir, tmp_path):
    """--strategy pointer publishes a gen-* child + _ann_current
    instead of renaming — the remote-filesystem maintenance path."""
    idx_path = str(tmp_path / "cli_ptr_idx")
    assert cli.main(
        ["ann", "train", "--embeddings", _emb_path(sf_dir),
         "--index-path", idx_path, "--k", "4"],
        spark=spark,
    ) == 0
    assert cli.main(
        ["ann", "retrain", "--index-path", idx_path, "--k", "5",
         "--strategy", "pointer"],
        spark=spark,
    ) == 0
    entries = os.listdir(idx_path)
    assert "_ann_current" in entries
    assert [d for d in entries if d.startswith("gen-")]
    assert AnnIndex.load(spark, idx_path).n_cells == 5


def test_ann_search_where_filters(spark, sf_dir, tmp_path):
    """search --where on a meta-trained index: every returned hit
    satisfies the predicate and equals the library filtered call."""
    idx_path = str(tmp_path / "cli_where_idx")
    assert cli.main(
        ["ann", "train", "--embeddings", _emb_path(sf_dir),
         "--index-path", idx_path, "--k", "4", "--meta-cols", "label"],
        spark=spark,
    ) == 0
    emb = io.read_table(spark, sf_dir, "embeddings")
    qsrc = str(tmp_path / "where_queries")
    emb.filter(F.col("vec_id") % 100 == 7).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qvec")
    ).write.parquet(qsrc)
    out = str(tmp_path / "where_hits")
    assert cli.main(
        ["ann", "search", "--index-path", idx_path, "--queries", qsrc,
         "--output", out, "--k", "5", "--nprobe", "2",
         "--where", "label = 1"],
        spark=spark,
    ) == 0
    idx = AnnIndex.load(spark, idx_path)
    got = sorted(map(tuple, spark.read.parquet(out).collect()))
    want = sorted(map(tuple, idx.topk_table(
        spark.read.parquet(qsrc), k=5, nprobe=2, where="label = 1"
    ).collect()))
    assert got == want and got
    # every hit's vec_id really has label 1
    hit_ids = {r["vec_id"] for r in spark.read.parquet(out).collect()}
    lab1 = {
        r["vec_id"]
        for r in emb.filter(F.col("label") == 1).select("vec_id").collect()
    }
    assert hit_ids <= lab1


def test_ann_delete_verb(spark, sf_dir, tmp_path):
    """`ann delete` removes the matching rows through the same
    partition-scoped rewrite the library verb runs."""
    idx_path = str(tmp_path / "cli_del_idx")
    assert cli.main(
        ["ann", "train", "--embeddings", _emb_path(sf_dir),
         "--index-path", idx_path, "--k", "4"],
        spark=spark,
    ) == 0
    emb = io.read_table(spark, sf_dir, "embeddings")
    n_match = emb.filter("vec_id % 10 = 4").count()
    n_before = spark.read.parquet(idx_path).count()
    assert cli.main(
        ["ann", "delete", "--index-path", idx_path,
         "--where", "vec_id % 10 = 4"],
        spark=spark,
    ) == 0
    layout = spark.read.parquet(idx_path)
    assert layout.count() == n_before - n_match
    assert layout.filter("vec_id % 10 = 4").count() == 0


def test_ann_delete_tombstone_flag(spark, sf_dir, tmp_path):
    """`ann delete --tombstone` (r16): the physical layout keeps the
    rows, serving excludes them — the flag maps to the library's
    tombstone mode."""
    from apachebeamkmeans_spark.ann import AnnIndex

    idx_path = str(tmp_path / "cli_ts_idx")
    assert cli.main(
        ["ann", "train", "--embeddings", _emb_path(sf_dir),
         "--index-path", idx_path, "--k", "4"],
        spark=spark,
    ) == 0
    n_before = spark.read.parquet(idx_path).count()
    assert cli.main(
        ["ann", "delete", "--index-path", idx_path,
         "--where", "vec_id % 10 = 4", "--tombstone"],
        spark=spark,
    ) == 0
    assert spark.read.parquet(idx_path).count() == n_before  # physical
    idx = AnnIndex.load(spark, idx_path)
    served = {
        r["vec_id"]
        for r in idx.topk(
            [[0.1 * ((i * 7 + j) % 5 - 2) for j in range(64)]
             for i in range(3)],
            k=500, nprobe=4,
        ).collect()
    }
    assert served and not any(v % 10 == 4 for v in served)


def test_ann_upsert_verb(spark, sf_dir, tmp_path):
    idx_path = str(tmp_path / "cli_ups_idx")
    assert cli.main(
        ["ann", "train", "--embeddings", _emb_path(sf_dir),
         "--index-path", idx_path, "--k", "4"],
        spark=spark,
    ) == 0
    emb = io.read_table(spark, sf_dir, "embeddings")
    n0 = spark.read.parquet(idx_path).count()
    batch_src = str(tmp_path / "ups_batch")
    emb.filter(F.col("vec_id") % 20 == 7).select(
        "vec_id", F.reverse(F.col("embedding")).alias("embedding")
    ).write.parquet(batch_src)
    assert cli.main(
        ["ann", "upsert", "--embeddings", batch_src,
         "--index-path", idx_path],
        spark=spark,
    ) == 0
    layout = spark.read.parquet(idx_path)
    assert layout.count() == n0  # pure replace, no growth
    assert layout.select("vec_id").distinct().count() == n0


def test_ann_compact_pressure_gate(spark, sf_dir, tmp_path):
    """r17: `ann compact --if-tombstone-*` maps to
    AnnIndex.compact_on_pressure — skipped under threshold, compacts
    (sidecar cleared) over it."""
    from apachebeamkmeans_spark.ann import AnnIndex
    from apachebeamkmeans_spark.sources import io

    emb_p = f"{sf_dir}/embeddings.parquet"
    idx_p = str(tmp_path / "cli_ann_press")
    assert cli.main(
        ["ann", "train", "--embeddings", emb_p, "--index-path", idx_p,
         "--k", "4"],
        spark=spark,
    ) == 0
    assert cli.main(
        ["ann", "delete", "--index-path", idx_p,
         "--where", "vec_id % 25 = 3", "--tombstone"],
        spark=spark,
    ) == 0
    idx = AnnIndex.load(spark, idx_p)
    assert len(idx._ts_entries()) == 1
    assert cli.main(
        ["ann", "compact", "--index-path", idx_p,
         "--if-tombstone-sidecars", "3"],
        spark=spark,
    ) == 0
    assert len(AnnIndex.load(spark, idx_p)._ts_entries()) == 1  # skipped
    assert cli.main(
        ["ann", "compact", "--index-path", idx_p,
         "--if-tombstone-sidecars", "0"],
        spark=spark,
    ) == 0
    assert AnnIndex.load(spark, idx_p)._ts_entries() == []  # compacted
