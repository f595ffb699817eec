"""`curate` CLI subcommand: the CurationPipeline facade as a shell
surface. Each run must equal the library composition it claims to be
(same stages, same parameters), and the packed/summary outputs must
be the library's."""

from __future__ import annotations

import json
import os

from apachebeamkmeans_spark import cli
from apachebeamkmeans_spark.pipeline import CurationPipeline
from apachebeamkmeans_spark.sources import io


def _docs(spark, sf_dir):
    return io.read_table(spark, sf_dir, "documents")


def test_curate_matches_library_composition(spark, sf_dir, tmp_path):
    out = tmp_path / "survivors"
    summ = tmp_path / "summary.json"
    rc = cli.main(
        [
            "curate",
            "--input", os.path.join(sf_dir, "documents.parquet"),
            "--output", str(out),
            "--exact-dedup", "--near-dedup", "--jaccard", "0.5",
            "--quality-gate", "--min-chars", "30", "--langs", "en",
            "--summary-file", str(summ),
        ],
        spark=spark,
    )
    assert rc == 0
    got = {r["doc_id"] for r in spark.read.parquet(str(out)).collect()}
    want_df = (
        CurationPipeline(_docs(spark, sf_dir))
        .exact_dedup()
        .near_dedup(threshold=0.5)
        .quality_gate(min_chars=30, langs=("en",))
        .df()
    )
    want = {r["doc_id"] for r in want_df.select("doc_id").collect()}
    assert got == want and 0 < len(got)

    s = json.loads(summ.read_text())
    assert s["n_out"] == len(got)
    assert s["n_in"] == _docs(spark, sf_dir).count()
    assert sum(g["n_docs"] for g in s["groups"]) == len(got)


def test_curate_pack_emits_layout(spark, sf_dir, tmp_path):
    out = tmp_path / "packed"
    rc = cli.main(
        [
            "curate",
            "--input", os.path.join(sf_dir, "documents.parquet"),
            "--output", str(out),
            "--exact-dedup", "--pack", "--ctx-len", "256",
            "--n-shards", "4",
        ],
        spark=spark,
    )
    assert rc == 0
    packed = spark.read.parquet(str(out))
    assert set(packed.columns) == {"doc_id", "shard", "n_tokens", "bin_id"}
    assert 0 < packed.count()
    assert packed.select("shard").distinct().count() <= 4


def test_curate_embedding_stages_and_guard(spark, sf_dir, tmp_path):
    import pytest

    with pytest.raises(SystemExit, match="--embeddings"):
        cli.main(
            [
                "curate", "--input",
                os.path.join(sf_dir, "documents.parquet"),
                "--output", str(tmp_path / "x"), "--semantic-dedup",
            ],
            spark=spark,
        )
    out = tmp_path / "sem"
    rc = cli.main(
        [
            "curate",
            "--input", os.path.join(sf_dir, "documents.parquet"),
            "--output", str(out),
            "--embeddings", os.path.join(sf_dir, "embeddings.parquet"),
            "--semantic-dedup", "--coverage-select", "--per-cell", "2",
        ],
        spark=spark,
    )
    assert rc == 0
    got = {r["doc_id"] for r in spark.read.parquet(str(out)).collect()}
    emb = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
    centers = CurationPipeline.train_quantizer(emb)
    want_df = (
        CurationPipeline(_docs(spark, sf_dir))
        .semantic_dedup(emb, centers=centers)
        .coverage_select(emb, per_cell=2, centers=centers)
        .df()
    )
    want = {r["doc_id"] for r in want_df.select("doc_id").collect()}
    assert got == want and 0 < len(got)


def test_curate_model_gate(spark, sf_dir, tmp_path):
    from apachebeamkmeans_spark.operators import classifier as CLF

    out = tmp_path / "modelgated"
    rc = cli.main(
        [
            "curate",
            "--input", os.path.join(sf_dir, "documents.parquet"),
            "--output", str(out),
            "--exact-dedup", "--model-gate", "--min-p", "0.5",
        ],
        spark=spark,
    )
    assert rc == 0
    got = {r["doc_id"] for r in spark.read.parquet(str(out)).collect()}
    docs = _docs(spark, sf_dir)
    model = CLF.fit_quality_model(CLF.feature_frame(docs))
    want_df = (
        CurationPipeline(docs).exact_dedup().model_gate(model, min_p=0.5).df()
    )
    want = {r["doc_id"] for r in want_df.select("doc_id").collect()}
    assert got == want and got


def test_curate_model_path_saves_then_reuses(spark, sf_dir, tmp_path):
    """--model-path: first run fits and saves; second run on a
    DIFFERENT corpus must load the saved gate rather than refit
    (ADVICE r10) — the survivors therefore match a library gate built
    from the saved model, not from a fresh fit on the new input."""
    from pyspark.ml.classification import LogisticRegressionModel

    model_dir = tmp_path / "gate_model"
    out1 = tmp_path / "run1"
    rc = cli.main(
        [
            "curate",
            "--input", os.path.join(sf_dir, "documents.parquet"),
            "--output", str(out1),
            "--model-gate", "--model-path", str(model_dir),
        ],
        spark=spark,
    )
    assert rc == 0 and os.path.isdir(model_dir)

    # a shifted corpus: a refit here would see different doc_ids/text;
    # loading means the gate is exactly the saved coefficient vector
    docs = _docs(spark, sf_dir)
    shifted_path = tmp_path / "shifted_docs"
    docs.filter("doc_id % 3 = 0").write.parquet(str(shifted_path))
    out2 = tmp_path / "run2"
    rc = cli.main(
        [
            "curate",
            "--input", str(shifted_path),
            "--output", str(out2),
            "--model-gate", "--model-path", str(model_dir),
        ],
        spark=spark,
    )
    assert rc == 0
    got = {r["doc_id"] for r in spark.read.parquet(str(out2)).collect()}
    saved = LogisticRegressionModel.load(str(model_dir))
    want_df = (
        CurationPipeline(spark.read.parquet(str(shifted_path)))
        .model_gate(saved, min_p=0.5)
        .df()
    )
    want = {r["doc_id"] for r in want_df.select("doc_id").collect()}
    assert got == want and got
