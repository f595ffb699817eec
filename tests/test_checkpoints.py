"""Scoped checkpoint-block release (checkpoints.release_blocks, r18)."""

from __future__ import annotations

from apachebeamkmeans_spark.checkpoints import release_blocks


def _n_persisted(spark) -> int:
    return spark.sparkContext._jsc.getPersistentRDDs().size()


def test_release_blocks_unpersists_only_its_own_rdd(spark):
    base = _n_persisted(spark)
    a = spark.range(100).localCheckpoint(eager=True)
    b = a.selectExpr("id + 1 AS y").localCheckpoint(eager=True)
    assert _n_persisted(spark) == base + 2
    release_blocks(b)
    assert _n_persisted(spark) == base + 1
    assert a.count() == 100  # a untouched by b's release
    release_blocks(a)
    assert _n_persisted(spark) == base


def test_release_blocks_noop_on_lazy_and_none(spark):
    base = _n_persisted(spark)
    lazy = spark.range(10).localCheckpoint(eager=False)
    release_blocks(lazy)     # never materialized — no-op, no error
    release_blocks(None)
    plain = spark.range(10)  # not a checkpoint at all
    release_blocks(plain)
    assert plain.count() == 10
    assert _n_persisted(spark) == base


def test_trainers_leave_no_persistent_blocks(spark, sf_dir):
    """ivf_train / pq_train / pca_train consume their checkpoints
    internally — after each returns, the block manager must hold no
    new persistent RDDs (the r17 leak class, now engine-owned)."""
    from apachebeamkmeans_spark.operators import ann_train as ANN
    from apachebeamkmeans_spark.sources import io

    pts = io.load_points(spark, sf_dir)
    base = _n_persisted(spark)
    ANN.ivf_train(pts, 4, 2)
    assert _n_persisted(spark) == base
    ANN.pq_train(pts, 8, 4, 1)
    assert _n_persisted(spark) == base
    ANN.pca_train(pts, 2)
    assert _n_persisted(spark) == base
