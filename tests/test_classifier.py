"""Trained quality classifier (`operators/classifier.py`): the
MLlib-LogisticRegression distillation of the heuristic quality gate.

The registered verdict is hybrid-oracle (exact counts + bounded
booleans); these tests pin the parts the oracle can't: real accuracy
values, score-frame shape, the distillation actually beating the
base rate, and the degenerate-input contract."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from apachebeamkmeans_spark.operators import classifier as CLF
from apachebeamkmeans_spark.sources import io


@pytest.fixture(scope="module")
def feats(spark, sf_dir):
    return CLF.feature_frame(
        io.read_table(spark, sf_dir, "documents")
    ).localCheckpoint()


def test_distillation_beats_base_rate(spark, feats):
    train = feats.filter(F.col("doc_id") % 5 != 0)
    hold = feats.filter(F.col("doc_id") % 5 == 0)
    model = CLF.fit_quality_model(train)
    acc_train = CLF._accuracy(model, train)
    acc_hold = CLF._accuracy(model, hold)
    pos = hold.agg(F.avg("label")).collect()[0][0]
    base = max(pos, 1 - pos)  # majority-class accuracy
    assert acc_train >= 0.90 and acc_hold >= 0.85  # the registered floors
    assert acc_hold > base + 0.05  # it learned something, not the prior


def test_score_frame_shape_and_consistency(spark, sf_dir, feats):
    docs = io.read_table(spark, sf_dir, "documents")
    model = CLF.fit_quality_model(feats)
    scored = CLF.score_docs(model, docs)
    assert scored.columns == ["doc_id", "label", "prediction", "p_keep"]
    rows = scored.collect()
    assert len(rows) == docs.count()
    for r in rows:
        assert 0.0 <= r["p_keep"] <= 1.0
        # prediction is the 0.5-thresholded probability; p_keep is
        # rounded to 6dp while the threshold applies to the raw value,
        # so skip the (measure-zero) rounding boundary band
        if abs(r["p_keep"] - 0.5) > 1e-5:
            assert r["prediction"] == (1.0 if r["p_keep"] > 0.5 else 0.0)


def test_features_are_finite_and_label_nondegenerate(feats):
    rows = feats.collect()
    assert all(
        all(v is not None and v == v for v in r["features"]) for r in rows
    )
    labels = {r["label"] for r in rows}
    assert labels == {0.0, 1.0}  # both classes present at sf0.001


def test_empty_input_raises(spark):
    empty = spark.createDataFrame(
        [], "doc_id long, text string, lang string"
    )
    with pytest.raises(ValueError, match="non-empty points frame"):
        CLF.fit_quality_model(CLF.feature_frame(empty))


def test_pipeline_model_gate(spark, sf_dir, feats):
    """The facade stage equals score_docs-then-filter, stays a narrow
    map (no Exchange, no Join), and preserves ride-along columns."""
    from apachebeamkmeans_spark.pipeline import CurationPipeline
    from apachebeamkmeans_spark.plans import explain as X

    docs = io.read_table(spark, sf_dir, "documents")
    model = CLF.fit_quality_model(feats)
    gated = CurationPipeline(docs).model_gate(model, min_p=0.5).df()
    assert set(gated.columns) == set(docs.columns)
    assert X.n_exchanges(gated) == 0
    assert "Join" not in X.formatted_plan(gated)
    scored = CLF.score_docs(model, docs).collect()
    # exclude the 6dp-rounding boundary band: the gate thresholds the
    # RAW probability, score_docs reports it rounded
    boundary = {r["doc_id"] for r in scored if abs(r["p_keep"] - 0.5) <= 1e-5}
    got = {
        r["doc_id"] for r in gated.select("doc_id").collect()
    } - boundary
    want = {r["doc_id"] for r in scored if r["p_keep"] >= 0.5} - boundary
    assert got == want and 0 < len(got) < docs.count()


def test_empty_holdout_split_is_descriptive(spark):
    """A corpus whose ids never hit the holdout residue must raise a
    clear ValueError from the accuracy scan, not float(None)'s opaque
    TypeError (ADVICE r10)."""
    rows = [(i, "the quick brown fox jumps over the lazy dog " * 3)
            for i in range(1, 40) if i % 5 != 0]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    with pytest.raises(ValueError, match="empty split"):
        CLF.quality_classifier_report(docs).collect()
