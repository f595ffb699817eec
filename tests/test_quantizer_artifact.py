"""The trained-quantizer artifact (r6 verdict item 3): the session
memo in front of `_knn_quantizer` dies with the process, so a COLD
session must read the previous session's training back from the
parquet artifact instead of re-paying the distributed Lloyd cost —
and a REGENERATED embeddings.parquet (newer mtime) must miss and
retrain, never serve stale centers."""

from __future__ import annotations

import os
import time


def _mk_sfdir(tmp_path, name="sfx"):
    import pyarrow as pa
    import pyarrow.parquet as pq

    d = tmp_path / name
    d.mkdir()
    # content is irrelevant (the training frame is passed separately);
    # only the file's EXISTENCE and mtime key the artifact
    pq.write_table(pa.table({"x": [1]}), str(d / "embeddings.parquet"))
    return str(d)


def test_quantizer_artifact_cold_session_and_staleness(spark, tmp_path, monkeypatch):
    import apachebeamkmeans_spark.queries_similarity as QS
    from apachebeamkmeans_spark.operators import ann_train as ANN

    sf_dir = _mk_sfdir(tmp_path)
    rows = [(i, [float(i % 3), float(i % 5), 1.0, float(i)]) for i in range(12)]
    base = spark.createDataFrame(rows, "id long, features array<double>")

    calls = {"n": 0}
    real_train = ANN.ivf_train

    def counting(*a, **kw):
        calls["n"] += 1
        return real_train(*a, **kw)

    monkeypatch.setattr(ANN, "ivf_train", counting)

    QS._KNN_QUANTIZER_MEMO.clear()
    c1 = QS._knn_quantizer(base, sf_dir, 2)
    assert calls["n"] == 1 and len(c1) == 2

    # warm: memo hit, no disk read or training
    QS._knn_quantizer(base, sf_dir, 2)
    assert calls["n"] == 1

    # cold session (memo cleared): artifact read-through, NO retraining
    QS._KNN_QUANTIZER_MEMO.clear()
    c2 = QS._knn_quantizer(base, sf_dir, 2)
    assert calls["n"] == 1
    assert c2 == c1

    # regenerated data at the same path (newer mtime) → artifact miss,
    # retrain; deterministic trainer → identical centers
    t = time.time() + 10
    os.utime(os.path.join(sf_dir, "embeddings.parquet"), (t, t))
    QS._KNN_QUANTIZER_MEMO.clear()
    c3 = QS._knn_quantizer(base, sf_dir, 2)
    assert calls["n"] == 2
    assert c3 == c1


def test_quantizer_artifact_corruption_falls_back_to_training(
    spark, tmp_path, monkeypatch
):
    import apachebeamkmeans_spark.queries_similarity as QS
    from apachebeamkmeans_spark.operators import ann_train as ANN

    sf_dir = _mk_sfdir(tmp_path, name="sfy")
    rows = [(i, [float(i), 1.0]) for i in range(8)]
    base = spark.createDataFrame(rows, "id long, features array<double>")

    QS._KNN_QUANTIZER_MEMO.clear()
    c1 = QS._knn_quantizer(base, sf_dir, 2)

    # truncate the artifact to garbage: the read returns None and the
    # consumer retrains instead of crashing or serving junk
    mt = os.path.getmtime(os.path.join(sf_dir, "embeddings.parquet"))
    art = QS._quantizer_artifact_path(sf_dir, 2, mt)
    with open(art, "wb") as f:
        f.write(b"not parquet")
    QS._KNN_QUANTIZER_MEMO.clear()
    c2 = QS._knn_quantizer(base, sf_dir, 2)
    assert c2 == c1
