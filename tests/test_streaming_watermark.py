"""Append-mode watermark semantics: late rows behind the watermark are
dropped; windows emit only once the watermark passes their end.

The complete-mode streaming query (`stream_events_hourly`) proves
batch-equivalence; this test proves the *late-data* behavior that only
append mode exercises — the semantics a 100 TB streaming deployment
actually relies on to bound state.
"""

from __future__ import annotations

import time

from pyspark.sql import functions as F

BASE = "2024-01-01 00:00:00"


def _write_batch(spark, path, rows):
    spark.createDataFrame(rows, "event_id long, ts timestamp, value double").coalesce(
        1
    ).write.mode("append").parquet(path)


def _ts(hours: float):
    import datetime

    return datetime.datetime(2024, 1, 1) + datetime.timedelta(hours=hours)


def test_append_mode_drops_late_rows(spark, tmp_path):
    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")

    # batch 1: window [0h,1h) gets 2 rows; an event at 5h pushes the
    # watermark (max event time - 1h) to 4h once the batch commits.
    _write_batch(spark, src, [(1, _ts(0.1), 1.0), (2, _ts(0.2), 2.0), (3, _ts(5.0), 5.0)])
    time.sleep(1.1)  # distinct mtimes → deterministic file order
    # batch 2: advances the stream so the 4h watermark takes effect and
    # window [0h,1h) is evicted + emitted with its 2 on-time rows.
    _write_batch(spark, src, [(5, _ts(6.0), 6.0)])
    time.sleep(1.1)
    # batch 3: a late row for the already-closed [0h,1h) window — behind
    # the watermark, must be DROPPED; a row at 7h keeps the stream moving.
    _write_batch(spark, src, [(4, _ts(0.5), 100.0), (6, _ts(7.0), 7.0)])

    stream = (
        spark.readStream.schema("event_id long, ts timestamp, value double")
        .option("maxFilesPerTrigger", "1")
        .option("latestFirst", "false")
        .parquet(src)
    )
    agg = (
        stream.withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "1 hour").alias("w"))
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("v"))
        .select(F.col("w.start").alias("start"), "n", "v")
    )
    q = (
        agg.writeStream.outputMode("append")
        .format("memory")
        .queryName("wm_test")
        .option("checkpointLocation", ckpt)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    out = {r["start"].hour: (r["n"], r["v"]) for r in spark.sql("SELECT * FROM wm_test").collect()}
    # [0h,1h) emitted with ONLY the two on-time rows: the late row
    # (event 4, value 100.0) was dropped by the watermark.
    assert out.get(0) == (2, 3.0), out
    assert 100.0 not in {v for _, v in out.values()}
