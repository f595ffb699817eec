"""Checkpoint recovery for the streaming engine: stop a stateful
streaming aggregation mid-stream, restart it from the checkpoint, and
prove (a) the restarted query RESUMES — no micro-batch id is ever
reprocessed, the foreachBatch idempotent-sink contract — and (b) the
final complete-mode state equals the batch twin over all input.

This is the property that makes the streaming surface production-safe:
at 100 TB/day a stream WILL be restarted (deploys, failures), and
correctness then rests entirely on state-store checkpointing, which
processAllAvailable-style tests never exercise.
"""

from __future__ import annotations

import time

from apachebeamkmeans_spark.sources import io
from apachebeamkmeans_spark.streaming.events import hourly_agg_stream

N_FILES = 8


def _start(spark, src_dir, schema, checkpoint, sink, name):
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src_dir)
    )
    return (
        hourly_agg_stream(stream)
        .writeStream.outputMode("complete")
        .foreachBatch(sink)
        .option("checkpointLocation", checkpoint)
        .queryName(name)
        .start()
    )


def test_restart_resumes_from_checkpoint(spark, sf_dir, tmp_path):
    src_dir = str(tmp_path / "src")
    out_dir = str(tmp_path / "out")
    checkpoint = str(tmp_path / "ckpt")

    events = io.read_table(spark, sf_dir, "events")
    events.repartition(N_FILES).write.parquet(src_dir)
    schema = spark.read.parquet(src_dir).schema

    batches: dict[str, list[int]] = {"phase1": [], "phase2": []}

    def make_sink(phase: str):
        def sink(batch_df, batch_id: int) -> None:
            batches[phase].append(batch_id)
            batch_df.write.mode("overwrite").parquet(f"{out_dir}/batch={batch_id}")

        return sink

    # Phase 1: wait until at least one micro-batch has COMMITTED
    # (lastProgress reports a batch only after its commit lands), then
    # kill the query mid-stream (maxFilesPerTrigger=1 forces one file
    # per batch, so there is a mid-stream to kill in).
    q1 = _start(spark, src_dir, schema, checkpoint, make_sink("phase1"), "rec1")
    deadline = time.time() + 120
    while time.time() < deadline:
        p = q1.lastProgress
        if p is not None and p["batchId"] >= 1:
            break
        time.sleep(0.05)
    q1.stop()
    q1.awaitTermination(60)
    assert batches["phase1"], "phase 1 never started a micro-batch"

    # Stage LATE files before the restart: on a fast machine all
    # N_FILES batches can commit between the poll exiting and stop()
    # landing, which would leave phase 2 with no new batch and fail
    # the resume assertions vacuously (r5 advisor race). Two files
    # arriving only after the restart guarantee phase 2 real work —
    # and make the recovery claim stronger: the final answer must
    # merge checkpointed state with genuinely new data.
    late = io.read_table(spark, sf_dir, "events").limit(500)
    late.repartition(2).write.mode("append").parquet(src_dir)

    # Phase 2: a NEW query object, same checkpoint — must RESUME, not
    # restart. stop() may have interrupted one in-flight batch whose
    # commit never landed; exactly-once says that batch (and only that
    # batch) re-runs against the idempotent sink, and nothing earlier
    # ever replays.
    q2 = _start(spark, src_dir, schema, checkpoint, make_sink("phase2"), "rec2")
    try:
        q2.processAllAvailable()
    finally:
        q2.stop()

    p1, p2 = batches["phase1"], batches["phase2"]
    assert p2, "restart processed nothing"
    assert min(p2) >= max(p1)  # no committed batch replays
    all_ids = sorted(set(p1) | set(p2))
    assert all_ids == list(range(0, max(all_ids) + 1))  # no gaps either

    # The last complete-mode batch carries the full recovered state:
    # it must equal the batch twin over the whole input (the stream
    # plan run as a batch plan — withWatermark is a no-op on batch).
    got = sorted(
        map(tuple, spark.read.parquet(f"{out_dir}/batch={max(all_ids)}").collect())
    )
    want = sorted(
        map(tuple, hourly_agg_stream(spark.read.parquet(src_dir)).collect())
    )
    assert got == want and len(want) > 0

    # State survived the restart only if phase 2 processed fewer files
    # than the total (N_FILES + the 2 late ones) — i.e. the final
    # answer NEEDED checkpointed state.
    assert len(set(p2)) < N_FILES + 2
