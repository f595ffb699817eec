"""Streaming state-SIZE scaling: the attribution join vs window width.

The SCALE.md events-only series scales users WITH events (per-user
density constant), so it measures per-event cost at CONSTANT state
density — the state-size dimension itself stayed argued, not measured
(r10 verdict item 6). This harness fixes the DATA (one events table,
fixed users) and widens the attribution HORIZON (1 h → 6 h → 24 h).

Methodology note that matters: the scale-series events table is ONE
parquet file, and a file stream consumes it in ONE micro-batch — a
single-batch drive never evicts state mid-stream, so horizon width is
invisible to it (measured: flat ~9-12 s medians at 1 h/6 h/24 h with
24× the output pairs — the r11 first-cut finding). To make retained
state REAL, the harness stages the events into `N_SLICES`
time-ordered single-file slices (uniform event-time buckets, written
in order so the file source's oldest-first mtime ordering replays
time) and drives with `maxFilesPerTrigger=1`: N_SLICES triggers, the
watermark advances per trigger, and the join's click state holds
exactly (watermark + horizon) of history — ~28k rows at 1 h vs ~350k
at 24 h on the x100ev profile. What the law then measures is the
per-trigger state-store maintenance + probe cost as retained state
grows 24× at identical input volume and trigger count.

Usage: python bench/stream_state_width.py [data_dir] [horizons_min...]
  data_dir default: .scaledata/x100ev if present, else
  $SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1)
  horizons default: 60 360 1440; reps via $STATE_WIDTH_REPS (3)
Prints one JSON line:
  {"dir": ..., "n_events": N, "n_slices": S,
   "horizons": {"60": {"secs": [...], "median": .., "pairs": ..}, ...}}
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from apachebeamkmeans_spark.session import get_spark
from apachebeamkmeans_spark.streaming.events import click_purchase_join_stream

N_SLICES = 10


def stage_time_ordered(spark, data_dir: str, out_root: str) -> None:
    """Split the single-file events table into N_SLICES uniform
    event-time buckets, each ONE file, written oldest-first so the
    file stream's mtime order replays time. Raw columns pass through
    unchanged (ts stays whatever the generator wrote — the streaming
    reader's normalize step applies identically to the staged dir)."""
    import shutil

    from pyspark.sql import functions as F

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    ev = spark.read.parquet(f"{data_dir}/events.parquet")
    # monotone bucket key for any ts encoding (ns-long, timestamp, or
    # TIMESTAMP_NTZ — which Spark 4 refuses to cast to bigint directly)
    dt = dict(ev.dtypes)["ts"]
    tsl = (
        F.col("ts")
        if dt in ("bigint", "long")
        else F.unix_micros(F.col("ts").cast("timestamp"))
    )
    row = ev.agg(F.min(tsl).alias("mn"), F.max(tsl).alias("mx")).first()
    mn, mx = row["mn"], row["mx"]
    width = max(1, (mx - mn) // N_SLICES + 1)
    os.makedirs(out_root, exist_ok=True)
    for i in range(N_SLICES):
        lo, hi = mn + i * width, mn + (i + 1) * width
        tmp = os.path.join(out_root, f"_tmp_{i}")
        (
            ev.filter((tsl >= lo) & (tsl < hi))
            .coalesce(1)
            .write.mode("overwrite")
            .parquet(tmp)
        )
        part = next(
            f for f in os.listdir(tmp)
            if f.endswith(".parquet") and not f.startswith("_")
        )
        os.replace(
            os.path.join(tmp, part),
            os.path.join(out_root, f"ev_{i:03d}.parquet"),
        )
        shutil.rmtree(tmp)
        print(f"# staged slice {i + 1}/{N_SLICES}", file=sys.stderr)


def _staged_stream(spark, staged_dir: str):
    """File stream over the staged slice files, one file per trigger —
    read_events_stream can't serve here (its pathGlobFilter pins the
    single-file layout name), but the ts normalization is the same."""
    from apachebeamkmeans_spark.sources.io import normalize_event_ts

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    schema = spark.read.parquet(staged_dir).schema
    raw = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(staged_dir)
    )
    return normalize_event_ts(raw)


def drive(spark, staged_dir: str, h: int, name: str) -> tuple[float, int]:
    t0 = time.perf_counter()
    q = (
        click_purchase_join_stream(_staged_stream(spark, staged_dir), horizon_min=h)
        .writeStream.outputMode("append")
        .format("memory")
        .queryName(name)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    sec = time.perf_counter() - t0
    pairs = spark.table(name).count()
    spark.catalog.dropTempView(name)  # memory sink = temp view
    spark.catalog.clearCache()
    return round(sec, 3), pairs


def main() -> None:
    args = sys.argv[1:]
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    default_dir = os.path.join(repo, ".scaledata", "x100ev")
    if args and not args[0].isdigit():
        data_dir, args = args[0], args[1:]
    elif os.path.isdir(default_dir):
        data_dir = default_dir
    else:
        data_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    horizons = [int(a) for a in args] or [60, 360, 1440]
    reps = int(os.environ.get("STATE_WIDTH_REPS", "3"))

    spark = get_spark("stream-state-width")
    # stream-stream join state partitions = shuffle partitions; at 32
    # the 4-store-per-partition trigger floor dominates every reading
    # (~3 s/trigger measured) — 8 keeps the law visible. Constant
    # across horizons, so it cancels out of the comparison.
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    # STATE_WIDTH_PROVIDER=rocksdb swaps the state store for the
    # disk-backed RocksDB provider Spark 4 ships — the cluster-scale
    # choice once retained state outgrows the executor heap (the
    # HDFS-backed default keeps the whole map on-heap and re-snapshots
    # it per commit). Same series both ways = the provider's cost law.
    provider = os.environ.get("STATE_WIDTH_PROVIDER", "")
    if provider.lower() == "rocksdb":
        spark.conf.set(
            "spark.sql.streaming.stateStore.providerClass",
            "org.apache.spark.sql.execution.streaming.state."
            "RocksDBStateStoreProvider",
        )
    # mtime-keyed like _ivf_index_path: regenerated events data must
    # restage, never silently reuse stale slices (r11 review); old
    # generations reaped on entry
    from apachebeamkmeans_spark import scratch

    base = os.path.basename(data_dir.rstrip("/"))
    mt = scratch.data_mtime(data_dir, "events")
    staged = os.path.join(
        repo, ".scaledata", f"state_width_{base}_m{mt}"
    )
    scratch.reap(os.path.dirname(staged), f"state_width_{base}_", keep=staged)
    if not os.path.isdir(staged) or len(
        [f for f in os.listdir(staged) if f.endswith(".parquet")]
    ) != N_SLICES:
        stage_time_ordered(spark, data_dir, staged)
    n_events = spark.read.parquet(f"{staged}/*.parquet").count()

    # one UNTIMED drive: the session's first streaming query pays
    # source listing + codegen + state-store provider init
    drive(spark, staged, horizons[0], "state_width_warmup")

    out: dict[str, dict] = {}
    for h in horizons:
        secs: list[float] = []
        pairs = 0
        for r in range(reps):
            sec, pairs = drive(spark, staged, h, f"state_width_{h}_{r}")
            secs.append(sec)
        med = sorted(secs)[len(secs) // 2]
        out[str(h)] = {"secs": secs, "median": med, "pairs": pairs}
        print(f"# horizon={h}min: {secs} -> median {med:.2f}s, "
              f"{pairs} pairs", file=sys.stderr)

    print(json.dumps({
        "dir": data_dir, "n_events": n_events, "n_slices": N_SLICES,
        "provider": provider or "hdfs(default)",
        "horizons": out,
    }))


if __name__ == "__main__":
    main()
