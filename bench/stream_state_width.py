"""Streaming state-SIZE scaling: the attribution join vs window width.

The SCALE.md events-only series scales users WITH events (per-user
density constant), so it measures per-event cost at CONSTANT state
density — the state-size dimension itself stayed argued, not measured
(r10 verdict item 6). This harness fixes the DATA (one events table,
fixed users) and widens the attribution HORIZON (1 h → 6 h → 24 h):
the stream-stream join must retain clicks for watermark + horizon and
purchases for watermark, so retained state grows linearly with the
horizon while the input volume stays identical. Output pairs also
grow with the horizon (each click matches more purchases), so the
harness reports BOTH the drive time and the output-pair count per
horizon — the state law is the residual after the output term
(seconds per emitted pair) is accounted for.

Usage: python bench/stream_state_width.py [data_dir] [horizons_min...]
  data_dir default: .scaledata/x100ev if present, else
  $SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1)
  horizons default: 60 360 1440
Prints one JSON line:
  {"dir": ..., "n_events": N,
   "horizons": {"60": {"sec": .., "pairs": ..}, ...}}
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from apachebeamkmeans_spark.session import get_spark
from apachebeamkmeans_spark.streaming.events import (
    click_purchase_join_stream,
    read_events_stream,
)


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

    spark = get_spark("stream-state-width")
    n_events = spark.read.parquet(f"{data_dir}/events.parquet").count()
    spark.range(1000).selectExpr("sum(id)").collect()  # session warmup

    out: dict[str, dict[str, float]] = {}
    for h in horizons:
        # fresh stream per horizon, driven to completion on a memory
        # sink exactly like the registered query's runner; timed end
        # to end (bench methodology: the drive IS the measurement)
        name = f"state_width_{h}"
        t0 = time.perf_counter()
        q = (
            click_purchase_join_stream(
                read_events_stream(spark, data_dir), horizon_min=h
            )
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
        spark.catalog.clearCache()
        out[str(h)] = {"sec": round(sec, 3), "pairs": pairs}
        print(f"# horizon={h}min: {sec:.2f}s, {pairs} pairs", file=sys.stderr)

    print(json.dumps({"dir": data_dir, "n_events": n_events, "horizons": out}))


if __name__ == "__main__":
    main()
