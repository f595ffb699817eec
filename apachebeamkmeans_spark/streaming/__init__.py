"""Streaming surface shared helpers.

`stream_shuffle_partitions` scopes a stateful stream's shuffle/state
partitioning to the STATE VOLUME instead of the session's core-count
default. Every stateful operator (stream-stream join, windowed agg,
dropDuplicates, applyInPandasWithState) instantiates one state-store
partition per shuffle partition and commits each of them per
micro-batch — with a stream-stream join that is 4 stores × partitions
× batches of pure per-store overhead (provider init, delta file,
commit fsync) regardless of rows. Measured at sf0.1 (r17, guide §2.2
"fewer, larger partitions" applied to state stores): the click/
purchase attribution join runs 7.3-12.9 s at 32 partitions and
2.7 s at 8 — identical 371-row result.

The dial is `SPARK_GRAFT_STREAM_SHUFFLE` (default 8): the bench's
streams carry ~10⁴-key state, where 8 stores already saturate; a
production stream sizes this to its key cardinality and executor
count (state stores are also the unit of streaming parallelism, so
at 100 TB this is hundreds — the env var, not a code change).
"""

from __future__ import annotations

import os
from contextlib import contextmanager


@contextmanager
def stream_shuffle_partitions(spark):
    """Scope `spark.sql.shuffle.partitions` to the streaming-state dial
    for the duration of one streaming query run (set before `start()`,
    restored after `stop()` — the stream fixes its state partitioning
    at the first micro-batch, and batch queries planned afterwards must
    see the session default again)."""
    key = "spark.sql.shuffle.partitions"
    target = os.environ.get("SPARK_GRAFT_STREAM_SHUFFLE", "8")
    prev = spark.conf.get(key, None)
    spark.conf.set(key, target)
    try:
        yield
    finally:
        if prev is None:
            spark.conf.unset(key)
        else:
            spark.conf.set(key, prev)
