"""Event-time operators: tumbling windows, sessionization, as-of join.

Absent from the reference (its Beam pipelines are bounded batch with no
windows/watermarks — SURVEY.md §2.7); these are the event-table
capabilities a data-pipeline engine needs. All batch DataFrame plans;
the streaming twins live in `streaming/events.py`.

Scale posture: every operator partitions by a key (user_id) before any
window, so state is distributed; no global-order windows anywhere.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def tumbling_agg(events: DataFrame, bucket: str = "hour",
                 ts_col: str = "ts") -> DataFrame:
    """Per-(bucket, event_type) counts + value stats. date_trunc keeps
    the bucket a plain column → normal hash aggregation."""
    return (
        events.withColumn("bucket", F.date_trunc(bucket, F.col(ts_col)))
        .groupBy("bucket", "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 4).alias("sum_value"),
            F.round(F.avg("value"), 6).alias("avg_value"),
        )
    )


def sessionize(events: DataFrame, gap_minutes: int = 30,
               user_col: str = "user_id", ts_col: str = "ts",
               id_col: str = "event_id") -> DataFrame:
    """Gaps-and-islands sessionization: a new session starts when the
    gap to the previous event of the same user exceeds `gap_minutes`.

    Windows partition by user — no global sort; sessions are computed
    with two window passes (lag → cumulative sum of boundary flags).
    Timestamps are compared in integer microseconds (exact).
    """
    gap_us = gap_minutes * 60 * 1_000_000
    us = F.unix_micros(F.col(ts_col))
    w = Window.partitionBy(user_col).orderBy(us.asc(), F.col(id_col).asc())
    flagged = events.withColumn(
        "__new_session",
        F.when(us - F.lag(us).over(w) > gap_us, 1).otherwise(
            F.when(F.lag(us).over(w).isNull(), 1).otherwise(0)
        ),
    )
    return flagged.withColumn(
        "session_seq",
        F.sum("__new_session").over(w.rowsBetween(Window.unboundedPreceding, 0)).cast("int"),
    ).drop("__new_session")


def session_stats(events: DataFrame, gap_minutes: int = 30) -> DataFrame:
    """One row per session: bounds (µs), event count, total value."""
    s = sessionize(events, gap_minutes)
    return s.groupBy("user_id", "session_seq").agg(
        F.min(F.unix_micros("ts")).alias("session_start_us"),
        F.max(F.unix_micros("ts")).alias("session_end_us"),
        F.count(F.lit(1)).alias("n_events"),
        F.round(F.sum("value"), 4).alias("sum_value"),
    )


def session_counts(events: DataFrame, gap_minutes: int = 30) -> DataFrame:
    """Final per-user session/event counts — one row per user with
    (n_sessions, n_events, last_ts_us). The batch twin of the custom
    stateful streaming operator (`streaming.stateful.session_counts_
    stream`): after the stream has consumed all input, its state equals
    exactly this frame (asserted in tests/test_cli_stateful.py), which
    is what lets the driver oracle-certify the stateful surface through
    a plain gaps-and-islands SQL twin."""
    s = sessionize(events, gap_minutes)
    return s.groupBy("user_id").agg(
        F.max("session_seq").cast("long").alias("n_sessions"),
        F.count(F.lit(1)).alias("n_events"),
        F.max(F.unix_micros("ts")).alias("last_ts_us"),
    )


def asof_join_latest(probes: DataFrame, updates: DataFrame, key: str,
                     probe_ts: Column, update_ts: Column,
                     update_val: str) -> DataFrame:
    """As-of join: for each probe row, the most recent update (by
    `update_ts`, inclusive) with the same key.

    Implemented with the union + last_value(ignore nulls) pattern: tag
    both sides, interleave per key ordered by time (updates before
    probes on ties), and carry the latest update value forward. One
    shuffle on the key, O(n log n) per partition — no per-row range
    probe, no cross join; this is the formulation that survives scale
    (vs. the naive join+filter+argmax which explodes on hot keys).

    Returns the probe rows + `asof_<update_val>` column (null if no
    update precedes the probe).
    """
    p = probes.select(
        F.col(key).alias("__k"),
        F.unix_micros(probe_ts).alias("__t"),
        F.lit(1).alias("__is_probe"),
        F.lit(None).cast("long").alias("__uval"),
        F.struct(*[F.col(c) for c in probes.columns]).alias("__row"),
    )
    u = updates.select(
        F.col(key).alias("__k"),
        F.unix_micros(update_ts).alias("__t"),
        F.lit(0).alias("__is_probe"),
        F.col(update_val).cast("long").alias("__uval"),
        F.lit(None).cast(p.schema["__row"].dataType).alias("__row"),
    )
    w = (
        Window.partitionBy("__k")
        .orderBy(F.col("__t").asc(), F.col("__is_probe").asc(), F.col("__uval").asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    merged = p.unionByName(u).withColumn(
        f"asof_{update_val}", F.last("__uval", ignorenulls=True).over(w)
    )
    return (
        merged.filter(F.col("__is_probe") == 1)
        .select("__row.*", f"asof_{update_val}")
    )


def mad_outliers(events: DataFrame, threshold: float = 3.0) -> DataFrame:
    """Per-user robust outlier profile via median absolute deviation —
    the grouped-map `applyInPandas` surface (each user's rows arrive as
    one Arrow-backed pandas frame; medians need the whole group sorted,
    which no single SQL window expresses without two self-joins).

    Scale shape: one shuffle on user_id, then embarrassingly parallel
    per-group numpy. Group size is a user's event count — bounded in
    practice; a pathological hot user would be capped/sampled upstream.
    All arithmetic is order-independent (selection-based medians,
    elementwise abs/compare), so the DuckDB oracle matches bit-for-bit
    without rounding.
    """
    import pandas as pd

    schema = "user_id long, n_events long, median double, mad double, n_outliers long"

    def _profile(pdf: "pd.DataFrame") -> "pd.DataFrame":
        import numpy as np

        v = pdf["value"].to_numpy(dtype=np.float64)
        med = float(np.median(v))
        ad = np.abs(v - med)
        mad = float(np.median(ad))
        n_out = int((ad > threshold * mad).sum()) if mad > 0 else 0
        return pd.DataFrame(
            [[int(pdf["user_id"].iloc[0]), len(v), med, mad, n_out]],
            columns=["user_id", "n_events", "median", "mad", "n_outliers"],
        )

    return events.select("user_id", "value").groupBy("user_id").applyInPandas(
        _profile, schema
    )
