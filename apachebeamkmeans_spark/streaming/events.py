"""Structured Streaming over the events table.

The reference's Beam pipelines are bounded batch (no windows,
watermarks or triggers anywhere — SURVEY.md §2.7); this module gives
the engine the streaming surface Spark users expect: file-source
readStream → event-time windowed aggregation → sink, driven to
completion in tests/queries with processAllAvailable on a memory sink.

On a real cluster the source becomes Kafka and the sink a Delta/
parquet table via foreachBatch; the aggregation plan is identical.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# Footer-probe results per (applicationId, sf_dir): several
# run_*_to_table helpers each construct a stream, and re-reading the
# same parquet footer per construction is avoidable driver work. Keyed
# on the session's applicationId — stable for the session's lifetime
# and never recycled (unlike id(spark), which CPython can reuse after
# GC and serve a stale schema to a new session — ADVICE r4).
_SCHEMA_CACHE: dict[tuple[str, str], object] = {}


def read_events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    from apachebeamkmeans_spark.sources.io import normalize_event_ts

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")  # oracle parity
    # File streams require an explicit schema, and the on-disk ts type
    # varies by generator (ns-as-long vs naive µs) — take it from the
    # footer via a batch schema probe (cached), then normalize like the
    # batch path.
    key = (spark.sparkContext.applicationId, sf_dir)
    schema = _SCHEMA_CACHE.get(key)
    if schema is None:
        schema = spark.read.parquet(f"{sf_dir}/events.parquet").schema
        _SCHEMA_CACHE[key] = schema
    raw = (
        spark.readStream.schema(schema)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
    )
    return normalize_event_ts(raw)


def _run_to_memory_table(spark: SparkSession, build, name: str,
                         mode: str, source_dir: str | None = None) -> DataFrame:
    """Drive a streaming frame to completion into a memory table under
    the state-sized partitioning scope (`stream_shuffle_partitions` —
    state-store count follows state volume, not the session's
    core-count default; see streaming/__init__.py for the measured
    rationale; `source_dir` feeds the footer-row-count derivation).
    `build` is a thunk so the stream is CONSTRUCTED and started inside
    the scope."""
    from apachebeamkmeans_spark.streaming import stream_shuffle_partitions

    with stream_shuffle_partitions(spark, source_dir):
        q = (
            build().writeStream.outputMode(mode)
            .format("memory").queryName(name).start()
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()
    return spark.table(name)


def hourly_agg_stream(events: DataFrame, watermark: str = "1 hour") -> DataFrame:
    """Event-time tumbling-window aggregation with a watermark for
    late-data bounds. Complete output mode ⇒ results equal the batch
    tumbling_agg on the same data."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 4).alias("sum_value"),
            F.round(F.avg("value"), 6).alias("avg_value"),
        )
        .select(F.col("w.start").alias("bucket"), "event_type", "n_events", "sum_value", "avg_value")
    )


def session_window_agg_stream(events: DataFrame, gap: str = "30 minutes",
                              watermark: str = "1 hour") -> DataFrame:
    """Native session windows (`F.session_window`): per user, events
    closer than `gap` merge into one [first_ts, last_ts+gap) window —
    the built-in dynamic-gap operator (vs. the gaps-and-islands batch
    formulation in `timeseries.sessionize` and the custom
    applyInPandasWithState tracker in `streaming.stateful`; three
    surfaces, one semantics). The watermark bounds open-session state:
    sessions whose window end falls behind it are finalized and
    evicted. Update mode is rejected for session windows (merges would
    retract emitted rows); complete mode ⇒ equals the batch twin."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy("user_id", F.session_window("ts", gap).alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 4).alias("sum_value"),
        )
        .select(
            "user_id",
            F.unix_micros("w.start").alias("session_start_us"),
            F.unix_micros("w.end").alias("session_end_us"),
            "n_events",
            "sum_value",
        )
    )


def run_session_window_stream_to_table(spark: SparkSession, sf_dir: str,
                                       name: str = "stream_session_window_out") -> DataFrame:
    return _run_to_memory_table(
        spark,
        lambda: session_window_agg_stream(read_events_stream(spark, sf_dir)),
        name, "complete", source_dir=f"{sf_dir}/events.parquet",
    )


def dedup_stream(events: DataFrame, watermark: str = "1 hour") -> DataFrame:
    """Streaming deduplication: first occurrence of each
    (user_id, event_type, minute-bucket) key wins; the watermark bounds
    how long per-key state lives in the state store (keys older than
    the watermark are evicted — without it, streaming dedup state grows
    forever). Only key columns are projected, so the output is the
    deterministic distinct key set regardless of which physical row
    arrived first."""
    keyed = events.select(
        "ts",
        "user_id",
        "event_type",
        F.date_trunc("minute", "ts").alias("minute"),
    ).withWatermark("ts", watermark)
    return keyed.dropDuplicates(["user_id", "event_type", "minute"]).drop("ts")


def run_dedup_stream_to_table(spark: SparkSession, sf_dir: str,
                              name: str = "stream_dedup_out") -> DataFrame:
    return _run_to_memory_table(
        spark,
        lambda: dedup_stream(read_events_stream(spark, sf_dir)),
        name, "append", source_dir=f"{sf_dir}/events.parquet",
    )


def enriched_nation_agg_stream(events: DataFrame, customer: DataFrame) -> DataFrame:
    """Stream-static join + aggregation: enrich the event stream with a
    static dimension (customer → nation) via a broadcast hash join —
    the standard streaming-enrichment shape (per micro-batch the dim is
    rebroadcast; no state, no shuffle of the stream beyond the final
    agg). Complete output mode ⇒ results equal the batch join+agg
    twin."""
    joined = events.join(
        F.broadcast(customer.select("c_custkey", "c_nationkey")),
        events.user_id == F.col("c_custkey"),
    )
    return (
        joined.groupBy("c_nationkey")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
    )


def run_enriched_stream_to_table(spark: SparkSession, sf_dir: str,
                                 name: str = "stream_enriched_out") -> DataFrame:
    from apachebeamkmeans_spark.sources import io as _io

    cust = _io.read_table(spark, sf_dir, "customer")
    return _run_to_memory_table(
        spark,
        lambda: enriched_nation_agg_stream(
            read_events_stream(spark, sf_dir), cust
        ),
        name, "complete", source_dir=f"{sf_dir}/events.parquet",
    )


def click_purchase_join_stream(events: DataFrame,
                               horizon_min: int = 60) -> DataFrame:
    """Stream-stream inner join: every (click, purchase) pair for the
    same user where the purchase lands within `horizon_min` minutes
    AFTER the click — the attribution join, streaming edition.

    Both sides carry watermarks and the join condition bounds purchase
    time to [click, click + horizon], so the state store can evict
    clicks older than watermark + horizon and purchases older than
    watermark — bounded state, the only formulation that survives an
    unbounded stream. Inner-join matches are emitted as both sides
    arrive; the final table equals the batch range-join twin."""
    clicks = (
        events.filter(F.col("event_type") == "click")
        .select(
            F.col("event_id").alias("click_id"),
            F.col("user_id").alias("c_user"),
            F.col("ts").alias("click_ts"),
        )
        .withWatermark("click_ts", "1 hour")
    )
    purchases = (
        events.filter(F.col("event_type") == "purchase")
        .select(
            F.col("event_id").alias("purchase_id"),
            F.col("user_id").alias("p_user"),
            F.col("ts").alias("purchase_ts"),
            F.col("value").alias("purchase_value"),
        )
        .withWatermark("purchase_ts", "1 hour")
    )
    cond = (
        (F.col("c_user") == F.col("p_user"))
        & (F.col("purchase_ts") >= F.col("click_ts"))
        & (F.col("purchase_ts") <= F.col("click_ts") + F.expr(f"INTERVAL {horizon_min} MINUTES"))
    )
    return clicks.join(purchases, cond).select(
        F.col("c_user").alias("user_id"),
        "click_id",
        "purchase_id",
        (F.unix_micros("purchase_ts") - F.unix_micros("click_ts")).alias("lag_us"),
    )


def run_click_purchase_join_to_table(spark: SparkSession, sf_dir: str,
                                     name: str = "stream_joined_out") -> DataFrame:
    return _run_to_memory_table(
        spark,
        lambda: click_purchase_join_stream(read_events_stream(spark, sf_dir)),
        name, "append", source_dir=f"{sf_dir}/events.parquet",
    )


def run_stream_to_parquet(spark: SparkSession, sf_dir: str, out_dir: str,
                          checkpoint_dir: str) -> None:
    """Stream → parquet with foreachBatch: each micro-batch lands as an
    idempotent overwrite-by-batch-id write. With the checkpoint
    directory this is the restart-safe (effectively exactly-once) sink
    pattern; the aggregation itself is the same hourly plan."""
    from apachebeamkmeans_spark.streaming import stream_shuffle_partitions

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        batch_df.write.mode("overwrite").parquet(f"{out_dir}/batch={batch_id}")

    with stream_shuffle_partitions(spark, f"{sf_dir}/events.parquet"):
        agg = hourly_agg_stream(read_events_stream(spark, sf_dir))
        q = (
            agg.writeStream.outputMode("complete")
            .foreachBatch(sink)
            .option("checkpointLocation", checkpoint_dir)
            .start()
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()


def run_hourly_stream_to_table(spark: SparkSession, sf_dir: str,
                               name: str = "stream_events_hourly_out") -> DataFrame:
    """Drive the stream over all available input and return the result
    as a static DataFrame (memory sink, complete mode)."""
    return _run_to_memory_table(
        spark,
        lambda: hourly_agg_stream(read_events_stream(spark, sf_dir)),
        name, "complete", source_dir=f"{sf_dir}/events.parquet",
    )
