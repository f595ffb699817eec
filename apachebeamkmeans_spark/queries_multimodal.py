"""Oracle-checked multimodal + streaming queries.

`mm_fake_decode` is deliberately a **Pandas UDF (mapInPandas) query
with an exact oracle**: the stand-in decoder derives dimensions from
the payload md5, which DuckDB recomputes in SQL — proving the Arrow
plumbing preserves values byte-for-byte.

`stream_events_hourly` drives a real Structured Streaming query
(file source → watermark → tumbling window → memory sink, complete
mode) and must equal the batch oracle on the same rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from apachebeamkmeans_spark import oraclegen as OG
from apachebeamkmeans_spark.operators import multimodal as MM
from apachebeamkmeans_spark.sources import io
from apachebeamkmeans_spark.streaming import events as SE


def _assets(spark: SparkSession, sf_dir: str) -> DataFrame:
    return MM.to_binary_assets(io.read_table(spark, sf_dir, "documents"))


def q_mm_binary_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary asset metadata: byte length, sha256, mime per payload."""
    a = _assets(spark, sf_dir)
    return a.select(
        "doc_id",
        F.col("meta.n_bytes").cast("long").alias("n_bytes"),
        F.col("meta.sha256").alias("sha256"),
        F.col("meta.mime").alias("mime"),
    )


ORACLE_MM_BINARY_META = """
SELECT doc_id,
       CAST(strlen(text) AS BIGINT) AS n_bytes,
       sha256(text) AS sha256,
       'application/octet-stream' AS mime
FROM documents
"""


def q_mm_asset_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Asset-level exact dedup — the first pass of multimodal corpus
    hygiene: group binary payloads by content hash (the sha256 the
    asset frame already carries), keeper = lowest doc_id. Scale shape:
    one map-side-combined hash aggregation on a 32-byte key; the
    payload bytes never shuffle."""
    a = _assets(spark, sf_dir)
    return (
        a.groupBy(F.col("meta.sha256").alias("sha256"))
        .agg(
            F.count(F.lit(1)).alias("n_assets"),
            F.min("doc_id").alias("keeper_id"),
        )
    )


ORACLE_MM_ASSET_DEDUP = """
SELECT sha256(text) AS sha256,
       CAST(count(*) AS BIGINT) AS n_assets,
       CAST(min(doc_id) AS BIGINT) AS keeper_id
FROM documents
GROUP BY 1
"""


def q_mm_fake_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow mapInPandas decode: md5-derived width/height/pixels per payload."""
    return MM.fake_decode(_assets(spark, sf_dir))


_W = f"({OG.sql_hex_to_int('substr(md5(text), 1, 2)', 2)} + 1)"
_H = f"({OG.sql_hex_to_int('substr(md5(text), 3, 2)', 2)} + 1)"

ORACLE_MM_FAKE_DECODE = f"""
SELECT doc_id,
       CAST({_W} AS INTEGER) AS width,
       CAST({_H} AS INTEGER) AS height,
       CAST({_W} * {_H} AS BIGINT) AS n_pixels
FROM documents
"""


def q_stream_events_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Structured Streaming tumbling-hour agg driven to completion; equals the batch twin."""
    return SE.run_hourly_stream_to_table(spark, sf_dir)


# Streaming complete-mode output == batch tumbling aggregation.
ORACLE_STREAM_EVENTS_HOURLY = """
SELECT date_trunc('hour', ts) AS bucket, event_type,
       CAST(count(*) AS BIGINT) AS n_events,
       round(sum(value), 4) AS sum_value,
       round(avg(value), 6) AS avg_value
FROM events
GROUP BY 1, 2
"""


from apachebeamkmeans_spark.queries_events import (
    ORACLE_EVENTS_SESSION_WINDOW as _SW_ORACLE,
    ORACLE_USER_SESSION_COUNTS,
)


def q_stream_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Native session windows in Structured Streaming (complete mode):
    the built-in merging-window state operator, watermark-bounded —
    output equals the batch `events_session_window` twin, so the
    oracle is the same gaps-and-islands SQL."""
    return SE.run_session_window_stream_to_table(spark, sf_dir)


def q_stream_session_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom stateful streaming operator (applyInPandasWithState
    per-user session tracking), CERTIFIED by the exact batch oracle
    since r8 (previously rows-only): the update-mode memory sink holds
    one row per (user, trigger-update), and because `n_events` grows
    monotonically with every state update, the FINAL state per user is
    simply its max-`n_events` row (ties broken by `last_ts_us` — a
    later update can only move it forward). That projection must equal
    the batch sessionization twin (`user_session_counts`) row for row
    — the same drive-to-completion-and-compare contract
    `stream_ingest_gate` certifies; multi-trigger recovery behavior
    stays covered by tests/test_cli_stateful.py."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from apachebeamkmeans_spark.streaming.stateful import run_session_counts_to_table

    updates = run_session_counts_to_table(
        spark, sf_dir, name="q_stream_sessions_out"
    )
    w = Window.partitionBy("user_id").orderBy(
        F.desc("n_events"), F.desc("last_ts_us")
    )
    return (
        updates.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .select("user_id", "n_sessions", "n_events", "last_ts_us")
    )


def q_stream_session_counts_tws(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SAME per-user sessionization through Spark 4's
    transformWithStateInPandas (StatefulProcessor + typed ValueState
    in the RocksDB state store) instead of applyInPandasWithState —
    two independent arbitrary-stateful plumbing paths certified
    against ONE batch oracle (`user_session_counts`). The fold logic
    is shared (`streaming.stateful._make_fold`), so a divergence here
    isolates the state-API integration, not the session math. Same
    final-state projection as `stream_session_counts`: max-n_events
    row per user, ties to the later last_ts_us.

    NOT in the registry: the transformWithState protocol needs the
    `protobuf` package on the Python side (its state server speaks
    proto), which this container lacks — a documented environment
    seam like the multimodal decode step. The implementation is real
    and `tests/test_stateful_tws.py` certifies it against the batch
    twin wherever protobuf is installed (importorskip)."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from apachebeamkmeans_spark.streaming.stateful import (
        run_session_counts_tws_to_table,
    )

    updates = run_session_counts_tws_to_table(
        spark, sf_dir, name="q_stream_sessions_tws_out"
    )
    w = Window.partitionBy("user_id").orderBy(
        F.desc("n_events"), F.desc("last_ts_us")
    )
    return (
        updates.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .select("user_id", "n_sessions", "n_events", "last_ts_us")
    )


def q_stream_dedup_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming dedup: first (user_id, event_type, minute) key wins,
    watermark-bounded state. Output = the distinct key set, so the
    batch twin is a plain SELECT DISTINCT."""
    return SE.run_dedup_stream_to_table(spark, sf_dir, name="q_stream_dedup_out")


ORACLE_STREAM_DEDUP_EVENTS = """
SELECT DISTINCT user_id, event_type, date_trunc('minute', ts) AS minute
FROM events
"""


def q_stream_enriched_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-static join: event stream enriched with the customer
    dimension (broadcast per micro-batch), aggregated to nation level.
    Complete output mode ⇒ batch join+agg twin."""
    return SE.run_enriched_stream_to_table(spark, sf_dir, name="q_stream_enriched_out")


ORACLE_STREAM_ENRICHED_NATION = """
SELECT c_nationkey, CAST(count(*) AS BIGINT) AS n_events,
       round(sum(value), 2) AS sum_value
FROM events JOIN customer ON user_id = c_custkey
GROUP BY c_nationkey
"""


def q_stream_click_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-stream inner join with watermarked, time-bounded state:
    every (click, purchase) pair of the same user within one hour —
    the attribution join. Batch twin = the equivalent range join."""
    return SE.run_click_purchase_join_to_table(
        spark, sf_dir, name="q_stream_attrib_out"
    )


ORACLE_STREAM_CLICK_ATTRIBUTION = """
SELECT c.user_id, c.event_id AS click_id, p.event_id AS purchase_id,
       epoch_us(p.ts) - epoch_us(c.ts) AS lag_us
FROM events c JOIN events p
  ON c.user_id = p.user_id
 AND c.event_type = 'click' AND p.event_type = 'purchase'
 AND p.ts >= c.ts AND p.ts <= c.ts + INTERVAL 60 MINUTE
"""


def q_mm_resize_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Resize + byte-histogram feature extraction over binary assets —
    a fully oracle-checked Pandas-UDF (mapInPandas) path: DuckDB
    re-derives the byte histogram by hex-encoding the payload and
    counting first-nibble matches, and replicates numpy's float32 cast,
    so even the Arrow-batched Python stage hash-matches exactly.
    `f6` = fraction of payload bytes in [96, 112) — the histogram bin
    with real signal on text payloads (bin 0 is constant-zero)."""
    assets = _assets(spark, sf_dir)
    thumbs = MM.resize_stub(assets, 8, 8)
    feats = MM.byte_histogram_features(assets, bins=16)
    return thumbs.join(feats, "doc_id").select(
        "doc_id",
        "width",
        "height",
        F.octet_length("thumb").alias("thumb_bytes"),
        F.size("features").alias("feat_dim"),
        F.round(F.element_at("features", 7).cast("double"), 6).alias("f6"),
    )


# hex(payload) has two chars per byte; a byte in [96,112) iff its first
# hex nibble is '6'. CAST(... AS REAL) replicates numpy's float32.
_F6 = (
    "round(CAST(CAST("
    "list_sum(list_transform(range(0, CAST(octet_length(encode(text)) AS INTEGER)),"
    " i -> CASE WHEN substr(hex(encode(text)), 2*i + 1, 1) = '6' THEN 1 ELSE 0 END))"
    " / octet_length(encode(text)) AS REAL) AS DOUBLE), 6)"
)

ORACLE_MM_RESIZE_FEATURES = f"""
SELECT doc_id,
       8 AS width, 8 AS height,
       CASE WHEN octet_length(encode(text)) = 0 THEN 0 ELSE 64 END AS thumb_bytes,
       16 AS feat_dim,
       {_F6} AS f6
FROM documents
"""


# ------------------------------------- multimodal → ANN hand-off (r5)

MM_TOPK = 5
# Literal query histograms over the 16 byte-value bins (bin d = bytes
# with first hex nibble d). ASCII text mass sits in bins 2 (space),
# 3 (digits), 6-7 (lowercase letters) — one uniform probe, one
# lowercase-shaped probe.
MM_QUERY_HISTS = [
    [1.0 / 16.0] * 16,
    [0.0] * 6 + [0.5, 0.5] + [0.0] * 8,
]


def q_mm_feature_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-modal retrieval end-to-end: the Arrow mapInPandas
    byte-histogram features feed `similarity.cosine_topk` UNCHANGED —
    top-5 most-similar assets per literal query histogram. The whole
    path (Python feature extraction → float32 cast → cosine ranking)
    is value-checked: DuckDB re-derives every histogram bin by
    hex-nibble counting and replays the same unrolled cosine."""
    from apachebeamkmeans_spark.operators import similarity as SIM

    feats = MM.byte_histogram_features(_assets(spark, sf_dir), bins=16)
    vecs = feats.select(
        "doc_id", F.col("features").cast("array<double>").alias("features")
    )
    return SIM.cosine_topk(vecs, MM_QUERY_HISTS, MM_TOPK, id_col="doc_id")


def _oracle_mm_feature_topk() -> str:
    # bin fraction h_d: payload bytes whose first hex nibble is d,
    # divided by payload length, float32-cast like numpy's astype —
    # the full-histogram generalization of the single-bin _F6 twin.
    n = "CAST(octet_length(encode(text)) AS INTEGER)"

    def hd(d: int) -> str:
        nib = "0123456789ABCDEF"[d]
        return (
            f"CAST(CAST(list_sum(list_transform(range(0, {n}),"
            f" i -> CASE WHEN substr(hex(encode(text)), 2*i + 1, 1) = '{nib}'"
            f" THEN 1 ELSE 0 END))"
            f" / greatest(octet_length(encode(text)), 1) AS REAL) AS DOUBLE)"
        )

    cols = ", ".join(f"{hd(d)} AS h{d}" for d in range(16))
    parts = []
    for qid, qv in enumerate(MM_QUERY_HISTS):
        qnorm = sum(float(v) * float(v) for v in qv) ** 0.5
        dot = " + ".join(f"h{d}*({float(qv[d])!r})" for d in range(16))
        nsq = " + ".join(f"h{d}*h{d}" for d in range(16))
        cos = f"(({dot}) / (sqrt({nsq}) * ({qnorm!r})))"
        parts.append(
            f"SELECT {qid} AS qid, doc_id AS vec_id, round(c, 6) AS cosine, rank FROM ("
            f" SELECT doc_id, c,"
            f" CAST(row_number() OVER (ORDER BY c DESC, doc_id ASC) AS INTEGER) AS rank"
            f" FROM (SELECT doc_id, {cos} AS c FROM h)"
            f") WHERE rank <= {MM_TOPK}"
        )
    return (
        "WITH h AS MATERIALIZED (SELECT doc_id, " + cols + " FROM documents) "
        + " UNION ALL ".join(parts)
    )


ORACLE_MM_FEATURE_TOPK = _oracle_mm_feature_topk()


def q_mm_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame sampling over 'video' assets: per-asset frame count from
    the metadata (deterministic stand-in: n_bytes % 100 + 1 frames),
    every-7th frame index emitted as its own row (posexplode). The
    index plan is pure column expressions — sequence() + explode runs
    in codegen, no Python; a production pipeline joins these indices
    into the decode mapInPandas so only sampled frames are ever
    decoded (the 100 TB video answer: decode cost ∝ sampled frames,
    not stored frames)."""
    a = _assets(spark, sf_dir)
    idx = MM.frame_sample_indices(a, every=7)
    return idx.select(
        "doc_id",
        "n_frames",
        F.posexplode("frame_idx").alias("sample_pos", "frame_idx"),
    ).select("doc_id", "n_frames", F.col("sample_pos").cast("int").alias("sample_pos"), "frame_idx")


ORACLE_MM_FRAME_SAMPLE = """
WITH a AS (SELECT doc_id, (strlen(text) % 100) + 1 AS n_frames FROM documents)
SELECT doc_id, CAST(n_frames AS INTEGER) AS n_frames,
       CAST(fi // 7 AS INTEGER) AS sample_pos,
       CAST(fi AS INTEGER) AS frame_idx
FROM a, LATERAL (SELECT unnest(generate_series(0, n_frames - 1, 7)) AS fi)
"""


QUERIES = {
    "mm_frame_sample": (q_mm_frame_sample, ORACLE_MM_FRAME_SAMPLE),
    "mm_resize_features": (q_mm_resize_features, ORACLE_MM_RESIZE_FEATURES),
    "mm_feature_topk": (q_mm_feature_topk, ORACLE_MM_FEATURE_TOPK),
    "mm_binary_meta": (q_mm_binary_meta, ORACLE_MM_BINARY_META),
    "mm_asset_dedup": (q_mm_asset_dedup, ORACLE_MM_ASSET_DEDUP),
    "mm_fake_decode": (q_mm_fake_decode, ORACLE_MM_FAKE_DECODE),
    "stream_events_hourly": (q_stream_events_hourly, ORACLE_STREAM_EVENTS_HOURLY),
    "stream_session_window": (q_stream_session_window, _SW_ORACLE),
    "stream_dedup_events": (q_stream_dedup_events, ORACLE_STREAM_DEDUP_EVENTS),
    "stream_enriched_nation": (q_stream_enriched_nation, ORACLE_STREAM_ENRICHED_NATION),
    "stream_click_attribution": (q_stream_click_attribution, ORACLE_STREAM_CLICK_ATTRIBUTION),
    "stream_session_counts": (q_stream_session_counts, ORACLE_USER_SESSION_COUNTS),
}
