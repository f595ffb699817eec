"""Sources and sinks (SURVEY.md §2.1).

The reference ingests points as raw text lines of comma-separated
doubles (`spark.read().textFile(...)`, SparKMeansGroupBy.java:66;
Beam `TextIO.read()`, BeamKmeansSideInput.java:70) and writes results
with a driver-side FileWriter (SparKMeansGroupBy.java:153-160) or
`TextIO.write().withoutSharding()` (BeamKmeansSideInput.java:125).

Here: schema-first parquet is the primary format; the text/CSV point
readers reproduce the reference's ingest path (including the
blank-line filter — a real `filter` *before* parsing, replacing the
reference's null-emitting map, SparKMeansGroupBy.java:95-97).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


def read_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Columnar scan of one testdata table; Catalyst pushes filters and
    prunes columns down to this parquet read.

    `events.parquet` has stored ts as TIMESTAMP(NANOS) (which the
    vectorized parquet reader rejects — read as long ns and truncate)
    or naive TIMESTAMP(MICROS) depending on the generator run; both are
    normalized to µs TIMESTAMP matching DuckDB (see normalize_event_ts).

    The session timezone is pinned to UTC here (not only in our session
    factory) because every timestamp-valued result and date_trunc
    bucket must agree with DuckDB's UTC-naive timestamps even when the
    caller (e.g. the verification driver) built the SparkSession with a
    different timezone.
    """
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
        return normalize_event_ts(df)
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def normalize_event_ts(df: DataFrame) -> DataFrame:
    """Normalize `events.ts` to a session-tz TIMESTAMP regardless of how
    the generator wrote it: TIMESTAMP(NANOS) arrives as bigint ns (via
    spark.sql.legacy.parquet.nanosAsLong), naive TIMESTAMP(MICROS)
    arrives as TIMESTAMP_NTZ, and adjusted-to-UTC micros arrives as
    TIMESTAMP already. With the session timezone pinned to UTC the
    NTZ→TZ cast is value-preserving, so unix_micros/date_trunc agree
    with DuckDB's naive-µs timestamps for every encoding."""
    t = dict(df.dtypes).get("ts")
    if t == "bigint":
        # integer div — float division would lose precision at ns scale
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    elif t == "timestamp_ntz":
        df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df


def read_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: read_table(spark, sf_dir, name) for name in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every table as a temp view so operators can be written
    in SQL where that is clearer."""
    for name in TABLES:
        read_table(spark, sf_dir, name).createOrReplaceTempView(name)


def load_points(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The engine's canonical points frame from `embeddings.parquet`:
    (id BIGINT, features ARRAY<DOUBLE>, label INT).

    FLOAT→DOUBLE cast on ingest so all distance arithmetic is double,
    matching the oracle's CAST(embedding AS DOUBLE[]).
    """
    return read_table(spark, sf_dir, "embeddings").select(
        F.col("vec_id").alias("id"),
        F.col("embedding").cast("array<double>").alias("features"),
        F.col("label"),
    )


def read_points_text(spark: SparkSession, path: str) -> DataFrame:
    """Reference-style ingest: text lines "x1,x2,...,xn" → (id, features).

    Blank lines are dropped with a real filter (the reference instead
    emitted nulls from the parse map — SparKMeansGroupBy.java:95-97).
    `monotonically_increasing_id` provides the stable tie-break id
    without any shuffle.
    """
    lines = spark.read.text(path)
    return (
        lines.filter(F.length(F.trim(F.col("value"))) > 0)
        .select(
            F.monotonically_increasing_id().alias("id"),
            F.split(F.col("value"), ",").cast("array<double>").alias("features"),
        )
    )


def read_points_csv(
    spark: SparkSession, path: str, n_features: int, label_col: bool = True
) -> DataFrame:
    """UCI-shaped CSV ingest: n numeric feature columns and an optional
    trailing label column (kept but never clustered on) — mirrors
    data/UCI/*.csv in the reference."""
    df = spark.read.csv(path, header=False, inferSchema=True)
    cols = df.columns
    feats = F.array(*[F.col(c).cast("double") for c in cols[:n_features]])
    out = df.select(
        F.monotonically_increasing_id().alias("id"), feats.alias("features"),
        *([F.col(cols[n_features]).alias("label")] if label_col and len(cols) > n_features else []),
    )
    return out


def write_text_single(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """Single text file output — the Beam `withoutSharding()` sink
    (BeamKmeansSideInput.java:125). coalesce(1) only at the final edge;
    upstream parallelism is untouched."""
    df.coalesce(1).write.mode(mode).text(path)


def write_parquet(df: DataFrame, path: str, mode: str = "overwrite", partition_by=None) -> None:
    w = df.write.mode(mode)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(path)


def write_jsonl(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """JSON-lines sink (one object per line, splittable for re-read) —
    the interchange format crawl/annotation pipelines feed from."""
    df.write.mode(mode).json(path)


def read_jsonl(spark: SparkSession, path: str, schema) -> DataFrame:
    """JSON-lines source with an EXPLICIT schema: schema inference
    would scan the data twice and silently widen types at 100 TB —
    production readers always pin the schema."""
    return spark.read.schema(schema).json(path)


def write_bucketed(df: DataFrame, table: str, key: str, n_buckets: int = 32,
                   mode: str = "overwrite") -> None:
    """Persist hash-bucketed by `key`: joins/aggregations on the key
    between tables bucketed the same way need NO shuffle — at 100 TB
    this is how the orders⨝lineitem class of fact-fact joins avoids
    re-exchanging either side on every query. (Saved as a managed
    table: bucket metadata lives in the catalog.)"""
    df.write.mode(mode).bucketBy(n_buckets, key).sortBy(key).saveAsTable(table)
