"""Z-order layout clustering property + runtime bloom-filter plan lock.

Both are 100 TB scale-path mechanisms with no reference counterpart
(the reference reads flat text files — SURVEY.md §2.7): min/max file
skipping needs a layout that keeps every dimension's per-file range
narrow, and a selective dim-side filter should prune the fact scan
*before* its shuffle via Catalyst's runtime bloom filter.
"""

from __future__ import annotations

from contextlib import contextmanager

from pyspark.sql import functions as F

from apachebeamkmeans_spark.operators.layout import BITS, morton_col, morton_sql
from apachebeamkmeans_spark.queries_advanced import (
    q_bloom_prune_revenue,
    q_events_zorder_layout,
)
from apachebeamkmeans_spark.sources import io


def _morton_py(a: int, b: int) -> int:
    z = 0
    for i in range(BITS):
        z |= ((a >> i) & 1) << (2 * i + 1)
        z |= ((b >> i) & 1) << (2 * i)
    return z


def test_morton_col_matches_python_twin(spark):
    rows = [(a, b) for a in (0, 1, 77, 150, 255) for b in (0, 3, 128, 200, 255)]
    df = spark.createDataFrame(rows, "a int, b int").withColumn(
        "z", morton_col(F.col("a"), F.col("b"))
    )
    got = {(r["a"], r["b"]): r["z"] for r in df.collect()}
    for (a, b), z in got.items():
        assert z == _morton_py(a, b)


def test_morton_sql_is_same_expression(spark):
    # The SQL string generator and the Column generator come from the
    # same loop; evaluate the SQL text through Spark to prove they
    # agree value-for-value (DuckDB runs the identical string in the
    # registered oracle).
    df = spark.createDataFrame(
        [(a, b) for a in (5, 200) for b in (9, 255)], "a int, b int"
    )
    df.createOrReplaceTempView("morton_probe")
    got = spark.sql(
        f"SELECT a, b, {morton_sql('a', 'b')} AS z FROM morton_probe"
    ).collect()
    for r in got:
        assert r["z"] == _morton_py(r["a"], r["b"])


def test_zorder_layout_clusters_both_dimensions(spark, sf_dir):
    """Every Morton 'file' must cover a narrow rectangle in BOTH
    dimensions, where a time-sorted layout keeps only time narrow.
    (Interleaving 8+8 bits means a 64-key file spans at most a
    16-wide bucket range per dimension: the low 6 z-bits hold 3 bits
    of each dimension.)"""
    files = q_events_zorder_layout(spark, sf_dir).collect()
    assert len(files) > 1
    for r in files:
        assert r["max_user"] - r["min_user"] <= 15
        assert r["max_t"] - r["min_t"] <= 15

    # Contrast: slice the SAME rows into equal-size files in pure time
    # order — the user dimension stays unclustered (span ~ full
    # range), so a user_id predicate would prune nothing.
    from pyspark.sql import Window

    ev = io.read_table(spark, sf_dir, "events")
    rn = F.row_number().over(Window.orderBy("ts", "event_id"))
    time_sorted = (
        ev.select((F.col("user_id") % 256).cast("int").alias("ub"), "ts", "event_id")
        .withColumn("file", ((rn - F.lit(1)) / F.lit(64)).cast("int"))
        .groupBy("file")
        .agg((F.max("ub") - F.min("ub")).alias("user_span"))
        .agg(F.avg("user_span").alias("avg_span"))
        .collect()[0]["avg_span"]
    )
    global_span = (
        ev.agg(
            (F.max(F.col("user_id") % 256) - F.min(F.col("user_id") % 256)).alias("g")
        ).collect()[0]["g"]
    )
    # time-only layout leaves user wide open: each file spans ~the whole
    # user range (relative, so the claim holds at any scale factor)
    assert time_sorted >= 0.9 * global_span
    assert time_sorted > 1.5 * sum(
        r["max_user"] - r["min_user"] for r in files
    ) / len(files)


@contextmanager
def _confs(spark, overrides: dict[str, str]):
    old = {k: spark.conf.get(k, None) for k in overrides}
    for k, v in overrides.items():
        spark.conf.set(k, v)
    try:
        yield
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_runtime_bloom_filter_prunes_fact_side(spark, sf_dir):
    """With the size thresholds scaled to the fixture (at 100 TB the
    defaults — 10 MB creation side, 10 GB application side — trigger
    on their own), Catalyst injects `bloom_filter_might_contain` on
    the lineitem side of bloom_prune_revenue, pruning the fact scan
    before its shuffle."""
    with _confs(
        spark,
        {
            "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
            "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
            "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold": "100MB",
            # force the shuffle join a 100 TB fact-fact pair would get
            # (broadcast joins don't need a runtime filter)
            "spark.sql.autoBroadcastJoinThreshold": "-1",
        },
    ):
        plan = q_bloom_prune_revenue(
            spark, sf_dir
        )._jdf.queryExecution().optimizedPlan().toString()
        assert "might_contain" in plan

    # and the results are identical with the filter off (bloom is a
    # pure pruning overlay; false positives die in the real join)
    with _confs(
        spark, {"spark.sql.optimizer.runtime.bloomFilter.enabled": "false"}
    ):
        base = sorted(map(tuple, q_bloom_prune_revenue(spark, sf_dir).collect()))
    with _confs(
        spark,
        {
            "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
            "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
            "spark.sql.autoBroadcastJoinThreshold": "-1",
        },
    ):
        pruned = sorted(map(tuple, q_bloom_prune_revenue(spark, sf_dir).collect()))
    assert base == pruned


def test_data_fingerprint_content_keyed(tmp_path):
    """scratch.data_fingerprint: same bytes → same key even after an
    mtime bump (the r8 artifact-freshness contract); different bytes →
    different key; missing table → '0'; directory-of-parts hashed by
    sorted relative name + content, markers ignored."""
    import os
    import time

    from apachebeamkmeans_spark import scratch

    d = tmp_path / "sf"
    d.mkdir()
    p = d / "documents.parquet"
    p.write_bytes(b"abc123")
    f1 = scratch.data_fingerprint(str(d), "documents")
    t = time.time() + 30
    os.utime(p, (t, t))
    assert scratch.data_fingerprint(str(d), "documents") == f1
    p.write_bytes(b"abc124")
    assert scratch.data_fingerprint(str(d), "documents") != f1
    assert scratch.data_fingerprint(str(d), "missing") == "0"

    dd = d / "events.parquet"
    dd.mkdir()
    (dd / "part-0").write_bytes(b"x")
    (dd / "_SUCCESS").write_bytes(b"")
    g1 = scratch.data_fingerprint(str(d), "events")
    # marker files don't key the content
    (dd / "_committed").write_bytes(b"zzz")
    os.utime(dd, (t, t))
    assert scratch.data_fingerprint(str(d), "events") == g1
    (dd / "part-1").write_bytes(b"y")
    os.utime(dd, (t + 5, t + 5))
    g2 = scratch.data_fingerprint(str(d), "events")
    assert g2 != g1
    # in-place rewrite of a SAME-NAMED part with the directory stat
    # pinned (r8 advice): the directory's own (mtime, size) is blind
    # to this, so the memo key must aggregate the parts themselves
    os.utime(dd, (t + 5, t + 5))
    dir_stat = os.stat(dd)
    (dd / "part-1").write_bytes(b"z")
    os.utime(dd, (dir_stat.st_mtime, dir_stat.st_mtime))
    assert scratch.data_fingerprint(str(d), "events") != g2
