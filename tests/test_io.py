"""Sources/sinks: reference-style text point ingest (S1-S3), blank-line
filter (P1), single-file text sink (S4), parquet tables (TESTDATA)."""

from __future__ import annotations

import os

from apachebeamkmeans_spark.sources import io


def test_read_points_text_with_blank_lines(spark, tmp_path):
    p = tmp_path / "points.txt"
    p.write_text("1.5,2.5\n\n3.0,4.0\n   \n-1.0,0.25\n")
    df = io.read_points_text(spark, str(p))
    rows = df.collect()
    assert len(rows) == 3  # blank lines filtered out, not null-emitted
    feats = sorted(tuple(r["features"]) for r in rows)
    assert feats == [(-1.0, 0.25), (1.5, 2.5), (3.0, 4.0)]
    assert len({r["id"] for r in rows}) == 3  # stable unique ids


def test_load_points_schema(spark, sf_dir):
    pts = io.load_points(spark, sf_dir)
    assert pts.columns == ["id", "features", "label"]
    assert dict(pts.dtypes)["features"] == "array<double>"
    assert pts.count() == 500


def test_read_tables(spark, sf_dir):
    dfs = io.read_tables(spark, sf_dir)
    assert set(dfs) == set(io.TABLES)
    assert dfs["lineitem"].count() == 6000


def test_read_points_csv_uci_shape(spark, tmp_path):
    """UCI-style CSV: n feature columns + trailing label (string or
    numeric) carried but not clustered on — mirrors data/UCI/*.csv."""
    p = tmp_path / "uci.csv"
    p.write_text("1.0,2.0,3.0,High\n4.0,5.0,6.0,Low\n")
    df = io.read_points_csv(spark, str(p), n_features=3)
    rows = sorted(df.collect(), key=lambda r: r["features"][0])
    assert rows[0]["features"] == [1.0, 2.0, 3.0] and rows[0]["label"] == "High"
    assert df.columns == ["id", "features", "label"]


def test_write_text_single(spark, tmp_path):
    df = spark.createDataFrame([("a",), ("b",)], "value string")
    out = str(tmp_path / "out")
    io.write_text_single(df, out)
    files = [f for f in os.listdir(out) if f.startswith("part-")]
    assert len(files) == 1  # withoutSharding semantics
