"""Source-format breadth (CSV/JSON/ORC round-trips) and skew-safe
salted aggregation."""

from __future__ import annotations

from pyspark.sql import functions as F

from apachebeamkmeans_spark.functions.skew import salted_agg
from apachebeamkmeans_spark.sources import io


def test_format_roundtrips(spark, tmp_path):
    df = spark.createDataFrame(
        [(1, "a", 1.5), (2, "b", -2.25), (3, None, 0.0)],
        "id long, s string, v double",
    )
    expected = sorted(map(tuple, df.collect()))
    for fmt in ("parquet", "orc", "json", "csv"):
        path = str(tmp_path / fmt)
        w = df.write.mode("overwrite")
        if fmt == "csv":
            w = w.option("header", True)
        w.format(fmt).save(path)
        r = spark.read
        if fmt in ("json", "csv"):
            r = r.schema("id long, s string, v double")
            if fmt == "csv":
                r = r.option("header", True)
        back = r.format(fmt).load(path)
        assert sorted(map(tuple, back.collect())) == expected, fmt


def test_salted_agg_matches_plain(spark, sf_dir):
    li = io.read_table(spark, sf_dir, "lineitem")
    plain = {
        r["l_returnflag"]: (r["n"], round(r["s"], 6), r["mx"])
        for r in li.groupBy("l_returnflag")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("l_quantity").alias("s"),
             F.max("l_quantity").alias("mx"))
        .collect()
    }
    sums = salted_agg(li, "l_returnflag", {"l_quantity": "sum"}, n_salts=8)
    counts = salted_agg(li, "l_returnflag", {"l_quantity": "count"}, n_salts=8)
    maxes = salted_agg(li, "l_returnflag", {"l_quantity": "max"}, n_salts=8)
    salted = {
        r["l_returnflag"]: (r["count_l_quantity"], round(r["sum_l_quantity"], 6),
                            r["max_l_quantity"])
        for r in sums.join(counts, "l_returnflag").join(maxes, "l_returnflag").collect()
    }
    assert plain == salted


def test_salted_agg_rejects_non_decomposable(spark, sf_dir):
    import pytest

    li = io.read_table(spark, sf_dir, "lineitem")
    with pytest.raises(ValueError):
        salted_agg(li, "l_returnflag", {"l_quantity": "median"})
