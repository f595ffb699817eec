"""salted_self_pairs must emit exactly the naive self-join's pair set
— every unordered same-bucket pair once — even when hot buckets are
grid-split into many sub-cells (small `target` forces the split at
test size)."""

from __future__ import annotations

import itertools

from pyspark.sql import functions as F

from apachebeamkmeans_spark.operators import dedup as DD


def _naive_pairs(rows):
    by_bucket: dict[tuple, list[int]] = {}
    for bucket, rid in rows:
        by_bucket.setdefault(bucket, []).append(rid)
    out = set()
    for ids in by_bucket.values():
        for a, b in itertools.combinations(sorted(ids), 2):
            out.add((a, b))
    return out


def _collect_salted(spark, rows, target):
    df = spark.createDataFrame(
        [(k, i) for (k, i) in rows], "bucket int, rid long"
    )
    got = (
        DD.salted_self_pairs(df, ["bucket"], "rid", target=target)
        .select(
            F.least("a.rid", "b.rid").alias("x"),
            F.greatest("a.rid", "b.rid").alias("y"),
        )
        .collect()
    )
    pairs = [(r["x"], r["y"]) for r in got]
    return pairs


def test_salted_equals_naive_with_hot_bucket(spark):
    # bucket 1 is hot (12 rows -> split factor ceil(12/4)=3 at target=4),
    # bucket 2 is cold (3 rows, s=1), bucket 3 is a singleton (no pairs)
    rows = [(1, i) for i in range(12)] + [(2, 100), (2, 101), (2, 102), (3, 999)]
    pairs = _collect_salted(spark, rows, target=4)
    assert len(pairs) == len(set(pairs)), "duplicate pair emitted"
    assert set(pairs) == _naive_pairs(rows)


def test_salted_no_split_path_identical(spark):
    rows = [(1, 1), (1, 2), (1, 3), (2, 10), (2, 11)]
    pairs = _collect_salted(spark, rows, target=256)
    assert sorted(pairs) == sorted(_naive_pairs(rows))


def test_salted_split_factor_covers_all_cross_group_pairs(spark):
    # every row in ONE bucket: worst case; s = ceil(40/5) = 8 sub-groups
    rows = [(7, i) for i in range(40)]
    pairs = _collect_salted(spark, rows, target=5)
    assert len(pairs) == 40 * 39 // 2
    assert set(pairs) == _naive_pairs(rows)
