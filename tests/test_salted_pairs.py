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


def test_salted_pairs_shadow_attribution_under_salting(spark):
    """The SemDeDup shadow aggregation (max cosine from any LOWER-id
    cell-mate, attributed to the HIGHER id) must survive salting: the
    salted join does NOT orient cross-salt-group pairs by id, so the
    consumer must take greatest(a.id, b.id) — r6 review finding. Force
    multiple salt groups with a tiny target and compare against a
    brute-force numpy truth."""
    import numpy as np
    from pyspark.sql import functions as F

    from apachebeamkmeans_spark.operators.dedup import salted_self_pairs

    rng = np.random.default_rng(7)
    n, dim = 40, 4
    mat = rng.normal(size=(n, dim))
    mat /= np.linalg.norm(mat, axis=1, keepdims=True)
    rows = [(i, 0, [float(x) for x in mat[i]]) for i in range(n)]
    df = spark.createDataFrame(rows, "vec_id long, cell int, f array<double>")

    # target=4 forces ~n/4 salt groups for the single hot cell
    half = salted_self_pairs(df, ["cell"], "vec_id", target=4).select(
        F.greatest(F.col("a.vec_id"), F.col("b.vec_id")).alias("vec_id"),
        F.round(
            F.aggregate(
                F.zip_with(F.col("a.f"), F.col("b.f"), lambda x, y: x * y),
                F.lit(0.0),
                lambda a, v: a + v,
            ),
            6,
        ).alias("cosine"),
    )
    got = {
        r["vec_id"]: r["m"]
        for r in half.groupBy("vec_id").agg(F.max("cosine").alias("m")).collect()
    }
    cos = np.round(mat @ mat.T, 6)
    want = {
        i: max(cos[i, j] for j in range(i))
        for i in range(1, n)
    }
    assert got == {i: round(v, 6) for i, v in want.items()}
