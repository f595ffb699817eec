"""PageRank operator: numpy-twin equality on a literal graph +
conservation property."""

from __future__ import annotations

import numpy as np

from apachebeamkmeans_spark.operators.graph import DAMPING, ITERATIONS, pagerank

# path 1-2-3 plus a separate pair (4,5): two components, asymmetric
# degrees inside the first.
PAIRS = [(1, 2), (2, 3), (4, 5)]


def _numpy_twin(pairs, d=DAMPING, iters=ITERATIONS):
    nodes = sorted({x for p in pairs for x in p})
    idx = {v: i for i, v in enumerate(nodes)}
    n = len(nodes)
    adj = np.zeros((n, n))
    for a, b in pairs:
        adj[idx[a], idx[b]] = adj[idx[b], idx[a]] = 1.0
    deg = adj.sum(axis=1)
    r = np.full(n, 1.0 / n)
    for _ in range(iters):
        r = (1.0 - d) / n + d * (adj.T @ (r / deg))
    return {v: round(float(r[idx[v]]), 6) for v in nodes}


def test_pagerank_matches_numpy_twin(spark):
    pairs = spark.createDataFrame(PAIRS, "doc_a long, doc_b long")
    got = {r["doc_id"]: r["rank"] for r in pagerank(pairs).collect()}
    assert got == _numpy_twin(PAIRS)


def test_pagerank_conserves_mass_and_ranks_center_highest(spark):
    pairs = spark.createDataFrame(PAIRS, "doc_a long, doc_b long")
    rows = {r["doc_id"]: r["rank"] for r in pagerank(pairs).collect()}
    # symmetric graph, no dangling nodes: total rank stays 1
    # (tolerance = n nodes × the 1e-6/2 output rounding)
    assert abs(sum(rows.values()) - 1.0) < len(rows) * 5e-7
    # degree-2 center of the path outranks its leaves
    assert rows[2] > rows[1] == rows[3]
    # the isolated pair splits its mass evenly
    assert rows[4] == rows[5]


def test_pagerank_empty_input(spark):
    empty = spark.createDataFrame([], "doc_a long, doc_b long")
    out = pagerank(empty)
    assert out.columns == ["doc_id", "rank"] and out.count() == 0


# --------------------------------------------------- hypothesis property

from hypothesis import given, settings, strategies as st


@st.composite
def _random_pairs(draw):
    n_nodes = draw(st.integers(min_value=2, max_value=10))
    n_edges = draw(st.integers(min_value=1, max_value=12))
    pairs = set()
    for _ in range(n_edges):
        a = draw(st.integers(min_value=0, max_value=n_nodes - 1))
        b = draw(st.integers(min_value=0, max_value=n_nodes - 1))
        if a != b:
            pairs.add((min(a, b), max(a, b)))
    return sorted(pairs)


@settings(max_examples=8, deadline=None)
@given(_random_pairs())
def test_pagerank_matches_numpy_on_random_graphs(spark, pairs):
    if not pairs:
        return
    df = spark.createDataFrame(pairs, "doc_a long, doc_b long")
    got = {r["doc_id"]: r["rank"] for r in pagerank(df).collect()}
    assert got == _numpy_twin(pairs)


def _triangles_of(spark, pairs):
    """Run the doc_triangles join plan on an explicit edge list."""
    from pyspark.sql import functions as F

    e = spark.createDataFrame(pairs, "doc_a long, doc_b long")
    ab = e.select(F.col("doc_a").alias("a"), F.col("doc_b").alias("b"))
    bc = e.select(F.col("doc_a").alias("b"), F.col("doc_b").alias("c"))
    ac = e.select(F.col("doc_a").alias("a"), F.col("doc_b").alias("c"))
    tri = ab.join(bc, "b").join(ac, ["a", "c"])
    out = (
        tri.select(F.explode(F.array("a", "b", "c")).alias("doc_id"))
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).cast("long").alias("n_triangles"))
    )
    return {r["doc_id"]: r["n_triangles"] for r in out.collect()}


def test_triangle_count_known_graphs(spark):
    """K4: every node sits in C(3,2)=3 triangles; a chain has none; a
    single triangle with a pendant edge counts each member once and
    excludes the pendant."""
    k4 = [(a, b) for a in range(4) for b in range(a + 1, 4)]
    assert _triangles_of(spark, k4) == {0: 3, 1: 3, 2: 3, 3: 3}
    chain = [(0, 1), (1, 2), (2, 3)]
    assert _triangles_of(spark, chain) == {}
    tri_pendant = [(0, 1), (0, 2), (1, 2), (2, 9)]
    assert _triangles_of(spark, tri_pendant) == {0: 1, 1: 1, 2: 1}


def test_triangle_count_matches_bruteforce_on_random_graphs(spark):
    """Join-plan triangle counts equal the O(n^3) reference on a few
    seeded random graphs."""
    import itertools
    import random

    for seed in (1, 2, 3):
        rng = random.Random(seed)
        nodes = list(range(8))
        pairs = sorted(
            {
                (min(a, b), max(a, b))
                for a, b in (
                    (rng.choice(nodes), rng.choice(nodes)) for _ in range(16)
                )
                if a != b
            }
        )
        es = set(pairs)
        want: dict[int, int] = {}
        for a, b, c in itertools.combinations(nodes, 3):
            if (a, b) in es and (b, c) in es and (a, c) in es:
                for v in (a, b, c):
                    want[v] = want.get(v, 0) + 1
        assert _triangles_of(spark, pairs) == want, seed


# ------------------------------------------------- label propagation


def _lp(spark, edges, seeds, rounds=3):
    from apachebeamkmeans_spark.operators.graph import label_propagation

    e = spark.createDataFrame(edges, "vec_id long, nbr_id long, wt long")
    s = spark.createDataFrame(seeds, "vec_id long, label int")
    out = label_propagation(e, s, rounds=rounds).collect()
    return {r["vec_id"]: (r["label"], r["rnd"]) for r in out}


def test_label_propagation_known_chain(spark):
    # chain 0->1->2->3 (each node's only neighbor is the previous one);
    # seed node 0 with label 7: the label walks one hop per round
    edges = [(1, 0, 10), (2, 1, 10), (3, 2, 10)]
    got = _lp(spark, edges, [(0, 7)], rounds=3)
    assert got == {0: (7, 0), 1: (7, 1), 2: (7, 2), 3: (7, 3)}


def test_label_propagation_weighted_majority_and_tie_break(spark):
    # node 10 hears label 1 with total weight 5 and label 2 with
    # weight 9 -> takes 2; node 11 hears both with equal weight ->
    # smaller label wins
    edges = [
        (10, 0, 5), (10, 1, 4), (10, 2, 5),
        (11, 0, 6), (11, 1, 6),
    ]
    seeds = [(0, 1), (1, 2), (2, 2)]
    got = _lp(spark, edges, seeds, rounds=1)
    assert got[10] == (2, 1)
    assert got[11] == (1, 1)


def test_label_propagation_seeds_frozen_and_unreached_absent(spark):
    # seed 0 keeps its label even though its neighbor votes otherwise;
    # node 99 has no labeled neighbor within 1 round and stays absent
    edges = [(0, 1, 100), (99, 98, 100)]
    got = _lp(spark, edges, [(0, 5), (1, 6)], rounds=1)
    assert got[0] == (5, 0)
    assert got[1] == (6, 0)
    assert 99 not in got


def test_label_propagation_matches_oracle_sql_on_random_graph(spark):
    """Cross-engine twin on a random-ish literal graph: the DuckDB
    replay of the unrolled rounds equals the Spark loop exactly."""
    import duckdb

    from apachebeamkmeans_spark.operators.graph import (
        label_propagation_oracle_sql,
    )

    rng = __import__("random").Random(7)
    nodes = list(range(30))
    edges = []
    for v in nodes:
        for u in rng.sample([x for x in nodes if x != v], 3):
            edges.append((v, u, rng.randint(1, 20)))
    seeds = [(v, v % 4) for v in nodes if v % 5 == 0]
    got = _lp(spark, edges, seeds, rounds=3)

    con = duckdb.connect()
    con.execute("CREATE TABLE e(vec_id BIGINT, nbr_id BIGINT, wt BIGINT)")
    con.executemany("INSERT INTO e VALUES (?, ?, ?)", edges)
    con.execute("CREATE TABLE s(vec_id BIGINT, label INTEGER)")
    con.executemany("INSERT INTO s VALUES (?, ?)", seeds)
    want = {
        v: (lab, rnd)
        for v, lab, rnd in con.execute(
            "WITH " + label_propagation_oracle_sql("e", "s", 3)
        ).fetchall()
    }
    assert got == want
