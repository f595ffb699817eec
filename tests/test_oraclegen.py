"""Cross-engine contract tests: every oraclegen SQL fragment must
produce EXACTLY the values of its Spark twin (this identity is what
the whole DuckDB-oracle correctness gate rests on). Values are
compared bit-exact — no approx."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from apachebeamkmeans_spark import oraclegen as OG
from apachebeamkmeans_spark.functions import distance as D
from apachebeamkmeans_spark.functions import text as T
from apachebeamkmeans_spark.functions.hashing import hash01, hash_u32

IDS = [0, 1, 7, 42, 999999999999, -3]
VECS = [
    [0.1, -0.25, 3.5, 0.0],
    [1e-8, 100.5, -99.25, 0.125],
]
CENTER = [0.5, -1.5, 2.25, 0.0]


@pytest.fixture(scope="module")
def duck():
    return duckdb.connect()


def test_hash01_twin(spark, duck):
    sdf = spark.createDataFrame([(i,) for i in IDS], "id long")
    got_spark = [
        r["h"] for r in sdf.select(hash01(F.col("id"), "42-1").alias("h")).orderBy("id").collect()
    ]
    got_duck = [
        duck.execute(
            f"SELECT {OG.sql_hash01('id', '42-1')} AS h FROM (SELECT CAST({i} AS BIGINT) AS id)"
        ).fetchone()[0]
        for i in sorted(IDS)
    ]
    assert got_spark == got_duck
    assert all(0.0 <= h < 1.0 for h in got_spark)


def test_hash_u32_twin(spark, duck):
    sdf = spark.createDataFrame([(i,) for i in IDS], "id long")
    got_spark = [
        r["h"] for r in sdf.select(hash_u32(F.col("id"), 7).alias("h")).orderBy("id").collect()
    ]
    got_duck = [
        duck.execute(
            f"SELECT {OG.sql_hex_to_int(OG_sub(i))} AS h"
        ).fetchone()[0]
        for i in sorted(IDS)
    ]
    assert got_spark == got_duck


def OG_sub(i: int) -> str:
    return f"substr(md5(concat('7|', CAST(CAST({i} AS BIGINT) AS VARCHAR))), 1, 8)"


def test_l2_sq_twin(spark, duck):
    sdf = spark.createDataFrame([(v,) for v in VECS], "v array<double>")
    got_spark = [
        r["d"]
        for r in sdf.select(D.l2_sq_unrolled(F.col("v"), CENTER).alias("d")).collect()
    ]
    for v, expected in zip(VECS, got_spark):
        got = duck.execute(
            f"SELECT {OG.sql_l2_sq('v', CENTER)} FROM (SELECT {OG.dlist(v)} AS v)"
        ).fetchone()[0]
        assert got == expected  # bit-exact


def test_norms_and_dot_twins(spark, duck):
    sdf = spark.createDataFrame([(v,) for v in VECS], "v array<double>")
    rows = sdf.select(
        D.abs_sum_unrolled(F.col("v"), 4).alias("l1"),
        D.norm_sq_unrolled(F.col("v"), 4).alias("n2"),
        D.dot_unrolled(F.col("v"), CENTER).alias("dp"),
        D.cosine_unrolled(F.col("v"), CENTER, 4).alias("cos"),
    ).collect()
    for v, r in zip(VECS, rows):
        q = (
            f"SELECT {OG.sql_abs_sum('v', 4)} AS l1, {OG.sql_norm_sq('v', 4)} AS n2, "
            f"{OG.sql_dot('v', CENTER)} AS dp, {OG.sql_cosine_lit('v', CENTER, 4)} AS cos "
            f"FROM (SELECT {OG.dlist(v)} AS v)"
        )
        got = duck.execute(q).fetchone()
        assert got == (r["l1"], r["n2"], r["dp"], r["cos"])


def test_tokens_and_shingles_twin(spark, duck):
    texts = ["The  quick brown fox", "one two", "single", ""]
    sdf = spark.createDataFrame([(t,) for t in texts], "text string")
    srows = sdf.select(
        T.tokens(F.col("text")).alias("toks"),
        T.token_shingles(T.tokens(F.col("text")), 3).alias("sh"),
    ).collect()
    for t, r in zip(texts, srows):
        toks_sql = OG.sql_tokens("text")
        got_toks, got_sh = duck.execute(
            f"SELECT {toks_sql} AS toks, {OG.sql_token_shingles('toks', 3)} AS sh "
            f"FROM (SELECT {toks_sql} AS toks, text FROM (SELECT '{t}' AS text))"
        ).fetchone()
        assert list(r["toks"]) == got_toks, t
        assert list(r["sh"]) == (got_sh or []), t


def test_minhash_band_twin(spark, duck):
    text = "the quick brown fox jumps over the lazy dog"
    sdf = spark.createDataFrame([(text,)], "text string")
    hashed = T.shingle_hashes(T.token_shingles(T.tokens(F.col("text")), 3))
    srow = sdf.select(T.minhash_signature(hashed, 4).alias("mh")).collect()[0]["mh"]
    toks_sql = OG.sql_tokens("text")
    sh_sql = OG.sql_token_shingles("toks", 3)
    bands = [OG.sql_minhash_band("sh", b) for b in range(4)]
    got = duck.execute(
        f"SELECT {', '.join(bands)} FROM "
        f"(SELECT {sh_sql} AS sh FROM (SELECT {toks_sql} AS toks FROM (SELECT '{text}' AS text)))"
    ).fetchone()
    assert list(srow) == list(got)


def test_argmin_case_matches_array_position(spark, duck):
    # ties must resolve to the FIRST minimum in both engines
    cases = [(1.0, 2.0, 1.0, 3.0), (5.0, 4.0, 4.0, 6.0), (7.0, 7.0, 7.0, 7.0)]
    sdf = spark.createDataFrame(cases, "d0 double, d1 double, d2 double, d3 double")
    arr = F.array("d0", "d1", "d2", "d3")
    got_spark = [
        r["c"]
        for r in sdf.select(
            (F.array_position(arr, F.array_min(arr)) - 1).cast("int").alias("c")
        ).collect()
    ]
    got_duck = [
        duck.execute(
            f"SELECT {OG.sql_argmin_case(['d0', 'd1', 'd2', 'd3'], 'c')} FROM "
            f"(SELECT {a} AS d0, {b} AS d1, {c} AS d2, {d} AS d3)"
        ).fetchone()[0]
        for a, b, c, d in cases
    ]
    assert got_spark == got_duck == [0, 1, 0]


def test_bpe_chain_exhausted_round_is_noop_cross_engine(spark, duck):
    """The r8 BPE oracle chain's empty-round guard (LEFT JOIN ON TRUE +
    coalesce): when every word fuses to one symbol before the merge cap,
    the remaining oracle rounds must be no-ops exactly like the Spark
    loop's break — the merge tables must match row-for-row on a corpus
    whose pairs exhaust in round 1 ('ab' is a single merged symbol
    after one round; rounds 2..5 find nothing)."""
    from apachebeamkmeans_spark import queries_text as QT
    from apachebeamkmeans_spark.operators import textstats as TX

    docs = spark.createDataFrame(
        [(1, "ab ab"), (2, "ab")], "doc_id long, text string"
    )
    got_spark = sorted(
        (r["round"], r["merged"], r["freq"])
        for r in TX.bpe_train_merges(docs, n_merges=5).collect()
    )
    duck.execute("CREATE OR REPLACE TABLE documents AS "
                 "SELECT * FROM (VALUES (1, 'ab ab'), (2, 'ab')) t(doc_id, text)")
    got_duck = sorted(
        (int(r[0]), r[1], int(r[2]))
        for r in duck.execute(QT._oracle_bpe_train(5)).fetchall()
    )
    duck.execute("DROP TABLE documents")
    assert got_spark == got_duck == [(1, "a b", 3)]
