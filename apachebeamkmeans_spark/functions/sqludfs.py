"""SQL UDF registration surface.

The reference hard-codes every scalar as a Java lambda and exposes no
function-registration surface at all (SURVEY.md §2.7). This module
registers the engine's vector/text scalars as **declarative SQL UDFs**
(`CREATE TEMPORARY FUNCTION ... RETURNS ... RETURN <expr>`) so users
can call them from plain `spark.sql(...)` text.

These are NOT Python UDFs: the body is a Catalyst expression that gets
inlined, optimized, and whole-stage-codegen'd exactly like a built-in —
zero serialization cost, safe in the 100 TB hot path. The fold order of
`aggregate(...)` is the array element order, i.e. the same
left-associated summation as the unrolled oracle twins in
`oraclegen.py`, so results are bit-identical to the expression API
(`functions/distance.py`) and hash-match the DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

_FOLD_SUM = "0.0D, (acc, x) -> acc + x"

_DEFS: dict[str, str] = {
    # L1 norm — twin of distance.abs_sum / oraclegen.sql_abs_sum
    "l1_norm": (
        "(v ARRAY<DOUBLE>) RETURNS DOUBLE RETURN "
        f"aggregate(transform(v, x -> abs(x)), {_FOLD_SUM})"
    ),
    # squared L2 norm — twin of distance.norm_sq
    "l2_norm_sq": (
        "(v ARRAY<DOUBLE>) RETURNS DOUBLE RETURN "
        f"aggregate(transform(v, x -> x * x), {_FOLD_SUM})"
    ),
    # squared L2 distance between two vectors — twin of distance.l2_sq
    "l2_dist_sq": (
        "(a ARRAY<DOUBLE>, b ARRAY<DOUBLE>) RETURNS DOUBLE RETURN "
        f"aggregate(zip_with(a, b, (x, y) -> (x - y) * (x - y)), {_FOLD_SUM})"
    ),
    # dot product — twin of distance.dot
    "dot_product": (
        "(a ARRAY<DOUBLE>, b ARRAY<DOUBLE>) RETURNS DOUBLE RETURN "
        f"aggregate(zip_with(a, b, (x, y) -> x * y), {_FOLD_SUM})"
    ),
    # Minkowski-p distance (p=1 → Manhattan, p=2 → Euclidean) — the
    # reference's single scalar workhorse, Point.distance_paradigm
    # (/root/reference/SparKMeansGroupBy.java:88)
    "minkowski_dist": (
        "(a ARRAY<DOUBLE>, b ARRAY<DOUBLE>, p DOUBLE) RETURNS DOUBLE RETURN "
        f"pow(aggregate(zip_with(a, b, (x, y) -> pow(abs(x - y), p)), {_FOLD_SUM}),"
        " 1.0D / p)"
    ),
    # cosine similarity
    "cosine_sim": (
        "(a ARRAY<DOUBLE>, b ARRAY<DOUBLE>) RETURNS DOUBLE RETURN "
        "dot_product(a, b) / (sqrt(l2_norm_sq(a)) * sqrt(l2_norm_sq(b)))"
    ),
    # whitespace tokenizer — twin of text.tokens
    "ws_tokens": (
        "(s STRING) RETURNS ARRAY<STRING> RETURN "
        "filter(split(lower(s), '\\\\s+'), t -> t != '')"
    ),
}


def register_sql_functions(spark: SparkSession) -> list[str]:
    """Register every engine scalar as a session-scoped SQL function;
    returns the registered names. Idempotent (OR REPLACE)."""
    for name, body in _DEFS.items():
        spark.sql(f"CREATE OR REPLACE TEMPORARY FUNCTION {name}{body}")
    return list(_DEFS)
