"""Skew-mitigation helpers.

AQE's skew-join splitting (enabled in session.get_spark) handles join
skew at runtime; for *aggregation* skew over hot keys the standard fix
is salting: a two-phase aggregate that fans each key across
`n_salts` partial groups before the final combine, so no single task
owns a hot key's entire row set.

Salts derive from a deterministic per-row hash (functions.hashing) —
no RNG state, reproducible plans.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from apachebeamkmeans_spark.functions.hashing import bucket


def salted_agg(df: DataFrame, key: str, aggs: dict[str, str],
               salt_col: Column | None = None, n_salts: int = 16) -> DataFrame:
    """Two-phase skew-safe aggregation.

    `aggs` maps column → 'sum' | 'count' | 'min' | 'max' (the
    decomposable aggregates; avg = sum/count downstream). Phase 1
    groups by (key, salt) — hot keys split across `n_salts` tasks;
    phase 2 combines the ≤ n_salts partials per key.
    """
    salt = salt_col if salt_col is not None else bucket(
        F.monotonically_increasing_id(), n_salts, seed="salt"
    )
    first, second = [], []
    for col, how in aggs.items():
        partial = f"__p_{col}"
        if how == "count":
            first.append(F.count(F.lit(1)).alias(partial))
            second.append(F.sum(partial).alias(f"{how}_{col}"))
        elif how == "sum":
            first.append(F.sum(col).alias(partial))
            second.append(F.sum(partial).alias(f"{how}_{col}"))
        elif how == "min":
            first.append(F.min(col).alias(partial))
            second.append(F.min(partial).alias(f"{how}_{col}"))
        elif how == "max":
            first.append(F.max(col).alias(partial))
            second.append(F.max(partial).alias(f"{how}_{col}"))
        else:
            raise ValueError(f"non-decomposable aggregate: {how}")
    return (
        df.withColumn("__salt", salt)
        .groupBy(key, "__salt")
        .agg(*first)
        .groupBy(key)
        .agg(*second)
    )
