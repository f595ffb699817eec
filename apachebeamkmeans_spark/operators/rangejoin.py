"""Binned (bucketed) time-range join.

The reference has no joins at all (SURVEY.md §2.3 — its only "join" is
the broadcast argmin assign); a real engine needs an event-time range
join: "for each probe row, the rows of the other side with the same
key whose timestamp falls in a trailing window". The naive plan is an
equi-join on the key plus an inequality predicate, which Spark executes
as a per-key nested loop — O(rows_per_key²) and hopeless when a hot key
holds millions of rows at 100 TB.

The scale-safe plan used here is the classic *binned* range join:

1. bucket both sides by `floor(ts / window)`;
2. explode each probe row to (bucket, bucket-1) — with a trailing
   window of exactly one bucket width, every candidate match lives in
   one of those two buckets;
3. shuffle equi-join on (key, bucket) — ordinary hash join, partial
   pruning, AQE skew-split all apply;
4. apply the exact range predicate *inside* the joined bucket pairs.

Cost: 2× probe-side duplication instead of a quadratic blowup; the
range predicate only ever sees rows at most one bucket apart.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_BUCKET = "__rj_bucket"


def trailing_range_join(
    probes: DataFrame,
    others: DataFrame,
    key: str,
    probe_ts_us: Column,
    other_ts_us: Column,
    window_us: int,
) -> DataFrame:
    """Inner-join each probe row to `others` rows with the same `key`
    and other_ts in [probe_ts - window_us, probe_ts).

    Both inputs may be the same table (self-join); column-name clashes
    are avoided by prefixing the other side with `o_`. Returns
    probe columns + `o_`-prefixed other columns.
    """
    p = probes.withColumn("__p_ts_us", probe_ts_us)
    o = others.withColumn("__o_ts_us", other_ts_us)
    o = o.select([F.col(c).alias(f"o_{c}") for c in o.columns])

    # Integer `div`, not F.floor(ts / w): double division is only exact
    # below 2^53, so ns-scale epochs (or far-future µs) could round a row
    # into the wrong bucket and silently drop matches. `div` truncates
    # toward zero == floor for the non-negative epochs used here.
    w = int(window_us)
    p = p.withColumn(
        _BUCKET,
        F.explode(
            F.array(
                F.expr(f"__p_ts_us div {w}"),
                F.expr(f"__p_ts_us div {w}") - 1,
            )
        ),
    )
    o = o.withColumn(_BUCKET, F.expr(f"o___o_ts_us div {w}"))

    joined = p.join(
        o,
        (p[key] == o[f"o_{key}"])
        & (p[_BUCKET] == o[_BUCKET])
        & (F.col("o___o_ts_us") >= F.col("__p_ts_us") - F.lit(window_us))
        & (F.col("o___o_ts_us") < F.col("__p_ts_us")),
        "inner",
    )
    return joined.drop(_BUCKET, "__p_ts_us", "o___o_ts_us")
