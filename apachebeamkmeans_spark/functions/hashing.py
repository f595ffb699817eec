"""Cross-engine deterministic hashing.

The reference uses unseeded ``java.util.Random`` for roulette draws and
``takeSample`` (SparKMeansGroupByPlusPlus.java:100-101) — irreproducible
runs. This engine bans that: every "random" per-row quantity is a pure
function of (stable id, explicit seed) computed via md5, which exists
with identical semantics in Spark SQL and DuckDB, so the oracle can
replay any sampling decision exactly.

``hash01`` maps (col, seed) → uniform double in (0, 1]: the first 8 hex
chars of md5 parsed as a 32-bit integer, plus one, over 2^32. The +1
keeps 0 out of the range so `-ln(u)` downstream (exponential-race
sampling) can never hit log(0) — Spark would yield NULL (which sorts
first under ASC) while DuckDB yields +inf (which sorts last): a
cross-engine determinism divergence at p≈2^-32 per row.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

TWO32 = 4294967296.0


def hash_hex8(col: Column, seed: int | str = 0) -> Column:
    """First 8 hex chars of md5(seed|value) — a 32-bit hash as hex text."""
    return F.substring(F.md5(F.concat(F.lit(f"{seed}|"), col.cast("string"))), 1, 8)


def hash_u32(col: Column, seed: int | str = 0) -> Column:
    """32-bit unsigned hash as BIGINT (via base-16 conv)."""
    return F.conv(hash_hex8(col, seed), 16, 10).cast("long")


def hash01(col: Column, seed: int | str = 0) -> Column:
    """Deterministic uniform (0,1] — the engine's reproducible `rand()`."""
    return (hash_u32(col, seed) + 1).cast("double") / F.lit(TWO32)


def bucket(col: Column, n_buckets: int, seed: int | str = 0) -> Column:
    """Deterministic hash-bucket id in [0, n_buckets)."""
    return (hash_u32(col, seed) % n_buckets).cast("int")
