"""Text column expressions: tokenization, shingling, MinHash, quality.

All pure Spark column expressions (higher-order functions) — no Python
UDFs, so tokenize → shingle → hash → min pipelines run entirely inside
the JVM with no shuffle until an aggregation needs one. MinHash uses
md5-based signatures (lexicographic min over per-band-salted digests),
which DuckDB reproduces exactly for the oracle.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def tokens(col: Column) -> Column:
    """Lower-cased whitespace tokens, empties dropped."""
    return F.filter(F.split(F.lower(col), r"\s+"), lambda t: F.length(t) > 0)


def token_shingles(toks: Column, n: int = 3) -> Column:
    """n-token shingles ('w1 w2 w3') — empty array if fewer than n
    tokens. Built by zipping n shifted slices of the token array (one
    O(len) pass) rather than slicing per output index, which is
    O(len²) per document (measured ~12× at sf0.1)."""
    m = F.greatest(F.size(toks) - (n - 1), F.lit(0))
    z = F.arrays_zip(*[F.slice(toks, i + 1, m) for i in range(n)])
    return F.transform(z, lambda s: F.concat_ws(" ", *[s[str(i)] for i in range(n)]))


def char_shingles(colname: str, n: int = 5) -> Column:
    """Character n-grams of a string column (document fingerprinting).

    Expressed via SQL text because `F.substring` only takes a literal
    position while we need the sequence index column.
    """
    return F.expr(
        f"transform(sequence(1, greatest(length({colname}) - {n - 1}, 0)), "
        f"i -> substring({colname}, i, {n}))"
    )


def shingle_base_hash(s: Column) -> Column:
    """Base hash of a shingle in [0, P): first 15 md5 hex chars (fits
    signed 64-bit) reduced mod P. One md5 per shingle — the affine band
    hashes (A_b·h + C_b mod P) derive from this single digest, the
    standard single-base-hash MinHash family."""
    from apachebeamkmeans_spark.fixtures import MINHASH_P

    return F.conv(F.substring(F.md5(s), 1, 15), 16, 10).cast("long") % MINHASH_P


def shingle_hashes(shingles: Column) -> Column:
    """ARRAY<BIGINT> of base hashes — materialize (cache) this before
    fanning out to band mins, or codegen re-hashes per band."""
    return F.transform(shingles, shingle_base_hash)


def minhash_signature(hashes: Column, bands: int, seed: int = 0) -> Column:
    """Array of `bands` MinHash values over pre-computed base hashes:
    band b = min over shingles of (A_b·h + C_b) mod P. BIGINT band
    values (cheap join keys); products stay < 2^62 (A_b, h < P ≈ 2^31).
    NULL-safe: empty shingle set → array of NULLs."""
    from apachebeamkmeans_spark.fixtures import MINHASH_P, minhash_coeffs

    def band_min(a: int, c: int):
        return lambda h: (F.lit(a) * h + F.lit(c)) % MINHASH_P

    return F.array(
        *[
            F.array_min(F.transform(hashes, band_min(a, c))).alias(f"mh{b}")
            for b, (a, c) in enumerate(minhash_coeffs(bands, seed))
        ]
    )


def stopword_hits(toks: Column, stopwords: list[str]) -> Column:
    """Count of tokens that are in the stopword list."""
    return F.size(F.filter(toks, lambda t: t.isin(*stopwords)))


def punct_count(col: Column) -> Column:
    """Number of non-alphanumeric, non-space characters."""
    return F.length(col) - F.length(F.regexp_replace(col, r"[^A-Za-z0-9 ]", ""))
