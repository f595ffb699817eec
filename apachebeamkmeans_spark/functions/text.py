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
    """n-token shingles ('w1 w2 w3') — empty array if fewer than n tokens."""
    idx = F.sequence(F.lit(1), F.greatest(F.size(toks) - (n - 1), F.lit(0)))
    return F.transform(idx, lambda i: F.concat_ws(" ", F.slice(toks, i, n)))


def char_shingles(colname: str, n: int = 5) -> Column:
    """Character n-grams of a string column (document fingerprinting).

    Expressed via SQL text because `F.substring` only takes a literal
    position while we need the sequence index column.
    """
    return F.expr(
        f"transform(sequence(1, greatest(length({colname}) - {n - 1}, 0)), "
        f"i -> substring({colname}, i, {n}))"
    )


def minhash_signature(shingles: Column, bands: int, seed: int = 0) -> Column:
    """Array of `bands` MinHash values: for band b, the lexicographic min
    of md5(b|seed|shingle) over the document's shingles.

    One md5 per (shingle, band) — O(|shingles|·bands) JVM work, no
    shuffle. NULL-safe: empty shingle set → array of NULLs.
    """

    def band_hash(b: int):
        # closure (not a default arg — an extra lambda param would be
        # read by Spark as the HOF's index argument)
        salt = f"{b}|{seed}|"
        return lambda s: F.md5(F.concat(F.lit(salt), s))

    return F.array(
        *[F.array_min(F.transform(shingles, band_hash(b))).alias(f"mh{b}") for b in range(bands)]
    )


def stopword_hits(toks: Column, stopwords: list[str]) -> Column:
    """Count of tokens that are in the stopword list."""
    return F.size(F.filter(toks, lambda t: t.isin(*stopwords)))


def punct_count(col: Column) -> Column:
    """Number of non-alphanumeric, non-space characters."""
    return F.length(col) - F.length(F.regexp_replace(col, r"[^A-Za-z0-9 ]", ""))
