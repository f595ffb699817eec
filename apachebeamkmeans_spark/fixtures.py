"""Deterministic shared literals used by BOTH the Spark queries and the
DuckDB oracle SQL.

Everything here is a pure function of small integers — no RNG state —
so the Spark plan and the generated oracle SQL embed bit-identical
double literals (rounded to a fixed number of decimals before use).

`centers_fixed` mirrors FIXTURES.md §1 ("frozen center set for
deterministic single-step queries"): it lets assignment (argmin),
recenter (element-wise avg), min-distance and farthest-point queries be
pure SQL with exact oracle twins, without running the iterative fit.
"""

from __future__ import annotations

import math

EMBEDDING_DIM = 64
K = 4


def _grid(i: int, j: int, scale: float, phase: float) -> float:
    # Smooth deterministic values spanning the embedding value range
    # (~[-0.5, 0.5] in the testdata); rounded so literals are short and
    # identical in Python, Spark and SQL text.
    return round(scale * math.cos(phase * (j + 1) * (i + 1) + 0.1 * i), 4)


def fixed_centers(k: int = K, dim: int = EMBEDDING_DIM) -> list[list[float]]:
    """k frozen cluster centers for single-step (non-iterative) queries."""
    return [[_grid(i, j, 0.35, 0.37) for j in range(dim)] for i in range(k)]


def lsh_hyperplanes(n_planes: int = 8, dim: int = EMBEDDING_DIM) -> list[list[float]]:
    """Random-hyperplane (SimHash-for-cosine) projection directions for
    embedding LSH bucketing. Deterministic so oracle SQL reproduces the
    same sign bits."""
    return [[_grid(i + 101, j, 1.0, 0.59) for j in range(dim)] for i in range(n_planes)]


def query_vectors(n: int = 5, dim: int = EMBEDDING_DIM) -> list[list[float]]:
    """Fixed query points for similarity-search top-k queries."""
    return [[_grid(i + 301, j, 0.3, 0.83) for j in range(dim)] for i in range(n)]


def maxsim_query_tokens(n: int = 3, tq: int = 3,
                        dsub: int = EMBEDDING_DIM // 4) -> list[list[list[float]]]:
    """Multi-vector (late-interaction) queries: `n` queries × `tq`
    token vectors × `dsub` dims. Doc-side token vectors are the
    EMBEDDING_DIM/dsub contiguous `dsub`-wide slices of the flat
    embedding, so queries live in the same sub-space width. Frozen
    literals, like `query_vectors`."""
    return [
        [[_grid(i * tq + t + 601, j, 0.3, 0.71) for j in range(dsub)]
         for t in range(tq)]
        for i in range(n)
    ]


def pq_codebooks(m: int = 8, ksub: int = 16,
                 dsub: int = EMBEDDING_DIM // 8) -> list[list[list[float]]]:
    """Product-quantization codebooks: `m` subspaces × `ksub` centroids
    × `dsub` dims (m·dsub = EMBEDDING_DIM). Frozen literals, like
    `fixed_centers`, so encode (per-subspace argmin) and ADC search
    (lookup-table sums) are exactly reproducible in oracle SQL."""
    return [
        [[_grid(s * ksub + c + 501, j, 0.35, 0.47) for j in range(dsub)]
         for c in range(ksub)]
        for s in range(m)
    ]


# MinHash modulus and affine band coefficients: h_b(x) = (A_b·h(x)+C_b) mod P
# over a single md5-derived base hash per shingle (one md5 instead of
# `bands`). Pure integers — embedded identically in Spark and oracle SQL.
MINHASH_P = 2147483647  # 2^31 − 1


def minhash_coeffs(bands: int, seed: int = 0) -> list[tuple[int, int]]:
    out = []
    for b in range(bands):
        a = (1103515245 * (b + seed + 1) + 12345) % MINHASH_P
        c = (2246822519 * (b + seed + 1) + 3266489917) % MINHASH_P
        out.append((a or 1, c))
    return out


# Stopword list for text quality scoring / language heuristics —
# a tiny fixed set, embedded identically in Spark and oracle SQL.
STOPWORDS = ["the", "a", "and", "of", "to", "in", "is", "it", "for", "on"]
