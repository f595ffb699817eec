"""K-Means configuration.

Replaces the reference's mutable static fields on the (missing) `Point`
class — `Point.k`, `Point.paradigm`, `Point.threshold`,
`Point.max_iteration` set from CLI args (SparKMeansGroupBy.java:30-54)
— with an explicit immutable params object. Every random choice flows
from `seed` (the reference used unseeded java.util.Random,
SparKMeansGroupByPlusPlus.java:100-101).
"""

from __future__ import annotations

from dataclasses import dataclass


@dataclass(frozen=True)
class KMeansParams:
    k: int = 4
    p: float = 2.0  # Minkowski order — the reference's "paradigm" (1=L1, 2=L2)
    threshold: float = 1e-4  # convergence epsilon on max matched center movement
    max_iter: int = 20
    seed: int = 42
    init: str = "random"  # random | plusplus | init_max | init_min |
    #                       max_farthest | max_farthest_manhattan
    weight: str = "d2"  # k-means++ roulette weight: 'd' (reference's
    #                     variant, SparKMeansGroupBy §8.4) or 'd2' (classic)

    def __post_init__(self):
        if self.init not in {
            "random",
            "plusplus",
            "init_max",
            "init_min",
            "max_farthest",
            "max_farthest_manhattan",
        }:
            raise ValueError(f"unknown init strategy: {self.init}")
        if self.weight not in {"d", "d2"}:
            raise ValueError(f"unknown weight: {self.weight}")
