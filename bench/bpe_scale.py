"""BPE trainer scale stress: per-round cost vs VOCABULARY size.

The r8 trainer's claim is that each merge round costs O(|vocab|),
independent of corpus size (the corpus is touched once, by the word
count). The synthetic corpus caps the demonstration at its ~31-word
vocabulary, so this harness measures the rounds directly on GENERATED
word-frequency tables of increasing size — deterministic md5-derived
words (8-24 chars) with Zipf-ish counts — which is exactly the frame a
real 30k-merge training run iterates on.

Usage: python bench/bpe_scale.py [vocab_sizes...]   (default 1k 10k 100k)
Prints one JSON line: {"rounds": N, "per_round_ms": {"1000": .., ...}}
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from apachebeamkmeans_spark.operators import textstats as TX
from apachebeamkmeans_spark.session import get_spark

ROUNDS = 30


def synthetic_vocab(spark, n_words: int):
    """Deterministic (word, cnt) frame: word = 8-24 lowercase-hex chars
    of md5(i) (distinct by construction at these sizes), cnt Zipf-ish
    via the id rank."""
    return (
        spark.range(n_words)
        .select(
            F.substring(
                F.md5(F.col("id").cast("string")),
                1,
                (8 + F.pmod(F.col("id"), F.lit(17))).cast("int"),
            ).alias("word"),
            (F.lit(1_000_000) / (F.col("id") + 1)).cast("long").alias("cnt"),
        )
        .groupBy("word")
        .agg(F.max("cnt").alias("cnt"))  # collapse rare hash-prefix ties
    )


def main() -> None:
    sizes = [int(a) for a in sys.argv[1:]] or [1_000, 10_000, 100_000]
    spark = get_spark("bpe-scale")
    spark.range(1000).selectExpr("sum(id)").collect()  # warm JVM
    out: dict[str, float] = {}
    for n in sizes:
        vocab = synthetic_vocab(spark, n)
        t0 = time.perf_counter()
        merges, _final = TX._bpe_fit_vocab(vocab, ROUNDS)
        dt = time.perf_counter() - t0
        out[str(n)] = round(dt / max(1, len(merges)) * 1000, 1)
        print(
            f"[bpe_scale] vocab={n}: {len(merges)} rounds, "
            f"{out[str(n)]} ms/round",
            file=sys.stderr,
        )
    print(json.dumps({"rounds": ROUNDS, "per_round_ms": out}))


if __name__ == "__main__":
    main()
