"""Skewed-fixture generator for the skew stress bench (SCALE.md §skew).

Produces a full sf-style directory (all ten tables, so selfcheck and
every registered query run unmodified) at roughly sf1 volume, but with
deliberately pathological key distributions the uniform testdata never
exercises:

- ``documents`` — a *hot near-duplicate family*: ``--hot-docs``
  variants of one template (one token substituted per doc), so they
  collide into the same MinHash-LSH band buckets, the same SimHash
  pigeonhole blocks, and one giant connected component. One bucket
  holding m docs forces ~m²/2 candidate pairs through the self-joins —
  the classic dedup skew failure at 100 TB.
- ``embeddings`` — a *hot sign-LSH bucket*: ``--hot-vecs`` copies of
  one base vector + tiny noise, all landing in one hyperplane bucket.
- ``events`` — a *hot user* (``--hot-user-events`` rows on user 0,
  ~20% of the stream) and a *hot hour* within that user, so the
  (user_id, hour-bucket) range-join key and the sessionization window
  partition are both heavily skewed.

The background rows mirror the driver testdata's shapes (same schemas,
token vocabulary, type mix) so thresholds and oracles stay meaningful.
Everything is seeded → the fixture and the DuckDB oracle replay are
deterministic. Remaining small tables are copied from sf0.1.

Usage: python tools/gen_skew.py [out_dir]   (default bench/skewdata)
"""

from __future__ import annotations

import argparse
import os
import shutil
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SRC_SF = "/root/testdata/sf0.1"

VOCAB = [
    "batch", "part", "spark", "line", "column", "order", "small", "sort",
    "fast", "value", "scan", "hash", "slow", "group", "agg", "filter",
    "query", "big", "key", "window", "row", "table", "stream", "merge",
    "data", "join", "shuffle", "cache", "plan", "stage",
]

EVENT_TYPES = ["click", "view", "purchase", "error"]
EVENT_P = [0.55, 0.25, 0.10, 0.10]
LANGS = ["en", "zh", "de", "fr"]
SOURCES = ["web", "wiki", "code", "chat"]

T0_US = 1_704_067_200_000_000  # 2024-01-01T00:00:00Z
DAYS = 30


def gen_documents(out: str, n: int, hot: int, seed: int) -> None:
    rng = np.random.default_rng(seed)
    doc_len = 50
    template = rng.integers(0, len(VOCAB), size=doc_len)
    texts: list[str] = []
    # hot family: one token substituted per doc → near-identical shingle
    # sets, but exact-dedup cannot collapse them
    for i in range(hot):
        words = template.copy()
        words[i % doc_len] = rng.integers(0, len(VOCAB))
        texts.append(" ".join(VOCAB[w] for w in words))
    # background: independent random docs
    bg = rng.integers(0, len(VOCAB), size=(n - hot, doc_len))
    texts.extend(" ".join(VOCAB[w] for w in row) for row in bg)
    lang = rng.choice(LANGS, size=n)
    source = rng.choice(SOURCES, size=n)
    tbl = pa.table(
        {
            "doc_id": pa.array(np.arange(n, dtype=np.int64)),
            "text": pa.array(texts),
            "lang": pa.array(lang),
            "source": pa.array(source),
            "n_chars": pa.array(np.array([len(t) for t in texts], dtype=np.int64)),
        }
    )
    pq.write_table(tbl, f"{out}/documents.parquet")


def gen_embeddings(out: str, n: int, hot: int, dim: int, seed: int) -> None:
    rng = np.random.default_rng(seed + 1)
    base = rng.standard_normal(dim).astype(np.float32)
    hot_vecs = base + 0.01 * rng.standard_normal((hot, dim)).astype(np.float32)
    bg = rng.standard_normal((n - hot, dim)).astype(np.float32)
    vecs = np.vstack([hot_vecs, bg]).astype(np.float32)
    tbl = pa.table(
        {
            "vec_id": pa.array(np.arange(n, dtype=np.int64)),
            "embedding": pa.array(list(vecs), type=pa.list_(pa.float32())),
            "label": pa.array(rng.integers(0, 4, size=n).astype(np.int32)),
        }
    )
    pq.write_table(tbl, f"{out}/embeddings.parquet")


def gen_events(out: str, n: int, hot_user: int, hot_hour: int, n_users: int,
               seed: int) -> None:
    rng = np.random.default_rng(seed + 2)
    span_us = DAYS * 24 * 3_600_000_000
    n_bg = n - hot_user
    # background: uniform users over the whole month
    bg_users = rng.integers(1, n_users, size=n_bg)
    bg_ts = rng.integers(0, span_us, size=n_bg)
    # hot user 0: hot_hour events packed into one hour, the rest spread
    hu_spread = rng.integers(0, span_us, size=hot_user - hot_hour)
    hu_hot = 10 * 24 * 3_600_000_000 + rng.integers(0, 3_600_000_000, size=hot_hour)
    users = np.concatenate([np.zeros(hot_user, dtype=np.int64), bg_users])
    ts = np.concatenate([hu_hot, hu_spread, bg_ts]) + T0_US
    order = np.argsort(ts, kind="stable")
    users, ts = users[order], ts[order]
    etype = rng.choice(EVENT_TYPES, size=n, p=EVENT_P)
    tbl = pa.table(
        {
            "event_id": pa.array(np.arange(n, dtype=np.int64)),
            # ns like the driver testdata, so sources/io.read_table takes
            # the same nanosAsLong read path the engine uses everywhere
            "ts": pa.array(ts * 1000, type=pa.timestamp("ns")),
            "user_id": pa.array(users),
            "event_type": pa.array(etype),
            "value": pa.array(np.round(rng.uniform(0, 100, size=n), 2)),
            "props": pa.array(['{"k": %d}' % k for k in rng.integers(0, 100, size=n)]),
        }
    )
    pq.write_table(tbl, f"{out}/events.parquet")


def main(argv: list[str]) -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("out", nargs="?", default=os.path.join(REPO, "bench", "skewdata"))
    ap.add_argument("--docs", type=int, default=50_000)
    ap.add_argument("--hot-docs", type=int, default=2_000)
    ap.add_argument("--vecs", type=int, default=20_000)
    ap.add_argument("--hot-vecs", type=int, default=4_000)
    ap.add_argument("--dim", type=int, default=64)
    ap.add_argument("--events", type=int, default=1_000_000)
    ap.add_argument("--hot-user-events", type=int, default=200_000)
    ap.add_argument("--hot-hour-events", type=int, default=20_000)
    ap.add_argument("--users", type=int, default=15_000)
    ap.add_argument("--seed", type=int, default=42)
    a = ap.parse_args(argv)

    os.makedirs(a.out, exist_ok=True)
    gen_documents(a.out, a.docs, a.hot_docs, a.seed)
    gen_embeddings(a.out, a.vecs, a.hot_vecs, a.dim, a.seed)
    gen_events(a.out, a.events, a.hot_user_events, a.hot_hour_events, a.users, a.seed)
    for t in ("region", "nation", "customer", "supplier", "part", "orders", "lineitem"):
        shutil.copy(f"{SRC_SF}/{t}.parquet", f"{a.out}/{t}.parquet")
    print(f"skew fixture written to {a.out}")


if __name__ == "__main__":
    main(sys.argv[1:])
