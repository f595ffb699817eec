"""Deterministic scale-series generator for the r9 scaling-curve
measurement (r8 verdict item 2: the 100 TB design claims rested on
plan shapes, not measured curves above sf0.1).

Generates documents / embeddings / events parquet tables with the SAME
generation process at every size — x1 is calibrated to the driver's
sf0.1 profile (5k docs avg ~300 chars with ~9.5% of docs carrying a
planted cross-doc copied block, ~0.3% exact copies; 2k 64-dim
embeddings in 10 Gaussian clusters; 100k events over a fixed 30-day
span with 5 uniform event types and per-user density held constant) —
so the measured time-vs-n exponents are attributable to the ENGINE,
not to a drifting fixture. Writes /root/repo/.scaledata/x{mult}/
(gitignored; ~80 MB at x10). The driver's /root/testdata is read-only
and never touched.

Usage: python tools/gen_scale.py [mult ...]      # default: 1 3 10
"""
from __future__ import annotations

import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT_ROOT = os.path.join(REPO, ".scaledata")

VOCAB = (
    "key agg row scan slow fast table value part hash batch window spark "
    "order data column join small line customer query merge big the a "
    "filter shuffle plan stage broadcast sort"
).split()  # 31 words, mirroring the driver fixture's vocabulary size

# x1 calibration (matches /root/testdata/sf0.1's measured profile)
BASE_DOCS = 5_000
BASE_EMB = 2_000
BASE_EVENTS = 100_000
BASE_USERS = 1_500
P_BLOCK_COPY = 0.047   # ~9.5% of docs end up flagged (copier + source)
P_EXACT_COPY = 0.002   # ~0.3% of docs sit in exact-dup groups
LANGS = ["en", "zh", "es", "fr", "de"]
LANG_P = [0.41, 0.1475, 0.1475, 0.1475, 0.1475]
SPAN_SEC = 30 * 24 * 3600  # events: fixed 30-day window at every size
DIM, K_CLUSTERS = 64, 10


def gen_documents(n: int, rng: np.random.Generator) -> pa.Table:
    texts: list[str] = []
    for i in range(n):
        target = int(rng.integers(44, 578))
        words: list[str] = []
        ln = -1
        while ln < target:
            w = VOCAB[int(rng.integers(0, len(VOCAB)))]
            words.append(w)
            ln += len(w) + 1
        texts.append(" ".join(words))
    # planted cross-doc copied blocks (the exact-substring workload):
    # copier inserts a 60-250 char slice of an EARLIER doc at a random
    # position — source and copier both become flagged docs
    for i in range(1, n):
        if rng.random() < P_BLOCK_COPY:
            src = texts[int(rng.integers(0, i))]
            blen = min(int(rng.integers(60, 251)), len(src))
            s0 = int(rng.integers(0, len(src) - blen + 1))
            block = src[s0 : s0 + blen]
            t = texts[i]
            at = int(rng.integers(0, len(t) + 1))
            texts[i] = t[:at] + block + t[at:]
    # exact copies (whole-doc duplication, the dedup_exact workload)
    for i in range(1, n):
        if rng.random() < P_EXACT_COPY:
            texts[i] = texts[int(rng.integers(0, i))]
    langs = rng.choice(len(LANGS), size=n, p=LANG_P)
    return pa.table(
        {
            "doc_id": pa.array(range(n), pa.int64()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array([LANGS[j] for j in langs], pa.string()),
            "source": pa.array(
                [f"src{int(v)}" for v in rng.integers(0, 20, n)], pa.string()
            ),
            "n_chars": pa.array([len(t) for t in texts], pa.int64()),
        }
    )


def gen_embeddings(n: int, rng: np.random.Generator) -> pa.Table:
    centers = rng.normal(0.0, 1.0, (K_CLUSTERS, DIM))
    labels = rng.integers(0, K_CLUSTERS, n)
    vecs = (centers[labels] + rng.normal(0.0, 0.35, (n, DIM))).astype(
        np.float32
    )
    return pa.table(
        {
            "vec_id": pa.array(range(n), pa.int64()),
            "embedding": pa.array(
                [v for v in vecs.tolist()], pa.list_(pa.float32())
            ),
            "label": pa.array(labels.astype(np.int32), pa.int32()),
        }
    )


def gen_events(n: int, n_users: int, rng: np.random.Generator) -> pa.Table:
    offs = np.sort(rng.uniform(0, SPAN_SEC, n))
    base = np.datetime64("2024-01-01T00:00:00", "us")
    ts = base + (offs * 1e6).astype("timedelta64[us]")
    types = np.array(["view", "click", "signup", "error", "purchase"])
    return pa.table(
        {
            "event_id": pa.array(range(n), pa.int64()),
            "ts": pa.array(ts),
            "user_id": pa.array(
                rng.integers(0, n_users, n).astype(np.int64), pa.int64()
            ),
            "event_type": pa.array(
                types[rng.integers(0, len(types), n)], pa.string()
            ),
            "value": pa.array(
                np.round(rng.exponential(50.0, n), 2), pa.float64()
            ),
            "props": pa.array(
                [f'{{"k": {int(v)}}}' for v in rng.integers(0, 100, n)],
                pa.string(),
            ),
        }
    )


def generate(mult: int) -> str:
    out = os.path.join(OUT_ROOT, f"x{mult}")
    os.makedirs(out, exist_ok=True)
    rng = np.random.default_rng(42 + mult)
    pq.write_table(
        gen_documents(BASE_DOCS * mult, rng),
        os.path.join(out, "documents.parquet"),
    )
    pq.write_table(
        gen_embeddings(BASE_EMB * mult, rng),
        os.path.join(out, "embeddings.parquet"),
    )
    pq.write_table(
        gen_events(BASE_EVENTS * mult, BASE_USERS * mult, rng),
        os.path.join(out, "events.parquet"),
    )
    return out


def generate_events_only(mult: int) -> str:
    """Events-only series for the streaming state-join measurement
    (SCALE.md §9 addendum): x{mult}ev holds just events.parquet at
    mult× volume with users scaled alongside (per-user density — and
    so per-user watermark state — held constant). Separate dirs so
    the document-family curves never pay for 10M-event generation."""
    out = os.path.join(OUT_ROOT, f"x{mult}ev")
    os.makedirs(out, exist_ok=True)
    rng = np.random.default_rng(42 + mult)
    pq.write_table(
        gen_events(BASE_EVENTS * mult, BASE_USERS * mult, rng),
        os.path.join(out, "events.parquet"),
    )
    return out


if __name__ == "__main__":
    args = sys.argv[1:]
    ev_only = "--events-only" in args
    args = [a for a in args if a != "--events-only"]
    mults = [int(a) for a in args] or ([30, 100] if ev_only else [1, 3, 10])
    for m in mults:
        print(generate_events_only(m) if ev_only else generate(m))
