"""Central query registry: name → (spark_fn, oracle_sql | None).

Aggregates every query module's QUERIES dict. `__spark_entry__.py`
exposes this to the driver; `bench.py` times the headline subset;
`tools/selfcheck.py` replays the oracle comparison locally.

Certification rotation: the verification driver oracle-checks the
FIRST `CERT_WINDOW` registry entries each round, so iteration order
decides which queries get driver-certified rows. The order is DERIVED
from the `CORRECTNESS_r*.json` history at the repo root, never
hand-maintained (the hand-kept front went stale twice — r3/r4
verdicts): oracle-backed queries with no green driver row in any round
come first, then green-but-stale ones oldest-round-first, and the
rows-only (no-oracle) queries last — a rows-only row can never
certify, so they must not occupy window slots.
"""

from __future__ import annotations

import json
import os
import re
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QuerySpec = tuple[Callable[[SparkSession, str], DataFrame], str | None]

# How many registry entries (in iteration order) the driver
# oracle-checks per round.
CERT_WINDOW = 50

# Queries whose SEMANTICS (implementation + oracle together) changed
# in a given round: until they have a value-green driver row from that
# round or later, they sort with the never-certified cohort — a green
# row recorded against the OLD semantics must not let the new form
# skip re-certification. Entries age out naturally (once re-certified
# they sort normally) but should be pruned when clearly stale.
SEMANTICS_CHANGED: dict[str, int] = {
    # (aged cohorts pruned per their own contract once re-certified:
    # r8 pruned in r11; the r9/r12/r13 markers and dedup_jaccard r16
    # pruned in r17 — every entry held a value-green driver row at or
    # after its marker round, so none had any remaining effect)
    # r17: sim_knn_graph_pq's refine dial moved from the fixed 100 to
    # the derived `ann_train.knn_refine(n, nprobe, cells)` rule
    # (SCALE.md's x30 recall fix). At TRAIN_SF_DIR the rule sits on
    # its floor of 100 so values and oracle text are bit-identical —
    # the marker forces the re-certification that PROVES that, rather
    # than riding the pre-change green row
    "sim_knn_graph_pq": 17,
}


def _repo_root() -> str:
    return os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def correctness_history(root: str | None = None) -> tuple[dict[str, int], dict[str, int]]:
    """(last_green, last_seen): per query name, the latest round with a
    VALUE-GREEN driver row (all three matches true — a contracted
    `no_oracle` row does NOT count, so a query that later gains an
    oracle is still 'never certified'), and the latest round with ANY
    recorded row (green, failed, rows-only, crashed)."""
    root = _repo_root() if root is None else root
    last_green: dict[str, int] = {}
    last_seen: dict[str, int] = {}
    for fn in os.listdir(root):
        m = re.fullmatch(r"CORRECTNESS_r(\d+)\.json", fn)
        if not m:
            continue
        rnd = int(m.group(1))
        with open(os.path.join(root, fn)) as f:
            data = json.load(f)
        for name, row in data.items():
            last_seen[name] = max(last_seen.get(name, 0), rnd)
            green = (
                bool(row.get("rows_match"))
                and bool(row.get("schema_match"))
                and bool(row.get("hash_match"))
            )
            if green:
                last_green[name] = max(last_green.get(name, 0), rnd)
    return last_green, last_seen


def certification_order(
    queries: dict[str, QuerySpec],
    history: tuple[dict[str, int], dict[str, int]] | None = None,
) -> dict[str, QuerySpec]:
    """Order the registry so the driver's certification window is spent
    where it buys the most:

    1. oracle-backed, never value-green — OR whose most recent driver
       row was NOT green (a failure after an old green must rotate
       back to the head, not hide behind its stale green round) —
       name order;
    2. oracle-backed, green at last check — oldest green round first,
       then name (so no query silently goes rounds without
       re-certification);
    3. no-oracle queries last (their driver row is rows-only and can
       never certify — keeping them in the window wastes slots).
    """
    green, seen = correctness_history() if history is None else history

    def key(item: tuple[str, QuerySpec]):
        name, (_fn, sql) = item
        if sql is None:
            return (2, 0, name)
        g = green.get(name)
        if (
            g is None
            or seen.get(name, 0) > g
            or g < SEMANTICS_CHANGED.get(name, 0)
        ):
            return (0, 0, name)
        return (1, g, name)

    return dict(sorted(queries.items(), key=key))


def all_queries() -> dict[str, QuerySpec]:
    # Unconditional imports: a transitive ImportError inside a query
    # module must fail loudly — silently dropping a module would remove
    # its queries from the correctness gate and the bench.
    from apachebeamkmeans_spark import (
        queries_advanced,
        queries_dedup,
        queries_events,
        queries_kmeans,
        queries_multimodal,
        queries_relational,
        queries_sim_serving,
        queries_similarity,
        queries_text,
    )

    modules = [
        queries_kmeans,
        queries_relational,
        queries_events,
        queries_text,
        queries_dedup,
        queries_similarity,
        queries_sim_serving,
        queries_multimodal,
        queries_advanced,
    ]

    out: dict[str, QuerySpec] = {}
    for m in modules:
        for k, v in m.QUERIES.items():
            if k in out:
                raise ValueError(f"duplicate query name: {k}")
            out[k] = v
    ordered = certification_order(out)
    # Fail-loud window invariant: every slot the driver will check must
    # be oracle-backed (there are far more than CERT_WINDOW such
    # queries; a no-oracle entry inside the window means the ordering
    # logic regressed).
    window = list(ordered.items())[:CERT_WINDOW]
    bad = [n for n, (_f, sql) in window if sql is None]
    if bad:
        raise AssertionError(f"no-oracle queries inside the cert window: {bad}")
    return ordered
