"""Repo-local scratch-dir hygiene, shared by every materialized
artifact the query layer stages beside the package (JSONL interchange
sinks, verified dedup-pair tables, IVF index layouts, trained-quantizer
parquet). Two rules, learned across rounds 5-7:

1. **Freshness keys live in the NAME.** Anything derived from a
   testdata table embeds that table's mtime (or the owning
   applicationId for per-session sinks) in its directory name, so a
   regenerated parquet at a reused path can never be read through a
   stale artifact — the oracle always recomputes from live data, so a
   stale Spark-side cache means a silent value mismatch.
2. **Stale generations are reaped on entry, never accumulated.** Each
   consumer calls `reap(root, prefix, keep=...)` before using its dir;
   siblings with the same prefix older than the TTL are deleted.
   Younger siblings may belong to a live concurrent session (selfcheck
   + driver-shape replay share the checkout) and are left alone;
   deletion races between two reapers are benign.
"""

from __future__ import annotations

import os
import shutil
import time

# Scratch dirs from other Spark applications older than this are
# abandoned (the owning session is long gone); younger ones may belong
# to a live concurrent session and must not be touched.
SCRATCH_TTL_SEC = 24 * 3600


def repo_root() -> str:
    return os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def data_mtime(sf_dir: str, table: str) -> int:
    """Integer mtime of a testdata parquet, 0 if absent — the
    freshness component of every data-derived scratch-dir name."""
    try:
        return int(os.path.getmtime(os.path.join(sf_dir, f"{table}.parquet")))
    except OSError:
        return 0


def reap(root: str, prefix: str, keep: str | tuple[str, ...] = ()) -> None:
    """Delete stale sibling scratch dirs under `root` whose name starts
    with `prefix` (r5 advisor: one abandoned suffixed dir per run,
    growing without bound). `keep` paths and anything younger than the
    TTL survive; errors (concurrent reaper won the race) are ignored."""
    keep_set = {keep} if isinstance(keep, str) else set(keep)
    try:
        entries = os.listdir(root)
    except FileNotFoundError:
        return
    cutoff = time.time() - SCRATCH_TTL_SEC
    for name in entries:
        p = os.path.join(root, name)
        if p in keep_set or not name.startswith(prefix):
            continue
        try:
            if os.path.getmtime(p) < cutoff:
                if os.path.isdir(p):
                    shutil.rmtree(p, ignore_errors=True)
                else:
                    os.remove(p)
        except OSError:
            continue
