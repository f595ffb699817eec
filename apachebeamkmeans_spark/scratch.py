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


# memo key → content hash: repeated callers within one process hash
# each data generation at most once. For a single file the key is
# (abspath, mtime_ns, size); for a directory it is the tuple of every
# part's (relname, mtime_ns, size).
_FP_MEMO: dict[tuple, str] = {}


def data_fingerprint(sf_dir: str, table: str) -> str:
    """CONTENT fingerprint (md5 of file bytes, 12 hex chars) of a
    testdata parquet — the freshness key for artifacts that must
    survive a regeneration with identical content (r7 verdict: the
    mtime-keyed quantizer/edge artifacts retrained every driver round
    even when the deterministic generator reproduced the same bytes;
    keying by content makes regenerated-identical data a cache HIT
    while still invalidating on any real change). Handles a single
    parquet file or a directory of part files (sorted relative names +
    bytes both hashed). Memoized by stat — per-part (relname,
    mtime_ns, size) tuples for directories (r9 advice: an aggregate
    max-mtime + total-bytes key was blind to a part rewritten with a
    pinned mtime) — so each generation is hashed once per process.
    Residual in-process caveat no stat key can close: a part rewritten
    with the SAME name, SAME size, and a deliberately pinned mtime
    serves the memoized hash until process restart — do not fingerprint
    directories whose writer pins part mtimes. The stream scratch
    source dirs (`queries_dedup._stream_scratch_roots`) DO pin their
    part mtimes (os.utime, for FileStreamSource replay order), so they
    are exactly such directories — today nothing fingerprints them
    (fingerprints are taken over sf_dir tables only), and that must
    stay true. '0' if absent (the synthetic-frame/test case)."""
    import hashlib

    path = os.path.join(sf_dir, f"{table}.parquet")
    try:
        st = os.stat(path)
    except OSError:
        return "0"
    # nanosecond mtime: a same-size rewrite within the same second must
    # not serve the previous generation's hash from the memo. For a
    # directory of part files the DIRECTORY stat is blind to an
    # in-place rewrite of a same-named part (r8 advice), so the memo
    # key aggregates the parts themselves: newest part mtime + total
    # part bytes.
    try:
        if os.path.isdir(path):
            # per-part (relname, mtime_ns, size) tuples, not an
            # aggregate: a max-mtime + total-size key is blind to a
            # part rewritten with a PINNED mtime and unchanged size —
            # exactly the os.utime pattern the stream scratch roots use
            # (r9 advice). The directory's own stat still must not
            # participate (a pinned/futured dir mtime would mask a
            # part rewrite).
            parts = []
            for root, _dirs, files in os.walk(path):
                for fn in sorted(files):
                    if fn.startswith(("_", ".")):
                        continue
                    pst = os.stat(os.path.join(root, fn))
                    parts.append((
                        os.path.relpath(os.path.join(root, fn), path),
                        pst.st_mtime_ns,
                        pst.st_size,
                    ))
            key = (os.path.abspath(path), tuple(sorted(parts)))
        else:
            key = (os.path.abspath(path), st.st_mtime_ns, st.st_size)
    except OSError:
        # a part vanished between walk-listing and stat (concurrent
        # regeneration/reap) — same degrade as an absent table: no
        # fingerprint, so consumers rebuild rather than crash
        return "0"
    if key not in _FP_MEMO:
        h = hashlib.md5()
        try:
            if os.path.isdir(path):
                for root, _dirs, files in sorted(os.walk(path)):
                    for fn in sorted(files):
                        if fn.startswith(("_", ".")):  # _SUCCESS, .crc
                            continue
                        h.update(
                            os.path.relpath(os.path.join(root, fn), path).encode()
                        )
                        with open(os.path.join(root, fn), "rb") as f:
                            h.update(f.read())
            else:
                with open(path, "rb") as f:
                    h.update(f.read())
        except OSError:
            return "0"  # same race as above, during the content read
        _FP_MEMO[key] = h.hexdigest()[:12]
    return _FP_MEMO[key]


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


def publish_once(path: str, marker: str, build_fn) -> str:
    """The build-once ATOMIC PUBLISH protocol shared by every
    persisted serving stage (ANN serve index, BM25 inverted index,
    sign-codes table, MaxSim token index): if `path` already carries
    `marker`, it is published — return it; otherwise `build_fn(tmp)`
    stages into a pid-suffixed tmp dir, the marker is written LAST,
    and one os.rename publishes. A concurrent builder either wins the
    rename or discards its identical bytes (deterministic builds);
    any OTHER rename failure (EACCES, vanished parent) propagates —
    silently destroying the work and returning a nonexistent path was
    the r12 review bug this branch guards (extracted r14: the dance
    had grown four hand-copies)."""
    if os.path.exists(os.path.join(path, marker)):
        return path
    tmp = f"{path}.build.{os.getpid()}"
    build_fn(tmp)
    with open(os.path.join(tmp, marker), "w") as f:
        f.write("1")
    try:
        os.rename(tmp, path)
    except OSError:
        if not os.path.exists(os.path.join(path, marker)):
            raise
        shutil.rmtree(tmp, ignore_errors=True)
    return path
