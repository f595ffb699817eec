"""Shared index-commit protocol: versioned, fenced commit files plus
the orphan-sweep/verify helpers — ONE implementation for both
persisted-index lifecycles (the BM25 text index in
`operators/textindex.py` and the vector `AnnIndex` in `ann.py`),
extracted per the r15 verdict (item 5: the two indexes had matching
build/append/delete/upsert/compact lifecycles but two commit-file
dialects).

The commit point of an index is a small JSON document. Writers are
single-writer by contract (the Lucene IndexWriter model; readers need
no coordination), and the protocol makes a violated contract FAIL
LOUDLY instead of silently dropping a concurrent writer's work:

- Commits live under `<index>/_commits/v<NNNNNNNNNN>.json`, version-
  numbered. A reader lists the directory and loads the highest
  version — one readdir + one small-file read.
- A fenced write creates version `expect + 1` with O_EXCL
  (`open(..., "x")`) — the Iceberg optimistic-concurrency pattern:
  the exclusive create IS the fence, atomic at the filesystem level,
  so two writers that both read version v can never both publish
  v+1; the loser gets `CommitConflict`. This replaces the r15
  read-compare-then-os.replace fence, which left a microsecond
  check-to-replace window (ADVICE r15) and raised a bare
  FileNotFoundError when the commit file vanished mid-fence.
- A legacy single-file commit (e.g. `_segments.json`) is read as
  version 0 when no `_commits/` directory exists — existing indexes
  upgrade transparently on their first post-r16 write — and is kept
  MIRRORED (tmp + os.replace, advisory only) after every versioned
  write so humans and older readers see current state.
- Superseded versions are pruned best-effort beyond a small retention
  window; an in-flight reader that already opened an old version is
  unaffected (POSIX unlink semantics), and a reader listing mid-prune
  re-reads the newest surviving version.

Object-store honesty: O_EXCL is a POSIX guarantee. On object stores
without conditional-put this module's fence does not apply — callers
keep their documented scheme-gated fallbacks (AnnIndex's pointer
publish falls back to an unfenced Spark text overwrite for remote
schemes; a real deployment would put the commit in a catalog with
compare-and-swap, which this protocol maps onto directly).
"""

from __future__ import annotations

import json
import os
import re
import shutil
import time

COMMITS_DIR = "_commits"
_VERSION_RE = re.compile(r"v(\d{10})\.json")
# superseded commit versions kept for in-flight readers / debugging
RETAIN_VERSIONS = 8


class CommitConflict(RuntimeError):
    """The commit advanced between a writer's read and its publish —
    another maintenance verb committed first. The losing verb raises
    instead of silently dropping or double-counting the other
    writer's work; re-run it against the new commit state."""


def _commits_dir(index_path: str) -> str:
    return os.path.join(index_path, COMMITS_DIR)


def _version_path(index_path: str, version: int) -> str:
    return os.path.join(_commits_dir(index_path), f"v{version:010d}.json")


def _list_versions(index_path: str) -> list[int]:
    d = _commits_dir(index_path)
    try:
        names = os.listdir(d)
    except FileNotFoundError:
        return []
    out = []
    for n in names:
        m = _VERSION_RE.fullmatch(n)
        if m:
            out.append(int(m.group(1)))
    return sorted(out)


def read_commit(index_path: str, legacy_name: str | None = None,
                missing_ok: bool = False) -> tuple[dict | None, int]:
    """The current commit dict plus its VERSION — the fence token a
    read-modify-write verb hands back to `write_commit`. Highest
    `_commits/` version wins; a legacy single-file commit reads as
    version 0; with neither, raises FileNotFoundError unless
    `missing_ok` (then `(None, 0)` — the state before any commit)."""
    for v in reversed(_list_versions(index_path)):
        try:
            with open(_version_path(index_path, v)) as f:
                return json.load(f), v
        except FileNotFoundError:
            # pruned between listing and open — try the next-newest
            continue
    if legacy_name is not None:
        try:
            with open(os.path.join(index_path, legacy_name)) as f:
                return json.load(f), 0
        except FileNotFoundError:
            pass
    if missing_ok:
        return None, 0
    raise FileNotFoundError(
        f"no commit at {index_path!r} "
        f"({COMMITS_DIR}/v*.json or {legacy_name})"
    )


def write_commit(index_path: str, commit: dict,
                 legacy_name: str | None = None,
                 expect: int | None = None,
                 conflict_cls: type = CommitConflict) -> int:
    """Publish a new commit version; returns the version written.

    `expect` is the version the caller's read-modify-write was based
    on (from `read_commit`): the write targets exactly `expect + 1`,
    exclusively created — if that version already exists, a concurrent
    writer won the race and `conflict_cls` raises with NOTHING
    overwritten. With `expect=None` (an unfenced build/overwrite) the
    write retries upward from the current newest version until an
    exclusive create lands."""
    os.makedirs(_commits_dir(index_path), exist_ok=True)
    if expect is not None:
        candidates = [expect + 1]
    else:
        start = (_list_versions(index_path) or [0])[-1] + 1
        candidates = range(start, start + 1_000_000)
    version = None
    payload = json.dumps(commit)
    for v in candidates:
        try:
            fd = os.open(
                _version_path(index_path, v),
                os.O_WRONLY | os.O_CREAT | os.O_EXCL,
            )
        except FileExistsError:
            if expect is not None:
                raise conflict_cls(
                    f"commit v{v} at {index_path!r} already exists — a "
                    f"concurrent maintenance verb committed first; "
                    f"re-run this verb against the new commit state "
                    f"(writers are single-writer by contract)"
                ) from None
            continue
        with os.fdopen(fd, "w") as f:
            f.write(payload)
        version = v
        break
    assert version is not None  # the unfenced range cannot exhaust
    # advisory mirror for humans / legacy readers (never read back
    # when versioned commits exist; last-writer-wins is acceptable)
    if legacy_name is not None:
        legacy = os.path.join(index_path, legacy_name)
        tmp = f"{legacy}.tmp.{os.getpid()}"
        try:
            with open(tmp, "w") as f:
                f.write(payload)
            os.replace(tmp, legacy)
        except OSError:
            try:
                os.unlink(tmp)
            except OSError:
                pass
    # best-effort retention prune of long-superseded versions
    for v in _list_versions(index_path)[:-RETAIN_VERSIONS]:
        if v < version:
            try:
                os.unlink(_version_path(index_path, v))
            except OSError:
                pass
    return version


def newest_tree_mtime(path: str) -> float:
    """The newest mtime anywhere under `path` — the liveness signal
    the orphan sweep judges by. A long-running writer only touches
    LEAF files after its partition dirs are created, so the dir-level
    mtime goes stale in the first seconds of a write (ADVICE r15); the
    deep walk doubles as the re-stat immediately before any rmtree."""
    newest = os.path.getmtime(path)
    for r, _dirs, files in os.walk(path):
        for fn in files:
            newest = max(newest, os.path.getmtime(os.path.join(r, fn)))
    return newest


def sweep_orphan_dirs(base: str, committed_ids: set, grace_sec: float,
                      pattern: str = r"seg=(\d+)") -> list[str]:
    """Reclaim child dirs of `base` that (a) match `pattern`, (b) are
    NOT in `committed_ids`, and (c) whose newest tree mtime is older
    than `grace_sec` — crash orphans are cold everywhere, while an
    in-flight writer's dir keeps warming its leaves. Returns the
    removed paths. Callers' writers must still verify their dirs
    before committing (`verify_dirs`): the grace window narrows the
    race, the pre-commit verify makes the residual case loud."""
    removed = []
    pat = re.compile(pattern)
    if not os.path.isdir(base):
        return removed
    committed = {str(c) for c in committed_ids}
    cutoff = time.time() - grace_sec
    for d in os.listdir(base):
        m = pat.fullmatch(d)
        full = os.path.join(base, d)
        if not m or m.group(1) in committed:
            continue
        try:
            if newest_tree_mtime(full) < cutoff:
                shutil.rmtree(full, ignore_errors=True)
                removed.append(full)
        except OSError:
            continue
    return removed


def dirs_present(paths: list[str]) -> list[str]:
    """Snapshot which of `paths` exist right after a write — the set
    `verify_dirs` re-checks immediately before the commit publish."""
    return [p for p in paths if os.path.isdir(p)]


def verify_dirs(paths: list[str], conflict_cls: type = CommitConflict,
                hint: str = "") -> None:
    """Last check before a writer's commit publish: every dir it wrote
    (snapshot via `dirs_present`) must still exist — a racing sweep
    may have reclaimed an in-flight segment whose write outlasted the
    grace window. Raising keeps the failure loud and retryable instead
    of publishing a commit that references missing files."""
    for d in paths:
        if not os.path.isdir(d):
            raise conflict_cls(
                f"{d} vanished before this verb could commit — a "
                f"concurrent sweep reclaimed it (write outlasted the "
                f"orphan grace window on a violated single-writer "
                f"schedule); re-run this verb{hint}"
            )
