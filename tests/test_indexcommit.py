"""The shared index-commit protocol (`operators/indexcommit.py`):
versioned exclusive-create commits (the fence IS the create — atomic,
unlike the r15 read-compare-then-replace), legacy single-file
migration, retention pruning, and the orphan-sweep/verify helpers
both persisted indexes ride."""

from __future__ import annotations

import json
import os

import pytest

from apachebeamkmeans_spark.operators import indexcommit as IC


def test_write_then_read_roundtrip(tmp_path):
    p = str(tmp_path / "idx")
    os.makedirs(p)
    v = IC.write_commit(p, {"a": 1})
    assert v == 1
    commit, fence = IC.read_commit(p)
    assert commit == {"a": 1} and fence == 1


def test_fenced_write_targets_expect_plus_one(tmp_path):
    p = str(tmp_path / "idx")
    os.makedirs(p)
    IC.write_commit(p, {"a": 1})
    commit, fence = IC.read_commit(p)
    v = IC.write_commit(p, {"a": 2}, expect=fence)
    assert v == fence + 1
    assert IC.read_commit(p) == ({"a": 2}, v)


def test_fence_conflict_is_atomic_and_loud(tmp_path):
    """Two writers that both read version v can never both publish
    v+1 — the exclusive create makes the loser raise with nothing
    overwritten (the winner's commit stays current)."""
    p = str(tmp_path / "idx")
    os.makedirs(p)
    IC.write_commit(p, {"gen": 0})
    _, fence = IC.read_commit(p)
    IC.write_commit(p, {"gen": "winner"}, expect=fence)
    with pytest.raises(IC.CommitConflict, match="committed first"):
        IC.write_commit(p, {"gen": "loser"}, expect=fence)
    assert IC.read_commit(p)[0] == {"gen": "winner"}


def test_conflict_cls_is_raised(tmp_path):
    class MyConflict(IC.CommitConflict):
        pass

    p = str(tmp_path / "idx")
    os.makedirs(p)
    IC.write_commit(p, {})
    with pytest.raises(MyConflict):
        IC.write_commit(p, {}, expect=0, conflict_cls=MyConflict)


def test_legacy_single_file_reads_as_version_zero(tmp_path):
    """A pre-r16 index (one `_segments.json`, no `_commits/`) reads as
    version 0; the first fenced write lands v1 and the legacy file
    stays mirrored with the new content."""
    p = str(tmp_path / "idx")
    os.makedirs(p)
    with open(os.path.join(p, "_segments.json"), "w") as f:
        json.dump({"segments": [1]}, f)
    commit, fence = IC.read_commit(p, "_segments.json")
    assert commit == {"segments": [1]} and fence == 0
    IC.write_commit(p, {"segments": [1, 2]}, legacy_name="_segments.json",
                    expect=fence)
    assert IC.read_commit(p, "_segments.json") == ({"segments": [1, 2]}, 1)
    with open(os.path.join(p, "_segments.json")) as f:
        assert json.load(f) == {"segments": [1, 2]}  # mirror current


def test_versioned_wins_over_stale_legacy(tmp_path):
    """Once versioned commits exist, a hand-edited legacy mirror must
    not shadow them — the versioned file is the source of truth."""
    p = str(tmp_path / "idx")
    os.makedirs(p)
    IC.write_commit(p, {"v": "new"}, legacy_name="_segments.json")
    with open(os.path.join(p, "_segments.json"), "w") as f:
        json.dump({"v": "stale-hand-edit"}, f)
    assert IC.read_commit(p, "_segments.json")[0] == {"v": "new"}


def test_missing_commit(tmp_path):
    p = str(tmp_path / "idx")
    os.makedirs(p)
    with pytest.raises(FileNotFoundError):
        IC.read_commit(p, "_segments.json")
    assert IC.read_commit(p, "_segments.json", missing_ok=True) == (None, 0)


def test_retention_prunes_old_versions(tmp_path):
    p = str(tmp_path / "idx")
    os.makedirs(p)
    for i in range(IC.RETAIN_VERSIONS + 5):
        IC.write_commit(p, {"i": i})
    versions = IC._list_versions(p)
    assert len(versions) <= IC.RETAIN_VERSIONS + 1
    assert IC.read_commit(p)[0] == {"i": IC.RETAIN_VERSIONS + 4}


def test_unfenced_write_skips_over_existing(tmp_path):
    """An unfenced write (build/overwrite semantics) retries upward
    instead of conflicting — last writer wins, atomically."""
    p = str(tmp_path / "idx")
    os.makedirs(p)
    IC.write_commit(p, {"a": 1})
    IC.write_commit(p, {"a": 2})
    assert IC.read_commit(p) == ({"a": 2}, 2)


def test_sweep_respects_grace_and_tree_mtime(tmp_path):
    base = str(tmp_path / "postings")
    for seg, committed in ((1, True), (2, False), (3, False)):
        d = os.path.join(base, f"seg={seg}", "tbucket=0")
        os.makedirs(d)
        with open(os.path.join(d, "part-0.parquet"), "w") as f:
            f.write("x")
    old = (0.0, 0.0)
    for seg in (2, 3):
        root = os.path.join(base, f"seg={seg}")
        for r, ds, fs in os.walk(root):
            for x in ds + fs:
                os.utime(os.path.join(r, x), old)
        os.utime(root, old)
    # seg 3 has one FRESH leaf (in-flight writer): must survive
    os.utime(os.path.join(base, "seg=3", "tbucket=0", "part-0.parquet"))
    removed = IC.sweep_orphan_dirs(base, {1}, grace_sec=60.0)
    assert removed == [os.path.join(base, "seg=2")]
    assert os.path.isdir(os.path.join(base, "seg=1"))   # committed
    assert os.path.isdir(os.path.join(base, "seg=3"))   # in-flight
    assert not os.path.isdir(os.path.join(base, "seg=2"))  # cold orphan


def test_verify_dirs(tmp_path):
    d = str(tmp_path / "seg=0")
    os.makedirs(d)
    present = IC.dirs_present([d, str(tmp_path / "absent")])
    assert present == [d]
    IC.verify_dirs(present)  # intact: no raise
    os.rmdir(d)
    with pytest.raises(IC.CommitConflict, match="vanished"):
        IC.verify_dirs(present)
