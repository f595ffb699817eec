"""Certification-rotation invariants (registry.py).

The r3/r4 verdicts flagged the hand-maintained certification front
going stale (the same 50 queries re-certified while never-checked,
oracle-backed queries sat outside the window). The front is now
DERIVED from the CORRECTNESS_r*.json history; these tests lock the
derivation's contract so it cannot silently regress.
"""

from __future__ import annotations

import json

from apachebeamkmeans_spark import registry


def _spec(has_oracle: bool):
    return (lambda spark, sf: None, "SELECT 1" if has_oracle else None)


def test_order_never_certified_first_then_stalest_then_no_oracle():
    queries = {
        "fresh_r4": _spec(True),
        "stale_r1": _spec(True),
        "stale_r2": _spec(True),
        "never_b": _spec(True),
        "never_a": _spec(True),
        "rows_only": _spec(False),
    }
    history = {"fresh_r4": 4, "stale_r1": 1, "stale_r2": 2, "rows_only": 4}
    ordered = list(registry.certification_order(queries, history))
    assert ordered == [
        "never_a", "never_b", "stale_r1", "stale_r2", "fresh_r4", "rows_only",
    ]


def test_failed_last_row_rotates_back_to_front():
    """A query whose only driver row FAILED must rank as never-green."""
    queries = {"ok_r1": _spec(True), "failed_r4": _spec(True)}
    # failed_r4 has a row in the history file but it was red, so
    # correctness_history never records it -> treated as never-green.
    history = {"ok_r1": 1}
    ordered = list(registry.certification_order(queries, history))
    assert ordered == ["failed_r4", "ok_r1"]


def test_history_parses_green_and_contracted_rows_only(tmp_path):
    (tmp_path / "CORRECTNESS_r01.json").write_text(json.dumps({
        "green_q": {"rows_match": True, "schema_match": True,
                    "hash_match": True, "err": None},
        "red_q": {"rows_match": True, "schema_match": True,
                  "hash_match": False, "err": None},
        "contracted_q": {"rows_match": None, "schema_match": None,
                         "hash_match": None, "err": "no_oracle"},
        "crashed_q": {"rows_match": None, "schema_match": None,
                      "hash_match": None, "err": "boom"},
    }))
    (tmp_path / "CORRECTNESS_r03.json").write_text(json.dumps({
        "green_q": {"rows_match": True, "schema_match": True,
                    "hash_match": True, "err": None},
    }))
    hist = registry.correctness_history(str(tmp_path))
    assert hist == {"green_q": 3, "contracted_q": 1}


def test_live_window_is_all_oracle_backed():
    """The driver checks the first CERT_WINDOW entries: every one must
    have an oracle (all_queries itself asserts this — calling it is the
    test), and the registry must be comfortably larger than the window."""
    qs = registry.all_queries()
    assert len(qs) > registry.CERT_WINDOW
    window = list(qs.items())[: registry.CERT_WINDOW]
    assert all(sql is not None for _n, (_f, sql) in window)


def test_live_window_prioritizes_stalest():
    """With the real history: no query inside the window has a green
    row newer than any oracle-backed query outside it (the exact
    staleness-first guarantee the r3/r4 verdicts asked for)."""
    hist = registry.correctness_history()
    qs = registry.all_queries()
    names = list(qs)
    window, rest = names[: registry.CERT_WINDOW], names[registry.CERT_WINDOW:]
    newest_in = max(hist.get(n, 0) for n in window)
    oracle_rest = [n for n in rest if qs[n][1] is not None]
    if oracle_rest:
        oldest_out = min(hist.get(n, 0) for n in oracle_rest)
        assert newest_in <= oldest_out
