"""transformWithStateInPandas twin of the per-user session tracker
(`streaming.stateful.session_counts_stream_tws`).

The execution path needs the `protobuf` package (the transformWithState
Python state server speaks proto to the JVM) — absent in this
container, so the end-to-end equality test importorskips; the plan
construction test runs everywhere and pins the API wiring (schemas,
output mode, grouping) against signature bit-rot.
"""

from __future__ import annotations

import pytest

from apachebeamkmeans_spark.streaming import stateful as ST
from apachebeamkmeans_spark.streaming.events import read_events_stream


def test_tws_plan_constructs_and_is_streaming(spark, sf_dir):
    out = ST.session_counts_stream_tws(read_events_stream(spark, sf_dir))
    assert out.isStreaming
    assert [f.name for f in out.schema.fields] == [
        "user_id", "n_sessions", "n_events", "last_ts_us",
    ]


def test_tws_equals_batch_twin_end_to_end(spark, sf_dir):
    pytest.importorskip(
        "google.protobuf",
        reason="transformWithState's Python state server needs protobuf",
    )
    from apachebeamkmeans_spark.queries_events import q_user_session_counts
    from apachebeamkmeans_spark.queries_multimodal import (
        q_stream_session_counts_tws,
    )

    got = sorted(
        map(tuple, q_stream_session_counts_tws(spark, sf_dir).collect())
    )
    want = sorted(map(tuple, q_user_session_counts(spark, sf_dir).collect()))
    assert got == want
