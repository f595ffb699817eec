"""CLI surface (reference-parity arguments) and the stateful streaming
session operator."""

from __future__ import annotations

import os

from apachebeamkmeans_spark import cli
from apachebeamkmeans_spark.operators import timeseries as TS
from apachebeamkmeans_spark.sources import io
from apachebeamkmeans_spark.streaming import stateful


def test_cli_end_to_end(spark, tmp_path):
    inp = tmp_path / "points.txt"
    lines = []
    for cx, cy in [(0, 0), (10, 0), (0, 10), (10, 10)]:
        for i in range(25):
            lines.append(f"{cx + (i % 5) * 0.01},{cy + (i % 7) * 0.01}")
    inp.write_text("\n".join(lines) + "\n")
    out = tmp_path / "out"
    tf, itf = tmp_path / "time.txt", tmp_path / "iters.txt"
    rc = cli.main(
        [
            f"--input={inp}",  # reference-style --key=value form
            "--output", str(out),
            "--k", "4", "--paradigm", "2", "--threshold", "0.0001",
            "--max_iteration", "15", "--init", "max_farthest",
            "--experiments", "2",
            "--time_file", str(tf), "--iteration_file", str(itf),
        ],
        spark=spark,
    )
    assert rc == 0
    # ×2 experiments → out0, out1 + 2 lines in each side file (§8.8:
    # per-run timers, unlike the reference's cumulative ones)
    assert os.path.isdir(f"{out}0") and os.path.isdir(f"{out}1")
    assert len(tf.read_text().splitlines()) == 2
    iters = [int(x) for x in itf.read_text().splitlines()]
    assert len(iters) == 2 and all(i >= 1 for i in iters)
    part = [f for f in os.listdir(f"{out}0") if f.startswith("part-")]
    content = open(os.path.join(f"{out}0", part[0])).read()
    assert len(content.splitlines()) == 4  # one line per cluster
    assert all(":" in line and line.endswith(";") for line in content.splitlines())


def test_stateful_session_counts_match_batch(spark, sf_dir):
    """The stream's final state equals the oracle-checked batch twin
    (`user_session_counts`) row-for-row, including last_ts_us — this is
    the equality that lets a driver-green batch row certify the
    applyInPandasWithState surface."""
    out = stateful.run_session_counts_to_table(spark, sf_dir, name="t_sessions")
    got = {
        r["user_id"]: (r["n_sessions"], r["n_events"], r["last_ts_us"])
        for r in out.collect()
    }
    batch = TS.session_counts(io.read_table(spark, sf_dir, "events"), 30)
    exp = {
        r["user_id"]: (r["n_sessions"], r["n_events"], r["last_ts_us"])
        for r in batch.collect()
    }
    assert got == exp and len(got) > 0
