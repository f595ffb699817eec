"""Local oracle gate for the STAGED (not-yet-registered) queries —
registration candidates carry full DuckDB oracles from the moment
they are staged; this test replays the driver's comparison (row
count, column names, order-insensitive values) so flipping them into
QUERIES in a later round's certification window is a no-risk move.
(The r14 staged set registered in r15; the parametrized gate runs
over whatever STAGED_QUERIES currently holds.)
"""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest

from apachebeamkmeans_spark import queries_sim_serving as QSS
from apachebeamkmeans_spark import queries_similarity as QS
from apachebeamkmeans_spark import queries_text as QT
from apachebeamkmeans_spark.sources.io import TABLES

STAGED = {**QSS.STAGED_QUERIES, **QT.STAGED_QUERIES}

# The driver certifies at sf0.01, and the trained-query oracles
# (serve-index probes) replay TRAINED_CENTERS, which are only the
# index's centers at TRAIN_SF_DIR — so the gate replay runs there too.
GATE_SF = QS.TRAIN_SF_DIR


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    s = df.astype(str)
    return s.sort_values(by=list(s.columns)).reset_index(drop=True)


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{GATE_SF}/{t}.parquet'"
        )
    yield con
    con.close()


@pytest.mark.parametrize("name", sorted(STAGED))
def test_staged_query_matches_oracle(spark, duck, name):
    fn, sql = STAGED[name]
    sdf = fn(spark, GATE_SF).toPandas()
    odf = duck.execute(sql).fetchdf()
    assert sorted(sdf.columns) == sorted(odf.columns), (
        f"{name}: columns {sorted(sdf.columns)} vs {sorted(odf.columns)}"
    )
    assert len(sdf) == len(odf), f"{name}: {len(sdf)} vs {len(odf)} rows"
    a, b = _canon(sdf), _canon(odf)
    assert a.equals(b), f"{name}: value mismatch\n{a.compare(b)}"


def test_staged_names_not_registered():
    """A staged query must not also be registered — moving one into
    QUERIES requires deleting it here (the window-budget bookkeeping
    depends on the split being exact)."""
    from apachebeamkmeans_spark.registry import all_queries

    assert not set(STAGED) & set(all_queries())


def test_staged_maxsim_indexed_plan_pruned(spark):
    """The indexed-MaxSim plan (staged r14, registered r15) keeps the
    serve index's partition pruning inside the fused plan (coarse_id
    PartitionFilters on the shortlist side) and stays Python-free."""
    from apachebeamkmeans_spark.plans import explain as X

    res = QSS.q_sim_maxsim_indexed(spark, GATE_SF)
    plan = X.formatted_plan(res)
    assert "coarse_id" in "".join(plan.split("PartitionFilters")[1:])
    assert "BatchEvalPython" not in plan and "MapInPandas" not in plan


def test_staged_maxsim_indexed_recall(spark):
    """The token-index shortlist must hold recall@10 ≥ 0.9 against the
    full-scan MaxSim ranking (measured 0.9-1.0 at the gate sf; the
    abandoned tiled-mean single-probe design measured 0.47)."""
    from apachebeamkmeans_spark.operators import similarity as SIM
    from apachebeamkmeans_spark.sources import io

    full = SIM.maxsim_topk(
        io.load_points(spark, GATE_SF), QS.MAXSIM_QUERIES,
        QS.MAXSIM_K, QS.DIM,
    ).collect()
    fullsets = {}
    for r in full:
        fullsets.setdefault(r["qid"], set()).add(r["vec_id"])
    pruned = QSS.q_sim_maxsim_indexed(spark, GATE_SF).collect()
    prunedsets = {}
    for r in pruned:
        prunedsets.setdefault(r["qid"], set()).add(r["vec_id"])
    for qi, fs in fullsets.items():
        recall = len(fs & prunedsets.get(qi, set())) / len(fs)
        assert recall >= 0.9, (qi, recall)
