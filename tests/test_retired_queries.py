"""Local oracle gate for RETIRED queries — registrations retired to
fund certification-window slots (README "Registry governance" option
(c)) stay VALUE-PROVEN here: the same spark-vs-DuckDB comparison the
driver ran (row count, column names, order-insensitive values)
replays every pytest round at the driver's certification sf. A
retirement demotes the hard gate to this local one; it never deletes
the query or its oracle. (Started r17 with the five r13-cohort
retirees that funded the WAND/tombstone serving registrations.)
"""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest

from apachebeamkmeans_spark import queries_dedup as QD
from apachebeamkmeans_spark import queries_events as QE
from apachebeamkmeans_spark import queries_relational as QR
from apachebeamkmeans_spark import queries_similarity as QS
from apachebeamkmeans_spark.sources.io import TABLES

RETIRED = {
    **QE.RETIRED_QUERIES,
    **QR.RETIRED_QUERIES,
    **QD.RETIRED_QUERIES,
    **QS.RETIRED_QUERIES,
}

# the driver certified these at sf0.01 — the gate replays there
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


@pytest.mark.parametrize("name", sorted(RETIRED))
def test_retired_query_matches_oracle(spark, duck, name):
    fn, sql = RETIRED[name]
    sdf = fn(spark, GATE_SF).toPandas()
    odf = duck.execute(sql).fetchdf()
    assert sorted(sdf.columns) == sorted(odf.columns), (
        f"{name}: columns {sorted(sdf.columns)} vs {sorted(odf.columns)}"
    )
    assert len(sdf) == len(odf), f"{name}: {len(sdf)} vs {len(odf)} rows"
    a, b = _canon(sdf), _canon(odf)
    assert a.equals(b), f"{name}: value mismatch\n{a.compare(b)}"


def test_retired_names_not_registered():
    """Retirement and registration are exclusive — resurrecting a
    retired query means deleting it here (the window-budget
    bookkeeping depends on the split being exact)."""
    from apachebeamkmeans_spark.registry import all_queries

    assert RETIRED and not set(RETIRED) & set(all_queries())
