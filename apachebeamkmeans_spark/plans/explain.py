"""Physical-plan inspection helpers.

The engine writes no custom Catalyst rules (SURVEY.md §4: everything
needed is built in) — instead this module makes the *expected* physical
properties assertable, so tests lock in the plans we designed for:
filters reach the parquet scan, small dims broadcast, narrow operators
stay shuffle-free, aggregations are partially aggregated map-side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def formatted_plan(df: DataFrame) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
        df._jdf.queryExecution(), "formatted"
    )


def simple_plan(df: DataFrame) -> str:
    return df._jdf.queryExecution().executedPlan().toString()  # noqa: SLF001


def n_exchanges(df: DataFrame) -> int:
    """Number of shuffle boundaries (Exchange operators) in the plan."""
    import re

    return len(re.findall(r"^\(\d+\) Exchange", formatted_plan(df), re.MULTILINE))


def has_broadcast_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in formatted_plan(df) or "BroadcastNestedLoopJoin" in formatted_plan(df)


def has_pushed_filter(df: DataFrame, fragment: str) -> bool:
    """True if the parquet scan carries a pushed filter mentioning
    `fragment` (PushedFilters: [...] in the formatted plan)."""
    plan = formatted_plan(df)
    for line in plan.splitlines():
        if "PushedFilters" in line and fragment in line:
            return True
    return False


def scan_read_schema(df: DataFrame, table_fragment: str = "") -> list[str]:
    """ReadSchema column lists of the parquet scans — evidence of
    column pruning."""
    out = []
    for line in formatted_plan(df).splitlines():
        if "ReadSchema" in line and table_fragment in line:
            out.append(line.strip())
    return out


def has_partial_aggregate(df: DataFrame) -> bool:
    """Partial (map-side) + final HashAggregate pair present — the
    groupByKey-ships-everything anti-pattern (SURVEY.md §2.4 A1)
    is absent."""
    return formatted_plan(df).count("HashAggregate") >= 2
