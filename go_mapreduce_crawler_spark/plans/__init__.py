"""Plan-shape introspection helpers.

The reference pins its execution strategy with resource/scaling tests
(SURVEY.md §6); on Spark the equivalent discipline is asserting the
physical plan: partial+final aggregation, broadcast joins for small dims,
filters/projection pushed into the parquet scan.  tests/test_plans.py
uses these to keep the 100 TB-relevant plan properties from regressing.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def physical_plan(df: DataFrame) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted")


def has_partial_and_final_agg(df: DataFrame) -> bool:
    plan = physical_plan(df)
    return "partial" in plan.lower() and "HashAggregate" in plan


def has_broadcast_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in physical_plan(df) or \
        "BroadcastNestedLoopJoin" in physical_plan(df)


def pushed_filters(df: DataFrame) -> str:
    """The PushedFilters line(s) of the scan nodes."""
    return "\n".join(l for l in physical_plan(df).splitlines()
                     if "PushedFilters" in l)


def read_schema(df: DataFrame) -> str:
    return "\n".join(l for l in physical_plan(df).splitlines()
                     if "ReadSchema" in l)


def n_shuffle_exchanges(df: DataFrame) -> int:
    """Count shuffle Exchange nodes (excludes BroadcastExchange); uses the
    numbered detail section so each node counts once."""
    import re
    return len(re.findall(r"\(\d+\) Exchange\b", physical_plan(df)))


def has_python_udf(df: DataFrame) -> bool:
    """True if any row-at-a-time Python eval appears (the slow path)."""
    plan = physical_plan(df)
    return "BatchEvalPython" in plan
