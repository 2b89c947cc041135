"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)  — flagship query smoke check on sf0.001.
queries()     — every implemented operator (SURVEY.md §2 + north-star
                extensions), (spark, sf_dir) -> DataFrame.
oracle_sql()  — DuckDB-equivalent SQL per query; entries omitted only for
                ops whose kernels are not SQL-expressible (xxhash64-based
                LSH/SimHash, sha256 feature kernel, approximate ANN) —
                those get the driver's rows-only check and are pinned
                against ground truth in tests/.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from go_mapreduce_crawler_spark.operators import all_oracles, all_queries
from go_mapreduce_crawler_spark.operators.relational import q1_pricing_summary


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: TPC-H-Q1-style pricing summary — grouped partial+final
    aggregation, the reference's Accumulate/Combine contract on real
    columns (SURVEY.md §7 M0)."""
    return q1_pricing_summary(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return all_queries()


def oracle_sql() -> dict[str, str]:
    return all_oracles()
