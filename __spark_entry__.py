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


# Round 1's correctness pass walked queries() in dict order and ran out
# of budget after these first 50, leaving 68 queries with no driver
# signal.  Order the dict so the never-checked queries run FIRST: if the
# budget caps again, the unchecked set gets signal and the cumulative
# union across rounds still covers everything.
_CHECKED_R01 = (
    "scan_filter_project", "q1_pricing_summary", "q6_revenue_change",
    "agg_distinct", "agg_argminmax", "rollup_region_nation",
    "cube_flag_status", "grouping_sets", "pivot_linestatus",
    "q3_shipping_priority", "q4_order_priority", "q5_local_supplier",
    "q7_nation_volume", "q10_returned_items", "q12_ship_delay_priority",
    "q14_promo_revenue", "q19_disjunctive_predicates", "q22_idle_customers",
    "q2_min_cost_supplier", "q8_market_share", "q9_product_profit",
    "q11_important_parts", "q15_top_supplier", "q16_supplier_part_count",
    "q20_part_promotion", "q21_waiting_suppliers",
    "q13_customer_distribution", "q17_small_quantity_revenue",
    "q18_large_volume_customer", "join_left_outer", "join_semi",
    "join_anti", "join_full_outer", "join_range_bands",
    "window_topk_per_group", "window_running_sum",
    "window_rank_dense_ntile", "window_percent_cume", "null_semantics",
    "unpivot_balances", "sort_limit_top20", "set_ops", "scalar_string",
    "scalar_date", "scalar_math", "scalar_json", "collect_sorted_arrays",
    "scalar_array_hof", "scd2_upsert", "scalar_map_histogram",
)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    q = all_queries()
    checked = set(_CHECKED_R01)
    ordered = {k: q[k] for k in q if k not in checked}
    ordered.update({k: q[k] for k in _CHECKED_R01 if k in q})
    return ordered


def oracle_sql() -> dict[str, str]:
    return all_oracles()
