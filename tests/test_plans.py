"""Plan-shape assertions — the 100 TB discipline, pinned.

The reference pins its execution strategy with scaling/resource tests
(SURVEY.md §6); the Spark analogue is asserting physical-plan
properties: filters/projection reach the parquet scan, small dims
broadcast, aggregates run partial+final, and no row-at-a-time Python
appears in hot paths.
"""

from __future__ import annotations

import pytest

from go_mapreduce_crawler_spark.operators import relational, dedup, text
from go_mapreduce_crawler_spark.plans import (
    has_broadcast_join, has_partial_and_final_agg, has_python_udf,
    n_shuffle_exchanges, physical_plan, pushed_filters, read_schema)


def test_scan_pushes_filters_and_prunes_columns(spark, sf_small):
    df = relational.q_scan_filter_project(spark, sf_small)
    pf = pushed_filters(df)
    assert "l_shipdate" in pf and "l_quantity" in pf, pf
    rs = read_schema(df)
    # only the 4 needed columns reach the scan — not all 11
    assert "l_extendedprice" not in rs and "l_orderkey" in rs, rs


def test_q1_has_partial_and_final_agg(spark, sf_small):
    df = relational.q1_pricing_summary(spark, sf_small)
    assert has_partial_and_final_agg(df)


def test_small_dims_broadcast(spark, sf_small):
    df = relational.q_rollup(spark, sf_small)
    assert has_broadcast_join(df)


def test_q5_broadcasts_dims(spark, sf_small):
    df = relational.q5_local_supplier(spark, sf_small)
    assert has_broadcast_join(df)


def test_range_join_is_broadcast_nlj(spark, sf_small):
    plan = physical_plan(relational.q_join_range(spark, sf_small))
    assert "BroadcastNestedLoopJoin" in plan


def test_sort_limit_is_top_k_not_global_sort(spark, sf_small):
    plan = physical_plan(relational.q_sort_limit(spark, sf_small))
    assert "TakeOrderedAndProject" in plan, plan


def test_no_python_udf_in_jvm_operators(spark, sf_small):
    """Every hot-path operator stays JVM-side (no BatchEvalPython)."""
    for fn in (relational.q1_pricing_summary, relational.q_sessionize,
               dedup.q_dedup_minhash_lsh, dedup.q_dedup_simhash,
               text.q_text_quality, text.q_text_langid):
        assert not has_python_udf(fn(spark, sf_small)), fn.__name__


def test_minhash_signature_is_row_local(spark, sf_small):
    """The signature stage is row-local (array_min over transform): only
    the input spread-repartition, bucket groupBy, candidate-distinct and
    verify shuffles may appear — no explode/groupBy shuffle for
    signatures (which would scale with docs x shingles x hashes)."""
    df = dedup.q_dedup_minhash_lsh(spark, sf_small)
    assert n_shuffle_exchanges(df) <= 4, physical_plan(df)[:2000]


def test_semi_anti_join_operators(spark, sf_small):
    assert "LeftSemi" in physical_plan(relational.q_join_semi(spark, sf_small))
    assert "LeftAnti" in physical_plan(relational.q_join_anti(spark, sf_small))
