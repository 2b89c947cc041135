"""Round-9 additions: enforcement guards and new operators.

Pins for the r08 verdict items landed this round — the exact-Jaccard
sample-contract guard (item 3) and the round's new operators (each
also carries a full DuckDB oracle; these tests pin the Python-replica
ground truth / property the oracle can't express).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


def test_exact_jaccard_guard_fires_on_oversized_corpus(spark):
    """_enforce_exact_pair_bound (r08 verdict item 3): the exact
    quadratic diagnostics must REFUSE a corpus past the sample bound
    (previously a docstring promise with nothing enforcing it), and
    pass corpora at or under it untouched."""
    from go_mapreduce_crawler_spark.operators.dedup import (
        _enforce_exact_pair_bound)

    small = spark.range(10).withColumnRenamed("id", "doc_id")
    _enforce_exact_pair_bound(small, "dedup_jaccard_pairs", max_docs=10)

    big = spark.range(11).withColumnRenamed("id", "doc_id")
    with pytest.raises(ValueError, match="sample bound"):
        _enforce_exact_pair_bound(big, "dedup_jaccard_pairs", max_docs=10)


def test_exact_jaccard_ops_still_run_and_guard_is_wired(spark):
    """The guarded ops still produce their pairs at test SF (the bound
    is generous for any sample), and the guard is actually WIRED into
    the three public entry points — shrinking the bound makes all of
    them refuse."""
    import go_mapreduce_crawler_spark.operators.dedup as dd

    assert dd.q_dedup_jaccard_pairs(spark, SF).count() > 0

    orig = dd.JACCARD_EXACT_MAX_DOCS
    dd.JACCARD_EXACT_MAX_DOCS = 1
    try:
        for op in (dd.q_dedup_jaccard_pairs, dd.q_dedup_containment,
                   dd.q_dedup_family_overlap):
            with pytest.raises(ValueError, match="sample bound"):
                op(spark, SF)
    finally:
        dd.JACCARD_EXACT_MAX_DOCS = orig
