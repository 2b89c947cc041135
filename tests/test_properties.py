"""Property-based checks (hypothesis) for the custom composed operators —
the ones whose semantics aren't pinned by a DuckDB oracle expression but
by a definition.  Few examples, small data: each example pays a Spark
job, so the strategy space is kept tight while still exercising ties,
empty sides, and out-of-order input."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings, strategies as st

from pyspark.sql import functions as F

from go_mapreduce_crawler_spark.operators.asof import asof_join

KEYS = st.integers(min_value=0, max_value=2)
TS = st.integers(min_value=0, max_value=20)

left_rows = st.lists(st.tuples(KEYS, TS), min_size=0, max_size=8)
right_rows = st.lists(st.tuples(KEYS, TS), min_size=0, max_size=8)


def _reference_asof(left, right):
    """Pure-Python backward as-of: for each left row the most recent
    right row with same key, right.ts <= left.ts; ties on right.ts broken
    by the largest payload id (matches the operator's total order:
    last() over ordering (ts, side, payload_id))."""
    out = {}
    for li, (k, lts) in enumerate(left):
        best = None
        for ri, (rk, rts) in enumerate(right):
            if rk == k and rts <= lts:
                cand = (rts, ri + 1000)
                if best is None or cand > best:
                    best = cand
        out[li] = best[1] if best else None
    return out


@settings(max_examples=12, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture,
                                 HealthCheck.too_slow])
@given(left=left_rows, right=right_rows)
def test_asof_join_matches_reference(spark, left, right):
    ldf = spark.createDataFrame(
        [(i, k, t) for i, (k, t) in enumerate(left)] or [(None, None, None)],
        "lid int, k int, ts int").filter(F.col("lid").isNotNull())
    rdf = spark.createDataFrame(
        [(i + 1000, k, t) for i, (k, t) in enumerate(right)] or [(None, None, None)],
        "rid int, k int, ts int").filter(F.col("rid").isNotNull())
    got = asof_join(ldf, rdf, key="k", left_ts="ts", right_ts="ts",
                    payload_cols=["rid"])
    got_map = {r.lid: r.asof_rid for r in got.collect()}
    assert got_map == _reference_asof(left, right)
