"""Focused tests for the r12 optimization round's internal changes.

Each test pins an internals change whose defect mode is silent value
divergence: the schema-drift empty-side spine (r11 verdict item 8),
and _write_meta's stale-file cleanup across parquet-writer format
transitions (r11 advice item 2).
"""

from __future__ import annotations

import datetime

import pytest  # noqa: F401


def _write_orders(spark, path, dates):
    rows = [(i, 10 + i, "O", 100.0 + i, d, "1-URGENT")
            for i, d in enumerate(dates)]
    df = spark.createDataFrame(
        rows, "o_orderkey long, o_custkey long, o_orderstatus string, "
              "o_totalprice double, o_orderdate timestamp, "
              "o_orderpriority string")
    df.coalesce(1).write.mode("overwrite").parquet(f"{path}/orders.parquet")


def test_schema_drift_one_sided_table_fails_loudly(spark, tmp_path):
    """A table entirely on ONE side of DRIFT_SPLIT must FAIL LOUDLY
    (the pre-fusion per-side df.agg() emitted an n=0/ndv=0 row per
    column, whose ``DIV base_ndv`` then raised under ANSI mode) — the
    fused grouped pass emitted NO group for the empty side, turning
    the pathological input into a silent EMPTY drift report, the one
    outcome an ingest monitor must never produce.  The spine restores
    the per-column zero rows and with them the loud divide-by-zero."""
    import pytest
    from py4j.protocol import Py4JJavaError
    from pyspark.errors import ArithmeticException

    from go_mapreduce_crawler_spark.operators.features import q_schema_drift

    sf = str(tmp_path)
    # every order AFTER the 1997-01-01 split -> base side is EMPTY
    _write_orders(spark, sf, [datetime.datetime(1998, 3, 1 + i)
                              for i in range(5)])
    with pytest.raises((ArithmeticException, Py4JJavaError),
                       match="DIVIDE_BY_ZERO"):
        q_schema_drift(spark, sf).collect()


def test_schema_drift_two_sided_unchanged(spark, sf_small):
    """The spine join must be a value no-op on a two-sided table (the
    oracle MATCH covers the fixtures; this pins row count + non-null
    sides explicitly so a spine regression localizes here)."""
    from go_mapreduce_crawler_spark.operators.features import q_schema_drift

    out = q_schema_drift(spark, sf_small).collect()
    assert len(out) == 4
    for r in out:
        assert r.base_n > 0 and r.new_n > 0
        assert r.base_null_ppm is not None
        assert r.ndv_ratio_e6 is not None


def test_write_meta_clears_stale_spark_format_files(tmp_path):
    """A retried batch landing on a meta dir written by the previous
    Spark-write format (part-00000-<uuid>-*.parquet) must remove the
    stale file: it sorts BEFORE 'part-00000.parquet' ('-' < '.'), so
    _read_meta would otherwise return the stale max."""
    import glob
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    from go_mapreduce_crawler_spark.streaming.stateful import (
        _read_meta, _write_meta)

    state = str(tmp_path / "state")
    d = f"{state}/state_v5/meta"
    os.makedirs(d)
    pq.write_table(pa.table({"mx": pa.array([111], type=pa.int64())}),
                   f"{d}/part-00000-0123abcd-c000.snappy.parquet")
    _write_meta(state, 5, 999)
    assert _read_meta(state, 5) == 999
    assert glob.glob(f"{d}/*.parquet") == [f"{d}/part-00000.parquet"]
