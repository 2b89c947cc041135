"""The pre-flight for the driver's correctness gate: every queries()
entry with an oracle must match DuckDB exactly (count, schema names,
order-insensitive values) at sf0.001; sf0.01 runs via
SPARK_GRAFT_TEST_SF=/root/testdata/sf0.01 (done before each commit of a
new query batch)."""

from __future__ import annotations

import os

import pytest

import __spark_entry__ as entrymod
from tests.oracle_utils import compare, duck_connection

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")

QUERIES = entrymod.queries()
ORACLES = entrymod.oracle_sql()


@pytest.fixture(scope="module")
def con():
    c = duck_connection(SF_DIR)
    yield c
    c.close()


def test_all_oracle_keys_have_queries():
    assert set(ORACLES) <= set(QUERIES), set(ORACLES) - set(QUERIES)


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_oracle_match(spark, con, name):
    problems = compare(QUERIES[name](spark, SF_DIR), con, ORACLES[name], name)
    assert not problems, "\n".join(problems)


@pytest.mark.parametrize("name", sorted(set(QUERIES) - set(ORACLES)))
def test_rows_only_queries_run(spark, name):
    df = QUERIES[name](spark, SF_DIR)
    assert df.count() >= 0
    assert len(df.columns) > 0


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    assert df.count() > 0


def test_queries_order_frontloads_weakest_driver_signal():
    """The driver budget caps at ~50 queries/run; the dict order must
    put the r08 front first (the r07-red replay row + its hardened
    siblings, the code-changed-since-last-driver-row ops, the 8 new
    ops, and the 32 r02-stale + 3 oldest-r03 rotation — VERDICT r07
    items 1-3), then anything else new this round, then oldest driver
    signal before freshest (r07 last)."""
    names = list(QUERIES)
    front = [n for n in entrymod._FRONT_R08 if n in QUERIES]
    checked = [set(entrymod._CHECKED_R01), set(entrymod._CHECKED_R02),
               set(entrymod._CHECKED_R03), set(entrymod._CHECKED_R04),
               set(entrymod._CHECKED_R05), set(entrymod._CHECKED_R06),
               set(entrymod._CHECKED_R07)]
    assert names[:len(front)] == front
    # the front fills the ~50-query budget: the red replay row runs
    # FIRST, and every r02-signed row is inside the budget
    assert front[0] == "stream_mv_refresh_replay"
    assert len(front) == 50
    r02_only = checked[1] - set().union(*checked[2:])
    assert r02_only <= set(front)
    anychecked = set().union(*checked)
    never = [n for n in names
             if n not in anychecked and n not in set(front)]
    if never:  # new-this-round queries directly after the front block
        assert max(names.index(n) for n in never) < len(front) + len(never)
    # freshest signal runs last
    tail = checked[6] - set(front)
    assert set(names[-len(tail):]) == tail
    assert len(names) == len(set(names))
