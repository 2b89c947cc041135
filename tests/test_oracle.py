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
    put the r09 front first (the twice-red, now integer-cents mv
    replay row FIRST, then ALL 34 never-driver-checked r08b rows —
    VERDICT r08 items 1-2 — then the 15-slot oldest-r03 rotation),
    then anything else new this round, then oldest driver signal
    before freshest (r08 last)."""
    names = list(QUERIES)
    front = [n for n in entrymod._FRONT_R09 if n in QUERIES]
    checked = [set(entrymod._CHECKED_R01), set(entrymod._CHECKED_R02),
               set(entrymod._CHECKED_R03), set(entrymod._CHECKED_R04),
               set(entrymod._CHECKED_R05), set(entrymod._CHECKED_R06),
               set(entrymod._CHECKED_R07), set(entrymod._CHECKED_R08)]
    assert names[:len(front)] == front
    # the front fills the ~50-query budget: the red replay row runs
    # FIRST, and every row with no driver signal at all (the 34 r08b
    # additions) is inside the budget
    assert front[0] == "stream_mv_refresh_replay"
    assert len(front) == 50
    anychecked = set().union(*checked)
    # front[1:35] are exactly the 34 rows with no driver row in any of
    # r01-r08 (item 2's "done" criterion: all of them inside the budget)
    assert all(n not in anychecked for n in front[1:35])
    assert len(front[1:35]) == 34
    never = [n for n in names
             if n not in anychecked and n not in set(front)]
    if never:  # new-this-round queries directly after the front block
        assert max(names.index(n) for n in never) < len(front) + len(never)
    # freshest signal runs last
    tail = checked[7] - set(front)
    assert set(names[-len(tail):]) == tail
    assert len(names) == len(set(names))
