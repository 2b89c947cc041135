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
    put the r10 front first (the 11 r09-new rows with no driver
    signal — VERDICT r09 item 1), then anything new this round
    (inside the budget), then the stale rotation oldest-first (the 32
    r03-signed rows next), with the freshest signal (r09) last."""
    names = list(QUERIES)
    front = [n for n in entrymod._FRONT_R10 if n in QUERIES]
    checked = [set(entrymod._CHECKED_R01), set(entrymod._CHECKED_R02),
               set(entrymod._CHECKED_R03), set(entrymod._CHECKED_R04),
               set(entrymod._CHECKED_R05), set(entrymod._CHECKED_R06),
               set(entrymod._CHECKED_R07), set(entrymod._CHECKED_R08),
               set(entrymod._CHECKED_R09)]
    assert names[:len(front)] == front
    assert len(front) == 11
    anychecked = set().union(*checked)
    # the front is exactly the 11 rows with no driver row in r01-r09
    # that existed last round (item 1's "done" criterion)
    assert all(n not in anychecked for n in front)
    never = [n for n in names
             if n not in anychecked and n not in set(front)]
    if never:  # new-this-round queries directly after the front block
        assert max(names.index(n) for n in never) < len(front) + len(never)
    # front + new + the 32 oldest-signal (r03-freshest) rows all fit
    # the ~50 budget
    later = set().union(*checked[3:])
    r03_oldest = (checked[2] & set(QUERIES)) - later - set(front)
    budget = set(names[:len(front) + len(never) + len(r03_oldest)])
    assert r03_oldest <= budget
    assert len(front) + len(never) + len(r03_oldest) <= 51
    # freshest signal runs last
    tail = (checked[8] & set(QUERIES)) - set(front)
    assert set(names[-len(tail):]) == tail
    assert len(names) == len(set(names))
