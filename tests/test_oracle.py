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
    put the r11 front first (the 49 rows whose latest driver signal
    is r04 — VERDICT r10 item 1, with the code-changed
    embedding_pca_project leading), then anything new this round
    directly behind, with the freshest signal (r10) last."""
    names = list(QUERIES)
    front = [n for n in entrymod._FRONT_R11 if n in QUERIES]
    checked = [set(entrymod._CHECKED_R01), set(entrymod._CHECKED_R02),
               set(entrymod._CHECKED_R03), set(entrymod._CHECKED_R04),
               set(entrymod._CHECKED_R05), set(entrymod._CHECKED_R06),
               set(entrymod._CHECKED_R07), set(entrymod._CHECKED_R08),
               set(entrymod._CHECKED_R09), set(entrymod._CHECKED_R10)]
    assert names[:len(front)] == front
    assert len(front) == 49
    # the front is exactly the rows whose LATEST driver row is r04:
    # checked in r04, never re-checked in r05-r10
    later = set().union(*checked[4:])
    r04_latest = (checked[3] & set(QUERIES)) - later
    assert set(front) == r04_latest
    assert front[0] == "embedding_pca_project"  # code-changed this round
    anychecked = set().union(*checked)
    never = [n for n in names
             if n not in anychecked and n not in set(front)]
    if never:  # new-this-round queries directly after the front block
        assert max(names.index(n) for n in never) < len(front) + len(never)
    # freshest signal runs last
    tail = (checked[9] & set(QUERIES)) - set(front)
    assert set(names[-len(tail):]) == tail
    assert len(names) == len(set(names))
