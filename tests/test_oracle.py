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
    put the queries with no (or stale-failing) recorded driver signal
    first so CORRECTNESS_r03 converts them to green rows."""
    names = list(QUERIES)
    r01, r02 = set(entrymod._CHECKED_R01), set(entrymod._CHECKED_R02)
    stale = set(entrymod._STALE_R01_FAILS)
    new3 = set(entrymod._NEW_R03)
    never = [n for n in names if n not in r01 and n not in r02]
    n_front = len(set(never) | stale | new3)
    front = set(names[:n_front])
    assert set(never) <= front, set(never) - front
    assert stale <= front, stale - front
    assert new3 <= front, new3 - front
    # two-round debt strictly precedes round-3 additions
    assert max(names.index(n) for n in never if n not in new3) \
        < min(names.index(n) for n in new3)
    # freshest signal runs last (minus any r02 row re-fronted for a new
    # oracle)
    tail = r02 - new3
    assert set(names[-len(tail):]) == tail
    assert len(names) == len(set(names))
