"""The local correctness gate: every queries() entry with an oracle must
match DuckDB exactly at sf0.01 (the driver's t2 scale)."""

from __future__ import annotations

import os

import pytest

import __spark_entry__ as entrymod
from tests.oracle_harness import compare, duck_con

SF_DIR = os.environ.get("SPARK_GRAFT_ORACLE_SF_DIR", "/root/testdata/sf0.01")

_QUERIES = entrymod.queries()
_ORACLES = entrymod.oracle_sql()


@pytest.fixture(scope="module")
def con():
    c = duck_con(SF_DIR)
    yield c
    c.close()


def test_every_query_has_callable():
    assert _QUERIES, "no queries registered"
    for name, fn in _QUERIES.items():
        assert callable(fn), name


@pytest.mark.parametrize("name", sorted(_ORACLES))
def test_oracle_match(spark, con, name):
    sdf = _QUERIES[name](spark, SF_DIR)
    odf = con.execute(_ORACLES[name]).df()
    issues = compare(sdf, odf)
    assert not issues, f"{name}: " + "; ".join(issues)


@pytest.mark.parametrize(
    "name", sorted(set(_QUERIES) - set(_ORACLES))
)
def test_rows_only(spark, name):
    # queries without an oracle still must run and return a stable schema
    sdf = _QUERIES[name](spark, SF_DIR)
    assert sdf.columns
    assert sdf.count() >= 0


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    assert df.count() > 0
