"""Smoke: every registered query runs at sf0.001 and the driver contract
holds (queries/oracle_sql key discipline, entry > 0 rows)."""

from __future__ import annotations

import pytest

import __spark_entry__ as entrymod
from pigout_spark import queries as qmod

#: driver-facing set + locally-verified extras (folded/subsumed queries)
ALL_QUERIES = {**entrymod.queries(), **qmod.extra_queries()}


def test_entry_returns_rows(spark):
    df = entrymod.entry(spark)
    assert df.count() > 0


def test_oracle_keys_subset_of_queries():
    q = entrymod.queries()
    o = entrymod.oracle_sql()
    assert set(o) <= set(q)
    assert len(q) >= 20
    # the driver records only the first 50 queries (round-1 lesson) —
    # never hand it more than that window
    assert len(q) <= qmod.DRIVER_QUERY_CAP
    assert not set(qmod.extra_queries()) & set(q)


@pytest.mark.parametrize("name", sorted(ALL_QUERIES))
def test_query_runs(spark, sf_dir, name):
    df = ALL_QUERIES[name](spark, sf_dir)
    # count() forces full execution; schema must be stable
    assert df.count() >= 0
    assert len(df.columns) > 0


def test_r6_rotation_landed():
    """The r6 window swap (queries/__init__.py): every rotated-in query
    is driver-facing WITH a SQL oracle (the whole point was a hash row),
    every displaced query kept its local oracle as an extra, and the
    window is exactly at the driver cap."""
    from pigout_spark.queries import _ROTATE_IN, _ROTATE_OUT

    q = entrymod.queries()
    o = entrymod.oracle_sql()
    for name in _ROTATE_IN:
        assert name in q, f"{name} fell out of the driver window"
        assert name in o, f"{name} rotated in without a SQL oracle"
    extras = qmod.extra_oracle_sql()
    for name in _ROTATE_OUT:
        assert name not in q, f"{name} still occupies a window slot"
        assert name in extras, f"{name} lost its local oracle"
    assert len(q) == qmod.DRIVER_QUERY_CAP
