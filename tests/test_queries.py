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


def test_r7_window_landed():
    """The r7 explicit window (queries/__init__.py): the driver-facing
    set is exactly _WINDOW_R7 in order, every entry except the two
    declared rows-only ops has a SQL oracle, and everything displaced
    kept its local oracle as an extra."""
    from pigout_spark.queries import _WINDOW_R7

    q = entrymod.queries()
    o = entrymod.oracle_sql()
    assert list(q) == _WINDOW_R7
    assert len(q) == qmod.DRIVER_QUERY_CAP
    rows_only = {"x_sample_bernoulli", "x_bpe_encode_trained"}
    for name in q:
        if name in rows_only:
            assert name not in o
        else:
            assert name in o, f"{name} in window without a SQL oracle"
    extras = qmod.extra_oracle_sql()
    # spot-check displaced r6 rows kept their oracle
    for name in ("x_semantic_pairs", "x_pagerank", "x_twa", "x_bpe_encode"):
        assert name not in q and name in extras
