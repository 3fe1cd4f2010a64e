"""Smoke: every registered query runs at sf0.001 and the driver contract
holds (queries/oracle_sql key discipline, entry > 0 rows)."""

from __future__ import annotations

import pytest

import __spark_entry__ as entrymod


def test_entry_returns_rows(spark):
    df = entrymod.entry(spark)
    assert df.count() > 0


def test_oracle_keys_subset_of_queries():
    q = entrymod.queries()
    o = entrymod.oracle_sql()
    assert set(o) <= set(q)
    assert len(q) >= 20


@pytest.mark.parametrize("name", sorted(entrymod.queries()))
def test_query_runs(spark, sf_dir, name):
    df = entrymod.queries()[name](spark, sf_dir)
    # count() forces full execution; schema must be stable
    assert df.count() >= 0
    assert len(df.columns) > 0
