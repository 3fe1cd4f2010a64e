"""Pinned-seed differential fuzz: a small fixed slice of the
tools/fuzz_oracle.py space runs in the suite so mapping regressions
surface in pytest, not only in manual fuzz runs.  (Full runs:
`python tools/fuzz_oracle.py 120 7` — 200 queries green across seeds
7/42/99 at end of round 1.)"""

from __future__ import annotations

import random

import duckdb
import pytest

from tools.fuzz_oracle import TABLES, gen_query
from tools.selfcheck import _normalize, value_hash

N = 12
SEED = 20260813


@pytest.fixture(scope="module")
def duck(sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    yield con
    con.close()


def _cases():
    rng = random.Random(SEED)
    return [gen_query(rng) for _ in range(N)]


@pytest.mark.parametrize("case", range(N))
def test_fuzz_differential(spark, sf_dir, duck, case):
    build, sql = _cases()[case]
    spdf = build(spark, sf_dir).toPandas()
    opdf = duck.execute(sql).df()
    assert len(spdf) == len(opdf), sql
    assert list(_normalize(spdf).columns) == list(_normalize(opdf).columns), sql
    assert value_hash(spdf) == value_hash(opdf), sql
