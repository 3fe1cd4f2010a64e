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


def _r8_cases():
    # one pinned case per r8 kind (seeded scan until all kinds seen)
    from tools.fuzz_oracle import gen_r8

    rng = random.Random(SEED + 8)
    seen: dict[str, tuple] = {}
    markers = {
        "bfs": "hops", "sssp": " dist FROM r", "cdc": "latest",
        "trend": "sxy", "psi": "psi6", "ks": "d_stat",
        "itemcf": "rec_item", "seasonal": "resid", "winsor": "value_w",
        "abseg": "mean_c6", "ntile": "ntile", "skew": "entropy_ratio6",
        "diff": "'added'", "rules": "n_violations",
        "km": "surv6", "wq": " AS q FROM c", "gini": "gini6",
        "wilson": "hi6",
    }
    for _ in range(400):
        build, sql = gen_r8(rng)
        for kind, mark in markers.items():
            if kind not in seen and mark in sql:
                seen[kind] = (build, sql)
                break
        if len(seen) == len(markers):
            break
    return list(seen.values())


@pytest.mark.parametrize("case", range(18))
def test_fuzz_r8_differential(spark, sf_dir, duck, case):
    cases = _r8_cases()
    assert len(cases) == 18, "seeded scan did not reach every r8 kind"
    build, sql = cases[case]
    spdf = build(spark, sf_dir).toPandas()
    opdf = duck.execute(sql).df()
    assert len(spdf) == len(opdf), sql
    assert list(_normalize(spdf).columns) == list(_normalize(opdf).columns), sql
    assert value_hash(spdf) == value_hash(opdf), sql


def _r9_cases():
    # one pinned case per r9 kind (seeded scan until all kinds seen)
    from tools.fuzz_oracle import gen_r9

    rng = random.Random(SEED + 9)
    seen: dict[str, tuple] = {}
    markers = {
        "spearman": "rho6", "mw": "z6", "bhfdr": "reject",
        "tenc": "target_enc", "rscale": "value_rs",
        "auc": "auc6", "calib": "mean_pred6", "uplift": "qini6",
    }
    for _ in range(200):
        build, sql = gen_r9(rng)
        for kind, mark in markers.items():
            if kind not in seen and mark in sql:
                seen[kind] = (build, sql)
                break
        if len(seen) == len(markers):
            break
    return list(seen.values())


@pytest.mark.parametrize("case", range(8))
def test_fuzz_r9_differential(spark, sf_dir, duck, case):
    cases = _r9_cases()
    assert len(cases) == 8, "seeded scan did not reach every r9 kind"
    build, sql = cases[case]
    spdf = build(spark, sf_dir).toPandas()
    opdf = duck.execute(sql).df()
    assert len(spdf) == len(opdf), sql
    assert list(_normalize(spdf).columns) == list(_normalize(opdf).columns), sql
    assert value_hash(spdf) == value_hash(opdf), sql
