"""Multi-sink scan sharing (SURVEY.md §4.1 MultiQueryOptimizer, H5)."""

from __future__ import annotations

from pyspark.sql import functions as F

from pigout_spark.catalog import load_table
from pigout_spark.plans import MultiSinkPlan, store_many


def test_multisink_persists_shared_parent(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_quantity") > 10)
    results = {}
    with MultiSinkPlan([li]):
        assert li.storageLevel.useMemory or li.storageLevel.useDisk
        results["n"] = li.count()
        results["parts"] = li.select("l_partkey").distinct().count()
    # unpersisted on exit
    assert not (li.storageLevel.useMemory or li.storageLevel.useDisk)
    assert results["n"] > 0 and results["parts"] > 0


def test_store_many_runs_all_sinks(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders")
    seen = []
    store_many(
        orders,
        [
            lambda df: seen.append(("count", df.count())),
            lambda df: seen.append(("status", df.select("o_orderstatus").distinct().count())),
        ],
    )
    assert dict(seen) == {"count": 1500, "status": 3}
