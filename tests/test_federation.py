"""Federation story (SURVEY.md §2.10, §3.4, divergence D5): PigOut
partitions a Pig DAG across clusters; here ONE SparkSession reads every
cluster's storage by URI in a single plan.  Two fixture scale-dirs stand
in for two clusters."""

from __future__ import annotations

from pyspark.sql import functions as F

from pigout_spark.catalog import Catalog


def test_cross_cluster_join_single_plan(spark):
    cat = (
        Catalog()
        .register("c1_orders", "/root/testdata/sf0.001/orders.parquet")
        .register("c2_customer", "/root/testdata/sf0.01/customer.parquet")
    )
    o = cat.load(spark, "c1_orders")
    c = cat.load(spark, "c2_customer")
    joined = o.join(c, o.o_custkey == c.c_custkey).groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("n")
    )
    rows = joined.collect()
    assert sum(r.n for r in rows) == 1500  # every sf0.001 order matches
    # one physical plan, no intermediate STORE/copy steps (D5)
    assert "Scan parquet" in joined._jdf.queryExecution().executedPlan().toString()


def test_catalog_errors_and_views(spark):
    import pytest as _pytest

    cat = Catalog().register_fixture_dir("/root/testdata/sf0.001")
    with _pytest.raises(KeyError):
        cat.load(spark, "nope")
    cat.create_temp_views(spark)
    n = spark.sql("select count(*) n from lineitem").first()["n"]
    assert n == 6000
    got = spark.sql(
        "select count(*) n from events where event_type = 'click'"
    ).first()["n"]
    assert got > 0  # events readable through the nanos normalization
