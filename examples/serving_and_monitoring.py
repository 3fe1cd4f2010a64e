"""Recommendation serving + production monitoring in one pass — the
round-8 operator families chained the way a real pipeline would:

  1. item CF    -> top-k "also bought" neighbors per part
                   (pipeline/recsys.py: capped co-occurrence, cosine)
  2. CDC merge  -> tonight's order changelog applied to the snapshot
                   (pipeline/scd.py: compact + upsert/delete merge)
  3. trend      -> per-customer spend slope over the merged snapshot
                   (behavioral.py:trend_fit, winsorized inputs first —
                   operators/sorting.py:winsorize tames whale orders)
  4. drift gate -> PSI + KS between last week's and this week's spend
                   distribution (pipeline/drift.py) — the "retrain /
                   investigate" signal
  5. segments   -> A/B readout per order priority
                   (behavioral.py:ab_lift(by=...))

Run:  python examples/serving_and_monitoring.py [sf_dir]
"""

import sys

sys.path.insert(0, ".")

from pyspark.sql import functions as F  # noqa: E402

from pigout_spark.catalog import load_table  # noqa: E402
from pigout_spark.operators.sorting import winsorize  # noqa: E402
from pigout_spark.pipeline.behavioral import ab_lift, trend_fit  # noqa: E402
from pigout_spark.pipeline.drift import ks_drift, psi_drift  # noqa: E402
from pigout_spark.pipeline.recsys import item_cf_topk  # noqa: E402
from pigout_spark.pipeline.scd import apply_cdc  # noqa: E402
from pigout_spark.session import get_spark  # noqa: E402


def main(sf_dir: str = "/root/testdata/sf0.01") -> None:
    spark = get_spark("serving-and-monitoring")
    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem")

    # 1. item-item recommendations over the customer×part incidence
    incidence = lineitem.join(
        orders, lineitem.l_orderkey == orders.o_orderkey
    ).select(
        F.col("o_custkey").alias("u"), F.col("l_partkey").alias("i")
    )
    recs = item_cf_topk(
        incidence, "u", "i", k=3, min_cooc=2, max_items_per_user=25
    )
    print("top recommendations sample:")
    recs.orderBy(F.desc("score")).show(5, truncate=False)

    # 2. apply tonight's changelog (derived here; a real pipeline reads
    # its Debezium/staging table)
    base = orders.select("o_orderkey", "o_custkey", "o_totalprice")
    k = F.col("o_orderkey")
    changes = (
        base.filter(k % 7 == 0)
        .withColumn("o_totalprice", F.col("o_totalprice") * 1.01)
        .withColumn("op", F.lit("U"))
        .withColumn("ts", F.lit(1).cast("bigint"))
        .unionByName(
            base.filter(k % 11 == 0)
            .withColumn("op", F.lit("D"))
            .withColumn("ts", F.lit(2).cast("bigint"))
        )
    )
    snapshot = apply_cdc(base, changes, ["o_orderkey"])
    print("snapshot rows after CDC merge:", snapshot.count())

    # 3. winsorize away whale orders, then fit per-customer spend trend
    w = winsorize(
        snapshot.join(orders.select("o_orderkey", "o_orderdate"), "o_orderkey"),
        "o_totalprice",
        ["o_custkey"],
        p_lo=0.05,
        p_hi=0.95,
    )
    series = w.select(
        "o_custkey",
        F.datediff(
            "o_orderdate", F.lit("1992-01-01 00:00:00").cast("timestamp_ntz")
        ).cast("double").alias("x"),
        F.round(F.col("value_w") * 100).cast("bigint").cast("double").alias("y"),
    )
    trends = trend_fit(series, ["o_custkey"], "x", "y", term_scale=0)
    print("steepest-rising customers:")
    trends.filter("slope is not null").orderBy(F.desc("slope")).show(5)

    # 4. drift gate: first half of the order history vs the second
    mid = orders.agg(
        F.expr("percentile_approx(o_orderdate, 0.5)").alias("m")
    ).collect()[0].m
    ref = orders.filter(F.col("o_orderdate") <= F.lit(mid))
    cur = orders.filter(F.col("o_orderdate") > F.lit(mid))
    psi = psi_drift(
        ref, cur, "o_totalprice", bins=20, lo=0.0, hi=600_000.0
    )
    total_psi = psi.agg(F.sum("psi6").alias("psi")).collect()[0].psi
    ks = ks_drift(
        ref, cur, "o_totalprice", bins=100, lo=0.0, hi=600_000.0
    ).collect()[0]
    print(f"spend drift: PSI={total_psi:.6f}  KS D={ks.d_stat:.6f}"
          f" (PSI<0.1 = stable)")

    # 5. per-priority experiment readout (deterministic md5 arms)
    seg = ab_lift(
        snapshot.join(
            orders.select("o_orderkey", "o_orderpriority"), "o_orderkey"
        ),
        "o_totalprice",
        ["o_custkey"],
        seed="42",
        by=["o_orderpriority"],
    )
    print("A/B readout by priority:")
    seg.orderBy("o_orderpriority").show(truncate=False)


if __name__ == "__main__":
    main(*sys.argv[1:2])
