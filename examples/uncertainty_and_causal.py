"""Uncertainty and observational-causal analysis end-to-end — the r12
operator family over the events/orders fixtures.

    poisson_bootstrap — one-pass 95% CI for mean order value per
                        priority (B=40 deterministic replicates)
    jackknife_ratio   — order-blocked SE for the effective discount
                        RATE (a ratio of sums — per-row resampling
                        would understate this)
    diff_in_diff      — 2×2 DiD of event value, md5-half treatment,
                        mid-month cutover
    psm_match         — nearest-control matching on document length
                        within source (caliper 50)
    trimmed_mean      — 5%-trimmed robust mean alongside the raw mean
    conformal_quantile— the 90%-coverage calibration threshold

Run:  python examples/uncertainty_and_causal.py [sf_dir]
"""

import sys

sys.path.insert(0, ".")

from pyspark.sql import functions as F  # noqa: E402

from pigout_spark.pipeline.behavioral import (  # noqa: E402
    conformal_quantile,
    diff_in_diff,
    jackknife_ratio,
    poisson_bootstrap,
    psm_match,
    trimmed_mean,
)
from pigout_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark("uncertainty-causal-example")
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    lineitem = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    events = spark.read.parquet(f"{sf_dir}/events.parquet")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")

    print("== bootstrap CI: mean order value (cents) per priority ==")
    poisson_bootstrap(
        orders.select(
            "o_orderpriority",
            F.round(F.col("o_totalprice") * 100).cast("bigint").alias("cents"),
            "o_orderkey",
        ),
        "cents",
        ["o_orderkey"],
        keys=["o_orderpriority"],
    ).orderBy("o_orderpriority").show(truncate=False)

    print("== jackknife SE: effective discount rate per returnflag ==")
    jackknife_ratio(
        lineitem.select(
            "l_returnflag",
            F.round(F.col("l_extendedprice") * F.col("l_discount") * 100)
            .cast("bigint").alias("nu"),
            F.round(F.col("l_extendedprice") * 100).cast("bigint").alias("de"),
            "l_orderkey",
        ),
        "nu", "de", ["l_orderkey"], keys=["l_returnflag"],
    ).orderBy("l_returnflag").show(truncate=False)

    print("== diff-in-differences: event value, md5-half rollout ==")
    u = F.conv(
        F.substring(F.md5(F.concat_ws("|", F.lit("did"),
                                      F.col("user_id").cast("string"))), 1, 8),
        16, 10,
    ).cast("bigint")
    diff_in_diff(
        events.select(
            "event_type",
            (u % 2 == 0).alias("treated"),
            (F.col("ts") >= F.lit("2024-01-16").cast("timestamp_ntz"))
            .alias("post"),
            F.round(F.col("value") * 100).cast("bigint").alias("cents"),
        ),
        "treated", "post", "cents", keys=["event_type"],
    ).orderBy("event_type").show(truncate=False)

    print("== PSM: en docs matched to nearest non-en by length ==")
    psm_match(
        docs.select(
            "source", (F.col("lang") == "en").alias("t"),
            F.col("n_chars").cast("double").alias("s"),
            F.col("doc_id").alias("did"),
        ),
        "t", "s", "did", keys=["source"], caliper=50.0,
    ).orderBy("source", "id").show(8, truncate=False)

    print("== trimmed vs raw mean: extendedprice cents per flag ==")
    cents = lineitem.select(
        "l_returnflag",
        F.round(F.col("l_extendedprice") * 100).cast("bigint").alias("c"),
    )
    trimmed_mean(cents, "c", ["l_returnflag"], trim=0.05).join(
        cents.groupBy("l_returnflag").agg(
            F.round(F.avg("c"), 2).alias("raw_mean")
        ),
        "l_returnflag",
    ).orderBy("l_returnflag").show(truncate=False)

    print("== conformal threshold: 90%-coverage doc length per source ==")
    conformal_quantile(
        docs.select("source", F.col("n_chars").cast("double").alias("s")),
        "s", keys=["source"], alpha=0.1,
    ).orderBy("source").show(5, truncate=False)


if __name__ == "__main__":
    main()
