"""End-to-end FEATURE ENGINEERING + MODEL EVALUATION on the fixture
tables — the r9 families working together:

    leakage-safe LOO target encoding  →  hashed sparse text features
    →  robust scaling  →  a toy deterministic "score"  →  exact
    ROC-AUC  →  calibration bins  →  uplift deciles for a simulated
    targeting experiment  →  per-source tests + BH-FDR readout

Everything stays in DataFrames (no collect-and-sklearn) and every step
is the same operator the oracle-checked queries run.

Run:  python examples/feature_engineering.py [sf_dir]
"""

import sys

sys.path.insert(0, ".")

from pyspark.sql import functions as F  # noqa: E402

from pigout_spark.session import get_spark  # noqa: E402
from pigout_spark.catalog import load_table  # noqa: E402
from pigout_spark.pipeline.features import (  # noqa: E402
    feature_hash,
    robust_scale,
    target_encode,
)
from pigout_spark.pipeline.evaluation import (  # noqa: E402
    calibration_bins,
    roc_auc,
    uplift_deciles,
)
from pigout_spark.pipeline.behavioral import bh_fdr, spearman_corr  # noqa: E402
from pigout_spark.pipeline.dedup import ws_tokens  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark("feature-engineering-example")
    orders = load_table(spark, sf_dir, "orders")
    docs = load_table(spark, sf_dir, "documents")
    events = load_table(spark, sf_dir, "events")

    # 1. leakage-safe target encoding: priority -> mean total price,
    #    each row's own label excluded (train-split discipline)
    enc = target_encode(
        orders, ["o_orderpriority"], "o_totalprice",
        smoothing=20.0, leave_one_out=True,
    )
    enc.select("o_orderpriority", "target_enc").show(5, truncate=False)

    # 2. hashed sparse text features (vocabulary-free, 2^10 buckets)
    toks = docs.select(
        "doc_id", F.explode(ws_tokens("text", distinct=False)).alias("tok")
    )
    coo = feature_hash(toks, ["doc_id"], "tok", n_buckets=1 << 10)
    print("sparse doc-term nnz:", coo.count())

    # 3. robust scaling of the price column per priority
    scaled = robust_scale(
        orders.select(
            "o_orderkey",
            F.col("o_orderpriority").alias("pri"),
            F.col("o_totalprice").alias("value"),
        ),
        "value", ["pri"],
    )
    scaled.show(3)

    # 4. evaluate total price as a predictor of urgency: exact AUC
    labeled = orders.select(
        F.col("o_orderpriority").startswith("1").alias("y"),
        F.col("o_totalprice").alias("s"),
    )
    roc_auc(labeled, "y", "s").show()

    # 5. a perfectly-calibrated synthetic scorer -> reliability bins
    u = lambda seed: (  # noqa: E731  (md5-uniform, engine-replayable)
        F.conv(
            F.substring(
                F.md5(F.concat_ws("|", F.lit(seed), F.col("doc_id").cast("string"))),
                1, 8,
            ), 16, 10,
        ).cast("bigint") % 1000000
    ) / 1000000.0
    synth = docs.select(u("cal").alias("s"), (u("lab") < u("cal")).alias("y"))
    calibration_bins(synth, "s", "y", bins=10).orderBy("bin").show()

    # 6. uplift deciles for a simulated targeting experiment
    d = events.filter(
        F.col("event_id").isNotNull() & F.col("event_type").isNotNull()
    ).select(
        (
            F.conv(
                F.substring(
                    F.md5(F.concat_ws("|", F.lit("upl"),
                                      F.col("user_id").cast("string"))),
                    1, 8,
                ), 16, 10,
            ).cast("bigint") % 1000000 / 1000000.0 < 0.5
        ).alias("tr"),
        (F.col("event_type") == "purchase").alias("y"),
        (
            F.conv(
                F.substring(
                    F.md5(F.concat_ws("|", F.lit("sc"),
                                      F.col("event_id").cast("string"))),
                    1, 8,
                ), 16, 10,
            ).cast("bigint") % 1000000 / 1000000.0
        ).alias("s"),
        "event_id",
    )
    uplift_deciles(d, "tr", "y", "s", tiebreak_cols=["event_id"]).show()

    # 7. per-returnflag monotone association screen + a multiple-testing
    #    readout over toy p-values derived from it
    li = load_table(spark, sf_dir, "lineitem")
    rho = spearman_corr(li, ["l_returnflag"], "l_quantity", "l_extendedprice")
    ps = rho.select(
        F.col("l_returnflag").alias("test_id"),
        # toy p proxy: weaker correlation -> larger p (illustrative only)
        F.round(1.0 - F.abs(F.coalesce(F.col("rho6"), F.lit(0.0))), 6).alias("p"),
    )
    bh_fdr(ps, "p", alpha=0.1).show()

    spark.stop()


if __name__ == "__main__":
    main()
