"""Stage decomposition of x_cohort_retention and x_trend_fit at a
fixture (r10 verdict #6: the two sf1 ratios — 8.6× and 6.9× — not yet
attributed).  Both plans are already minimal shapes (one window + one
distinct-rollup; one six-sum groupBy), so the decomposition times the
plan PREFIXES to show which physical stage carries the wall:

  cohort:  scan-only → +window-min → +distinct → full rollup
  trend:   scan-only → full groupBy readout

Each prefix is noop-written; differences between successive walls
attribute the stages.  Usage:
    python tools/profile_cohort_trend.py [sf_dir] [repeats]
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import Window  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from pigout_spark.session import get_spark  # noqa: E402
from pigout_spark.sources.io import load  # noqa: E402


def _noop(df) -> float:
    t0 = time.perf_counter()
    df.write.format("noop").mode("overwrite").save()
    return time.perf_counter() - t0


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else ".localdata/sf1"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    spark = get_spark("profile-cohort-trend")

    # --- cohort_retention over events (mirrors x_cohort_retention) ---
    def ev():
        return load(spark, f"{sf_dir}/events.parquet").select(
            "user_id",
            F.date_trunc("second", "ts").cast("timestamp_ntz").alias("ts"),
        )

    _noop(ev().limit(1))  # warm scans

    p = F.floor(F.unix_timestamp("ts") / 86400).cast("bigint")
    w = Window.partitionBy("user_id")
    for r in range(reps):
        t_scan = _noop(ev().select("user_id", p.alias("__p")))
        periods = ev().select(
            F.col("user_id"), p.alias("__p"), F.min(p).over(w).alias("__c")
        )
        t_win = _noop(periods)
        dd = periods.select(
            "user_id",
            F.col("__c").alias("cohort"),
            (F.col("__p") - F.col("__c")).alias("period_offset"),
        ).distinct()
        t_dist = _noop(dd)
        t_full = _noop(
            dd.groupBy("cohort", "period_offset").agg(
                F.count(F.lit(1)).alias("n_keys")
            )
        )
        print(
            f"cohort run {r}: scan {t_scan:5.2f}  +window {t_win:5.2f}  "
            f"+distinct {t_dist:5.2f}  full {t_full:5.2f}",
            flush=True,
        )

    # --- trend_fit over orders (mirrors x_trend_fit exactly) ---
    from pigout_spark.pipeline.behavioral import trend_fit

    def o():
        return load(spark, f"{sf_dir}/orders.parquet").select(
            "o_custkey",
            F.datediff(
                "o_orderdate",
                F.lit("1992-01-01 00:00:00").cast("timestamp_ntz"),
            )
            .cast("double")
            .alias("x"),
            F.round(F.col("o_totalprice") * 100)
            .cast("bigint")
            .cast("double")
            .alias("y"),
        )

    _noop(o().limit(1))
    for r in range(reps):
        t_scan = _noop(o())
        t_full = _noop(
            trend_fit(o(), ["o_custkey"], "x", "y", term_scale=0)
        )
        print(
            f"trend  run {r}: scan {t_scan:5.2f}  full {t_full:5.2f}",
            flush=True,
        )


if __name__ == "__main__":
    main()
