"""Product-analytics pass over the events fixture: the behavioral
operator family end-to-end.

    sessionize   — 30-min gap sessions per user, rolled up with a
                   value sum
    funnel       — view → click → purchase strict-order progression,
                   plus the per-step conversion table
    retention    — daily cohort triangle
    rolling      — trailing 1-hour per-event count/sum
    histogram    — 20-bin event-value distribution
    pivot        — per-user wide table of count+sum per event type

Run:  python examples/behavioral_analytics.py [sf_dir]
"""

import sys

sys.path.insert(0, ".")

from pyspark.sql import functions as F  # noqa: E402

from pigout_spark.catalog import load_table  # noqa: E402
from pigout_spark.operators.grouping import pivot_table  # noqa: E402
from pigout_spark.pipeline.behavioral import (  # noqa: E402
    cohort_retention,
    funnel_counts,
    histogram,
    session_stats,
)
from pigout_spark.session import get_spark  # noqa: E402
from pigout_spark.streaming.windows import rolling_agg  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("behavioral-example")
    ev = load_table(spark, sf_dir, "events").withColumn(
        "ts", F.date_trunc("second", "ts").cast("timestamp_ntz")
    )

    sessions = session_stats(
        ev, gap_seconds=1800, aggs=[F.sum("value").alias("sum_value")]
    )
    print("— sessions (30-min gap), longest by event count —")
    sessions.orderBy(F.desc("n_events")).show(5, truncate=False)

    print("— funnel view→click→purchase —")
    funnel_counts(ev, ["view", "click", "purchase"]).orderBy("step").show()

    print("— daily cohort retention (first 10 cells) —")
    cohort_retention(ev, period_seconds=86400).orderBy(
        "cohort", "period_offset"
    ).show(10)

    print("— trailing 1-hour rolling count/sum (sample) —")
    rolling_agg(
        ev, "ts", "user_id", 3600,
        {"n_1h": F.count(F.lit(1)), "sum_1h": F.sum("value")},
    ).select("user_id", "ts", "n_1h", "sum_1h").show(5)

    print("— value histogram [0, 100), 20 bins —")
    histogram(ev, "value", 20, 0.0, 100.0).orderBy("bin").show(20)

    print("— per-user pivot on event_type —")
    pivot_table(
        ev, ["user_id"], "event_type", ["view", "click", "purchase"],
        [F.count("event_type").alias("n"), F.sum("value").alias("s")],
    ).orderBy("user_id").show(5)

    from pigout_spark.pipeline.behavioral import detect_gaps, session_paths
    from pigout_spark.streaming.windows import rolling_zscore

    print("— top session paths (event_id tiebreak) —")
    session_paths(ev, tiebreak="event_id", max_len=5).orderBy(
        F.desc("n_sessions")
    ).show(5, truncate=False)

    print("— longest silences (> 1 day) —")
    detect_gaps(ev, min_gap_seconds=86400).orderBy(
        F.desc("gap_seconds")
    ).show(5)

    print("— rolling z-score anomalies (24h window, |z| > 2) —")
    rolling_zscore(ev, "ts", "user_id", "value", 86400, threshold=2.0).show(5)

    from pigout_spark.pipeline.behavioral import attribution, rfm

    print("— last-touch attribution (24h lookback): credit per channel —")
    attribution(ev, model="last", lookback_seconds=86400).groupBy(
        "touch_type"
    ).agg(F.sum("credit").alias("conversions_credited")).show()

    print("— linear attribution: same conversions, split credit —")
    attribution(ev, model="linear", lookback_seconds=86400).groupBy(
        "touch_type"
    ).agg(F.round(F.sum("credit"), 2).alias("credit")).show()

    print("— RFM cells (12h/3d, 8/20 events, 500/2000 value) —")
    rfm(
        ev, r_bounds=[43200.0, 259200.0], f_bounds=[8.0, 20.0],
        m_bounds=[500.0, 2000.0],
    ).groupBy("segment").count().orderBy(F.desc("count")).show(8)

    spark.stop()


if __name__ == "__main__":
    main()
