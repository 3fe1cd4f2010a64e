"""Event-time analytics on the events fixture: the temporal operator
family in one pass.

    as-of join      — every purchase matched to the user's most recent
                      prior view (attribution)
    range join      — clicks within ±5 min of a same-user error
    resample        — 6-hour per-user grid with gap fill
    hypertable      — 1h → 6h → 1d continuous-aggregate cascade

Run:  python examples/timeseries_analytics.py [sf_dir]
"""

import sys

sys.path.insert(0, ".")

from pyspark.sql import functions as F  # noqa: E402

from pigout_spark.session import get_spark  # noqa: E402
from pigout_spark.catalog import load_table  # noqa: E402
from pigout_spark.operators.joins import asof_join, range_join  # noqa: E402
from pigout_spark.streaming.windows import (  # noqa: E402
    resample_events,
    rollup_timeseries,
)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("timeseries-example")
    ev = load_table(spark, sf_dir, "events").withColumn(
        "ts", F.date_trunc("second", "ts").cast("timestamp_ntz")
    )

    purchases = ev.filter("event_type = 'purchase'").select(
        "user_id", "ts", "event_id"
    )
    views = ev.filter("event_type = 'view'").select(
        "user_id", "ts", F.col("event_id").alias("view_id")
    )
    attributed = asof_join(purchases, views, by="user_id")
    print(f"purchases               : {purchases.count()}")
    print(f"  with an attributed view: {attributed.filter('view_id IS NOT NULL').count()}")

    clicks = ev.filter("event_type = 'click'").select(
        "user_id", "ts", F.col("event_id").alias("click_id")
    )
    errors = ev.filter("event_type = 'error'").select(
        "user_id",
        (F.col("ts") - F.expr("INTERVAL 300 SECONDS")).alias("iv_start"),
        (F.col("ts") + F.expr("INTERVAL 300 SECONDS")).alias("iv_end"),
        F.col("event_id").alias("error_id"),
    )
    near = range_join(
        clicks, errors, "ts", "iv_start", "iv_end", bin_seconds=600,
        by="user_id",
    )
    print(f"clicks near an error    : {near.count()}")

    grid = resample_events(ev, interval_seconds=21600)
    print(f"6h grid rows            : {grid.count()} "
          f"(gaps: {grid.filter('n_events = 0').count()})")

    cascade = rollup_timeseries(ev, [3600, 21600, 86400])
    cascade.groupBy("resolution").count().orderBy("resolution").show()

    from pigout_spark.streaming.windows import rolling_agg, time_weighted_avg

    twa = time_weighted_avg(
        ev, "ts", "user_id", "value", 21600, tiebreak="event_id"
    )
    print("— 6h time-weighted averages (LOCF integral), sample —")
    twa.orderBy("user_id", "bucket").show(5)

    roll = rolling_agg(
        ev, "ts", "user_id", 3600,
        {"n_1h": F.count(F.lit(1)), "sum_1h": F.sum("value")},
    )
    print("— trailing 1h rolling stats, sample —")
    roll.select("user_id", "ts", "n_1h", "sum_1h").show(5)


if __name__ == "__main__":
    main()
