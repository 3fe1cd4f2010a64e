"""Continuous-aggregate maintenance under streaming ingest: the
hypertable rollup kept incrementally fresh with foreachBatch —
TimescaleDB's continuous aggregates done the Structured Streaming way.

Per micro-batch: aggregate ONLY the new events to hourly partials,
MERGE them into the stored hourly rollup (sum/count re-add exactly —
the nesting property rollup_timeseries relies on), then rebuild the
coarser resolutions FROM the hourly table (never from raw history).
The stored state is bucket-sized, the per-batch work is
new-data-sized, and raw events are never rescanned.

Run:  python examples/streaming_rollup.py [sf_dir]
"""

import shutil
import sys
import tempfile

sys.path.insert(0, ".")

from pyspark.sql import functions as F  # noqa: E402

from pigout_spark.catalog import load_table  # noqa: E402
from pigout_spark.session import get_spark  # noqa: E402

HOUR = 3600
DAY = 86400


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("streaming-rollup-example")
    work = tempfile.mkdtemp(prefix="pigout_croll_")
    src, hourly, ckpt = f"{work}/src", f"{work}/hourly", f"{work}/ckpt"

    ev = load_table(spark, sf_dir, "events").withColumn(
        "ts", F.date_trunc("second", "ts").cast("timestamp_ntz")
    )
    # split the fixture into two "arrival waves" to show incrementality
    ev.filter("event_id % 2 = 0").write.parquet(f"{src}/w0")
    ev.filter("event_id % 2 = 1").write.parquet(f"{src}/w1")

    schema = ev.schema
    stream = spark.readStream.schema(schema).option(
        "maxFilesPerTrigger", "8"
    ).parquet(f"{src}/*")

    def upsert_hourly(batch, batch_id):
        part = (
            batch.groupBy(
                (F.floor(F.unix_timestamp("ts") / HOUR) * HOUR).alias("bucket"),
                "user_id",
            )
            .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("s"))
        )
        import os

        if os.path.isdir(hourly):
            # pin the stored rollup in memory BEFORE the swap below —
            # a lazy read would re-list the directory mid-replace
            stored = batch.sparkSession.read.parquet(hourly).persist()
            stored.count()
            merged = (
                stored.unionByName(part)
                .groupBy("bucket", "user_id")
                .agg(F.sum("n").alias("n"), F.sum("s").alias("s"))
            )
        else:
            stored, merged = None, part
        merged.write.mode("overwrite").parquet(hourly + "_next")
        if stored is not None:
            stored.unpersist()
        # atomic-enough swap for the demo; production would write
        # bucket-partitioned and replace only touched partitions
        shutil.rmtree(hourly, ignore_errors=True)
        shutil.move(hourly + "_next", hourly)
        batch.sparkSession.catalog.refreshByPath(hourly)

    q = (
        stream.writeStream.foreachBatch(upsert_hourly)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)

    h = spark.read.parquet(hourly)
    daily = (
        h.groupBy(
            (F.floor(F.col("bucket") / DAY) * DAY).alias("bucket"), "user_id"
        )
        .agg(F.sum("n").alias("n"), F.sum("s").alias("s"))
    )
    print(f"hourly rows : {h.count()}")
    print(f"daily rows  : {daily.count()} (built from hourly, not raw)")

    # the incremental result must equal a from-scratch batch rollup
    truth = (
        ev.groupBy(
            (F.floor(F.unix_timestamp("ts") / HOUR) * HOUR).alias("bucket"),
            "user_id",
        )
        .agg(F.count(F.lit(1)).alias("n"))
    )
    diff = (
        h.select("bucket", "user_id", "n")
        .exceptAll(truth.select("bucket", "user_id", "n"))
        .count()
    )
    print(f"mismatch vs from-scratch rollup: {diff} rows (expect 0)")
    shutil.rmtree(work, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
