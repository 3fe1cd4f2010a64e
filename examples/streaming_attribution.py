"""Incremental attribution under streaming ingest: the touch store
maintained across micro-batches with foreachBatch — the conversion
counterpart of streaming_rollup.py (sums) and percentile_rollup.py
(quantiles).

Last-touch attribution needs every touch that precedes a conversion,
so the state is a TOUCH STORE (append-only, touch-sized — far smaller
than raw events when conversions dominate reporting): per micro-batch,
append the batch's touches, then attribute ONLY the batch's
conversions against the store.  With event-time-ordered arrival (the
demo splits waves by timestamp tertiles, the production analog of
date-partitioned ingest) every conversion sees its full touch history,
so the incremental result equals the one-shot batch operator EXACTLY —
asserted at the end.

Run:  python examples/streaming_attribution.py [sf_dir]
"""

import os
import shutil
import sys
import tempfile

sys.path.insert(0, ".")

from pyspark.sql import functions as F  # noqa: E402

from pigout_spark.catalog import load_table  # noqa: E402
from pigout_spark.pipeline.behavioral import attribution  # noqa: E402
from pigout_spark.session import get_spark  # noqa: E402

LOOKBACK = 86400


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("streaming-attribution-example")
    work = tempfile.mkdtemp(prefix="pigout_sattr_")
    src, touches, credits, ckpt = (
        f"{work}/src", f"{work}/touches", f"{work}/credits", f"{work}/ckpt",
    )

    ev = load_table(spark, sf_dir, "events").withColumn(
        "ts", F.date_trunc("second", "ts").cast("timestamp_ntz")
    )
    # event-time-ordered waves (timestamp tertiles), one file each so
    # the stream consumes them in arrival = event-time order
    evs = ev.withColumn("__s", F.unix_timestamp("ts"))
    t1, t2 = evs.approxQuantile("__s", [1 / 3, 2 / 3], 0.0)
    waves = [
        evs.filter(F.col("__s") <= t1).drop("__s"),
        evs.filter((F.col("__s") > t1) & (F.col("__s") <= t2)).drop("__s"),
        evs.filter(F.col("__s") > t2).drop("__s"),
    ]
    for i, w in enumerate(waves):
        w.coalesce(1).write.parquet(f"{src}/w{i}")

    stream = (
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(f"{src}/*")
    )

    def attribute_batch(batch, batch_id):
        new_touch = batch.filter(F.col("event_type").isin("view", "click"))
        new_touch.write.mode("append").parquet(touches)
        convs = batch.filter(F.col("event_type") == "purchase")
        if not convs.isEmpty():
            store = batch.sparkSession.read.parquet(touches)
            scope = store.unionByName(convs)  # touches ∪ this batch's convs
            out = attribution(
                scope, model="last", lookback_seconds=LOOKBACK
            )
            out.write.mode("append").parquet(credits)

    q = (
        stream.writeStream.foreachBatch(attribute_batch)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)

    inc = spark.read.parquet(credits)
    whole = attribution(ev, model="last", lookback_seconds=LOOKBACK)
    n_inc, n_whole = inc.count(), whole.count()
    diff = inc.exceptAll(whole).count() + whole.exceptAll(inc).count()
    print(f"incremental credits: {n_inc}  batch credits: {n_whole}  "
          f"symmetric diff: {diff} (expect 0)")
    assert diff == 0 and n_inc == n_whole
    n_touch = spark.read.parquet(touches).count()
    print(f"touch store: {n_touch} rows vs {ev.count()} raw events — "
          f"state is touch-sized, conversions never rescanned")
    shutil.rmtree(work, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
