"""Percentile continuous aggregates under streaming ingest: per-key
q-digests kept incrementally fresh with foreachBatch — the quantile
counterpart of streaming_rollup.py's sum/count maintenance.

Sums re-add and counts re-count, but percentiles don't compose — UNLESS
the stored state is a mergeable sketch.  The q-digest
(pipeline/sketches.py) is deterministic and merges by node-count
addition + one recompress, so per micro-batch we digest ONLY the new
events and merge into the stored per-key digest table: state is
digest-sized (≤3k nodes per key), per-batch work is new-data-sized,
and raw history is never rescanned when serving p50/p95/p99.

Run:  python examples/percentile_rollup.py [sf_dir]
"""

import math
import os
import shutil
import sys
import tempfile

sys.path.insert(0, ".")

from pyspark.sql import functions as F  # noqa: E402

from pigout_spark.catalog import load_table  # noqa: E402
from pigout_spark.pipeline.sketches import (  # noqa: E402
    qdigest_build,
    qdigest_merge,
    qdigest_quantiles,
)
from pigout_spark.session import get_spark  # noqa: E402

K, LEVELS = 64, 13  # eighths-scaled events.value fits [0, 2^13)
QS = [0.5, 0.95, 0.99]


def eighths(df):
    return df.select(
        "event_type", F.floor(F.col("value") * 8).cast("bigint").alias("v8")
    )


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("percentile-rollup-example")
    work = tempfile.mkdtemp(prefix="pigout_qroll_")
    src, digests, ckpt = f"{work}/src", f"{work}/digests", f"{work}/ckpt"

    ev = load_table(spark, sf_dir, "events")
    # three "arrival waves" to show incrementality
    for w in range(3):
        ev.filter(f"event_id % 3 = {w}").write.parquet(f"{src}/w{w}")

    stream = (
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", "8")
        .parquet(f"{src}/*")
    )

    def upsert_digests(batch, batch_id):
        fresh = qdigest_build(
            eighths(batch), "v8", k=K, levels=LEVELS, keys=["event_type"]
        )
        if os.path.isdir(digests):
            stored = batch.sparkSession.read.parquet(digests).persist()
            stored.count()  # pin before the directory swap below
            merged = qdigest_merge(
                [stored, fresh], k=K, levels=LEVELS, keys=["event_type"]
            )
        else:
            stored, merged = None, fresh
        merged.write.mode("overwrite").parquet(digests + "_next")
        if stored is not None:
            stored.unpersist()
        shutil.rmtree(digests, ignore_errors=True)
        shutil.move(digests + "_next", digests)
        batch.sparkSession.catalog.refreshByPath(digests)

    q = (
        stream.writeStream.foreachBatch(upsert_digests)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)

    stored = spark.read.parquet(digests)
    n_keys = stored.select("event_type").distinct().count()
    n_nodes = stored.count()
    n_events = ev.count()
    print(f"stored digest: {n_nodes} nodes across {n_keys} keys "
          f"(vs {n_events} raw events — state is sketch-sized)")

    # counts conserve exactly through every merge
    got = {
        r.event_type: r.n
        for r in stored.groupBy("event_type").agg(F.sum("cnt").alias("n")).collect()
    }
    want = {
        r.event_type: r.n
        for r in ev.groupBy("event_type").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert got == want, "digest totals drifted from raw counts"
    print("per-key totals match raw exactly: OK")

    # served percentiles stay within the q-digest rank-error bound of
    # exact percentiles computed from raw history
    est = {
        (r.event_type, r.q): r.est
        for r in qdigest_quantiles(
            stored, QS, k=K, levels=LEVELS, keys=["event_type"]
        ).collect()
    }
    worst = 0.0
    for et, n in want.items():
        vals = sorted(
            r.v8 for r in eighths(ev.filter(F.col("event_type") == et)).collect()
        )
        for qq in QS:
            r_ = max(0, math.ceil(qq * n) - 1)
            true = vals[r_]
            e = est[(et, qq)]
            # rank of the estimate in this key's distribution
            import bisect

            rank_err = abs(bisect.bisect_right(vals, e) - (r_ + 1)) / n
            worst = max(worst, rank_err)
            bound = LEVELS * (n // K) / max(1, n)
            assert rank_err <= bound + 1e-9, (et, qq, e, true, rank_err, bound)
    print(f"worst served-percentile rank error: {worst:.4f} "
          f"(bound levels/k = {LEVELS / K:.4f})")
    shutil.rmtree(work, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
