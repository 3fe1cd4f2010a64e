"""Corpus observability from stored sketches only — the no-rescan
monitoring story for a 100 TB corpus.

One pass over each arriving shard builds four KB-sized artifacts
(pipeline/sketches.py); every dashboard question after that is
answered from the artifacts alone:

  KMV      -> distinct users per shard AND for any shard union
  KMV ∩    -> audience overlap between shards (kmv_jaccard)
  CMS      -> token frequencies / heavy hitters over the text stream
  q-digest -> value percentiles per event type, merged across shards

The point being demonstrated: per-shard sketches MERGE — union counts,
overlaps, and percentiles for arbitrary shard combinations come from
sketch-sized arithmetic, never from rescanning raw data.

Run:  python examples/corpus_monitoring.py [sf_dir]
"""

import sys

sys.path.insert(0, ".")

from pyspark.sql import functions as F  # noqa: E402

from pigout_spark.catalog import load_table  # noqa: E402
from pigout_spark.pipeline.sketches import (  # noqa: E402
    cms_build,
    cms_estimate,
    kmv_build,
    kmv_estimate,
    kmv_jaccard,
    kmv_merge,
    qdigest_build,
    qdigest_merge,
    qdigest_quantiles,
)
from pigout_spark.session import get_spark  # noqa: E402

K = 256
QK, QLEVELS = 64, 13


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("corpus-monitoring-example")
    ev = load_table(spark, sf_dir, "events")
    docs = load_table(spark, sf_dir, "documents")

    # "shards": two halves of the event stream, as if two ingest days
    day0 = ev.filter("event_id % 2 = 0")
    day1 = ev.filter("event_id % 2 = 1")

    # --- build once per shard (the only corpus-sized passes) ---------
    kmv0 = kmv_build(day0, "user_id", k=K)
    kmv1 = kmv_build(day1, "user_id", k=K)
    qd0 = qdigest_build(
        day0.select("event_type", F.floor(F.col("value") * 8).cast("bigint").alias("v8")),
        "v8", k=QK, levels=QLEVELS, keys=["event_type"],
    )
    qd1 = qdigest_build(
        day1.select("event_type", F.floor(F.col("value") * 8).cast("bigint").alias("v8")),
        "v8", k=QK, levels=QLEVELS, keys=["event_type"],
    )
    cms = cms_build(docs, "text", depth=4, width=1024)

    # --- answer everything from the sketches -------------------------
    d0 = kmv_estimate(kmv0).collect()[0].est
    d1 = kmv_estimate(kmv1).collect()[0].est
    both = kmv_estimate(kmv_merge([kmv0, kmv1], k=K)).collect()[0].est
    print(f"distinct users  day0={d0:.0f}  day1={d1:.0f}  union={both:.0f}")
    truth = ev.select("user_id").distinct().count()
    print(f"  (exact union distinct for reference: {truth})")

    j = kmv_jaccard(kmv0, kmv1, k=K).collect()[0]
    print(f"audience overlap day0 vs day1: J={j.jaccard:.3f} "
          f"({j.n_common}/{j.n_merged} of the union k-min sample)")

    merged = qdigest_merge([qd0, qd1], k=QK, levels=QLEVELS, keys=["event_type"])
    pcts = qdigest_quantiles(
        merged, [0.5, 0.95], k=QK, levels=QLEVELS, keys=["event_type"]
    )
    print("value percentiles per event type (merged shard digests, /8 scale):")
    for r in sorted(pcts.collect(), key=lambda r: (r.event_type, r.q)):
        print(f"  {r.event_type:10s} p{int(r.q * 100):02d} ≈ {r.est / 8:.2f}")

    from pigout_spark.pipeline.curation import shingle_overlap

    non_en = docs.filter(F.col("lang") != "en")
    en = docs.filter(F.col("lang") == "en")
    so = shingle_overlap(non_en, en, n=4, k=512).collect()[0]
    print(f"contamination screen (non-en corpus vs en 'benchmark', "
          f"4-gram shingles): J={so.jaccard:.4f} "
          f"({so.n_common}/{so.n_merged}) — run exact decontaminate "
          f"only when this is non-zero")

    probes = spark.createDataFrame(
        [("the",), ("and",), ("model",), ("data",)], "term string"
    )
    est = cms_estimate(cms, probes, depth=4, width=1024)
    print("token frequency point-queries (CMS, ≥ truth by construction):")
    for r in est.collect():
        print(f"  {r.term:8s} ≈ {r.est}")

    spark.stop()


if __name__ == "__main__":
    main()
