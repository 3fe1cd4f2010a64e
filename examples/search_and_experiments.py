"""The round-7 operator families end-to-end on the fixtures:

    BM25            ranked retrieval for a term query over documents
    fuzzy join      entity resolution of mangled part names (EDJoin)
    leakage-safe    cluster-keyed train/val/test split vs doc-keyed
    A/B readout     deterministic arms + Welch z over event values
    SCD2            user event-type state history + a snapshot
    PPR             personalized weighted PageRank recommendations

Run:  python examples/search_and_experiments.py [sf_dir]
"""

import sys

sys.path.insert(0, ".")

from pyspark.sql import functions as F  # noqa: E402

from pigout_spark.catalog import load_table  # noqa: E402
from pigout_spark.operators.joins import edit_distance_join  # noqa: E402
from pigout_spark.pipeline.behavioral import ab_lift  # noqa: E402
from pigout_spark.pipeline.curation import split_by_cluster  # noqa: E402
from pigout_spark.pipeline.dedup import (  # noqa: E402
    dedup_clusters,
    minhash_lsh_pairs,
)
from pigout_spark.pipeline.graph import pagerank  # noqa: E402
from pigout_spark.pipeline.scd import scd2_build, scd2_snapshot  # noqa: E402
from pigout_spark.pipeline.text import bm25_topk  # noqa: E402
from pigout_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("search-experiments-example")
    docs = load_table(spark, sf_dir, "documents")
    events = load_table(spark, sf_dir, "events")
    part = load_table(spark, sf_dir, "part")
    li = load_table(spark, sf_dir, "lineitem")

    print("== BM25: top-5 docs for ['join', 'vector', 'stream'] ==")
    bm25_topk(docs, ["join", "vector", "stream"], k=5).show(truncate=60)

    print("== fuzzy join: recover mangled part names (ed <= 1) ==")
    left = part.select(F.col("p_partkey").alias("id"), F.col("p_name").alias("s"))
    right = part.select(
        (F.col("p_partkey") + 1_000_000).alias("id"),
        F.expr("substring(p_name, 2)").alias("s"),
    )
    matches = edit_distance_join(left, right, k=1)
    n_self = matches.filter(
        F.col("r_id") - F.col("l_id") == 1_000_000
    ).count()
    print(f"pairs: {matches.count()}  (self-mangle recoveries: {n_self})")

    print("== leakage-safe split: near-dup families stay together ==")
    pairs = minhash_lsh_pairs(docs, "doc_id", "text", num_hashes=16, rows_per_band=8)
    clusters = dedup_clusters(pairs)
    safe = split_by_cluster(
        docs.select("doc_id"), clusters, {"train": 0.8, "val": 0.1, "test": 0.1}
    )
    straddlers = (
        clusters.join(safe, "doc_id")
        .groupBy("cluster_id")
        .agg(F.count_distinct("split").alias("n_splits"))
        .filter("n_splits > 1")
        .count()
    )
    print(f"clusters straddling splits: {straddlers} (must be 0)")

    print("== A/B readout over event values (seed 7, 50/50 by user) ==")
    ab_lift(
        events.filter(F.col("value").isNotNull()), "value", ["user_id"], seed="7"
    ).show()

    print("== SCD2: user event-type state history ==")
    hist = scd2_build(
        events.select("user_id", "event_id", "event_type", "ts"),
        key="user_id", ts_col="ts", attrs=["event_type"], tiebreak="event_id",
    )
    print(f"intervals: {hist.count()}, open: {hist.filter('is_current').count()}")
    at = events.agg(F.max("ts")).collect()[0][0]
    print(f"snapshot at corpus end covers {scd2_snapshot(hist, at, ts_fmt=False).count()} users")

    print("== personalized weighted PageRank from suppliers 1-3 ==")
    edges = li.groupBy(
        F.col("l_suppkey").cast("long").alias("src"),
        (F.col("l_partkey") + (1 << 32)).cast("long").alias("dst"),
    ).agg(F.count(F.lit(1)).cast("long").alias("w"))
    ppr = pagerank(edges, iterations=3, weight_col="w", seeds=[1, 2, 3])
    ppr.orderBy(F.desc("rank")).limit(8).show()


if __name__ == "__main__":
    main()
