"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec, ...}, "sf": ...}.

One shared SparkSession; a warmup action amortizes JVM/codegen startup
(the DuckDB baseline has no session cost — BASELINE.md caveat).
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

from pigout_spark.session import get_spark  # noqa: E402

#: Headline set: the scan→group→agg spine, the big shuffling joins, the
#: window/top-k path, cube, tokenize-explode, and the extension pillars
#: (dedup, similarity, text, streaming-in-batch).
HEADLINE = [
    "q01_group_agg",
    "q03_join_agg",
    "q05_broadcast_join",
    "q09_order_limit",
    "q11_cube",
    "q13_flatten_tokenize",
    "q15_nested_topk",
    "q22_distinct_agg",
    "dedup_exact",
    "dedup_minhash",
    "dedup_simhash",
    "sim_cosine_topk",
    "sim_ann_buckets",
    "text_quality",
    "text_fingerprint",
    "stream_tumbling",
    "stream_session",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    import __spark_entry__ as entrymod

    qs = entrymod.queries()
    names = [n for n in HEADLINE if n in qs]
    spark = get_spark("pigout-bench")
    # Warmup: trigger JVM + whole-stage-codegen on a trivial plan.
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    timings: dict[str, float] = {}
    for name in names:
        t0 = time.perf_counter()
        df = qs[name](spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()
        timings[name] = round(time.perf_counter() - t0, 3)

    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_wall",
                "value": round(sum(timings.values()), 3),
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )


if __name__ == "__main__":
    main()
