"""Stage-level decomposition of x_item_cf at a given fixture (r10
verdict #4: the largest absolute data-proportional gap at sf1 — 35.1 s
vs DuckDB 10.0 s).  Materializes each stage of the recsys plan with a
noop write so the walls separate:

  A  scan→join→cap→per-user list aggregation (the one user exchange)
  B  in-task pair explosion → pair-key exchange → co-occurrence counts
  C  symmetrize → n_i joins → score → per-item top-k window

Also prints the AQE-final executed plan of the full query so exchange
row counts / partition counts are on record.

Usage: python tools/profile_item_cf.py [sf_dir] [repeats]
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F  # noqa: E402

from pigout_spark.session import get_spark  # noqa: E402
from pigout_spark.sources.io import load  # noqa: E402
from pigout_spark.pipeline.recsys import (  # noqa: E402
    _pair_counts,
    _user_item_lists,
    item_cf_topk,
)


def _noop(df) -> float:
    t0 = time.perf_counter()
    df.write.format("noop").mode("overwrite").save()
    return time.perf_counter() - t0


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else ".localdata/sf1"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    spark = get_spark("profile-item-cf")

    def events():
        li = load(spark, f"{sf_dir}/lineitem.parquet").select(
            "l_orderkey", "l_partkey"
        )
        o = load(spark, f"{sf_dir}/orders.parquet").select(
            "o_orderkey", "o_custkey"
        )
        return li.join(o, li.l_orderkey == o.o_orderkey).select(
            F.col("o_custkey").alias("u"), F.col("l_partkey").alias("i")
        )

    # warm the JVM + scans once
    _noop(events().limit(1))

    for r in range(reps):
        ev = events()
        lists = _user_item_lists(ev, "u", "i", 25)
        ta = _noop(lists)
        lists_c = lists.localCheckpoint(eager=True)  # isolate stage B
        pairs = _pair_counts(lists_c).filter(F.col("n_ab") >= 2)
        tb = _noop(pairs)
        full = item_cf_topk(events(), "u", "i", k=5, min_cooc=2,
                            max_items_per_user=25)
        tf = _noop(full)
        print(
            f"run {r}: A_lists {ta:6.2f}s  B_pairs {tb:6.2f}s  "
            f"full {tf:6.2f}s  (C≈full−A−B {tf - ta - tb:6.2f}s)",
            flush=True,
        )

    n_pairs = _pair_counts(
        _user_item_lists(events(), "u", "i", 25).localCheckpoint(eager=True)
    )
    print("distinct pairs:", n_pairs.count(), flush=True)
    print(
        "pre-filter pair rows:",
        _user_item_lists(events(), "u", "i", 25)
        .select(
            F.sum(
                (F.size("items") * (F.size("items") - 1) / 2).cast("bigint")
            )
        )
        .first()[0],
        flush=True,
    )

    full = item_cf_topk(events(), "u", "i", k=5, min_cooc=2,
                        max_items_per_user=25)
    full.write.format("noop").mode("overwrite").save()
    print(full._jdf.queryExecution().executedPlan().toString()[:8000])


if __name__ == "__main__":
    main()
