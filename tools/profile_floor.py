"""Split each headline query's wall time into plan-construction
(Python+py4j DataFrame building) vs execution (noop write) — identifies
whether the Spark-vs-DuckDB floor is driver-side or executor-side.

Usage: python tools/profile_floor.py [query ...]
"""

from __future__ import annotations

import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from bench import HEADLINE, _warmup  # noqa: E402
from pigout_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    import __spark_entry__ as entrymod

    qs = entrymod.queries()
    names = sys.argv[1:] or [n for n in HEADLINE if n in qs]
    spark = get_spark("pigout-profile")
    _warmup(spark, sf_dir)

    print(f"{'query':26s} {'build':>7s} {'exec':>7s} {'total':>7s}")
    tot_b = tot_e = 0.0
    for name in names:
        bb = be = None
        for _ in range(3):
            t0 = time.perf_counter()
            df = qs[name](spark, sf_dir)
            t1 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            t2 = time.perf_counter()
            b, e = t1 - t0, t2 - t1
            bb = b if bb is None else min(bb, b)
            be = e if be is None else min(be, e)
        tot_b += bb
        tot_e += be
        print(f"{name:26s} {bb:7.3f} {be:7.3f} {bb + be:7.3f}")
    print(f"{'TOTAL':26s} {tot_b:7.3f} {tot_e:7.3f} {tot_b + tot_e:7.3f}")


if __name__ == "__main__":
    main()
