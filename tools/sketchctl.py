"""Sketch CLI: build, merge, and query the mergeable-sketch artifacts
(pipeline/sketches.py) as parquet relations — the operational loop for
no-rescan corpus monitoring: build one sketch per arriving shard, then
answer distinct/overlap/percentile/frequency questions from the stored
artifacts alone.

Usage:
    python tools/sketchctl.py kmv-build  IN.parquet OUT_DIR --col user_id [--k 1024] [--keys a,b]
    python tools/sketchctl.py kmv-merge  OUT_DIR SKETCH_DIR [SKETCH_DIR ...] [--k 1024] [--keys a,b]
    python tools/sketchctl.py kmv-est    SKETCH_DIR [--keys a,b]
    python tools/sketchctl.py kmv-jacc   SKETCH_A SKETCH_B --k K
    python tools/sketchctl.py cms-build  IN.parquet OUT_DIR [--text-col text] [--depth 4] [--width 1024]
    python tools/sketchctl.py cms-est    SKETCH_DIR --terms the,and,data [--depth 4] [--width 1024]
    python tools/sketchctl.py qd-build   IN.parquet OUT_DIR --col v [--k 64] [--levels 12] [--keys a,b]
    python tools/sketchctl.py qd-merge   OUT_DIR DIGEST_DIR [DIGEST_DIR ...] [--k 64] [--levels 12] [--keys a,b]
    python tools/sketchctl.py qd-q       DIGEST_DIR --qs 0.5,0.95 [--k 64] [--levels 12] [--keys a,b]

Build/merge subcommands write a parquet sketch dir; query subcommands
print rows to stdout.  Every operation is the library function — this
file only sequences I/O around them, so all SCALE.md arguments apply:
builds are the only corpus-sized passes, everything downstream is
sketch-sized.
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def _keys(s: str | None) -> list[str] | None:
    return [k for k in s.split(",") if k] if s else None


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("cmd", choices=[
        "kmv-build", "kmv-merge", "kmv-est", "kmv-jacc",
        "cms-build", "cms-est", "qd-build", "qd-merge", "qd-q",
    ])
    ap.add_argument("paths", nargs="+")
    ap.add_argument("--col", default=None)
    ap.add_argument("--text-col", default="text")
    ap.add_argument("--k", type=int, default=None)
    ap.add_argument("--levels", type=int, default=12)
    ap.add_argument("--depth", type=int, default=4)
    ap.add_argument("--width", type=int, default=1024)
    ap.add_argument("--keys", default=None)
    ap.add_argument("--terms", default=None)
    ap.add_argument("--qs", default=None)
    args = ap.parse_args()

    from pigout_spark import session
    from pigout_spark.pipeline import sketches as sk

    spark = session.get_spark("sketchctl")
    keys = _keys(args.keys)
    cmd, p = args.cmd, args.paths

    def show(df):
        for r in df.collect():
            print("\t".join(str(v) for v in r))

    try:
        if cmd == "kmv-build":
            if not args.col:
                ap.error("kmv-build requires --col")
            k = args.k or 1024
            sk.kmv_build(spark.read.parquet(p[0]), args.col, k=k, keys=keys) \
                .write.mode("overwrite").parquet(p[1])
            print(f"kmv sketch (k={k}) -> {p[1]}")
        elif cmd == "kmv-merge":
            k = args.k or 1024
            ins = [spark.read.parquet(x) for x in p[1:]]
            sk.kmv_merge(ins, k=k, keys=keys).write.mode("overwrite").parquet(p[0])
            print(f"merged {len(ins)} kmv sketches -> {p[0]}")
        elif cmd == "kmv-est":
            show(sk.kmv_estimate(spark.read.parquet(p[0]), k=args.k, keys=keys))
        elif cmd == "kmv-jacc":
            if args.k is None:
                ap.error("kmv-jacc requires --k (the sketches' carried k)")
            show(sk.kmv_jaccard(
                spark.read.parquet(p[0]), spark.read.parquet(p[1]), k=args.k
            ))
        elif cmd == "cms-build":
            sk.cms_build(
                spark.read.parquet(p[0]), args.text_col,
                depth=args.depth, width=args.width,
            ).write.mode("overwrite").parquet(p[1])
            print(f"cms sketch ({args.depth}x{args.width}) -> {p[1]}")
        elif cmd == "cms-est":
            if not args.terms:
                ap.error("cms-est requires --terms")
            probes = spark.createDataFrame(
                [(t,) for t in args.terms.split(",")], "term string"
            )
            show(sk.cms_estimate(
                spark.read.parquet(p[0]), probes,
                depth=args.depth, width=args.width,
            ))
        elif cmd == "qd-build":
            if not args.col:
                ap.error("qd-build requires --col")
            k = args.k or 64
            sk.qdigest_build(
                spark.read.parquet(p[0]), args.col,
                k=k, levels=args.levels, keys=keys,
            ).write.mode("overwrite").parquet(p[1])
            print(f"q-digest (k={k}, levels={args.levels}) -> {p[1]}")
        elif cmd == "qd-merge":
            k = args.k or 64
            ins = [spark.read.parquet(x) for x in p[1:]]
            sk.qdigest_merge(ins, k=k, levels=args.levels, keys=keys) \
                .write.mode("overwrite").parquet(p[0])
            print(f"merged {len(ins)} digests -> {p[0]}")
        elif cmd == "qd-q":
            if not args.qs:
                ap.error("qd-q requires --qs")
            qs = [float(x) for x in args.qs.split(",")]
            k = args.k or 64
            show(sk.qdigest_quantiles(
                spark.read.parquet(p[0]), qs,
                k=k, levels=args.levels, keys=keys,
            ))
    finally:
        spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
