"""Curation-pipeline CLI: run a configurable chain of training-data
stages over a documents parquet and write the surviving corpus.

Usage:
    python tools/curate.py INPUT.parquet OUT_DIR \
        [--stages pii,quality,surprisal,dedup,incremental,passages,\
                   decontaminate,mixture,dsir,wsample,split] \
        [--report] [--text-col text] [--id-col doc_id]

Stage semantics (each consumes the previous stage's survivors):
    normalize     NFC + control/zero-width strip + whitespace collapse
                  (text replaced in place - run it FIRST so hashing
                  sees canonical bytes)
    pii           scrub emails/IPs/phones in place (text_scrubbed used
                  downstream)
    quality       composite C4/Gopher rule filter (drop keep=false)
    dedup         MinHash-LSH pairs -> connected components -> one doc
                  per cluster
    passages      drop docs with >60% duplicated 13-gram positions
    decontaminate requires --benchmark PARQUET; 13-gram overlap drop
    mixture       requires --recipe "src0=0.5,src1=0.5" and --target N
    sample        requires --sample-n N; exactly N docs per source
                  (md5-rank, reproducible)
    dsir          requires --dsir-target PARQUET and --dsir-k N
    split         stamp train/val/test 80/10/10 (adds a column, drops
                  nothing)
    splitsafe     LEAKAGE-SAFE split: same 80/10/10 but keyed on the
                  MinHash duplicate-cluster id, so near-dup families
                  never straddle train/test (split_by_cluster)
    wsample       requires --wsample-n; weighted (A-ES) exact-count
                  sample on --weight-col (default n_chars)
    surprisal     requires --max-surprisal; drop docs whose mean
                  unigram surprisal exceeds it
    incremental   requires --corpus-bands PARQUET (a stored
                  lsh_band_index); drop docs colliding with it —
                  pair with --band-index-out to persist this run's
                  index for the next ingest

Output: a plain parquet dir by default; ``--shards N`` writes the
verified training-export layout instead (sources/shards.py — N
one-file shard dirs + _manifest.json, re-verified after the write).

Every stage is the library operator (pipeline/*.py) — this file only
sequences them; all the 100 TB arguments in SCALE.md apply unchanged.
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

DEFAULT_STAGES = "pii,quality,dedup,passages,split"


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("input")
    ap.add_argument("out_dir")
    ap.add_argument("--stages", default=DEFAULT_STAGES)
    ap.add_argument("--text-col", default="text")
    ap.add_argument("--id-col", default="doc_id")
    ap.add_argument("--benchmark", default=None)
    ap.add_argument("--recipe", default=None, help="dom=w,dom=w for mixture")
    ap.add_argument("--target", type=int, default=None, help="mixture rows")
    ap.add_argument("--dsir-target", default=None)
    ap.add_argument("--dsir-k", type=int, default=None)
    ap.add_argument("--shards", type=int, default=None,
                    help="write the output as N verified shards "
                         "(sources/shards.py) instead of a plain parquet dir")
    ap.add_argument("--sample-n", type=int, default=None,
                    help="exact docs per source for the sample stage")
    ap.add_argument("--wsample-n", type=int, default=None,
                    help="docs to keep for the wsample stage")
    ap.add_argument("--weight-col", default="n_chars",
                    help="weight column for the wsample stage")
    ap.add_argument("--max-surprisal", type=float, default=None,
                    help="drop docs above this mean unigram surprisal "
                         "(surprisal stage)")
    ap.add_argument("--corpus-bands", default=None,
                    help="stored LSH band index parquet for the "
                         "incremental stage")
    ap.add_argument("--band-index-out", default=None,
                    help="also write the OUTPUT corpus's LSH band index "
                         "here (the state the next incremental run probes)")
    ap.add_argument("--zorder", default=None,
                    help="comma-separated numeric columns: z-order the "
                         "plain-parquet output layout (not with --shards)")
    ap.add_argument("--seed", default="0")
    ap.add_argument("--report", action="store_true",
                    help="print per-stage survivor counts (extra actions)")
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from pigout_spark.session import get_spark
    from pigout_spark.pipeline.curation import (
        decontaminate,
        importance_resample,
        mixture_sample,
        split_corpus,
    )
    from pigout_spark.pipeline.dedup import (
        dedup_clusters,
        minhash_lsh_pairs,
        passage_dup_stats,
        retain_per_cluster,
    )
    from pigout_spark.pipeline.text import quality_filter, scrub_pii

    spark = get_spark("pigout-curate")
    df = spark.read.parquet(args.input)
    id_col, text_col = args.id_col, args.text_col
    stages = [s.strip() for s in args.stages.split(",") if s.strip()]
    report: list[tuple[str, int]] = []
    if args.report:
        report.append(("input", df.count()))

    for stage in stages:
        if stage == "pii":
            df = scrub_pii(df, text_col=text_col)
            df = df.drop(text_col).withColumnRenamed("text_scrubbed", text_col)
        elif stage == "quality":
            verdict = quality_filter(df, text_col=text_col, id_col=id_col)
            df = df.join(
                verdict.filter(F.col("keep")).select(id_col), id_col
            )
        elif stage == "dedup":
            pairs = minhash_lsh_pairs(
                df, id_col, text_col, num_hashes=16, rows_per_band=8
            )
            clusters = dedup_clusters(pairs)
            df = retain_per_cluster(df, clusters, id_col=id_col)
            df = df.drop("cluster_id")
        elif stage == "passages":
            stats = passage_dup_stats(df, id_col, text_col, n=13, min_docs=2)
            df = df.join(
                stats.filter(F.col("dup_fraction") <= 0.6).select(id_col),
                id_col,
            )
        elif stage == "decontaminate":
            if not args.benchmark:
                raise SystemExit("--benchmark required for decontaminate")
            bench = spark.read.parquet(args.benchmark)
            df = decontaminate(df, bench, id_col=id_col, text_col=text_col)
        elif stage == "mixture":
            if not (args.recipe and args.target):
                raise SystemExit("--recipe and --target required for mixture")
            recipe = {
                k: float(v)
                for k, v in (p.split("=") for p in args.recipe.split(","))
            }
            df = mixture_sample(
                df, "source", recipe, args.target, [id_col], seed=args.seed
            )
        elif stage == "dsir":
            if not (args.dsir_target and args.dsir_k):
                raise SystemExit("--dsir-target and --dsir-k required")
            target = spark.read.parquet(args.dsir_target)
            picked = importance_resample(
                df, target, args.dsir_k, id_col, text_col, seed=args.seed
            )
            df = df.join(picked.select(id_col), id_col)
        elif stage == "sample":
            if not args.sample_n:
                raise SystemExit("--sample-n required for sample")
            from pigout_spark.pipeline.curation import sample_exact_n

            df = sample_exact_n(
                df, args.sample_n, [id_col], seed=args.seed, by="source"
            )
        elif stage == "wsample":
            if not args.wsample_n:
                raise SystemExit("--wsample-n required for wsample")
            from pigout_spark.pipeline.curation import sample_weighted

            df = sample_weighted(
                df, args.wsample_n, args.weight_col, [id_col], seed=args.seed
            )
        elif stage == "surprisal":
            if args.max_surprisal is None:
                raise SystemExit("--max-surprisal required for surprisal")
            from pigout_spark.pipeline.text import surprisal_score

            scores = surprisal_score(df, id_col=id_col, text_col=text_col)
            # Left join, not inner: zero-token docs get no surprisal
            # score and must pass through (this stage gates on model
            # surprisal only; emptiness is the quality stage's call).
            df = (
                df.join(
                    scores.select(id_col, "mean_surprisal"), id_col, "left"
                )
                .filter(
                    F.col("mean_surprisal").isNull()
                    | (F.col("mean_surprisal") <= args.max_surprisal)
                )
                .drop("mean_surprisal")
            )
        elif stage == "incremental":
            if not args.corpus_bands:
                raise SystemExit("--corpus-bands required for incremental")
            from pigout_spark.pipeline.dedup import dedup_incremental

            bands = spark.read.parquet(args.corpus_bands)
            df = dedup_incremental(
                df, bands, id_col=id_col, text_col=text_col,
                num_hashes=16, rows_per_band=8,
            )
        elif stage == "normalize":
            from pigout_spark.pipeline.text import normalize_text

            df = (
                normalize_text(df, args.text_col)
                .drop(args.text_col)
                .withColumnRenamed("text_norm", args.text_col)
            )
        elif stage == "split":
            df = split_corpus(
                df, {"train": 0.8, "val": 0.1, "test": 0.1}, [id_col],
                seed=args.seed,
            )
        elif stage == "splitsafe":
            from pigout_spark.pipeline.curation import split_by_cluster
            from pigout_spark.pipeline.dedup import (
                dedup_clusters,
                minhash_lsh_pairs,
            )

            pairs = minhash_lsh_pairs(
                df, id_col, text_col, num_hashes=16, rows_per_band=8
            )
            df = split_by_cluster(
                df, dedup_clusters(pairs),
                {"train": 0.8, "val": 0.1, "test": 0.1},
                id_col=id_col, seed=args.seed,
            )
        else:
            raise SystemExit(f"unknown stage: {stage}")
        if args.report and stage not in ("split", "splitsafe"):
            report.append((stage, df.count()))

    out = str(Path(args.out_dir))
    if args.zorder and args.shards:
        raise SystemExit("--zorder applies to the plain-parquet layout; "
                         "shards are content-addressed (drop one)")
    if args.zorder:
        from pigout_spark.plans.partitioning import zorder_layout

        df, zkey = zorder_layout(df, args.zorder.split(","))
        df = df.drop(zkey)  # the layout (file/row order) is the product
    if args.shards:
        from pigout_spark.sources.shards import verify_shards, write_shards

        write_shards(df, out, id_col=args.id_col, n_shards=args.shards)
        check = verify_shards(spark, out)
        if not check["ok"]:
            raise SystemExit(f"shard verification failed: {check['errors']}")
    else:
        df.write.mode("overwrite").parquet(out)
    if args.band_index_out:
        from pigout_spark.pipeline.dedup import lsh_band_index

        lsh_band_index(
            df, id_col, text_col, num_hashes=16, rows_per_band=8
        ).write.mode("overwrite").parquet(args.band_index_out)
    if args.report:
        for name, n in report:
            print(f"{name:15s} {n}")
    print(f"wrote {out}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
