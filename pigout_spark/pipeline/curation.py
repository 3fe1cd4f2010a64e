"""Corpus curation operators for training-data pipelines: benchmark
decontamination, stratified sampling, token-budget selection.

All three are standard steps between raw dedup and training-set
export.  Spark-first: shingle joins and window cumsums, no Python in
the hot path; the only nondeterminism (sampleBy) is seeded.

Scale notes (100 TB):
- decontamination: shingle inverted-join — the moved data is (hash,
  doc_id) pairs for the *benchmark* side (tiny) semi-joined against the
  train side's shingles; never a doc×doc product.
- stratified sampling: per-stratum Bernoulli — narrow map.
- token budgeting: one shuffle on the group key + per-group running
  sum; selection is a filter on the cumsum, no collect.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from pigout_spark.pipeline.dedup import ws_tokens


def _shingle_hashes(
    df: DataFrame, id_col: str, text_col: str, n: int
) -> DataFrame:
    """(id, md5-hash of each n-token shingle).  Token runs shorter than
    ``n`` produce no shingles (standard n-gram convention)."""
    toks = ws_tokens(text_col, distinct=False)
    # shingle i = tokens[i, i+n); guard short docs (sequence(0,-1) would
    # count DOWN, not produce an empty array)
    idxs = F.when(
        F.size(toks) >= n, F.sequence(F.lit(0), F.size(toks) - n)
    ).otherwise(F.array().cast("array<int>"))
    shingles = F.transform(
        idxs, lambda i: F.md5(F.concat_ws(" ", F.slice(toks, i + 1, n)))
    )
    return df.select(
        F.col(id_col), F.explode(shingles).alias("sh")
    )


def decontaminate(
    train: DataFrame,
    benchmark: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 13,
    bench_id_col: str | None = None,
    bench_text_col: str | None = None,
) -> DataFrame:
    """Benchmark decontamination: drop training docs sharing ANY
    ``n``-token shingle with the benchmark corpus (the standard 13-gram
    rule from LLM training-set hygiene).

    Inverted-index formulation: benchmark shingle hashes (small side,
    distinct) anti-joined against the train side's shingles — one
    shuffle on the shingle hash, never doc×doc.  Returns the surviving
    train rows."""
    bid = bench_id_col or id_col
    btext = bench_text_col or text_col
    bench_sh = (
        _shingle_hashes(benchmark, bid, btext, n).select("sh").distinct()
    )
    train_sh = _shingle_hashes(train, id_col, text_col, n)
    contaminated = (
        train_sh.join(bench_sh, "sh").select(id_col).distinct()
    )
    return train.join(contaminated, id_col, "left_anti")


def stratified_sample(
    df: DataFrame,
    stratum_col: str,
    fractions: dict,
    seed: int = 42,
) -> DataFrame:
    """Per-stratum Bernoulli sampling (e.g. downweight one source or
    language): strata absent from ``fractions`` are DROPPED (explicit
    mixture design — pass 1.0 to keep a stratum whole).  Seeded for
    reproducible mixtures; narrow map, no shuffle."""
    return df.sampleBy(stratum_col, fractions, seed)


def token_budget_select(
    df: DataFrame,
    group_col: str,
    budget: int,
    order_col: str | Column,
    text_col: str = "text",
    ascending: bool = False,
) -> DataFrame:
    """Select documents per group (source, language, …) until a token
    budget is reached: order each group by ``order_col`` (e.g. a quality
    score, best-first by default), take docs while the running token sum
    stays within ``budget``.  A doc that crosses the budget line is
    excluded (strict budget).

    One shuffle on the group key; the running sum is a per-group window
    cumsum — no global ordering, no collect.  Deterministic given a
    total order (break ties in ``order_col`` upstream or pass a compound
    Column)."""
    oc = F.col(order_col) if isinstance(order_col, str) else order_col
    oc = oc.asc() if ascending else oc.desc()
    ntok = F.size(ws_tokens(text_col, distinct=False)).cast("long")
    w = (
        Window.partitionBy(group_col)
        .orderBy(oc)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        df.withColumn("__ntok", ntok)
        .withColumn("__cum", F.sum("__ntok").over(w))
        .filter(F.col("__cum") <= budget)
        .drop("__ntok", "__cum")
    )


def shuffle_deterministic(
    df: DataFrame,
    key_cols: list[str],
    seed: str = "0",
    out: str = "shuffle_rank",
) -> DataFrame:
    """Deterministic global SHUFFLE for training-set export: order rows
    by ``md5(seed || key)`` and stamp the 1-based shuffle position —
    the step after packing that fixes the (reproducible) sample order a
    training run will consume.

    Seeded and engine-neutral (md5 — any engine derives the identical
    permutation, so the order itself is oracle-checkable); changing
    ``seed`` gives an independent permutation without touching data.

    100 TB: the hash sort is Spark's sample-based RANGE partition —
    uniformly distributed keys (md5) make the ranges perfectly
    balanced, so this is the best-case total order; the rank stamp
    rides :func:`~pigout_spark.operators.sorting.row_rank`'s two-pass
    counter (no single-partition window over data rows).
    """
    from pigout_spark.operators.sorting import row_rank

    key = F.concat_ws(
        "|",
        F.lit(seed),
        *[
            F.coalesce(F.col(c).cast("string"), F.lit("\x00"))
            for c in key_cols
        ],
    )
    return row_rank(
        df.withColumn("__skey", F.md5(key)), "__skey", out=out
    ).drop("__skey")
