"""ML feature preparation: target encoding, the hashing trick, robust
scaling — the last-mile transforms between curated data and a trainer.

Pig/reference parity: none of these exist in the reference surface
(Apache Pig has no ML-prep builtins; SURVEY.md §2 marks the family
beyond-reference) — they are here because the 100 TB training-data
pipeline this engine targets runs them at full corpus scale, and every
one is expressible as narrow maps + one keyed aggregation (no UDFs).

Determinism (oracle-hash discipline): hashing uses the split_corpus
md5-hex idiom (first 8 hex chars → uniform integer — reproducible
across runs, engines, reprocessing); encodings are one IEEE chain over
decimal-exact sums, ROUND-6 (+0.0 where a result can cross zero).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def target_encode(
    df: DataFrame,
    cat_cols: list[str],
    target_col: str,
    smoothing: float = 20.0,
    leave_one_out: bool = False,
    out: str = "target_enc",
) -> DataFrame:
    """Smoothed target (mean) encoding of a categorical key:

        enc(cat) = (Σ_cat y + m·ȳ) / (n_cat + m)

    with ``smoothing`` m shrinking rare categories toward the global
    mean ȳ — the standard high-cardinality categorical feature.  With
    ``leave_one_out`` each row EXCLUDES ITS OWN target,

        enc(row) = (Σ_cat y − y_row + m·ȳ) / (n_cat − 1 + m)

    the leakage guard for encodings computed on the training split
    itself (a category's own label must not leak into its feature).
    LOO singletons with m = 0 have an empty denominator and read NULL.

    Rows with NULL target contribute to neither sums nor counts but
    still RECEIVE an encoding (the shrunk category mean; for LOO the
    plain smoothed mean — there is nothing of theirs to remove); NULL
    category keys form their own group, encoded like any other (a
    missing category is itself signal).

    Determinism: category sums/counts are DECIMAL(30,6)-exact integers
    + one IEEE chain, ROUND-6.  Output: input columns + ``out``.

    100 TB: one map-side-combined groupBy to the category relation
    (|categories| rows), one 1-row global aggregate, one
    AQE-broadcastable join back — the fact table is scanned once and
    never shuffled.
    """
    if not cat_cols:
        raise ValueError("target_encode needs at least one category column")
    m = float(smoothing)
    if m < 0:
        raise ValueError(f"smoothing must be >= 0, got {m}")
    if leave_one_out and m == 0.0:
        # legal (classical LOO) — singletons read NULL; documented
        pass
    y = F.col(target_col)
    dec = "decimal(30,6)"
    cat = df.groupBy(
        *[F.col(c).alias(f"__k{i}") for i, c in enumerate(cat_cols)]
    ).agg(
        F.sum(y.cast(dec)).cast("double").alias("__sy"),
        F.count(y).cast("double").alias("__ny"),
    )
    tot = df.agg(
        (
            F.sum(y.cast(dec)).cast("double")
            / F.count(y).cast("double")
        ).alias("__prior")
    )
    # NULL-SAFE join back: groupBy groups NULL category keys together,
    # so the join must match them too (<=>) — a plain equi-join would
    # silently NULL-encode every missing-category row instead of
    # encoding the NULL group like any other.
    cond = [
        F.col(c).eqNullSafe(F.col(f"__k{i}"))
        for i, c in enumerate(cat_cols)
    ]
    joined = (
        df.join(cat, cond, "left")
        .drop(*[f"__k{i}" for i in range(len(cat_cols))])
        .crossJoin(F.broadcast(tot))
    )
    # a category whose targets are ALL NULL sums to NULL, not 0 — it
    # must still shrink to the prior (r9 self-review: the bare __sy
    # NULLed the whole encoding, contradicting the contract above)
    sy = F.coalesce(F.col("__sy"), F.lit(0.0))
    if leave_one_out:
        own = F.when(y.isNotNull(), y.cast("double")).otherwise(F.lit(0.0))
        own_n = F.when(y.isNotNull(), F.lit(1.0)).otherwise(F.lit(0.0))
        num = sy - own + F.lit(m) * F.col("__prior")
        den = F.col("__ny") - own_n + F.lit(m)
    else:
        num = sy + F.lit(m) * F.col("__prior")
        den = F.col("__ny") + F.lit(m)
    enc = F.when(den > 0, F.round(num / den, 6) + F.lit(0.0))
    return joined.withColumn(out, enc).drop("__sy", "__ny", "__prior")


def feature_hash(
    df: DataFrame,
    id_cols: list[str],
    token_col: str,
    n_buckets: int = 1 << 18,
    seed: str = "0",
) -> DataFrame:
    """The hashing trick: map tokens to a fixed bucket space and count
    per (id, bucket) — the sparse doc-term representation that needs no
    vocabulary pass, no fitted state, and survives new tokens at
    serving time.

    Bucket = md5-hex uniform (split_corpus idiom) mod ``n_buckets``,
    so the mapping is reproducible across engines and runs (seed it
    per feature namespace).  NULL tokens are EXCLUDED.  No sign trick
    (unsigned counts; add one downstream if you need the
    expectation-unbiased variant).

    Output: (*id_cols, bucket, n) — the sparse matrix in COO form.

    100 TB: one narrow map (hash is per-row arithmetic) + one
    map-side-combined groupBy on (id, bucket); output is
    nnz-sized, never |docs|×|buckets|.
    """
    if int(n_buckets) < 1:
        raise ValueError(f"n_buckets must be >= 1, got {n_buckets}")
    tok = F.col(token_col)
    key = F.concat_ws("|", F.lit(seed), tok)
    bucket = (
        F.conv(F.substring(F.md5(key), 1, 8), 16, 10).cast("bigint")
        % int(n_buckets)
    ).alias("bucket")
    return (
        df.filter(tok.isNotNull())
        .select(*id_cols, bucket)
        .groupBy(*id_cols, "bucket")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def robust_scale(
    df: DataFrame,
    value_col: str,
    key_cols: list[str],
    out: str = "value_rs",
) -> DataFrame:
    """Per-key robust scaling: (v − median) / IQR — the outlier-immune
    normalization (z-scores move with every tail event; median/IQR do
    not).  Quantile convention: the k-th order statistic with
    k = max(1, ceil(p·n)) over the key's non-NULL values (the
    winsorize contract — a real observed value, tie-invariant,
    decimal-exact thresholds).

    NULL values pass through NULL; zero-IQR keys (constant-ish values)
    read NULL rather than ±inf.  Scaled values ROUND-6 (+0.0).

    Output: the input columns + ``out``.

    100 TB: ONE key exchange — rank window, per-key quantile
    aggregation, and the join back all share the key partitioning
    (the winsorize physical shape).  Keys are REQUIRED; for a global
    pass add a constant key consciously.
    """
    from decimal import Decimal

    keys = list(key_cols or [])
    if not keys:
        raise ValueError(
            "robust_scale requires key_cols (constant key for a conscious "
            "global pass)"
        )
    v = F.col(value_col)
    w = Window.partitionBy(*keys).orderBy(value_col)
    ranked = (
        df.filter(v.isNotNull())
        .withColumn("__rn", F.row_number().over(w))
        .withColumn("__n", F.count(F.lit(1)).over(Window.partitionBy(*keys)))
    )

    def kth(p: float):
        return F.greatest(
            F.lit(1), F.ceil(F.lit(Decimal(str(p))) * F.col("__n"))
        )

    bounds = (
        ranked.withColumn("__k25", kth(0.25))
        .withColumn("__k50", kth(0.5))
        .withColumn("__k75", kth(0.75))
        .groupBy(*keys)
        .agg(
            F.min(F.when(F.col("__rn") == F.col("__k25"), v)).alias("__q25"),
            F.min(F.when(F.col("__rn") == F.col("__k50"), v)).alias("__q50"),
            F.min(F.when(F.col("__rn") == F.col("__k75"), v)).alias("__q75"),
        )
    )
    iqr = F.col("__q75") - F.col("__q25")
    scaled = F.when(
        v.isNotNull() & (iqr > 0),
        F.round((v - F.col("__q50")) / iqr, 6) + F.lit(0.0),
    )
    return (
        df.join(bounds, keys, "left")
        .withColumn(out, scaled)
        .drop("__q25", "__q50", "__q75")
    )
