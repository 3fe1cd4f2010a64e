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


#: exact micro-unit quantization of a float32 embedding component:
#: x·10⁶ is EXACT in double (24-bit float32 mantissa × 5⁶ (14 bits)
#: = 38 significant bits < 53), so the half-away-from-zero tie rule
#: resolves identically in every engine (Spark ROUND is HALF_UP =
#: away from zero; DuckDB ROUND likewise) — the covariance fold below
#: then runs on exact integers and is order-free by construction
_MICRO_EXPR = (
    "transform({vec}, x -> "
    "cast(round(cast(x as double) * 1000000.0) as bigint))"
)

#: in-task upper-triangle second-moment products from the micro array
#: (the recsys/theil_sen pair idiom lifted to (index, index) cells):
#: i ≤ j including the diagonal, plus one (i, -1) sentinel struct per
#: dimension carrying the FIRST moment — one explode feeds one
#: map-side-combined aggregation, so the shuffle is #partitions ×
#: d(d+3)/2 rows no matter how many vectors stream through
_MOMENT_EXPR = (
    "concat("
    "flatten(transform(__mq, (xi, i) -> "
    "transform(slice(__mq, i + 1, size(__mq) - i), "
    "(xj, jo) -> struct(i as i, i + jo as j, xi * xj as p)))), "
    "transform(__mq, (xi, i) -> struct(i as i, -1 as j, xi as p)))"
)


def embedding_moments(
    df: DataFrame,
    vec_col: str = "embedding",
    dim: int | None = None,
) -> DataFrame:
    """Exact integer moment sums over an embedding column — the one
    distributed pass under :func:`embedding_covariance` /
    :func:`pca_components`: per upper-triangle cell (i ≤ j) the sum of
    micro-unit products Σ m_i·m_j (units 10⁻¹²), per dimension the
    sentinel row (i, −1) with Σ m_i (units 10⁻⁶), and n on every row.

    Products are cast to DECIMAL(38,0) BEFORE summing (an int64 sum
    overflows at ~10⁵ vectors × |x| ≈ 8; the decimal sum is exact and
    order-free, the engine-agnostic twin of DuckDB's HUGEINT sum).

    NULL vectors are EXCLUDED; a non-NULL vector whose length differs
    from its batch's first row fails LOUDLY via the dimension gate
    (mixed-dim corpora would silently misalign the (i, j) cells —
    the graph weight-contract pattern).  Pass ``dim`` to pin the
    expected width explicitly — PREFER THIS: with ``dim=None`` the
    width is probed via an eager extra ``.first()`` job whose chosen
    row is arbitrary, so on a mixed-width corpus WHICH side fails the
    gate depends on scan order (r11 ADVICE).  ``dim=None`` is a
    convenience for known-uniform corpora only.

    100 TB: the d(d+1)/2-per-row product fan-out never leaves the
    task (hash-aggregate partial combine collapses it to one cell
    relation per partition before the ONE exchange); CPU is the
    n·d²/2 multiply-adds inherent to a covariance, run as codegen'd
    integer arithmetic, not Python.
    """
    vec = F.col(vec_col)
    d = df.filter(vec.isNotNull())
    first_dim = dim
    if first_dim is None:
        probe = d.select(F.size(vec).alias("s")).first()
        if probe is None:
            raise ValueError("embedding_moments: no non-NULL vectors")
        first_dim = int(probe.s)
    # assert_true returns NULL on success, so the filter keeps every
    # valid row and the dimension check rides the existing scan —
    # distributed, unprunable (the pagerank weight-contract pattern)
    mq = d.filter(
        F.assert_true(
            F.size(vec) == F.lit(int(first_dim)),
            F.concat(
                F.lit(f"embedding_moments: expected dim {first_dim}, got "),
                F.size(vec).cast("string"),
            ),
        ).isNull()
    ).select(F.expr(_MICRO_EXPR.format(vec=vec_col)).alias("__mq"))
    return (
        mq.select(F.explode(F.expr(_MOMENT_EXPR)).alias("__m"))
        .groupBy(
            F.col("__m.i").cast("int").alias("i"),
            F.col("__m.j").cast("int").alias("j"),
        )
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.sum(F.col("__m.p").cast("decimal(38,0)")).alias("s"),
        )
    )


def embedding_covariance(
    df: DataFrame,
    vec_col: str = "embedding",
    dim: int | None = None,
) -> DataFrame:
    """Population covariance matrix of an embedding column, upper
    triangle as rows — the PCA/whitening input a training pipeline
    computes over the full corpus before dimensionality reduction
    (:func:`pca_components` eigendecomposes it;
    :func:`similarity.quantize_embeddings` is the storage-side
    counterpart):

        cov_ij = Σxy/n − (Σx/n)(Σy/n)

    computed on the EXACT integer micro-unit sums of
    :func:`embedding_moments`, finished in one fixed IEEE chain per
    cell (each exact decimal casts to the same nearest double in any
    engine) and ROUND-6 (+0.0).

    Output: (i, j, n, cov6) for 0 ≤ i ≤ j < d — d(d+1)/2 rows.

    100 TB: the data pass is embedding_moments' single exchange; this
    readout joins the d-row first-moment slice to the cell relation
    twice, both broadcasts of a d-row relation.
    """
    mom = embedding_moments(df, vec_col, dim)
    firsts = mom.filter(F.col("j") == -1).select(
        F.col("i").alias("__fi"), F.col("s").alias("__sx")
    )
    cells = mom.filter(F.col("j") >= 0)
    nn = F.col("n").cast("double")
    cov = (
        F.col("s").cast("double") / nn
        - (F.col("__sx").cast("double") / nn)
        * (F.col("__sy").cast("double") / nn)
    ) / 1000000000000.0
    return (
        cells.join(F.broadcast(firsts), cells.i == firsts.__fi)
        .drop("__fi")
        .join(
            F.broadcast(
                firsts.select(
                    F.col("__fi").alias("__fj"), F.col("__sx").alias("__sy")
                )
            ),
            cells.j == F.col("__fj"),
        )
        .select(
            "i", "j", "n", (F.round(cov, 6) + F.lit(0.0)).alias("cov6")
        )
        .orderBy("i", "j")
    )


def pca_components(
    df: DataFrame,
    vec_col: str = "embedding",
    k: int = 8,
    dim: int | None = None,
) -> tuple[list[list[float]], list[float]]:
    """Top-k principal axes of the embedding corpus: eigendecompose
    the :func:`embedding_covariance` matrix driver-side (numpy eigh on
    a d×d symmetric matrix — the collect is d(d+1)/2 rows, BOUNDED by
    the embedding width like the audited PQ-codebook collects, never
    by corpus size) and return (components [k][d], explained variance
    [k]), eigenvalues descending.

    Sign convention for determinism: each component is flipped so its
    largest-|coefficient| entry is positive (eigh's sign is otherwise
    arbitrary and run-dependent).
    """
    import numpy as np

    rows = embedding_covariance(df, vec_col, dim).collect()
    if not rows:
        raise ValueError(
            "pca_components: embedding_covariance returned zero rows — "
            "the corpus has no non-NULL vectors (an empty-but-dim-pinned "
            "input reaches here; filter or check upstream)"
        )
    d = 1 + max(r.i for r in rows)
    m = np.zeros((d, d))
    for r in rows:
        if r.j >= 0:
            m[r.i][r.j] = m[r.j][r.i] = r.cov6
    vals, vecs = np.linalg.eigh(m)
    order = np.argsort(vals)[::-1][: int(k)]
    comps, ev = [], []
    for ix in order:
        v = vecs[:, ix]
        pivot = int(np.argmax(np.abs(v)))
        if v[pivot] < 0:
            v = -v
        comps.append([float(x) for x in v])
        ev.append(float(vals[ix]))
    return comps, ev


def pca_project(
    df: DataFrame,
    components: list[list[float]],
    vec_col: str = "embedding",
    out_col: str = "pca",
) -> DataFrame:
    """Project each embedding onto fixed principal axes — a JVM-side
    array fold per component (the similarity.dot idiom: zip_with +
    aggregate, no UDF), appending ``out_col`` as array<double> of
    length len(components).  Components ride into the plan as
    literals (k·d doubles — trivially broadcast-sized).

    100 TB: a narrow map, no exchange; chain ahead of
    :func:`similarity.ann_topk` to search in the reduced space.
    """
    from pigout_spark.pipeline.similarity import as_double, dot

    vec = as_double(F.col(vec_col))
    projs = [
        dot(vec, F.array(*[F.lit(float(c)) for c in comp]))
        for comp in components
    ]
    return df.withColumn(out_col, F.array(*projs))


def apply_logistic(
    df: DataFrame,
    weights: dict[str, float],
    intercept: float = 0.0,
    out_col: str = "score",
) -> DataFrame:
    """Score rows with a fixed logistic model — the
    quality-classifier application step of a curation pipeline (the
    CCNet/fastText-style linear scorer whose TRAINING happens
    offline; inference is embarrassingly parallel and belongs in the
    engine): score = σ(Σ wᵢ·xᵢ + b), appended ROUND-6 as ``out_col``.

    The weighted sum folds in SORTED feature-name order (one fixed
    IEEE chain both engines replay identically — the pca_project
    literal discipline; weights ride into the plan as Python
    literals).  The logit is ROUND-6 before the sigmoid so the
    exp() input is the same double everywhere; exp's own last ulp
    then sits under the final ROUND-6 except at rounding boundaries
    (the accepted nelson_aalen exp-chain risk).  NULL features make a
    NULL score (standard SQL propagation) — impute upstream.

    100 TB: a narrow map, no exchange, no UDF.
    """
    if not weights:
        raise ValueError("apply_logistic needs at least one feature weight")
    z = F.lit(float(intercept))
    for name in sorted(weights):
        z = z + F.col(name).cast("double") * F.lit(float(weights[name]))
    z6 = F.round(z, 6) + F.lit(0.0)
    score = F.lit(1.0) / (F.lit(1.0) + F.exp(-z6))
    return df.withColumn(out_col, F.round(score, 6) + F.lit(0.0))
