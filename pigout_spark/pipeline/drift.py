"""Distribution-drift monitoring: PSI and the two-sample KS statistic
over a shared equi-width binning — the production-ML "did my feature /
score distribution move" gate (training-vs-serving skew, week-over-week
corpus shift, A/A sanity).

Spark-first: each side contributes ONE map-side-combinable groupBy onto
the bin id (the histogram() bin chain — floor of one IEEE division by a
shared literal, bit-identical across engines).  Everything after the
two groupBys operates on the K-row bin relation, which is bounded by
the ``bins`` parameter (driver-sized by contract) — the one place a
single-partition ordered window is legitimate, because it sorts K rows,
not data.

Determinism (oracle-hash discipline): bin counts are exact integers;
proportions are single IEEE divisions; PSI contributions pass through
``ln`` and therefore ROUND to 6 decimals with signed-zero
normalization before any sum (the vocab_kl/PMI libm discipline,
FIXTURES.md) — engines' ln implementations agree far beyond 6 decimals
but are not guaranteed bit-identical.  The KS statistic needs no
rounding: it is a max of |differences of count ratios|, ln-free.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _bin_counts(
    df: DataFrame, value_col: str, bins: int, lo: float, hi: float
) -> DataFrame:
    """Clamped equi-width bin counts: (bin, n).  NULL values are
    excluded (a NULL is not a drifted value; callers comparing NULL
    RATES should profile those separately).  Identical bin arithmetic
    to behavioral.histogram so oracles can share the chain (the bin
    arithmetic itself lives in :func:`bin_expr` — ONE copy, shared
    with the streaming path, so the binnings can never drift)."""
    return (
        df.filter(F.col(value_col).isNotNull())
        .select(bin_expr(value_col, bins, lo, hi).alias("bin"))
        .groupBy("bin")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def _joined_bins(
    ref: DataFrame,
    cur: DataFrame,
    value_col: str,
    bins: int,
    lo: float,
    hi: float,
) -> DataFrame:
    """Full outer bin join with zero-fill plus the two side totals as
    broadcast-sized scalars (cross join against a 1-row relation)."""
    r = _bin_counts(ref, value_col, bins, lo, hi).withColumnRenamed(
        "n", "n_ref"
    )
    c = _bin_counts(cur, value_col, bins, lo, hi).withColumnRenamed(
        "n", "n_cur"
    )
    j = (
        r.join(c, "bin", "full_outer")
        .select(
            "bin",
            F.coalesce("n_ref", F.lit(0)).alias("n_ref"),
            F.coalesce("n_cur", F.lit(0)).alias("n_cur"),
        )
    )
    tot = j.agg(
        F.sum("n_ref").alias("t_ref"), F.sum("n_cur").alias("t_cur")
    )
    return j.crossJoin(F.broadcast(tot))


def psi_drift(
    ref: DataFrame,
    cur: DataFrame,
    value_col: str,
    bins: int = 20,
    lo: float = 0.0,
    hi: float = 100.0,
    min_prop: float = 1e-4,
) -> DataFrame:
    """Population Stability Index contributions per bin:

        contrib(b) = (p_cur(b) − p_ref(b)) · ln(p_cur(b) / p_ref(b))

    with both proportions clamped below at ``min_prop`` (the standard
    empty-bin smoothing — PSI is +∞ on a truly vanished bin
    otherwise; the clamp makes "bin emptied out" a large finite
    signal).  Rule of thumb: total PSI < 0.1 stable, 0.1–0.25 drifting,
    > 0.25 shifted — sum the contributions (they are exact 6-decimal
    values; a DECIMAL(20,6) sum stays exact).

    Output: (bin, n_ref, n_cur, psi6) — contribution rounded to 6
    decimals, signed zero normalized (the ln discipline above).

    100 TB: two map-side-combined groupBys (one per side), then
    K-row-relation arithmetic.  Nothing else touches the data.
    """
    j = _joined_bins(ref, cur, value_col, bins, lo, hi)
    # an EMPTY side (no data arrived yet — a routine monitoring state)
    # is a NULL readout, not an ANSI divide-by-zero crash (r8
    # self-review; the ab_lift empty-arm discipline)
    # (greatest/least SKIP NULL operands — the winsorize lesson — so
    # the empty-side NULL must be routed around the clamp explicitly)
    p_ref = F.when(
        F.col("t_ref") > 0,
        F.greatest(
            F.col("n_ref") / F.col("t_ref"), F.lit(float(min_prop))
        ),
    )
    p_cur = F.when(
        F.col("t_cur") > 0,
        F.greatest(
            F.col("n_cur") / F.col("t_cur"), F.lit(float(min_prop))
        ),
    )
    contrib = F.round((p_cur - p_ref) * F.log(p_cur / p_ref), 6) + F.lit(
        0.0
    )
    return j.select(
        "bin", "n_ref", "n_cur", contrib.alias("psi6")
    )


def ks_drift(
    ref: DataFrame,
    cur: DataFrame,
    value_col: str,
    bins: int = 100,
    lo: float = 0.0,
    hi: float = 100.0,
) -> DataFrame:
    """Two-sample Kolmogorov–Smirnov statistic over the binned
    empirical CDFs: D = max over bin boundaries of
    |ECDF_ref − ECDF_cur|.  Exact for the DISCRETIZED distributions
    (raise ``bins`` to tighten; for genuinely discrete scores one bin
    per value makes it the exact KS).  No ln, no rounding needed: D
    is a max of |differences of single-division count ratios| — one
    fixed IEEE chain per bin.

    Output: ONE row (d_stat, at_bin) — at_bin is the smallest bin
    boundary achieving the max (deterministic argmax).

    100 TB: the two groupBys see the data; the cumulative sums run on
    the K-row bin relation (single-partition window over ``bins``
    rows — bounded by contract, not by data).
    """
    j = _joined_bins(ref, cur, value_col, bins, lo, hi)
    w = Window.orderBy("bin").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    ecdf = j.select(
        "bin",
        F.when(
            F.col("t_ref") > 0, F.sum("n_ref").over(w) / F.col("t_ref")
        ).alias("__er"),
        F.when(
            F.col("t_cur") > 0, F.sum("n_cur").over(w) / F.col("t_cur")
        ).alias("__ec"),
    ).select(
        "bin", F.abs(F.col("__er") - F.col("__ec")).alias("__d")
    ).filter(F.col("__d").isNotNull())
    # single agg: max over (d, -bin) structs == max d, smallest bin on
    # ties — deterministic argmax without a second pass
    return ecdf.agg(
        F.max(
            F.struct(F.col("__d").alias("d"), (-F.col("bin")).alias("nb"))
        ).alias("m")
    ).select(
        F.col("m.d").alias("d_stat"),
        (-F.col("m.nb")).cast("bigint").alias("at_bin"),
    )


def bin_expr(value_col: str, bins: int, lo: float, hi: float):
    """The clamped equi-width bin id as a NARROW column expression —
    shareable by batch groupBys and streaming window aggregations
    (same arithmetic as :func:`_bin_counts`)."""
    if int(bins) < 1:
        raise ValueError("drift binning: bins must be >= 1")
    if not float(hi) > float(lo):
        raise ValueError(
            f"drift binning: hi ({hi}) must be > lo ({lo}) — swapped "
            "bounds silently funnel everything into the edge bins"
        )
    width = (float(hi) - float(lo)) / int(bins)
    v = F.col(value_col)
    # NULL values must yield a NULL bin, not bin 0 (r8 advice):
    # floor(NULL/width) is NULL, but NULL-skipping greatest(0, NULL)
    # returns 0 — so an unguarded caller (this expression is exported
    # for streaming aggregations that may not pre-filter) would count
    # NULLs as bin-0 mass.  The when() keeps NULL in, NULL out.
    return F.when(
        v.isNotNull(),
        F.least(
            F.lit(int(bins) - 1),
            F.greatest(
                F.lit(0), F.floor((v - F.lit(float(lo))) / F.lit(width))
            ),
        ),
    ).cast("bigint")


def drift_bins_stream(
    stream: DataFrame,
    value_col: str,
    ts_col: str,
    duration: str,
    bins: int = 20,
    lo: float = 0.0,
    hi: float = 100.0,
) -> DataFrame:
    """Streaming-safe windowed bin counts: ONE tumbling event-time
    aggregation over the narrow bin expression — the stream half of a
    continuous drift monitor.  Output: (window_start, bin, n_cur).

    Streaming only allows a single aggregation layer, so the PSI
    arithmetic itself (which needs per-window totals and the reference
    join) runs downstream via :func:`psi_from_counts` — in a
    foreachBatch, or on the sink table (the rollup_timeseries
    continuous-aggregate pattern: heavy counting in the stream,
    cheap readout from the counts).
    """
    b = bin_expr(value_col, bins, lo, hi)
    out = (
        stream.filter(F.col(value_col).isNotNull())
        .withColumn("__bin", b)
        .groupBy(F.window(ts_col, duration).alias("__w"), F.col("__bin"))
        .agg(F.count(F.lit(1)).alias("n_cur"))
    )
    return out.select(
        F.col("__w.start").alias("window_start"),
        F.col("__bin").alias("bin"),
        "n_cur",
    )


def psi_from_counts(
    ref_counts: DataFrame,
    cur_counts: DataFrame,
    by: list[str] | None = None,
    min_prop: float = 1e-4,
) -> DataFrame:
    """PSI contributions from PRE-AGGREGATED bin counts: ``ref_counts``
    is a static (bin, n_ref) reference; ``cur_counts`` carries
    (``by``..., bin, n_cur) — one comparison group per ``by`` tuple
    (a stream's window_start, a date partition, a model version).
    Same formula, clamping, and ROUND-6 ln discipline as
    :func:`psi_drift`; per-group empty sides read NULL.

    Output: (*by, bin, n_ref, n_cur, psi6) — every reference bin
    appears in every group (zero-filled), so per-group totals are
    comparable.

    100 TB: the count relations are bins-sized (× groups); everything
    here is small-relation arithmetic — the data was paid for
    upstream, once.
    """
    bys = list(by or [])
    ref_n = [c for c in ref_counts.columns if c != "bin"]
    if len(ref_n) != 1:
        raise ValueError(
            "psi_from_counts: ref_counts must be exactly (bin, <count>)"
        )
    r = ref_counts.select("bin", F.col(ref_n[0]).alias("n_ref"))
    c = cur_counts.select(*bys, "bin", "n_cur")
    # bin universe = ref ∪ cur bins: a bin the CURRENT side invented
    # (zero reference mass — the strongest drift signal there is) must
    # still scaffold into every group with n_ref 0, or its rows would
    # vanish in the join AND deflate t_cur (r8 second self-review —
    # the first shape used ref bins only, unlike psi_drift's
    # full-outer join)
    bins_univ = (
        r.select("bin").unionByName(c.select("bin")).distinct()
    )
    rb = bins_univ.join(r, "bin", "left").select(
        "bin", F.coalesce("n_ref", F.lit(0)).alias("n_ref")
    )
    groups = (
        c.select(*bys).distinct() if bys
        else c.sparkSession.range(1).select(F.lit(1).alias("__g"))
    )
    scaffold = (
        groups.crossJoin(F.broadcast(rb)) if bys
        else groups.crossJoin(F.broadcast(rb)).drop("__g")
    )
    # scaffold derives FROM c, so a plain self-join sees conflicting
    # attribute references — rename the probe side's join columns into
    # fresh attributes instead of relying on alias resolution
    c2 = c.select(
        *[F.col(b).alias(f"__cb{i}") for i, b in enumerate(bys)],
        F.col("bin").alias("__cbin"),
        "n_cur",
    )
    cond = [
        F.col(f"__cb{i}") == F.col(b) for i, b in enumerate(bys)
    ] + [F.col("__cbin") == F.col("bin")]
    j = scaffold.join(c2, cond, "left").select(
        *bys,
        "bin",
        F.coalesce("n_ref", F.lit(0)).alias("n_ref"),
        F.coalesce("n_cur", F.lit(0)).alias("n_cur"),
    )
    wt = Window.partitionBy(*bys) if bys else Window.partitionBy()
    j = j.withColumn("t_ref", F.sum("n_ref").over(wt)).withColumn(
        "t_cur", F.sum("n_cur").over(wt)
    )
    p_ref = F.when(
        F.col("t_ref") > 0,
        F.greatest(F.col("n_ref") / F.col("t_ref"), F.lit(float(min_prop))),
    )
    p_cur = F.when(
        F.col("t_cur") > 0,
        F.greatest(F.col("n_cur") / F.col("t_cur"), F.lit(float(min_prop))),
    )
    contrib = F.round((p_cur - p_ref) * F.log(p_cur / p_ref), 6) + F.lit(0.0)
    return j.select(*bys, "bin", "n_ref", "n_cur", contrib.alias("psi6"))
