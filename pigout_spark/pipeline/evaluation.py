"""Model evaluation at corpus scale: exact ROC-AUC, calibration bins,
decile uplift (Qini) — the readouts between feature prep
(pipeline/features.py) and experiment analysis (behavioral ab_lift /
cuped_lift / bh_fdr).

Beyond-reference family (Apache Pig has no evaluation builtins); every
op is rank/bin arithmetic over one exchange — no sklearn-style
collect-and-compute, the corpus never leaves the cluster.

Determinism (oracle-hash discipline): ranks and counts are exact
integers (doubled average ranks — the spearman_corr recipe), moments
sum as DECIMAL(38,0), final statistics are one IEEE chain ROUND-6.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from pigout_spark.operators.sorting import row_rank


def roc_auc(
    df: DataFrame,
    label_col: str,
    score_col: str,
) -> DataFrame:
    """Exact ROC-AUC from the rank-sum identity,

        AUC = (R₊ − n₊(n₊+1)/2) / (n₊ · n₋)

    with R₊ the positives' sum of AVERAGE ranks over the combined score
    order — ties contribute the ½ credit the trapezoidal ROC gives
    them, exactly (this is the Mann–Whitney U normalized; no curve
    materialization, no threshold sweep, no approximation).
    ``label_col`` must be boolean; NULL label or score rows are
    EXCLUDED.  Either class empty reads NULL auc.

    Output: ONE row (n_pos, n_neg, auc6).

    100 TB: NO keyless data-sized window.  Ranks come from
    :func:`~pigout_spark.operators.sorting.row_rank`'s two-pass counter
    (range-partitioned sort + per-partition offsets — the same plan
    percentile_rank and rank_by ride), and the tie credit is a window
    partitioned BY THE SCORE VALUE — an ordinary hash exchange whose
    groups are tied-score runs: SQL rank = MIN(row_number) within the
    score group, doubled average rank = 2·rank + cnt − 1.  A 10B-row
    eval set never passes through a single partition.
    """
    y, s = F.col(label_col), F.col(score_col)
    d = df.filter(y.isNotNull() & s.isNotNull()).select(
        y.cast("boolean").alias("__y"), s.alias("__s")
    )
    rr = row_rank(d, "__s", out="__rn")
    wt = Window.partitionBy("__s")
    r = rr.select(
        "__y",
        (2 * F.min("__rn").over(wt) + F.count(F.lit(1)).over(wt) - 1)
        .cast("bigint")
        .alias("__r2"),
    )
    dec = "decimal(38,0)"
    agg = r.agg(
        F.sum(F.when(F.col("__y"), 1).otherwise(0)).cast("bigint").alias(
            "n_pos"
        ),
        F.sum(F.when(F.col("__y"), 0).otherwise(1)).cast("bigint").alias(
            "n_neg"
        ),
        F.sum(F.when(F.col("__y"), F.col("__r2")).otherwise(0).cast(dec))
        .cast("double")
        .alias("__sr2"),
    )
    np, nn = F.col("n_pos").cast("double"), F.col("n_neg").cast("double")
    auc = F.when(
        (F.col("n_pos") > 0) & (F.col("n_neg") > 0),
        F.round(
            (F.col("__sr2") / 2.0 - np * (np + 1.0) / 2.0) / (np * nn), 6
        )
        + F.lit(0.0),
    )
    return agg.select("n_pos", "n_neg", auc.alias("auc6"))


def calibration_bins(
    df: DataFrame,
    score_col: str,
    label_col: str,
    bins: int = 10,
) -> DataFrame:
    """Reliability diagram data: clamp scores (∈ [0, 1]) into ``bins``
    equal-width bins and report, per bin, the mean predicted
    probability vs the observed positive rate — the calibration readout
    ("when the model says 0.8, does it happen 80% of the time"), plus
    the signed gap.  Out-of-range scores fail LOUDLY (assert on the
    scan — a probability outside [0, 1] is an upstream bug, not a
    bin); NULL score or label rows are EXCLUDED.

    Determinism: bin ids are exact integer arithmetic (score 1.0 lands
    in the top bin via the clamp); counts exact; mean_pred sums scores
    as DECIMAL(26,16) (exact for dyadic/decimal-quantized scores — the
    md5-uniform and rounded-probability cases; arbitrary full-precision
    doubles stay correct, just not bit-guaranteed at extreme n) and
    divides once; everything ROUND-6 (+0.0).

    Output: (bin, n, n_pos, mean_pred6, obs_rate6, gap6).

    100 TB: one narrow bin map + one map-side-combined groupBy to a
    bins-sized relation.  No window, no join.
    """
    if int(bins) < 1:
        raise ValueError(f"bins must be >= 1, got {bins}")
    s, y = F.col(score_col), F.col(label_col)
    d = df.filter(s.isNotNull() & y.isNotNull()).filter(
        F.assert_true(
            s.between(0.0, 1.0),
            F.lit(
                f"calibration_bins: {score_col} must lie in [0, 1] — "
                "scores are probabilities here"
            ),
        ).isNull()
    )
    b = F.least(
        F.lit(int(bins) - 1),
        F.floor(s * int(bins)).cast("int"),
    ).cast("bigint")
    g = (
        d.select(b.alias("bin"), s.alias("__s"), y.cast("boolean").alias("__y"))
        .groupBy("bin")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.when(F.col("__y"), 1).otherwise(0))
            .cast("bigint")
            .alias("n_pos"),
            F.sum(F.col("__s").cast("decimal(26,16)"))
            .cast("double")
            .alias("__ss"),
        )
    )
    mean_pred = F.round(F.col("__ss") / F.col("n").cast("double"), 6) + F.lit(
        0.0
    )
    obs = F.round(
        F.col("n_pos").cast("double") / F.col("n").cast("double"), 6
    ) + F.lit(0.0)
    return g.select(
        "bin",
        "n",
        "n_pos",
        mean_pred.alias("mean_pred6"),
        obs.alias("obs_rate6"),
        (F.round(obs - mean_pred, 6) + F.lit(0.0)).alias("gap6"),
    )


def uplift_deciles(
    df: DataFrame,
    treated_col: str,
    outcome_col: str,
    score_col: str,
    tiebreak_cols: list[str] | None = None,
    n_buckets: int = 10,
) -> DataFrame:
    """Qini/uplift readout by score decile: order the population by
    uplift score (best first), cut into ``n_buckets`` equal-count
    buckets, and report per CUMULATIVE prefix the treated/control
    response rates and the Qini value

        qini(k) = Y₊ᵗ(k) − Y₊ᶜ(k) · Nᵗ(k)/Nᶜ(k)

    (incremental conversions among the top-k, the curve whose area is
    AUUC) — the standard targeting readout for an uplift model.

    Determinism: bucket = ceil(B·row_number/n) over (score DESC,
    ``tiebreak_cols``) — tie-broken EXPLICITLY; score ties without a
    tiebreak would make bucket boundaries row-order dependent, so
    tiebreak_cols is REQUIRED unless scores are guaranteed distinct
    (pass [] consciously for that contract).  ``treated_col`` and
    ``outcome_col`` boolean; NULL treated/outcome/score rows EXCLUDED.
    Empty control prefix reads NULL qini for that prefix.

    Output: (bucket, n, n_t, n_c, y_t, y_c, rate_t6, rate_c6, qini6) —
    all columns CUMULATIVE through the bucket.

    100 TB: NO keyless data-sized window — row numbers come from
    :func:`~pigout_spark.operators.sorting.row_rank`'s two-pass counter
    (range-partitioned sort, per-partition offsets), the population
    total is a 1-row aggregate broadcast back (not a count window over
    every row), then one bucket groupBy and one running-sum window over
    the B-sized bucket relation.
    """
    if tiebreak_cols is None:
        raise ValueError(
            "uplift_deciles: pass tiebreak_cols (unique id columns) — "
            "or [] to assert scores are distinct"
        )
    if int(n_buckets) < 1:
        raise ValueError(f"n_buckets must be >= 1, got {n_buckets}")
    t, y, s = F.col(treated_col), F.col(outcome_col), F.col(score_col)
    d = df.filter(t.isNotNull() & y.isNotNull() & s.isNotNull()).select(
        t.cast("boolean").alias("__t"),
        y.cast("boolean").alias("__y"),
        s.alias("__s"),
        *tiebreak_cols,
    )
    order = [F.col("__s").desc()] + [F.col(c).asc() for c in tiebreak_cols]
    total = d.agg(F.count(F.lit(1)).cast("bigint").alias("__n"))
    ranked = row_rank(d, *order, out="__rn").crossJoin(F.broadcast(total))
    bucket = F.ceil(
        F.lit(int(n_buckets)) * F.col("__rn") / F.col("__n")
    ).cast("bigint")
    per = (
        ranked.select(bucket.alias("bucket"), "__t", "__y")
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("__bn"),
            F.sum(F.when(F.col("__t"), 1).otherwise(0))
            .cast("bigint")
            .alias("__bnt"),
            F.sum(F.when(F.col("__t") & F.col("__y"), 1).otherwise(0))
            .cast("bigint")
            .alias("__byt"),
            F.sum(F.when(~F.col("__t") & F.col("__y"), 1).otherwise(0))
            .cast("bigint")
            .alias("__byc"),
        )
    )
    wc = Window.orderBy("bucket").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cum = per.select(
        "bucket",
        F.sum("__bn").over(wc).cast("bigint").alias("n"),
        F.sum("__bnt").over(wc).cast("bigint").alias("n_t"),
        (F.sum("__bn").over(wc) - F.sum("__bnt").over(wc))
        .cast("bigint")
        .alias("n_c"),
        F.sum("__byt").over(wc).cast("bigint").alias("y_t"),
        F.sum("__byc").over(wc).cast("bigint").alias("y_c"),
    )
    rt = F.when(
        F.col("n_t") > 0,
        F.round(F.col("y_t").cast("double") / F.col("n_t"), 6) + F.lit(0.0),
    )
    rc = F.when(
        F.col("n_c") > 0,
        F.round(F.col("y_c").cast("double") / F.col("n_c"), 6) + F.lit(0.0),
    )
    qini = F.when(
        F.col("n_c") > 0,
        F.round(
            F.col("y_t").cast("double")
            - F.col("y_c").cast("double")
            * F.col("n_t").cast("double")
            / F.col("n_c").cast("double"),
            6,
        )
        + F.lit(0.0),
    )
    return cum.select(
        "bucket", "n", "n_t", "n_c", "y_t", "y_c",
        rt.alias("rate_t6"), rc.alias("rate_c6"), qini.alias("qini6"),
    )


def rank_metrics(
    df: DataFrame,
    query_col: str,
    rank_col: str,
    rel_col: str,
    k: int = 10,
) -> DataFrame:
    """Per-query ranked-retrieval metrics over a (query, rank,
    relevance) relation — the readout for the BM25 / ANN top-k
    families:

        NDCG@k = Σ_{i≤k} (2^rel_i − 1)/log₂(i+1)  /  IDCG@k
        MRR@k  = 1/rank of the first rel > 0 hit (0 if none in top-k)
        P@k    = |rel > 0 in top-k| / k

    ``rank_col`` must already be the 1-based rank (the shape
    sim_*_topk / bm25_topk emit); duplicate ranks within a query fail
    LOUDLY (the autocorr malformed-grid discipline — a ranking with
    ties at the same position is not a ranking).  Relevance grades are
    small non-negative INTEGERS (asserted ≤ 16: 2^rel must stay exact
    and IEEE-safe).  IDCG sorts the query's own grades descending —
    queries with no positive grade read NDCG/MRR 0 (not NULL: "found
    nothing relevant" is a score).  Ranks beyond k are ignored.

    Determinism: gains are exact integers; each discount is one IEEE
    log₂ chain; per-query sums are ≤k terms ROUND-6-summed via
    DECIMAL(20,6) (the vocab_kl ln discipline); final ratios ROUND-6.

    Output: (query, n_ranked, ndcg6, mrr6, p_at_k6).

    100 TB: ONE exchange on the query key — the duplicate-rank guard,
    the ≤k filter, and the per-query aggregation share it; per-query
    state is ≤k rows by construction.
    """
    if int(k) < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    q, r, rel = F.col(query_col), F.col(rank_col), F.col(rel_col)
    d = df.select(q.alias("__q"), r.alias("__r"), rel.alias("__rel")).filter(
        F.assert_true(
            F.col("__r").isNotNull() & (F.col("__r") >= 1),
            F.lit("rank_metrics: ranks must be 1-based and non-NULL"),
        ).isNull()
    ).filter(
        F.assert_true(
            F.col("__rel").isNotNull()
            & (F.col("__rel") == F.floor("__rel"))
            & F.col("__rel").between(0, 16),
            F.lit(
                "rank_metrics: relevance grades must be integers in "
                "[0, 16] (2^rel exactness bound)"
            ),
        ).isNull()
    )
    d = d.repartition("__q")
    dup = Window.partitionBy("__q", "__r")
    d = d.withColumn("__dup", F.count(F.lit(1)).over(dup)).filter(
        F.assert_true(
            F.col("__dup") == 1,
            F.lit(
                "rank_metrics: duplicate rank within a query — ties at "
                "one position are not a ranking"
            ),
        ).isNull()
    )
    topk = d.filter(F.col("__r") <= int(k))
    gain = F.pow(F.lit(2.0), F.col("__rel").cast("double")) - 1.0
    disc = F.log2(F.col("__r").cast("double") + 1.0)
    dcg_term = F.round(gain / disc, 6).cast("decimal(20,6)")
    # ideal ordering: grades descending get positions 1..n (row_number
    # over the SAME query partitioning — no new exchange)
    wi = Window.partitionBy("__q").orderBy(F.col("__rel").desc())
    ideal_pos = F.row_number().over(wi)
    idcg_term = F.round(
        gain / F.log2(ideal_pos.cast("double") + 1.0), 6
    ).cast("decimal(20,6)")
    s = (
        topk.withColumn("__dcg_t", dcg_term)
        .withColumn("__idcg_t", idcg_term)
        .groupBy("__q")
        .agg(
            F.count(F.lit(1)).alias("n_ranked"),
            F.sum("__dcg_t").cast("double").alias("__dcg"),
            F.sum("__idcg_t").cast("double").alias("__idcg"),
            F.min(F.when(F.col("__rel") > 0, F.col("__r"))).alias("__fr"),
            F.sum(F.when(F.col("__rel") > 0, 1).otherwise(0)).alias("__nrel"),
        )
    )
    ndcg = F.when(
        F.col("__idcg") > 0,
        F.round(F.col("__dcg") / F.col("__idcg"), 6) + F.lit(0.0),
    ).otherwise(F.lit(0.0))
    mrr = F.when(
        F.col("__fr").isNotNull(),
        F.round(F.lit(1.0) / F.col("__fr").cast("double"), 6) + F.lit(0.0),
    ).otherwise(F.lit(0.0))
    patk = F.round(F.col("__nrel").cast("double") / F.lit(float(k)), 6) + F.lit(
        0.0
    )
    return s.select(
        F.col("__q").alias(query_col),
        "n_ranked",
        ndcg.alias("ndcg6"),
        mrr.alias("mrr6"),
        patk.alias("p_at_k6"),
    )
