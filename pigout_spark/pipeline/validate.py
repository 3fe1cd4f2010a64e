"""Declarative data-validation checks — the load-gate every production
pipeline runs before trusting a snapshot: row-level rules, key
uniqueness, and referential integrity, each reduced to a small report
relation (or a loud failure in ``strict`` mode).

Spark-first: every row-level rule compiles into ONE conditional
aggregation over a single scan (no per-rule passes); uniqueness is one
map-side-combined groupBy; referential integrity is one anti-join
(AQE-broadcastable when the parent key set is small).  All counts are
exact integers — trivially oracle-replayable.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def check_rules(
    df: DataFrame,
    rules: dict[str, Column],
    strict: bool = False,
) -> DataFrame:
    """Row-level rule report: for each named boolean rule, how many
    rows violate it.  A rule evaluating to NULL counts as a VIOLATION
    (NULL-in-a-predicate means "could not establish the property" —
    the safe reading for a gate; wrap with ``coalesce`` to opt out).

    Output: one row per rule — (rule, n_rows, n_violations, pass).
    ``strict=True`` additionally makes ANY violation raise at action
    time (a distributed assert_true riding the same scan — the
    pagerank guard mechanism), so a bad batch can never be written.

    100 TB: all rules fold into ONE conditional aggregation over one
    scan; the report is rules-sized.
    """
    if not rules:
        raise ValueError("check_rules needs at least one rule")
    base = df
    if strict:
        for name, cond in rules.items():
            base = base.filter(
                F.assert_true(
                    F.coalesce(cond, F.lit(False)),
                    F.lit(f"check_rules: rule '{name}' violated"),
                ).isNull()
            )
    aggs = [F.count(F.lit(1)).alias("n_rows")] + [
        F.sum(
            F.when(F.coalesce(cond, F.lit(False)), 0).otherwise(1)
        ).cast("bigint").alias(f"__v_{i}")
        for i, cond in enumerate(rules.values())
    ]
    s = base.agg(*aggs)
    # stack the report by exploding one array of structs — a union of
    # per-rule selects would plan N copies of the aggregation (N data
    # scans); this keeps it at one
    entries = [
        F.struct(
            F.lit(name).alias("rule"),
            F.col("n_rows").alias("n_rows"),
            F.col(f"__v_{i}").alias("n_violations"),
            (F.col(f"__v_{i}") == 0).alias("pass"),
        )
        for i, name in enumerate(rules)
    ]
    return s.select(F.explode(F.array(*entries)).alias("__r")).select("__r.*")


def check_unique(df: DataFrame, key_cols: list[str]) -> DataFrame:
    """Key-uniqueness report: every key tuple appearing more than once,
    with its multiplicity — empty output means the key is unique.
    NULL key components group together (two all-NULL keys ARE a
    duplicate for gate purposes — surface them, don't hide them).

    Output: (*key_cols, cnt) for cnt > 1, deterministic content.

    100 TB: one map-side-combined groupBy; the HAVING keeps the
    output duplicate-sized."""
    if not key_cols:
        raise ValueError("check_unique needs at least one key column")
    return (
        df.groupBy(*key_cols)
        .agg(F.count(F.lit(1)).alias("cnt"))
        .filter(F.col("cnt") > 1)
    )


def check_ref_integrity(
    child: DataFrame,
    parent: DataFrame,
    keys: list[str] | dict[str, str],
) -> DataFrame:
    """Referential-integrity report: child rows whose foreign key has
    no parent — grouped to one row per orphaned key value with its row
    count.  ``keys`` maps child columns to parent columns (a plain
    list means same names).  Child rows with a NULL foreign key are
    EXCLUDED (SQL FK semantics: NULL references nothing and violates
    nothing; gate NULLs via :func:`check_rules` if they are illegal).

    Output: (*child_keys, n_rows) for orphans only — empty means
    integrity holds.

    100 TB: one left-anti join on the key (broadcast when the parent
    key set is dimension-sized — the common case) + one small groupBy.
    """
    kmap = {k: k for k in keys} if not isinstance(keys, dict) else dict(keys)
    if not kmap:
        raise ValueError("check_ref_integrity needs at least one key")
    ck = list(kmap)
    p = parent.select(
        *[F.col(pc).alias(cc) for cc, pc in kmap.items()]
    ).distinct()
    nn = child
    for c in ck:
        nn = nn.filter(F.col(c).isNotNull())
    return (
        nn.join(p, ck, "left_anti")
        .groupBy(*ck)
        .agg(F.count(F.lit(1)).alias("n_rows"))
    )


#: Benford expected first-digit probabilities log10(1 + 1/d), d = 1..9,
#: as PYTHON-computed literals embedded identically in both engines'
#: plans (the LSH-hyperplane literal precedent) — never engine log10,
#: whose last-ulp differences near exact powers of ten would make the
#: digit law itself engine-dependent
BENFORD_P = [0.3010299956639812, 0.17609125905568124, 0.12493873660829993,
             0.09691001300805642, 0.07918124604762482, 0.06694678963061322,
             0.05799194697768673, 0.05115252244738129, 0.04575749056067514]


def benford_test(df, value_col: str, keys: list[str] | None = None):
    """Benford first-digit conformance per key — the forensic
    data-quality screen (fabricated or unit-mixed amount columns break
    the log-digit law long before summary stats notice): the chi-square
    statistic of the observed first-significant-digit distribution
    against log10(1 + 1/d).

    The input must be INTEGER-VALUED and ≥ 1 (amounts in cents, counts
    — the trend_fit integerized contract, asserted on the scan):
    digits come from the DECIMAL STRING of the bigint — no float log10
    anywhere, so an exact power of ten can never flip its digit on an
    engine's last-ulp log.  NULL and non-positive rows are EXCLUDED
    (Benford's domain is positive magnitudes); fractional values fail
    LOUDLY.

    Determinism: digit counts are exact integers; each digit's
    (n_d − n·p_d)²/(n·p_d) term is one IEEE chain over a Python-literal
    p_d, ROUND-6, decimal-summed across the 9 digits (the vocab_kl
    discipline); readout ROUND-6.  Compare to χ²(8) downstream (no CDF
    builtin — the kruskal_wallis contract).

    Output: one row per key — (*keys, n, chi2_6); ONE row total when
    ``keys`` is empty.

    100 TB: ONE map-side-combined exchange on the keys (9 conditional
    counts); the chi-square is a 9-literal readout fold.
    """
    from pyspark.sql import functions as F

    from pigout_spark.pipeline.behavioral import _check_keys

    keys = list(keys or [])
    _check_keys(keys, ("n", "chi2_6"), "benford_test")
    v = F.col(value_col)
    d = df.filter(v.isNotNull() & (v >= 1)).filter(
        F.assert_true(
            v == F.floor(v),
            F.lit(
                "benford_test: values must be integral (cents, counts) "
                "— integerize upstream"
            ),
        ).isNull()
    )
    digit = F.substring(v.cast("bigint").cast("string"), 1, 1).cast("int")
    cells = d.select(*keys, digit.alias("__d"))
    agg = cells.groupBy(*keys).agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        *[
            F.sum(F.when(F.col("__d") == dd, 1).otherwise(0))
            .cast("bigint")
            .alias(f"__n{dd}")
            for dd in range(1, 10)
        ],
    )
    nn = F.col("n").cast("double")
    terms = []
    for dd in range(1, 10):
        p = BENFORD_P[dd - 1]
        obs = F.col(f"__n{dd}").cast("double")
        terms.append(
            (
                F.round(
                    (obs - nn * p) * (obs - nn * p) / (nn * p), 6
                )
                + F.lit(0.0)
            ).cast("decimal(20,6)")
        )
    chi2 = F.round(
        sum(terms[1:], terms[0]).cast("double"), 6
    ) + F.lit(0.0)
    return agg.select(*keys, "n", chi2.alias("chi2_6"))
