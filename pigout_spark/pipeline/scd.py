"""Type-2 slowly-changing-dimension (SCD2) history building — the
warehouse-side temporal op: turn a change log into validity intervals
and reconstruct point-in-time snapshots.

Spark-first: change detection is one lag() pass on the key
partitioning, interval closure one lead() pass on the SAME
partitioning — a single key exchange end-to-end, no self-joins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def scd2_build(
    df: DataFrame,
    key: str = "id",
    ts_col: str = "ts",
    attrs: list[str] | None = None,
    tiebreak: str | None = None,
) -> DataFrame:
    """Collapse a per-key change log into SCD2 validity intervals:
    one row per maximal run of consecutive identical attribute tuples,
    with ``[valid_from, valid_to)`` half-open bounds (``valid_to``
    NULL on the current row, ``is_current`` flagging it).

    Change detection is NULL-safe per attribute tuple (a NULL→value
    transition is a change; NULL==NULL is not).  Events order by
    (ts, ``tiebreak``); pass a tiebreak column when timestamps can
    tie — same-instant changes produce zero-length intervals in
    deterministic tiebreak order, preserving the full audit trail.

    Output: (key, *attrs, valid_from, valid_to, is_current).

    100 TB: ONE key exchange serves both window passes (lag for change
    detection, lead for interval closure — same partitioning, same
    sort).  No join, no collect; per-key state is the window sort.
    """
    attrs = attrs or [c for c in df.columns if c not in (key, ts_col)]
    if not attrs:
        raise ValueError("scd2_build needs at least one attribute column")
    order = [F.col(ts_col)] + ([F.col(tiebreak)] if tiebreak else [])
    w = Window.partitionBy(key).orderBy(*order)
    cur = F.struct(*[F.col(a) for a in attrs])
    prev = F.lag(cur).over(w)
    changed = prev.isNull() | ~cur.eqNullSafe(prev)
    starts = df.withColumn("__chg", changed).filter(F.col("__chg"))
    w2 = Window.partitionBy(key).orderBy(*order)
    return (
        starts.withColumn("__vto", F.lead(F.col(ts_col)).over(w2))
        .select(
            F.col(key),
            *[F.col(a) for a in attrs],
            F.col(ts_col).alias("valid_from"),
            F.col("__vto").alias("valid_to"),
            F.col("__vto").isNull().alias("is_current"),
        )
    )


def scd2_snapshot(history: DataFrame, at_ts, ts_fmt: bool = True) -> DataFrame:
    """Point-in-time state from an SCD2 history: rows whose interval
    covers ``at_ts`` (``valid_from <= at < valid_to``, open current
    rows included).  A narrow filter — parquet min/max stats prune
    history files whose interval range misses the snapshot time when
    the history is stored sorted by validity."""
    at = F.lit(at_ts).cast("timestamp_ntz") if ts_fmt else F.lit(at_ts)
    return history.filter(
        (F.col("valid_from") <= at)
        & (F.col("valid_to").isNull() | (at < F.col("valid_to")))
    ).drop("is_current")


def compact_changelog(
    changes: DataFrame,
    key_cols: list[str],
    ts_col: str = "ts",
    op_col: str = "op",
    seq_col: str | None = None,
) -> DataFrame:
    """Collapse a CDC change log to its LATEST entry per key — the
    universal pre-merge step (Debezium-style I/U/D streams, warehouse
    staging tables).  One row per key survives: max (ts, seq).

    Determinism: events order by (``ts_col``, ``seq_col``) descending.
    When ``seq_col`` is None, duplicate (key, ts) pairs would make the
    winner partition-order-dependent, so the op FAILS LOUDLY on them
    (a distributed assert_true riding the same window partitioning —
    no extra pass) instead of silently picking one.  Pass the log
    sequence number / offset column when same-instant changes are
    legal.

    Output: the change schema unchanged, one row per key.

    100 TB: ONE exchange onto the key columns; row_number + the
    duplicate guard share it.  No join, no collect.
    """
    if not key_cols:
        raise ValueError("compact_changelog needs at least one key column")
    order = [F.col(ts_col).desc()] + (
        [F.col(seq_col).desc()] if seq_col else []
    )
    w = Window.partitionBy(*key_cols).orderBy(*order)
    out = changes.withColumn("__rn", F.row_number().over(w))
    if seq_col is None:
        # ambiguity matters only where it decides the WINNER: evaluate
        # the duplicate-(key, ts) guard on the rn=1 row alone, so
        # historical same-instant entries that a later change already
        # superseded compact fine (r8 self-review — the first guard
        # aborted on ANY duplicate ts)
        dup = F.count(F.lit(1)).over(
            Window.partitionBy(*key_cols, ts_col)
        )
        out = out.withColumn("__dup", dup)
        out = out.filter(F.col("__rn") == 1).filter(
            F.assert_true(
                F.col("__dup") == 1,
                F.lit(
                    "compact_changelog: duplicate (key, ts) rows at the "
                    "winning timestamp — pass seq_col to define the "
                    "winner deterministically"
                ),
            ).isNull()
        )
        return out.drop("__rn", "__dup")
    return out.filter(F.col("__rn") == 1).drop("__rn")


def apply_cdc(
    base: DataFrame,
    changes: DataFrame,
    key_cols: list[str],
    ts_col: str = "ts",
    op_col: str = "op",
    seq_col: str | None = None,
    delete_op: str = "D",
) -> DataFrame:
    """Apply a CDC change log to a base snapshot (the batch MERGE:
    upsert + delete), producing the next snapshot.

    Contract: ``changes`` carries the base schema plus ``op_col``,
    ``ts_col`` (and optionally ``seq_col``).  The log is first
    compacted to its latest entry per key (:func:`compact_changelog`
    — same determinism contract); then keys whose final op is
    ``delete_op`` vanish, every other touched key takes its newest
    payload, and untouched base rows pass through.  Op values other
    than ``delete_op`` are all upserts (insert-or-replace) — I vs U
    need not be distinguished for snapshot semantics.

    Output: exactly the base schema.

    100 TB: the change log shuffles once onto the key; the base is
    touched by ONE left-anti join on the same key (AQE broadcasts the
    compacted key set when the log is small — the common case, a
    day's changes against years of snapshot; for co-partitioned
    bucketed tables the anti-join is zero-shuffle).  No base rewrite
    beyond the touched keys' rows; no driver-side state.
    """
    extra = {op_col, ts_col} | ({seq_col} if seq_col else set())
    missing = [c for c in list(base.columns) + sorted(extra)
               if c not in changes.columns]
    if missing:
        raise ValueError(f"apply_cdc: changes missing columns {missing}")
    # a NULL op is a malformed record, not a delete: `op <> delete_op`
    # is NULL for NULL op, which silently dropped the row from
    # survivors while its key was still anti-joined out of base —
    # destroying data (r8 self-review).  Fail loudly on the scan.
    changes = changes.filter(
        F.assert_true(
            F.col(op_col).isNotNull(),
            F.lit(
                f"apply_cdc: NULL {op_col} in change log — malformed "
                "CDC record (neither upsert nor delete)"
            ),
        ).isNull()
    )
    latest = compact_changelog(
        changes, key_cols, ts_col=ts_col, op_col=op_col, seq_col=seq_col
    )
    survivors = latest.filter(F.col(op_col) != F.lit(delete_op)).select(
        *base.columns
    )
    untouched = base.join(
        latest.select(*key_cols), key_cols, "left_anti"
    )
    return untouched.unionByName(survivors)


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    key_cols: list[str],
    compare_cols: list[str] | None = None,
) -> DataFrame:
    """Keyed diff of two snapshots — the pipeline-regression primitive
    ("what did the new code change"): every key classified as
    ``added`` / ``removed`` / ``changed`` (unchanged rows are NOT
    emitted — at 100 TB the interesting output is the delta), with the
    exact list of differing columns.

    Comparison is NULL-safe per column (NULL==NULL is not a change, a
    NULL↔value transition is — the scd2_build discipline).
    ``compare_cols`` defaults to every shared non-key column; columns
    existing in only one snapshot are ignored (schema drift is a
    different check — compare schemas directly).

    Output: (*key_cols, diff — 'added'|'removed'|'changed',
    changed_cols — array<string>, NULL except for 'changed').

    100 TB: ONE full-outer key-equi join; the per-column comparisons
    are narrow expressions on the joined row.  Duplicate keys on
    either side make the diff ill-defined — gate with
    validate.check_unique first.
    """
    if not key_cols:
        raise ValueError("snapshot_diff needs at least one key column")
    if compare_cols is None:
        compare_cols = [
            c
            for c in old.columns
            if c not in key_cols and c in new.columns
        ]
    o = old.select(
        *key_cols,
        F.lit(True).alias("__in_old"),
        *[F.col(c).alias(f"__o_{c}") for c in compare_cols],
    )
    n = new.select(
        *key_cols,
        F.lit(True).alias("__in_new"),
        *[F.col(c).alias(f"__n_{c}") for c in compare_cols],
    )
    j = o.join(n, key_cols, "full_outer")
    changed_arr = F.array_compact(
        F.array(
            *[
                F.when(
                    ~F.col(f"__o_{c}").eqNullSafe(F.col(f"__n_{c}")),
                    F.lit(c),
                )
                for c in compare_cols
            ]
        )
    ) if compare_cols else F.array().cast("array<string>")
    diff = (
        F.when(F.col("__in_old").isNull(), F.lit("added"))
        .when(F.col("__in_new").isNull(), F.lit("removed"))
        .when(F.size(changed_arr) > 0, F.lit("changed"))
    )
    return (
        j.withColumn("diff", diff)
        .filter(F.col("diff").isNotNull())
        .withColumn(
            "changed_cols",
            F.when(F.col("diff") == "changed", changed_arr),
        )
        .select(*key_cols, "diff", "changed_cols")
    )
