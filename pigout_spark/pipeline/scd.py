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
