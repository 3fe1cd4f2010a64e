"""Pig GROUP / COGROUP / aggregation (SURVEY.md §2.4) and the nested-
FOREACH rewrites (§7 phase 4).

Pig's GROUP *collects* a bag per key; aggregation happens in a later
FOREACH.  Fusing GROUP+FOREACH-agg into ``groupBy().agg()`` is the
fundamental rewrite: it lets Spark partial-aggregate map-side (Pig needed
the Algebraic-interface combiner for that) and never materializes the
bag.  ``group_bag``/``cogroup`` keep literal bag semantics for the rare
scripts that need the bag itself.

At 100 TB: group_agg is one shuffle with map-side combine; group_bag is
one shuffle but moves every row — only use it when the bag is consumed
whole.  Nested FOREACH {ORDER/LIMIT} per group → window row_number, which
shuffles once by the group key (no global sort).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _keys(by) -> list:
    return [by] if isinstance(by, (str, Column)) else list(by)


def group_agg(df: DataFrame, by, aggs: list[Column]) -> DataFrame:
    """Pig `G = GROUP A BY k; R = FOREACH G GENERATE group, agg(A.x);`
    fused.  `by=None` is GROUP ALL (global aggregate, no shuffle of keys).
    """
    if by is None:
        return df.agg(*aggs)
    return df.groupBy(*_keys(by)).agg(*aggs)


def group_bag(df: DataFrame, by, bag_name: str = "bag") -> DataFrame:
    """Literal Pig GROUP: (group, bag of whole tuples).

    collect_list(struct(*)) — the bag is unordered, matching Pig's
    no-order guarantee for bags (SURVEY.md §7-H1).
    """
    keys = _keys(by)
    payload = [c for c in df.columns if c not in {k if isinstance(k, str) else None for k in keys}]
    return df.groupBy(*keys).agg(F.collect_list(F.struct(*payload)).alias(bag_name))


def cogroup(
    dfs: list[DataFrame],
    keys: list[str],
    inner: bool = False,
    bag_names: list[str] | None = None,
) -> DataFrame:
    """Pig n-ary COGROUP: (group, bagA, bagB, ...).

    Per-input groupBy+collect_list, then joined on the key.  INNER drops
    groups with an empty bag on any input → inner join; default keeps all
    groups → full outer with empty-array fill (Pig yields empty bags, not
    nulls).
    """
    if len(dfs) != len(keys):
        raise ValueError("one key column per input")
    names = bag_names or [f"bag_{i}" for i in range(len(dfs))]
    how = "inner" if inner else "full_outer"
    out: DataFrame | None = None
    for i, (df, key, name) in enumerate(zip(dfs, keys, names)):
        payload = [c for c in df.columns if c != key]
        g = df.groupBy(F.col(key).alias("group")).agg(
            F.collect_list(F.struct(*payload)).alias(name)
        )
        out = g if out is None else out.join(g, "group", how)
    assert out is not None
    # Pig: a key absent from one input yields an EMPTY bag, never null.
    for name in names:
        out = out.withColumn(
            name, F.coalesce(F.col(name), F.array().cast(out.schema[name].dataType))
        )
    return out


def nested_topk(
    df: DataFrame,
    by,
    order: list[Column],
    k: int,
    keep_rank: str | None = None,
) -> DataFrame:
    """Pig nested FOREACH { t = ORDER A BY x; t = LIMIT t k; GENERATE ... }
    — per-group top-k without materializing bags: window row_number over
    the group key, filter rank ≤ k.  One shuffle on the group key; never
    a global sort (SURVEY.md §2.2 "Nested FOREACH block").
    """
    rn = keep_rank or "__rn"
    w = Window.partitionBy(*_keys(by)).orderBy(*order)
    out = df.withColumn(rn, F.row_number().over(w)).filter(F.col(rn) <= k)
    return out if keep_rank else out.drop(rn)


def _fill_all_marker(
    df: DataFrame, dims: list[str], aggs: list[Column], mode: str
) -> DataFrame:
    """Pig-compat 'all' filler: rolled-up dimension slots get the string
    'all' (Pig CubeDimensions behavior) instead of Spark's NULL.  Uses
    grouping() flags computed inside the agg, so data NULLs stay NULL
    and only rollup slots become 'all'; dims are cast to string (Pig's
    'all' is a chararray in a dim column)."""
    gcols = [F.grouping(d).alias(f"__g_{i}") for i, d in enumerate(dims)]
    out = getattr(df, mode)(*dims).agg(*gcols, *aggs)
    for i, d in enumerate(dims):
        out = out.withColumn(
            d,
            F.when(F.col(f"__g_{i}") == 1, F.lit("all")).otherwise(
                F.col(d).cast("string")
            ),
        )
    return out.drop(*[f"__g_{i}" for i in range(len(dims))])


def cube_agg(
    df: DataFrame, dims: list[str], aggs: list[Column], all_marker: bool = False
) -> DataFrame:
    """Pig `CUBE A BY CUBE(a,b)` (SURVEY.md §2.4).  Pig fills rolled-up
    dimensions with the string 'all'; Spark uses NULL + grouping().
    Default keeps Spark's NULL convention; ``all_marker=True`` restores
    Pig's 'all' strings for ported scripts (latin.py:
    `SET pigout.cube.all_marker true`)."""
    if all_marker:
        return _fill_all_marker(df, dims, aggs, "cube")
    return df.cube(*dims).agg(*aggs)


def rollup_agg(
    df: DataFrame, dims: list[str], aggs: list[Column], all_marker: bool = False
) -> DataFrame:
    """Pig `CUBE A BY ROLLUP(a,b)` → hierarchical rollup."""
    if all_marker:
        return _fill_all_marker(df, dims, aggs, "rollup")
    return df.rollup(*dims).agg(*aggs)


def pivot_table(
    df: DataFrame,
    keys: list[str],
    pivot_col: str,
    values: list[str],
    aggs: list[Column],
) -> DataFrame:
    """PIVOT: one output column per ``values`` entry (the long→wide
    reshape Pig scripts emulate with nested FOREACH + bincond chains).
    ``values`` must be EXPLICIT — Spark then skips the extra distinct
    pass it would otherwise run to discover them, and the output schema
    is deterministic (the oracle-hash requirement).  Each agg must be
    aliased; with multiple aggs the output columns are ``value_alias``,
    with one they are just ``value``.

    100 TB: identical shuffle profile to the underlying groupBy —
    pivoting adds columns, not exchanges; partial aggregation applies
    per (key, value) cell map-side.
    """
    return df.groupBy(*keys).pivot(pivot_col, values).agg(*aggs)
