"""Relational operator surface (SURVEY.md §2.1–2.6) as DataFrame helpers.

Each helper is declarative — it builds a DataFrame plan and lets Catalyst
pick the physical strategy.  Pig's physical knobs become hints:
USING 'replicated' → broadcast(); USING 'skewed' → AQE skew join (on by
default in session.py); USING 'merge' → sort-merge join (Catalyst's
default for large equi-joins).
"""

from pigout_spark.operators.joins import join, cross, semi_join, anti_join
from pigout_spark.operators.grouping import group_bag, cogroup, group_agg
from pigout_spark.operators.sorting import order_by, limit, rank, dense_rank, row_rank
from pigout_spark.operators.sets import union, union_onschema
from pigout_spark.operators.relational import (
    foreach,
    filter_by,
    split,
    sample,
    assert_by,
    stream_through,
    flatten,
)

__all__ = [
    "join",
    "cross",
    "semi_join",
    "anti_join",
    "group_bag",
    "cogroup",
    "group_agg",
    "order_by",
    "limit",
    "rank",
    "dense_rank",
    "row_rank",
    "union",
    "union_onschema",
    "foreach",
    "filter_by",
    "split",
    "sample",
    "assert_by",
    "stream_through",
    "flatten",
]
