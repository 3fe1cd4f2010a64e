"""Pig UNION / UNION ONSCHEMA (SURVEY.md §2.6) + the set ops the
reference lacks (INTERSECT/EXCEPT — idioms in Pig, first-class here).

Pig UNION is bag union: duplicates kept, no order — exactly Spark
unionAll.  No shuffle: union is a metadata-only plan node.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame


def union(*dfs: DataFrame) -> DataFrame:
    """Pig `UNION A, B, ...` — positional, duplicates kept."""
    return reduce(lambda a, b: a.unionAll(b), dfs)


def union_onschema(*dfs: DataFrame) -> DataFrame:
    """Pig `UNION ONSCHEMA` — by column name, null-filling missing."""
    return reduce(lambda a, b: a.unionByName(b, allowMissingColumns=True), dfs)


def intersect(a: DataFrame, b: DataFrame) -> DataFrame:
    """Beyond-reference (Pig idiom: JOIN + DISTINCT)."""
    return a.intersect(b)


def except_all(a: DataFrame, b: DataFrame) -> DataFrame:
    """Beyond-reference (Pig idiom: COGROUP + IsEmpty)."""
    return a.exceptAll(b)
