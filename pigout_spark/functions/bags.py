"""Pig bag/tuple/map builtins (SURVEY.md §2.7 "Bag/tuple/map").

Pig's inner bag is a multiset-of-tuples field value; the Spark-native
shape is array<struct> (SURVEY.md §1.1).  These helpers cover the
constructor/inspection builtins; the *relational* bag semantics
(GROUP→bag, nested FOREACH) live in operators/grouping.py.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _col(c: Column | str) -> Column:
    return F.col(c) if isinstance(c, str) else c


def TO_BAG(*cols: Column | str) -> Column:
    """Pig TOBAG(a, b, ...) → bag of 1-field tuples → array."""
    return F.array(*[_col(c) for c in cols])


def TO_TUPLE(*cols: Column | str) -> Column:
    return F.struct(*[_col(c) for c in cols])


def TO_MAP(*cols: Column | str) -> Column:
    """Pig TOMAP(k1, v1, k2, v2, ...) → map."""
    return F.create_map(*[_col(c) for c in cols])


def SIZE(c: Column | str) -> Column:
    """Pig SIZE: element count for bag/tuple/map, char count for chararray.
    Spark size() handles array/map; length() handles string — dispatch at
    call site is unavoidable without the input schema, so accept either
    and use try_element_at-style: caller picks SIZE for collections.
    """
    return F.size(_col(c)).cast("long")


def STRSIZE(c: Column | str) -> Column:
    return F.length(_col(c)).cast("long")


def IS_EMPTY(c: Column | str) -> Column:
    return F.size(_col(c)) == 0


def BAG_TO_STRING(c: Column | str, delim: str = "_") -> Column:
    return F.array_join(_col(c), delim)


def SUBTRACT(a: Column | str, b: Column | str) -> Column:
    """Pig SUBTRACT(bag1, bag2): elements of bag1 not in bag2 (dedupes —
    Pig's implementation materializes a HashSet), like array_except."""
    return F.array_except(_col(a), _col(b))


def DIFF(a: Column | str, b: Column | str) -> Column:
    """Pig DIFF: symmetric difference of two bags."""
    return F.array_union(F.array_except(_col(a), _col(b)), F.array_except(_col(b), _col(a)))


def TOP(n: int, field: str, bag: Column | str) -> Column:
    """Pig TOP(n, column, bag): the n tuples with the largest values of
    ``field`` — array_sort descending by the field, then slice.  (Pig
    uses a priority queue per group; semantics identical, order of the
    result bag unspecified in Pig — here it is descending.)"""
    srt = F.array_sort(
        _col(bag),
        lambda a, b: F.when(a[field] < b[field], 1)
        .when(a[field] > b[field], -1)
        .otherwise(0),
    )
    return F.slice(srt, 1, n)


def KEYSET(c: Column | str) -> Column:
    return F.map_keys(_col(c))


def VALUELIST(c: Column | str) -> Column:
    return F.map_values(_col(c))


def VALUESET(c: Column | str) -> Column:
    return F.array_distinct(F.map_values(_col(c)))


def PLUCK(df, prefix: str, keep: list[str] | None = None):
    """Pig PluckTuple(prefix): project the columns whose names start
    with ``prefix`` (the join-disambiguation idiom), plus any ``keep``
    columns verbatim."""
    cols = list(keep or []) + [c for c in df.columns if c.startswith(prefix)]
    return df.select(*cols)
