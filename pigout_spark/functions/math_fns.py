"""Pig math builtins (SURVEY.md §2.7 "Math").

Every Pig math builtin (ABS CEIL FLOOR ROUND EXP LOG LOG10 SQRT CBRT
COPYSIGN trig/hyperbolic, RANDOM) maps 1:1 to the lower-cased
pyspark.sql.functions name, so no wrappers are needed for those — use
``F.abs``, ``F.ceil``, ...  The two that differ are here.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def ROUND_TO(c: Column | str, digits: int) -> Column:
    """Pig ROUND_TO(x, d) → round(x, d).  (Pig ROUND with no digits rounds
    half-up to long; Spark round is half-up too — identical.)"""
    col = F.col(c) if isinstance(c, str) else c
    return F.round(col, digits)


def RANDOM() -> Column:
    return F.rand()
