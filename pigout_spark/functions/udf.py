"""UDF surface (SURVEY.md §2.9) — the Pig extension-point family mapped
to Spark's Python UDF machinery.

| Pig mechanism            | here                                      |
| EvalFunc<T>              | eval_func (Arrow-batched pandas_udf)      |
| FilterFunc               | filter_func (boolean pandas_udf)          |
| EvalFunc returning a bag | udtf (array-returning UDF; FLATTEN=explode) |
| Algebraic / Accumulator  | algebraic_agg (GROUPED_AGG pandas_udf —   |
|                          | Spark partial-aggregates it per partition,|
|                          | the combiner story for free)              |
| Jython/JS scripting UDFs | plain Python functions (native here)      |
| DEFINE alias(args)       | functools.partial / closures              |

Everything is Arrow-batched (pandas_udf), never row-at-a-time Python —
the 10-100× difference on the 100 TB path.  Still: prefer built-in
column expressions; UDFs are the escape hatch.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.pandas.functions import pandas_udf


def eval_func(return_type: str) -> Callable:
    """Pig `EvalFunc<T>` — scalar UDF over Arrow batches.

        @eval_func("double")
        def discounted(price: pd.Series, disc: pd.Series) -> pd.Series:
            return price * (1 - disc)
    """
    return pandas_udf(return_type)


def filter_func(fn: Callable) -> Callable:
    """Pig `FilterFunc` — boolean UDF for use in .filter(...)."""
    return pandas_udf("boolean")(fn)


def algebraic_agg(return_type: str) -> Callable:
    """Pig `Algebraic`/`Accumulator` UDAF — GROUPED_AGG pandas_udf.
    Spark evaluates it with partial aggregation per partition (the
    MR-combiner behavior Pig required the Algebraic interface for).

        @algebraic_agg("long")
        def cents_sum(x: pd.Series) -> int:
            return int((x * 100).round().sum())

    (Series → scalar type hints mark it GROUPED_AGG.)
    """
    return pandas_udf(return_type)


def udtf(df: DataFrame, fn_col: Column, alias: str) -> DataFrame:
    """Pig bag-returning EvalFunc + FLATTEN: apply an array-returning
    UDF column and explode — one row per produced element."""
    return df.withColumn(alias, F.explode(fn_col))
