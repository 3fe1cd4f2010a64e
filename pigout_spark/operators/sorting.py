"""Pig ORDER BY / LIMIT / RANK (SURVEY.md §2.5).

ORDER BY: Pig samples the input and range-partitions so the sort is
distributed (RandomSampleLoader + WeightedRangePartitioner); Spark's
orderBy uses the identical technique (RangePartitioning) — a direct map.

RANK: Pig's PORank/POCounter is a two-pass global counter: count rows
per partition, prefix-sum the counts, add the offset within each
partition.  A naive Spark window with no partitionBy collapses to ONE
partition — fine at test scale, fatal at 100 TB (SURVEY.md §7-H3).
``row_rank`` below implements Pig's own two-pass trick distributively:
sort (range-partitioned), count per partition, broadcast tiny offsets,
add per-partition row number via zipWithIndex-style arithmetic.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def order_by(df: DataFrame, *cols: Column | str) -> DataFrame:
    """Pig ORDER A BY ... — total order via range partitioning."""
    return df.orderBy(*cols)


def limit(df: DataFrame, n: int) -> DataFrame:
    """Pig LIMIT.  orderBy().limit(n) is planned as TakeOrderedAndProject
    (per-partition top-n + merge) — the LimitOptimizer analog is free."""
    return df.limit(n)


def rank(df: DataFrame, *order: Column | str, dense: bool = False, out: str = "rank") -> DataFrame:
    """Pig `RANK A BY x [DENSE]` — SQL rank semantics (ties share rank).

    Uses a global window: acceptable when the ranked result is small or
    the caller immediately limits.  For full-relation ranking at scale,
    prefer ``row_rank`` (no single-partition stage).
    """
    w = Window.orderBy(*order)
    fn = F.dense_rank() if dense else F.rank()
    return df.withColumn(out, fn.over(w))


def dense_rank(df: DataFrame, *order: Column | str, out: str = "rank") -> DataFrame:
    return rank(df, *order, dense=True, out=out)


def row_rank(df: DataFrame, *order: Column | str, out: str = "rank") -> DataFrame:
    """Pig bare `RANK A [BY ...]` = unique 1-based row numbers — the
    scalable two-pass plan (Pig's own POCounter/PORank design):

      1. range-partition sort by the rank keys (skipped if no keys),
      2. per-partition row count → driver (tiny: one long per partition),
      3. prefix-sum offsets, map each partition adding offset + local idx.

    No single-partition window anywhere, so it survives 100 TB.
    """
    if order:
        df = df.orderBy(*order)
    sdf = df
    spark = sdf.sparkSession
    rdd = sdf.rdd  # row order within/across partitions is the sorted order
    counts = rdd.mapPartitionsWithIndex(
        lambda i, it: [(i, sum(1 for _ in it))]
    ).collectAsMap()
    offsets = {}
    acc = 0
    for i in sorted(counts):
        offsets[i] = acc
        acc += counts[i]
    boff = spark.sparkContext.broadcast(offsets)
    fields = sdf.columns

    def add_rank(i, it):
        base = boff.value.get(i, 0)
        for j, row in enumerate(it, start=1):
            yield (*row, base + j)

    out_rdd = rdd.mapPartitionsWithIndex(add_rank)
    from pyspark.sql.types import LongType, StructField, StructType

    schema = StructType(list(sdf.schema.fields) + [StructField(out, LongType(), False)])
    return spark.createDataFrame(out_rdd, schema)
