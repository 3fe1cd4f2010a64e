"""Bucketed (co-located) tables: the 100 TB shuffle-elimination path.

Pig's ``JOIN … USING 'merge'`` (SURVEY.md §2.3) relies on pre-sorted
inputs so the join runs map-side with no shuffle.  The Spark-first
equivalent is *bucketing*: write both fact tables bucketed+sorted on the
join key once, and every subsequent join on that key skips both the
exchange and the sort — at 100 TB that turns the nightly fact-to-fact
join from a full-cluster shuffle into a local merge.

Usage::

    write_bucketed(lineitem, "/warehouse/li", "li_b", 256, "l_orderkey")
    write_bucketed(orders,   "/warehouse/od", "od_b", 256, "o_orderkey")
    j = bucketed(spark, "li_b").join(bucketed(spark, "od_b"),
                                     on=F.col("l_orderkey") == F.col("o_orderkey"))
    # physical plan: SortMergeJoin over two bucketed FileScans, zero
    # ShuffleExchange (tests/test_plans.py::test_bucketed_join_no_shuffle)

Bucket-count guidance at scale: pick ``buckets`` so one bucket of the
*larger* table is ~128–512 MB (e.g. 100 TB / 262144 buckets ≈ 400 MB);
both sides must use the same count for the exchange to be elided.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    path: str,
    table: str,
    buckets: int,
    *keys: str,
    sort: bool = True,
    fmt: str = "parquet",
) -> None:
    """Write ``df`` as an external bucketed table registered as ``table``.

    ``sort=True`` additionally sorts each bucket file by the keys, which
    lets SortMergeJoin skip its per-partition sort too (Pig 'merge').
    """
    w = df.write.format(fmt).option("path", path).mode("overwrite")
    w = w.bucketBy(buckets, *keys)
    if sort:
        w = w.sortBy(*keys)
    w.saveAsTable(table)


def bucketed(spark: SparkSession, table: str) -> DataFrame:
    """Read a bucketed table back (bucket metadata comes from the session
    catalog — a plain ``spark.read.parquet(path)`` would lose it)."""
    return spark.table(table)
