"""Shared partitioning helpers for candidate-pair / bucket-join plans.

Reference analog (SURVEY.md §2.3): Pig lets the script pin join
parallelism with ``PARALLEL n``; here the same lever defends
amplifying joins against AQE's input-byte-based coalescing.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pin_partitions(df: DataFrame, *keys: str) -> DataFrame:
    """Repartition by the upcoming join keys with an EXPLICIT partition
    count (spark.sql.shuffle.partitions).

    Candidate-pair joins have huge output amplification from tiny
    inputs; AQE sizes stages by shuffle INPUT bytes, so it coalesces the
    join down to one task and serializes the expensive pair generation.
    An explicit count is exempt from AQE coalescing, and since it
    hash-partitions on the join keys the join reuses it — no extra
    exchange.  When BOTH sides of a self-join derive from the same
    pinned node, the physical plan gets one Exchange + one
    ReusedExchange: the upstream subtree executes once.
    """
    n = int(df.sparkSession.conf.get("spark.sql.shuffle.partitions", "32"))
    return df.repartition(n, *[F.col(k) for k in keys])
