"""Distributed sketches beyond Spark's built-ins (approx_count_distinct
is HLL; Bloom lives in operators/bloom.py): Count-Min for frequency
estimation over unbounded vocabularies.

All hashing is md5-based (the repo discipline): deterministic,
engine-neutral, oracle-replayable — no seeded murmur3.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from pigout_spark.pipeline.dedup import ws_tokens


def _cms_bucket(tok: Column, row: int, width: int) -> Column:
    """Row-salted md5 bucket in [0, width): the row index is the salt,
    the first 8 md5 hex chars the hash — identical arithmetic in any
    engine (DuckDB: ('0x'||substring(md5(...),1,8))::BIGINT % width)."""
    return (
        F.conv(F.substring(F.md5(F.concat_ws("#", F.lit(str(row)), tok)), 1, 8), 16, 10)
        .cast("bigint")
        % width
    )


def cms_build(
    df: DataFrame,
    text_col: str = "text",
    depth: int = 4,
    width: int = 1024,
) -> DataFrame:
    """Build a COUNT-MIN SKETCH over the corpus token stream: a
    depth×width counter table where cell (d, b) counts tokens hashing
    to bucket b under row-d's salted hash.  Point queries
    (:func:`cms_estimate`) read min over rows — an overestimate with
    error ≤ N·e/width at confidence 1−e^−depth; the classic
    heavy-hitter / frequency primitive when the vocabulary is too big
    to count exactly.

    Output: (row, bucket, cnt) — the sketch as a relation,
    depth×width rows max (KBs), ready to store, union-merge with other
    shards' sketches (counts add — the property that makes CMS a
    distributed-aggregation native), or broadcast-join for estimates.

    100 TB: ONE explode of the token stream into depth (row, bucket)
    pairs and ONE groupBy with map-side combine — shuffle volume is
    bounded by depth×width per task after partial aggregation, not by
    token count.
    """
    tok = F.explode(ws_tokens(text_col, distinct=False)).alias("__tok")
    base = df.select(tok)
    rows = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(d).alias("row"),
                    _cms_bucket(F.col("__tok"), d, width).alias("bucket"),
                )
                for d in range(depth)
            ]
        )
    ).alias("__rb")
    return (
        base.select(rows)
        .select(F.col("__rb.row").alias("row"), F.col("__rb.bucket").alias("bucket"))
        .groupBy("row", "bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def cms_estimate(
    sketch: DataFrame,
    queries: DataFrame,
    query_col: str = "term",
    depth: int = 4,
    width: int = 1024,
) -> DataFrame:
    """Point-query the sketch for each term in ``queries``: min over
    the depth rows of the counter at the term's bucket — the CMS
    estimate (≥ true count, with the standard error bound).

    The query side maps to its depth (row, bucket) probes (narrow),
    equi-joins the sketch (depth×width rows — broadcast-sized by
    construction), and takes min per term.  Terms absent from the
    corpus can still return small positive counts (CMS overestimates —
    that is the contract, documented not hidden).
    """
    probes = queries.select(
        F.col(query_col),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(d).alias("row"),
                        _cms_bucket(F.col(query_col), d, width).alias("bucket"),
                    )
                    for d in range(depth)
                ]
            )
        ).alias("__rb"),
    ).select(
        query_col,
        F.col("__rb.row").alias("row"),
        F.col("__rb.bucket").alias("bucket"),
    )
    return (
        probes.join(F.broadcast(sketch), ["row", "bucket"], "left")
        .groupBy(query_col)
        .agg(F.min(F.coalesce("cnt", F.lit(0))).alias("est"))
    )
