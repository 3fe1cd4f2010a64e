"""Graph analytics on edge relations: PageRank (fixed-iteration).

Connected components (min-label propagation + pointer jumping) live in
pipeline/dedup.py:dedup_clusters — this module holds the rank side.

Determinism contract (oracle-hash discipline): per-node contribution
sums are order-dependent in IEEE double, so each contribution is cast
to DECIMAL(38,18) before the sum — decimal addition is exact and
associative, both engines then agree bit-for-bit; the damping update
is one IEEE multiply-add chain on the exact sum.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    iterations: int = 5,
    damping: float = 0.85,
) -> DataFrame:
    """Fixed-iteration PageRank over an edge relation (duplicate edges
    count as parallel edges).  Classic simplified update — each node
    starts at 1/N and per round

        rank(v) = (1-d)/N + d · Σ_{u→v} rank(u)/out_degree(u)

    (dangling mass is NOT redistributed — the standard simplification;
    dangling nodes keep contributing nothing, documented rather than
    hidden).  A fixed iteration count keeps it SQL-expressible: the
    oracle replays the same rounds as unrolled CTEs.

    100 TB: per round ONE equi-join of the degree-annotated edge list
    with the rank vector (both keyed on the node — AQE handles skewed
    hubs) and one map-side-combined aggregation; ranks are
    localCheckpoint'ed per round so lineage stays constant-depth (the
    dedup_clusters discipline).  The driver holds only N (a scalar).
    Hub skew: a node with 10⁸ in-links aggregates through partial
    combine, never a single-task reduce.
    """
    e_src, e_dst = F.col(src), F.col(dst)
    nodes = (
        edges.select(e_src.alias("node"))
        .unionByName(edges.select(e_dst.alias("node")))
        .distinct()
    )
    n = nodes.count()
    if n == 0:
        return nodes.withColumn("rank", F.lit(0.0))
    deg = edges.groupBy(e_src.alias("__s")).agg(F.count(F.lit(1)).alias("__deg"))
    e = edges.select(e_src.alias("__s"), e_dst.alias("__d")).join(deg, "__s")
    base = float((1.0 - damping) / n)
    ranks = nodes.withColumn("rank", F.lit(1.0 / n))
    for _ in range(int(iterations)):
        contrib = e.join(ranks, e["__s"] == ranks["node"]).select(
            F.col("__d").alias("node"),
            (F.col("rank") / F.col("__deg")).cast("decimal(38,18)").alias("__c"),
        )
        sums = contrib.groupBy("node").agg(F.sum("__c").alias("__sum"))
        ranks = (
            nodes.join(sums, "node", "left")
            .select(
                "node",
                (
                    F.lit(base)
                    + F.lit(float(damping))
                    * F.coalesce(F.col("__sum").cast("double"), F.lit(0.0))
                ).alias("rank"),
            )
            .localCheckpoint(eager=False)
        )
    return ranks
