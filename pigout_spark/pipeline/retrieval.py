"""Rank fusion for hybrid retrieval — combining lexical (text.py:
bm25_topk) and dense (similarity.py ANN top-k) candidate lists into
one ranking, the standard first stage of a modern retrieval /
RAG-data-curation pipeline.

Reciprocal Rank Fusion (Cormack, Clarke & Büttcher, SIGIR 2009):

    RRF(d) = Σ_lists w_i / (k + rank_i(d))

is the battle-tested default precisely because it needs NO score
calibration between heterogeneous rankers — only ranks — and one
hyperparameter (k = 60 in the paper, damping the head).

Determinism (oracle-hash discipline): ranks are exact integers, each
1/(k+rank) contribution is ROUND-6 (+0.0) and summed through
DECIMAL(20,6) — exact, associative, order-free across lists and
partitions.

100 TB: the fused relation is candidate-sized (≤ Σ per-list top-k —
the inputs are already truncated rankings, that is the contract), so
every stage here is a union + one hash aggregation on the id key;
nothing is corpus-sized and nothing needs a window.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def rrf_fuse(
    rankings: list[DataFrame],
    id_col: str = "doc_id",
    rank_col: str = "rank",
    k: int = 60,
    weights: list[float] | None = None,
) -> DataFrame:
    """Fuse ranked candidate lists by weighted Reciprocal Rank Fusion.

    Each input must carry (``id_col``, ``rank_col``) with rank ≥ 1
    (asserted distributed — a 0/negative rank upstream is a bug, not a
    vote).  ``weights`` (default all 1.0) lets a caller tilt toward
    one ranker without rescoring; they multiply INSIDE the ROUND-6
    contribution so the decimal sum stays the only cross-row fold.

    Output: (id, n_lists, rrf6) — n_lists = how many input lists voted
    for the id (a useful confidence signal: intersection hits beat
    single-list hits at equal score).  Order/truncate downstream
    (``.orderBy(F.desc("rrf6"), id).limit(n)`` plans
    TakeOrderedAndProject — no global sort materializes).
    """
    if not rankings:
        raise ValueError("rrf_fuse needs at least one ranking")
    if weights is None:
        weights = [1.0] * len(rankings)
    if len(weights) != len(rankings):
        raise ValueError(
            f"rrf_fuse: {len(rankings)} rankings but {len(weights)} weights"
        )
    kk = float(int(k))
    parts = []
    for df, w in zip(rankings, weights):
        r = F.col(rank_col).cast("bigint")
        checked = df.filter(
            F.assert_true(
                r.isNotNull() & (r >= 1),
                F.lit(f"rrf_fuse: {rank_col} must be a 1-based rank"),
            ).isNull()
        )
        contrib = (
            F.round(F.lit(float(w)) / (F.lit(kk) + r.cast("double")), 6)
            + F.lit(0.0)
        ).cast("decimal(20,6)")
        parts.append(
            checked.select(F.col(id_col).alias("__id"), contrib.alias("__c"))
        )
    allp = parts[0]
    for p in parts[1:]:
        allp = allp.unionByName(p)
    return allp.groupBy(F.col("__id").alias(id_col)).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_lists"),
        F.sum("__c").cast("double").alias("rrf6"),
    )
