"""Item-item collaborative filtering on implicit feedback — the
"users who took X also took Y" serving primitive: co-occurrence counts
over per-user item sets, cosine-normalized, top-k neighbors per item.

Distinct from behavioral.basket_rules (per-BASKET pair support /
confidence / lift for rule mining): here the unit is the USER's whole
item set, the normalization is cosine over the binary user-item
incidence matrix, and the output is a ranked per-item neighbor list —
the item-to-item recommender shape (Amazon-style).

Determinism (oracle-hash discipline): all counts are exact integers;
score = n_ab / sqrt(n_a·n_b) is one IEEE sqrt + one division on
integer-valued doubles (sqrt is correctly rounded in every IEEE
engine); ranking ties break (score DESC, neighbor ASC).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def item_cooccurrence(
    events: DataFrame,
    user_col: str,
    item_col: str,
    max_items_per_user: int | None = None,
) -> DataFrame:
    """Unordered-pair co-occurrence counts over per-user DISTINCT item
    sets: (item_a, item_b, n_ab) with item_a < item_b.

    ``max_items_per_user`` is the hub guard (the common_neighbors
    ``max_wedge_degree`` discipline): a user with m items contributes
    m² pairs, so one crawler/bot account can dominate the shuffle.
    The cap keeps each user's FIRST ``max_items_per_user`` items in
    item order — deterministic, and mirrorable in SQL (QUALIFY
    row_number) so capped runs still oracle-match.

    100 TB: distinct (user, item) shuffles once onto the user key;
    the pair self-join is co-partitioned on that key (zero extra
    exchange); the pair aggregation map-side-combines into the
    (a, b) exchange.  With the cap, per-user work is bounded by
    cap²."""
    u, it = F.col(user_col), F.col(item_col)
    ui = (
        events.filter(u.isNotNull() & it.isNotNull())
        .select(u.alias("__u"), it.alias("__i"))
        .distinct()
    )
    if max_items_per_user is not None:
        w = Window.partitionBy("__u").orderBy("__i")
        ui = (
            ui.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") <= int(max_items_per_user))
            .drop("__rn")
        )
    a, b = ui.alias("a"), ui.alias("b")
    return (
        a.join(
            b,
            (F.col("a.__u") == F.col("b.__u"))
            & (F.col("a.__i") < F.col("b.__i")),
        )
        .groupBy(
            F.col("a.__i").alias("item_a"), F.col("b.__i").alias("item_b")
        )
        .agg(F.count(F.lit(1)).alias("n_ab"))
    )


def item_cf_topk(
    events: DataFrame,
    user_col: str,
    item_col: str,
    k: int = 10,
    min_cooc: int = 1,
    max_items_per_user: int | None = None,
) -> DataFrame:
    """Top-k cosine-nearest items per item:

        score(a, b) = n_ab / sqrt(n_a · n_b)

    where n_i counts DISTINCT users of item i (post-cap, so the
    normalization matches the pair counts) and n_ab the users holding
    both.  ``min_cooc`` prunes noise pairs before ranking (a single
    shared user is rarely signal).  Ties rank (score DESC, neighbor
    ASC) — deterministic in any engine because the score chain is
    bit-identical (module docstring).

    Output: (item, rec_item, n_ab, score, rank), rank 1..k, both
    directions of every pair (a recommends b AND b recommends a).

    100 TB: pair counts per :func:`item_cooccurrence`; the item-count
    join is item-sized (AQE-broadcastable); ranking is one window on
    the item key.  No driver-side state.
    """
    pairs = item_cooccurrence(
        events, user_col, item_col, max_items_per_user
    ).filter(F.col("n_ab") >= int(min_cooc))
    u, it = F.col(user_col), F.col(item_col)
    ui = (
        events.filter(u.isNotNull() & it.isNotNull())
        .select(u.alias("__u"), it.alias("__i"))
        .distinct()
    )
    if max_items_per_user is not None:
        w = Window.partitionBy("__u").orderBy("__i")
        ui = (
            ui.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") <= int(max_items_per_user))
            .drop("__rn")
        )
    ni = ui.groupBy(F.col("__i").alias("item")).agg(
        F.count(F.lit(1)).alias("n_i")
    )
    sym = pairs.select(
        F.col("item_a").alias("item"),
        F.col("item_b").alias("rec_item"),
        "n_ab",
    ).unionByName(
        pairs.select(
            F.col("item_b").alias("item"),
            F.col("item_a").alias("rec_item"),
            "n_ab",
        )
    )
    scored = (
        sym.join(ni, "item")
        .join(
            ni.select(
                F.col("item").alias("rec_item"), F.col("n_i").alias("n_j")
            ),
            "rec_item",
        )
        .withColumn(
            "score",
            F.col("n_ab")
            / F.sqrt((F.col("n_i") * F.col("n_j")).cast("double")),
        )
    )
    wr = Window.partitionBy("item").orderBy(
        F.col("score").desc(), F.col("rec_item").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(wr).cast("bigint"))
        .filter(F.col("rank") <= int(k))
        .select("item", "rec_item", "n_ab", "score", "rank")
    )
