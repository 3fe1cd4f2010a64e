"""Similarity search over embedding columns (array<float>).

Everything computes in JVM-side higher-order functions (zip_with +
aggregate fold) — no Python in the hot path.  Floats are cast to double
*before* multiplication and folded left-to-right, which makes the dot
product bit-identical to a SQL left-fold (list_reduce) — the property
the DuckDB oracle checks ride on.

Scale notes (100 TB):
- brute-force top-k: broadcast the query set, per-partition scoring,
  per-query top-k via window on the query key.  Right when |queries| is
  small; cost is one scan of the corpus, no shuffle of the corpus.
- hyperplane LSH: 8 signed projections → 256 buckets; bucketing is a
  narrow map, candidate search is a bucket-equi-join.  The ANN path —
  never a cross join (FIXTURES.md design constraint).
"""

from __future__ import annotations

import random

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def as_double(vec: Column | str) -> Column:
    c = F.col(vec) if isinstance(vec, str) else vec
    return F.transform(c, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    """Left-fold dot product: ((0 + x₁y₁) + x₂y₂) + … — the exact
    summation order list_reduce uses, so cross-engine bit-identical."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def brute_force_topk(
    emb: DataFrame,
    queries: DataFrame,
    k: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    q_id: str = "q_id",
) -> DataFrame:
    """Exact cosine top-k per query vector (the correctness baseline).

    queries is broadcast (small by contract); the corpus is scanned once
    with per-row scoring, then per-query top-k via window row_number on
    the query key — no corpus shuffle, no global sort."""
    from pyspark.sql import Window

    # Norms are precomputed per vector (not per pair): the fold over the
    # 64-dim array is the unit of work — at |Q| queries this saves
    # 2·|corpus|·|Q| folds, leaving one dot per pair.
    c = emb.select(
        F.col(id_col).alias("neighbor_id"),
        as_double(vec_col).alias("cv"),
    ).withColumn("cn", norm(F.col("cv")))
    q = queries.select(
        F.col(id_col).alias(q_id), as_double(vec_col).alias("qv")
    ).withColumn("qn", norm(F.col("qv")))
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("neighbor_id") != F.col(q_id))
        .withColumn("cos", dot(F.col("qv"), F.col("cv")) / (F.col("qn") * F.col("cn")))
    )
    w = Window.partitionBy(q_id).orderBy(F.desc("cos"), "neighbor_id")
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select(q_id, "neighbor_id", "cos", "rn")
    )


def random_hyperplanes(dim: int, n_planes: int, seed: int = 1000) -> list[list[float]]:
    """Deterministic hyperplanes (plain Python PRNG, engine-neutral —
    the constants embed into both the Spark plan and any SQL oracle)."""
    out = []
    for i in range(n_planes):
        rng = random.Random(seed + i)
        out.append([rng.uniform(-1.0, 1.0) for _ in range(dim)])
    return out


def lsh_bucket(vec_col: Column, planes: list[list[float]]) -> Column:
    """Signed-projection bucket code: bit i = (v · plane_i >= 0)."""
    v = as_double(vec_col) if not isinstance(vec_col, Column) else vec_col
    code = None
    for i, plane in enumerate(planes):
        lit_plane = F.array(*[F.lit(float(x)) for x in plane])
        bit = F.when(dot(v, lit_plane) >= 0, F.lit(1 << i)).otherwise(F.lit(0))
        code = bit if code is None else (code + bit)
    return code.cast("int")


def ivf_assign(
    emb: DataFrame,
    n_centroids: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF coarse quantization: assign every vector to its
    nearest-by-cosine centroid.  Centroids are the ``n_centroids``
    lowest-id vectors (deterministic; production swaps in k-means
    centroids — the dataflow is identical).

    One broadcast of the centroid set, one scan of the corpus, argmax
    via a per-vector window over n_centroids scored rows.  Returns
    (id, v double[], nrm, cell)."""
    from pyspark.sql import Window

    base = emb.select(
        F.col(id_col), as_double(vec_col).alias("v")
    ).withColumn("nrm", norm(F.col("v")))
    cents = base.filter(F.col(id_col) < n_centroids).select(
        F.col(id_col).alias("c_id"), F.col("v").alias("cv"), F.col("nrm").alias("cn")
    )
    scored = base.crossJoin(F.broadcast(cents)).withColumn(
        "s", dot(F.col("v"), F.col("cv")) / (F.col("nrm") * F.col("cn"))
    )
    w = Window.partitionBy(id_col).orderBy(F.desc("s"), "c_id")
    return (
        scored.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .select(id_col, "v", "nrm", F.col("c_id").alias("cell"))
    )


def ivf_probe_cells(
    emb: DataFrame,
    n_centroids: int,
    nprobe: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    ids_max: int | None = None,
) -> DataFrame:
    """Top-``nprobe`` nearest cells per vector (the IVF probe list).
    Centroids always come from the FULL ``emb`` (the ids < n_centroids
    contract); ``ids_max`` optionally restricts which vectors get probe
    lists (the query subset).  Same broadcast-score-window dataflow as
    ivf_assign; returns one row per (id, cell) — ``nprobe`` rows per
    vector."""
    from pyspark.sql import Window

    base = emb.select(
        F.col(id_col), as_double(vec_col).alias("v")
    ).withColumn("nrm", norm(F.col("v")))
    cents = base.filter(F.col(id_col) < n_centroids).select(
        F.col(id_col).alias("c_id"), F.col("v").alias("cv"), F.col("nrm").alias("cn")
    )
    probed = base if ids_max is None else base.filter(F.col(id_col) < ids_max)
    scored = probed.crossJoin(F.broadcast(cents)).withColumn(
        "s", dot(F.col("v"), F.col("cv")) / (F.col("nrm") * F.col("cn"))
    )
    w = Window.partitionBy(id_col).orderBy(F.desc("s"), "c_id")
    return (
        scored.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= nprobe)
        .select(id_col, "v", "nrm", F.col("c_id").alias("cell"))
    )


def ivf_topk(
    emb: DataFrame,
    query_ids_max: int,
    k: int,
    n_centroids: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    nprobe: int = 1,
) -> DataFrame:
    """IVF approximate top-k: candidates restricted to the query's
    ``nprobe`` nearest cells, exact cosine within those cells.  The cell
    id is the join key — shuffle-by-cell, never O(n²).

    Scale knobs (production: nlist ≈ √N, nprobe 4–32): ``n_centroids``
    trades cell size against centroid-scoring cost; ``nprobe`` trades
    recall against candidate volume — each probed cell contributes its
    members once (a candidate lives in exactly one cell, so no dedup
    shuffle is needed)."""
    from pyspark.sql import Window

    cells = ivf_assign(emb, n_centroids, id_col, vec_col)
    if nprobe <= 1:
        q = cells.filter(F.col(id_col) < query_ids_max).select(
            F.col(id_col).alias("q_id"), F.col("v").alias("qv"),
            F.col("nrm").alias("qn"), "cell",
        )
    else:
        probes = ivf_probe_cells(
            emb, n_centroids, nprobe, id_col, vec_col, ids_max=query_ids_max
        )
        q = probes.select(
            F.col(id_col).alias("q_id"), F.col("v").alias("qv"),
            F.col("nrm").alias("qn"), "cell",
        )
    cand = cells.select(
        F.col(id_col).alias("neighbor_id"), F.col("v").alias("cv"),
        F.col("nrm").alias("cn"), "cell",
    )
    scored = (
        q.join(cand, "cell")
        .filter(F.col("neighbor_id") != F.col("q_id"))
        .withColumn("cos", dot(F.col("qv"), F.col("cv")) / (F.col("qn") * F.col("cn")))
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("cos"), "neighbor_id")
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select("q_id", "neighbor_id", "cos", "rn")
    )


def ann_topk(
    emb: DataFrame,
    queries: DataFrame,
    planes: list[list[float]],
    k: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: candidates restricted to the query's LSH
    bucket, then exact cosine within the bucket.  The bucket code is the
    join key → shuffle-by-bucket, never O(n²)."""
    from pyspark.sql import Window

    withb = emb.select(
        F.col(id_col), as_double(vec_col).alias("v"),
        lsh_bucket(as_double(vec_col), planes).alias("bucket"),
    ).withColumn("nrm", norm(F.col("v")))
    q = withb.select(
        F.col(id_col).alias("q_id"), F.col("v").alias("qv"),
        F.col("nrm").alias("qn"), "bucket",
    ).join(queries.select(F.col(id_col).alias("q_id")), "q_id")
    cand = withb.select(
        F.col(id_col).alias("neighbor_id"), F.col("v").alias("cv"),
        F.col("nrm").alias("cn"), "bucket",
    )
    scored = (
        q.join(cand, "bucket")
        .filter(F.col("neighbor_id") != F.col("q_id"))
        .withColumn("cos", dot(F.col("qv"), F.col("cv")) / (F.col("qn") * F.col("cn")))
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("cos"), "neighbor_id")
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select("q_id", "neighbor_id", "cos", "rn")
    )
