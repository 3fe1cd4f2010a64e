"""Training-data pipeline corpus (SURVEY.md §7 phase 7) — dedup,
similarity search, text analysis, multimodal plumbing, each with a full
DuckDB oracle (generated programmatically where the expression is big:
SimHash bit logic, LSH hyperplane literals).

Cross-engine determinism relies on: md5 (identical hex in both), left-
fold double dot products (aggregate ≡ list_reduce), int/int → double
division, and decimal-disciplined double sums (registry.py).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from pigout_spark.pipeline.dedup import (
    dedup_clusters,
    retain_per_cluster,
    exact_groups,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    simhash16,
)
from pigout_spark.pipeline.multimodal import binarize, extract_meta
from pigout_spark.pipeline.similarity import (
    ann_topk,
    as_double,
    brute_force_topk,
    lsh_bucket,
    random_hyperplanes,
)
from pigout_spark.pipeline.text import (
    LANG_PROFILES,
    fingerprint,
    lang_id,
    quality_features,
    token_counts,
)
from pigout_spark.plans.partitioning import fan_out
from pigout_spark.queries.registry import query, t


def tf(spark, sf_dir, name):
    """Load + fan_out: spread a small scan before compute-heavy
    narrow maps (no-op at scale - plans/partitioning.py)."""
    return fan_out(t(spark, sf_dir, name))

#: shared token expression (SQL twin of pipeline.dedup.ws_tokens)
_SQL_TOKS = "list_filter(string_split(text, ' '), x -> x <> '')"
_SQL_DTOKS = f"list_distinct({_SQL_TOKS})"


def _sql_dot(a: str, b: str) -> str:
    """Left-fold dot product — the SQL twin of similarity.dot."""
    return (
        f"list_reduce(list_transform(list_zip({a}, {b}), s -> s[1] * s[2]),"
        f" (acc, x) -> acc + x)"
    )


# ---------------------------------------------------------------- dedup ---
@query(
    "dedup_exact",
    """
    SELECT md5(text) AS fp, MIN(doc_id) AS rep_id, COUNT(*) AS n_dups
    FROM documents GROUP BY md5(text)
    """,
)
def dedup_exact(spark, sf_dir):
    """Exact dedup groups: hash-groupBy on the content fingerprint —
    one shuffle with map-side combine (pipeline/dedup.py)."""
    return exact_groups(t(spark, sf_dir, "documents"), ["text"], "doc_id")


#: 16 hashes / 8 rows per band → 2 bands, candidate threshold
#: s ≈ (1/2)^(1/8) ≈ 0.92.  The synthetic corpus draws ~16-token docs
#: from a tiny shared vocabulary, so baseline inter-doc Jaccard is ~0.5;
#: lower thresholds make LSH degenerate to all-pairs.  Real corpora use
#: wider vocabularies — tune bands/rows per corpus.
_MH_HASHES, _MH_ROWS = 16, 8


def _minhash_sql(num_hashes: int, rows_per_band: int, src: str = "documents") -> str:
    from pigout_spark.pipeline.dedup import MINHASH_P, minhash_perms

    perms = minhash_perms(num_hashes)
    n_bands = num_hashes // rows_per_band
    band_rows = "\n  UNION ALL\n".join(
        "  SELECT doc_id, {j} AS band, md5(concat_ws('_', {ms})) AS bv FROM sig".format(
            j=j,
            ms=", ".join(f"m{j * rows_per_band + r}" for r in range(rows_per_band)),
        )
        for j in range(n_bands)
    )
    return (
        "WITH toks AS (\n"
        f"  SELECT doc_id, unnest({_SQL_DTOKS}) AS tok FROM {src}\n"
        "), hashed AS (\n"
        "  SELECT doc_id, ('0x' || substr(md5(tok), 1, 7))::BIGINT AS x FROM toks\n"
        "), sig AS (\n"
        "  SELECT doc_id,\n"
        + ",\n".join(
            f"    min((x * {a} + {b}) % {MINHASH_P}) AS m{i}"
            for i, (a, b) in enumerate(perms)
        )
        + "\n  FROM hashed GROUP BY doc_id\n"
        f"), bands AS (\n{band_rows}\n)\n"
        "SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b\n"
        "FROM bands a JOIN bands b\n"
        "  ON a.band = b.band AND a.bv = b.bv AND a.doc_id < b.doc_id"
    )


def _clusters_sql(src: str = "documents", rounds: int = 10) -> str:
    """Connected components of the MinHash pair graph as UNROLLED
    min-label propagation + pointer jumping — the true SQL twin of the
    Spark algorithm.  (The r1–r5 oracle used a recursive-CTE transitive
    closure, whose O(Σ|component|²) reach relation exceeded 5 minutes
    on the sf0.1 duplicate graph; per-round intermediates here are
    node-sized, and the label-of-label jump halves path lengths so a
    fixed unroll covers large diameters.)  Label propagation past the
    fixpoint is a no-op, so over-unrolling is exact.

    UNDER-unrolling is NOT (r14 find): the r13 default ``rounds``=6
    under-merged the sf3 duplicate graph by exactly 3 clusters
    (2707 vs the converged 2704 — caught by the sf3 sweep's rowcount
    gate on x_dedup_retain; Spark iterates to its Σ-label fixpoint and
    was right).  Two fixes: the oracle carries the k-core-style LOUD
    convergence guard — if the LAST round still changed any label it
    error()s instead of returning half-merged clusters, so a deeper
    graph at a larger SF can never silently pass (the guard needs
    rounds ≥ convergence+1 to stay quiet: it proved rounds=8 was
    still moving labels at sf3 even though the CLUSTER COUNT had
    already stabilized — count-stable ≠ label-converged) — and the
    default is now 10, which passes the guard at sf3."""
    parts = [
        "pairs AS MATERIALIZED (\n" + _minhash_sql(_MH_HASHES, _MH_ROWS, src) + "\n)",
        "edges AS MATERIALIZED (SELECT doc_a AS u, doc_b AS v FROM pairs"
        " UNION SELECT doc_b, doc_a FROM pairs)",
        "l0 AS MATERIALIZED (SELECT DISTINCT u AS node, u AS lab FROM edges)",
    ]
    for i in range(1, rounds + 1):
        parts.append(
            f"p{i} AS MATERIALIZED (\n"
            f"  SELECT e.v AS node, MIN(l.lab) AS m\n"
            f"  FROM edges e JOIN l{i-1} l ON l.node = e.u GROUP BY e.v\n"
            f"), q{i} AS MATERIALIZED (\n"
            f"  SELECT l.node, LEAST(l.lab, COALESCE(p.m, l.lab)) AS lab\n"
            f"  FROM l{i-1} l LEFT JOIN p{i} p ON p.node = l.node\n"
            f"), l{i} AS MATERIALIZED (\n"
            f"  SELECT q.node, q2.lab AS lab\n"
            f"  FROM q{i} q JOIN q{i} q2 ON q2.node = q.lab\n"
            f")"
        )
    parts.append(
        "chk AS (\n"
        f"  SELECT CASE WHEN (SELECT COUNT(*) FROM l{rounds} a\n"
        f"                    JOIN l{rounds - 1} b ON a.node = b.node\n"
        "                    WHERE a.lab <> b.lab) = 0 THEN 1\n"
        f"         ELSE CAST(error('clusters oracle: {rounds}-round "
        "unroll did not converge — raise rounds') AS INT) END AS ok\n"
        ")"
    )
    return (
        "WITH " + ",\n".join(parts)
        + f"\nSELECT node AS doc_id, CAST(lab AS BIGINT) AS cluster_id"
        f" FROM l{rounds}, chk WHERE chk.ok = 1"
    )


@query("x_dedup_clusters", _clusters_sql())
def x_dedup_clusters(spark, sf_dir):
    """Duplicate CLUSTERS from MinHash pairs: connected components via
    min-label propagation + pointer jumping (pipeline/dedup.py:
    dedup_clusters).  Near-dup retention keeps one doc per component —
    pairs alone aren't transitive-closed.  Oracle: recursive-CTE
    transitive closure over the identical pair SQL."""
    pairs = minhash_lsh_pairs(
        tf(spark, sf_dir, "documents"), "doc_id", "text",
        num_hashes=_MH_HASHES, rows_per_band=_MH_ROWS,
    )
    return dedup_clusters(pairs)


@query("dedup_minhash", _minhash_sql(_MH_HASHES, _MH_ROWS))
def dedup_minhash(spark, sf_dir):
    """MinHash+LSH near-dup candidates: 16 md5-family min-hashes, 2
    bands of 8, bucket-join on (band, band-hash).  Candidate volume
    scales with collisions, never O(n²) — the 100 TB dedup path."""
    return minhash_lsh_pairs(
        tf(spark, sf_dir, "documents"), "doc_id", "text",
        num_hashes=_MH_HASHES, rows_per_band=_MH_ROWS,
    )


def _retain_sql() -> str:
    """Retention twin: clusters (recursive CTE) left-joined to docs,
    ROW_NUMBER over the cluster keeps the longest doc (ties → lowest
    id); unclustered docs are their own singleton."""
    return f"""
    WITH docs_s AS (
      SELECT doc_id, CAST(len({_SQL_TOKS}) AS BIGINT) AS n_tokens
      FROM documents
    ), cl AS (
      {_clusters_sql()}
    ), j AS (
      SELECT d.doc_id, d.n_tokens,
             COALESCE(c.cluster_id, d.doc_id) AS cluster_id
      FROM docs_s d LEFT JOIN cl c ON d.doc_id = c.doc_id
    ), r AS (
      SELECT *, ROW_NUMBER() OVER (
        PARTITION BY cluster_id ORDER BY n_tokens DESC, doc_id) AS rn
      FROM j
    )
    SELECT doc_id, cluster_id, n_tokens FROM r WHERE rn = 1
    """


@query("x_dedup_retain", _retain_sql())
def x_dedup_retain(spark, sf_dir):
    """The full dedup chain end-to-end: MinHash pairs → connected
    components (dedup_clusters) → one retained doc per cluster
    (retain_per_cluster, keep-longest policy).  What a 100 TB curation
    run actually ships: the retained corpus, not the pair list."""
    from pigout_spark.pipeline.dedup import ws_tokens

    docs = t(spark, sf_dir, "documents").select(
        "doc_id",
        F.size(ws_tokens("text", distinct=False)).cast("long").alias("n_tokens"),
    )
    pairs = minhash_lsh_pairs(
        tf(spark, sf_dir, "documents"), "doc_id", "text",
        num_hashes=_MH_HASHES, rows_per_band=_MH_ROWS,
    )
    kept = retain_per_cluster(
        docs, dedup_clusters(pairs), score_col="n_tokens"
    )
    return kept.select("doc_id", "cluster_id", "n_tokens")


@query(
    "dedup_jaccard",
    f"""
    WITH toks AS (
      SELECT doc_id, unnest({_SQL_DTOKS}) AS tok FROM documents
    ), sizes AS (
      SELECT doc_id, COUNT(*) AS sz FROM toks GROUP BY doc_id
    ), inter AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS i
      FROM toks a JOIN toks b ON a.tok = b.tok AND a.doc_id < b.doc_id
      GROUP BY a.doc_id, b.doc_id
    )
    SELECT doc_a, doc_b, i / (sa.sz + sb.sz - i) AS jac
    FROM inter
    JOIN sizes sa ON sa.doc_id = doc_a
    JOIN sizes sb ON sb.doc_id = doc_b
    WHERE i / (sa.sz + sb.sz - i) >= 0.5
    """,
    extra=True,  # late-r5 rotation: settled driver-green row parked as local extra
)
def dedup_jaccard(spark, sf_dir):
    """Exact n-gram (token-set) Jaccard ≥ 0.5 via inverted-index
    self-join — |A∩B| from the token join, sizes joined back.  max_df
    capping guards hub tokens at scale (pipeline/dedup.py)."""
    return ngram_jaccard_pairs(
        tf(spark, sf_dir, "documents"), "doc_id", "text", threshold=0.5
    )


def _simhash_sql() -> str:
    sums = ",\n".join(
        f"    SUM(CASE WHEN (h >> {b}) & 1 = 1 THEN 1 ELSE -1 END) AS s{b}"
        for b in range(16)
    )
    fp = " + ".join(f"(CASE WHEN s{b} > 0 THEN {1 << b} ELSE 0 END)" for b in range(16))
    return (
        "WITH toks AS (\n"
        f"  SELECT doc_id, unnest({_SQL_TOKS}) AS tok FROM documents\n"
        "), hashed AS (\n"
        "  SELECT doc_id, ('0x' || substr(md5(tok), 1, 8))::BIGINT AS h FROM toks\n"
        "), sums AS (\n"
        f"  SELECT doc_id,\n{sums}\n  FROM hashed GROUP BY doc_id\n"
        ")\n"
        f"SELECT doc_id, CAST({fp} AS BIGINT) AS simhash FROM sums"
    )


@query("dedup_simhash", _simhash_sql(), extra=True)  # r5 late rotation; simhash family driver-covered by dedup_simhash_pairs
def dedup_simhash(spark, sf_dir):
    """16-bit SimHash fingerprints (md5-derived per-token 32-bit hashes,
    ±1 bit votes).  Hamming-bucket search builds on this fingerprint."""
    return simhash16(tf(spark, sf_dir, "documents"), "doc_id", "text")


def _simhash_pairs_sql(max_hamming: int = 3) -> str:
    # The oracle needs no block predicate: Hamming ≤ 3 over four 4-bit
    # blocks *implies* at least one identical block (pigeonhole), which
    # is exactly the candidate set the Spark side's block-bucketed join
    # generates — the bucketing is purely a performance device.
    fps = _simhash_sql()
    return (
        f"WITH fps AS (\n{fps}\n)\n"
        "SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,\n"
        "       CAST(bit_count(xor(a.simhash, b.simhash)) AS INT) AS hamming\n"
        "FROM fps a JOIN fps b ON a.doc_id < b.doc_id\n"
        f"WHERE bit_count(xor(a.simhash, b.simhash)) <= {max_hamming}"
    )


@query("dedup_simhash_pairs", _simhash_pairs_sql(3))
def dedup_simhash_pairs(spark, sf_dir):
    """SimHash Hamming-neighbor search (≤ 3 bits over 16): pigeonhole
    block-bucket equi-join — candidates from identical 4-bit blocks,
    exact Hamming check inside the bucket, exactly-once emission
    (pipeline/dedup.py:simhash_hamming_pairs)."""
    from pigout_spark.pipeline.dedup import simhash_hamming_pairs

    return simhash_hamming_pairs(
        tf(spark, sf_dir, "documents"), "doc_id", "text", max_hamming=3
    )


# ----------------------------------------------------------- similarity ---
@query(
    "sim_cosine_topk",
    f"""
    WITH e AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
    ), q AS (
      SELECT vec_id AS q_id, v AS qv FROM e WHERE vec_id < 10
    ), scored AS (
      SELECT q.q_id, e.vec_id AS neighbor_id,
             {_sql_dot('q.qv', 'e.v')}
               / (sqrt({_sql_dot('q.qv', 'q.qv')})
                  * sqrt({_sql_dot('e.v', 'e.v')})) AS cos
      FROM e, q WHERE e.vec_id <> q.q_id
    )
    SELECT q_id, neighbor_id, cos,
           ROW_NUMBER() OVER (PARTITION BY q_id
                              ORDER BY cos DESC, neighbor_id) AS rn
    FROM scored QUALIFY rn <= 3
    """,
    extra=True,  # r5 late rotation; similarity family driver-covered by sim_ivf/sim_quant
)
def sim_cosine_topk(spark, sf_dir):
    """Brute-force cosine top-3 for 10 query vectors: broadcast queries,
    one corpus scan, per-query window top-k — the exact baseline the
    LSH path approximates.  Dot products are left-fold double ops,
    bit-identical to the SQL oracle."""
    emb = tf(spark, sf_dir, "embeddings")
    return brute_force_topk(emb, emb.filter(F.col("vec_id") < 10), k=3)


_PLANES = random_hyperplanes(dim=64, n_planes=8)


def _sql_bucket_bits(var: str) -> str:
    """SQL twin of similarity.lsh_bucket over column ``var``."""

    def lit_list(plane: list[float]) -> str:
        return "[" + ", ".join(repr(x) for x in plane) + "]"

    return " + ".join(
        f"(CASE WHEN {_sql_dot(var, lit_list(p))} >= 0 THEN {1 << i} ELSE 0 END)"
        for i, p in enumerate(_PLANES)
    )


def _ann_sql() -> str:
    return (
        "WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings)\n"
        f"SELECT CAST({_sql_bucket_bits('v')} AS INT) AS bucket, COUNT(*) AS n\n"
        "FROM e GROUP BY 1"
    )


# Extra: the bucket histogram is subsumed by sim_ann_topk, whose oracle
# embeds the same bucket-bit expression in its CTE (50-query window).
@query("sim_ann_buckets", _ann_sql(), extra=True)
def sim_ann_buckets(spark, sf_dir):
    """Hyperplane-LSH bucketing (the ANN scale path): 8 signed
    projections → 256 buckets; downstream candidate search joins on the
    bucket code instead of cross-joining the corpus.  Deterministic
    planes embed as literals in both engines."""
    emb = tf(spark, sf_dir, "embeddings")
    return (
        emb.select(lsh_bucket("embedding", _PLANES).alias("bucket"))
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def _ann_topk_sql() -> str:
    return (
        "WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),\n"
        "b AS (\n"
        f"  SELECT vec_id, v, CAST({_sql_bucket_bits('v')} AS INT) AS bucket,\n"
        f"         sqrt({_sql_dot('v', 'v')}) AS nrm\n"
        "  FROM e\n"
        "), scored AS (\n"
        "  SELECT q.vec_id AS q_id, c.vec_id AS neighbor_id,\n"
        f"         {_sql_dot('q.v', 'c.v')} / (q.nrm * c.nrm) AS cos\n"
        "  FROM b q JOIN b c ON q.bucket = c.bucket AND q.vec_id <> c.vec_id\n"
        "  WHERE q.vec_id < 10\n"
        ")\n"
        "SELECT q_id, neighbor_id, cos,\n"
        "       ROW_NUMBER() OVER (PARTITION BY q_id\n"
        "                          ORDER BY cos DESC, neighbor_id) AS rn\n"
        "FROM scored QUALIFY rn <= 3"
    )


@query("sim_ann_topk", _ann_topk_sql(), extra=True)
def sim_ann_topk(spark, sf_dir):
    """Approximate top-3 within the query's LSH bucket: bucket-equi-join
    candidates, exact cosine inside the bucket — the full ANN path with
    its oracle (bucket bits + left-fold dots shared with SQL)."""
    emb = tf(spark, sf_dir, "embeddings")
    return ann_topk(emb, emb.filter(F.col("vec_id") < 10), _PLANES, k=3)


def _emb_dedup_sql(threshold: float) -> str:
    return (
        "WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),\n"
        "b AS (\n"
        f"  SELECT vec_id, v, CAST({_sql_bucket_bits('v')} AS INT) AS bucket,\n"
        f"         sqrt({_sql_dot('v', 'v')}) AS nrm\n"
        "  FROM e\n"
        "), pairs AS (\n"
        "  SELECT a.vec_id AS id_a, r.vec_id AS id_b,\n"
        f"         {_sql_dot('a.v', 'r.v')} / (a.nrm * r.nrm) AS cos\n"
        "  FROM b a JOIN b r ON a.bucket = r.bucket AND a.vec_id < r.vec_id\n"
        ")\n"
        f"SELECT id_a, id_b, cos FROM pairs WHERE cos >= {threshold}"
    )


@query("dedup_embedding", _emb_dedup_sql(0.3), extra=True)  # r5 late rotation; embedding dedup stays oracle-checked locally
def dedup_embedding(spark, sf_dir):
    """Embedding-cosine near-dup: same-LSH-bucket candidates, exact
    cosine ≥ 0.3 within the bucket — the no-cross-join dedup path for
    embedding spaces (pipeline/dedup.py:embedding_cosine_dups)."""
    from pigout_spark.pipeline.dedup import embedding_cosine_dups

    return embedding_cosine_dups(
        tf(spark, sf_dir, "embeddings"), _PLANES, threshold=0.3
    )


def _sql_assign(src: str, cents: str, out: str) -> str:
    """Nearest-centroid-by-cosine assignment CTE: ties → lowest c_id
    (the SQL twin of similarity._argmax_cell)."""
    return (
        f"{out} AS (\n"
        f"  SELECT vec_id, v, nrm, c_id AS cell FROM (\n"
        f"    SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id\n"
        f"                                 ORDER BY s DESC, c_id) AS rn\n"
        f"    FROM (\n"
        f"      SELECT b.vec_id, b.v, b.nrm, c.c_id,\n"
        f"             {_sql_dot('b.v', 'c.cv')} / (b.nrm * c.cn) AS s\n"
        f"      FROM {src} b, {cents} c)\n"
        f"  ) WHERE rn = 1\n)"
    )


def _kmeans_cells_sql(n_centroids: int = 8, n_iters: int = 3, dim: int = 64) -> str:
    """SQL replay of similarity.kmeans_centroids + final assignment —
    the unrolled training loop as chained CTEs.  Bit-identical to the
    Spark side by construction: init = lowest-id vectors, assignment =
    cosine argmax (ties → c_id), update = EXACT per-dimension mean via
    int64 cents (round(x·10⁴) — order-independent integer sums, then
    CAST(… AS DOUBLE)/10⁴/COUNT(*)); emptied cells keep their previous
    centroid (COALESCE)."""
    coal = "COALESCE(m.cv, p.cv)"
    parts = [
        "WITH e AS (\n"
        "  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings\n"
        "), b AS (\n"
        f"  SELECT vec_id, v, sqrt({_sql_dot('v', 'v')}) AS nrm FROM e\n"
        "), c0 AS (\n"
        f"  SELECT vec_id AS c_id, v AS cv, nrm AS cn FROM b WHERE vec_id < {n_centroids}\n"
        ")"
    ]
    prev = "c0"
    for it in range(1, n_iters + 1):
        parts.append(", " + _sql_assign("b", prev, f"a{it}"))
        parts.append(
            f", m{it} AS (\n"
            f"  SELECT cell, list(mv ORDER BY dim) AS cv FROM (\n"
            f"    SELECT cell, i AS dim,\n"
            f"           CAST(SUM(CAST(round(v[i] * 10000) AS BIGINT)) AS DOUBLE)\n"
            f"             / 10000.0 / COUNT(*) AS mv\n"
            f"    FROM a{it}, range(1, {dim + 1}) t(i) GROUP BY cell, i\n"
            f"  ) GROUP BY cell\n)"
        )
        parts.append(
            f", c{it} AS (\n"
            f"  SELECT p.c_id, {coal} AS cv,\n"
            f"         sqrt({_sql_dot(coal, coal)}) AS cn\n"
            f"  FROM {prev} p LEFT JOIN m{it} m ON m.cell = p.c_id\n)"
        )
        prev = f"c{it}"
    parts.append(", " + _sql_assign("b", prev, "cells") + "\n")
    return "\n".join(parts)


_IVF_CELLS_SQL = _kmeans_cells_sql()


# Extra: the cell histogram is subsumed by sim_ivf_topk, whose oracle
# reuses the same cells CTE (50-query window).
@query(
    "sim_ivf_cells",
    _IVF_CELLS_SQL + "SELECT cell, COUNT(*) AS n FROM cells GROUP BY cell",
    extra=True,
)
def sim_ivf_cells(spark, sf_dir):
    """IVF coarse quantization (the other ANN scale path besides LSH):
    nearest-centroid cell per vector under the seeded spherical-k-means
    codebook (similarity.kmeans_centroids — trained in Spark, replayed
    bit-identically by the oracle's unrolled CTE chain).  Cell
    histogram checked exactly against SQL."""
    from pigout_spark.pipeline.similarity import ivf_assign

    cells = ivf_assign(tf(spark, sf_dir, "embeddings"), n_centroids=8)
    return cells.groupBy("cell").agg(F.count(F.lit(1)).alias("n"))


@query(
    "sim_ivf_topk",
    _IVF_CELLS_SQL
    + f"""
    , q AS (
      SELECT vec_id AS q_id, v AS qv, nrm AS qn, cell FROM cells WHERE vec_id < 10
    ), scored2 AS (
      SELECT q.q_id, c.vec_id AS neighbor_id,
             {_sql_dot('q.qv', 'c.v')} / (q.qn * c.nrm) AS cos
      FROM q JOIN cells c ON q.cell = c.cell AND c.vec_id <> q.q_id
    )
    SELECT q_id, neighbor_id, cos,
           ROW_NUMBER() OVER (PARTITION BY q_id
                              ORDER BY cos DESC, neighbor_id) AS rn
    FROM scored2 QUALIFY rn <= 3
    """,
)
def sim_ivf_topk(spark, sf_dir):
    """IVF approximate top-3 (nprobe=1): exact cosine within the
    query's cell only — shuffle-by-cell, never a corpus cross join.
    Cells come from the k-means codebook (sim_ivf_cells docstring)."""
    from pigout_spark.pipeline.similarity import ivf_topk

    return ivf_topk(tf(spark, sf_dir, "embeddings"), query_ids_max=10, k=3)


@query(
    "x_sim_ivfq_topk",
    _IVF_CELLS_SQL
    + f"""
    , sc2 AS (
      SELECT vec_id, v, nrm, cell,
             list_max(list_transform(v, x -> abs(x))) / 127.0 AS scale
      FROM cells
    ), dq2 AS (
      SELECT vec_id, cell,
             CASE WHEN scale > 0
                  THEN list_transform(v, x -> CAST(round(x / scale) AS INT) * scale)
                  ELSE list_transform(v, x -> 0.0) END AS dv
      FROM sc2
    ), dn2 AS (
      SELECT vec_id, cell, dv, sqrt({_sql_dot('dv', 'dv')}) AS dnrm FROM dq2
    ), q2 AS (
      SELECT vec_id AS q_id, v AS qv, nrm AS qn, cell
      FROM cells WHERE vec_id < 10
    ), coarse2 AS (
      SELECT q.q_id, d.vec_id AS neighbor_id, q.qv, q.qn,
             {_sql_dot('q.qv', 'd.dv')} / (q.qn * d.dnrm) AS qcos
      FROM q2 q JOIN dn2 d ON q.cell = d.cell AND d.vec_id <> q.q_id
    ), surv2 AS (
      SELECT q_id, neighbor_id, qv, qn,
             ROW_NUMBER() OVER (PARTITION BY q_id
                                ORDER BY qcos DESC, neighbor_id) AS qrn
      FROM coarse2 QUALIFY qrn <= 12
    ), ex2 AS (
      SELECT s.q_id, s.neighbor_id,
             {_sql_dot('s.qv', 'c2.v')} / (s.qn * c2.nrm) AS cos
      FROM surv2 s JOIN cells c2 ON c2.vec_id = s.neighbor_id
    )
    SELECT q_id, neighbor_id, cos,
           ROW_NUMBER() OVER (PARTITION BY q_id
                              ORDER BY cos DESC, neighbor_id) AS rn
    FROM ex2 QUALIFY rn <= 3
    """,
    extra=True,  # 50-query window full; selfcheck + pytest verified
)
def x_sim_ivfq_topk(spark, sf_dir):
    """IVF × int8 composed (the FAISS IVF-PQ-style serving layout):
    cell-restricted candidates coarse-scored on dequantized int8
    codes, exact float rescore of the top 12 — both approximations in
    one plan, hash-checked against the oracle replaying the same
    codebook, quantizer, and fold arithmetic."""
    from pigout_spark.pipeline.similarity import ivf_quantized_topk

    return ivf_quantized_topk(
        tf(spark, sf_dir, "embeddings"), query_ids_max=10, k=3,
        n_centroids=8, rescore=4,
    )


@query(
    "sim_quant_topk",
    f"""
    WITH e AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
    ), nn AS (
      SELECT vec_id, v, sqrt({_sql_dot('v', 'v')}) AS nrm FROM e
    ), sc AS (
      SELECT vec_id, v,
             list_max(list_transform(v, x -> abs(x))) / 127.0 AS scale
      FROM e
    ), dq AS (
      SELECT vec_id,
             CASE WHEN scale > 0
                  THEN list_transform(v, x -> CAST(round(x / scale) AS INT) * scale)
                  ELSE list_transform(v, x -> 0.0) END AS dv
      FROM sc
    ), dn AS (
      SELECT vec_id, dv, sqrt({_sql_dot('dv', 'dv')}) AS dnrm FROM dq
    ), q AS (
      SELECT vec_id AS q_id, v AS qv, nrm AS qn FROM nn WHERE vec_id < 10
    ), coarse AS (
      SELECT q.q_id, d.vec_id AS neighbor_id, q.qv, q.qn,
             {_sql_dot('q.qv', 'd.dv')} / (q.qn * d.dnrm) AS qcos
      FROM q JOIN dn d ON d.vec_id <> q.q_id
    ), surv AS (
      SELECT q_id, neighbor_id, qv, qn,
             ROW_NUMBER() OVER (PARTITION BY q_id
                                ORDER BY qcos DESC, neighbor_id) AS qrn
      FROM coarse QUALIFY qrn <= 12
    ), ex AS (
      SELECT s.q_id, s.neighbor_id,
             {_sql_dot('s.qv', 'n2.v')} / (s.qn * n2.nrm) AS cos
      FROM surv s JOIN nn n2 ON n2.vec_id = s.neighbor_id
    )
    SELECT q_id, neighbor_id, cos,
           ROW_NUMBER() OVER (PARTITION BY q_id
                              ORDER BY cos DESC, neighbor_id) AS rn
    FROM ex QUALIFY rn <= 3
    """,
)
def sim_quant_topk(spark, sf_dir):
    """int8-rescore top-3: coarse rank on dequantized int8 codes (the
    4×-smaller scan), exact rescore of the top 12 (rescore=4·k) on full
    floats — the search-side payoff of x_emb_quantize's storage cut.
    The oracle replays quantize → dequant-coarse → rescore with
    identical IEEE arithmetic (round half-away-from-zero, left-fold
    dots), so ranks hash-match exactly."""
    from pigout_spark.pipeline.similarity import quantized_topk

    return quantized_topk(
        tf(spark, sf_dir, "embeddings"), query_ids_max=10, k=3, rescore=4
    )


def _pii_sql() -> str:
    """SQL twin of scrub_pii over PII-augmented fixture text: the same
    patterns in the same order, counts taken on the text as each
    category's scrub sees it."""
    from pigout_spark.pipeline.text import PII_PATTERNS

    aug = (
        "text || ' contact doc' || CAST(doc_id AS VARCHAR) || '@mail.example'"
        " || ' ip 10.0.0.' || CAST(doc_id % 255 AS VARCHAR)"
        " || ' tel +1 555-000-' || CAST(doc_id AS VARCHAR)"
    )
    stages, cur, names = [f"aug AS (SELECT doc_id, {aug} AS t0 FROM documents)"], "t0", []
    for i, (name, pat, rep) in enumerate(PII_PATTERNS):
        nxt = f"t{i + 1}"
        prev = "aug" if i == 0 else f"s{i - 1}"
        carried = ", ".join(f"n_{n}" for n in names)
        carried = (carried + ", ") if carried else ""
        stages.append(
            f"s{i} AS (SELECT doc_id, {carried}"
            f"CAST(len(regexp_extract_all({cur}, '{pat}')) AS BIGINT) AS n_{name}, "
            f"regexp_replace({cur}, '{pat}', '{rep}', 'g') AS {nxt} FROM {prev})"
        )
        cur, names = nxt, names + [name]
    cols = ", ".join(f"n_{n}" for n in names)
    return (
        "WITH " + ",\n".join(stages)
        + f"\nSELECT doc_id, {cols}, md5({cur}) AS scrub_fp FROM s{len(names) - 1}"
    )


@query("x_text_pii", _pii_sql())
def x_text_pii(spark, sf_dir):
    """PII scrubbing (pipeline/text.py:scrub_pii) hash-checked against
    the SQL twin: fixture text augmented with deterministic per-doc
    email/IP/phone, scrubbed, and fingerprinted — the md5 pins every
    replacement span, not just the counts."""
    from pigout_spark.pipeline.text import scrub_pii

    d = t(spark, sf_dir, "documents").select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.lit(" contact doc"), F.col("doc_id").cast("string"),
            F.lit("@mail.example"),
            F.lit(" ip 10.0.0."), (F.col("doc_id") % 255).cast("string"),
            F.lit(" tel +1 555-000-"), F.col("doc_id").cast("string"),
        ).alias("text"),
    )
    out = scrub_pii(d)
    return out.select(
        "doc_id", "n_email", "n_ip", "n_phone",
        F.md5("text_scrubbed").alias("scrub_fp"),
    )


@query(
    "x_emb_quantize",
    """
    WITH e AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
    ), s AS (
      SELECT vec_id, v,
             list_max(list_transform(v, x -> abs(x))) / 127.0 AS scale
      FROM e
    ), q AS (
      SELECT vec_id, v, scale,
             CASE WHEN scale > 0
                  THEN list_transform(v, x -> CAST(round(x / scale) AS INT))
                  ELSE list_transform(v, x -> 0) END AS qv
      FROM s
    )
    SELECT vec_id, scale,
           md5(array_to_string(qv, ',')) AS q_fp,
           list_max(list_transform(range(1, len(v) + 1),
                    i -> abs(v[i] - qv[i] * scale))) AS max_err
    FROM q
    """,
)
def x_emb_quantize(spark, sf_dir):
    """int8 embedding quantization hash-checked: the md5 of the code
    array pins every quantized value, and max_err (≤ scale/2 by
    construction) pins the reconstruction chain."""
    from pigout_spark.pipeline.similarity import dequantize, quantize_embeddings

    emb = tf(spark, sf_dir, "embeddings")
    q = quantize_embeddings(emb)
    joined = q.join(
        emb.select("vec_id", as_double("embedding").alias("v")), "vec_id"
    )
    return joined.select(
        "vec_id",
        "scale",
        F.md5(F.array_join("qvec", ",")).alias("q_fp"),
        F.array_max(
            F.zip_with(
                F.col("v"), dequantize("qvec", "scale"),
                lambda a, b: F.abs(a - b),
            )
        ).alias("max_err"),
    )


# ------------------------------------------------------------------ text ---
# Extra: token counts folded into text_quality (50-query window).
@query(
    "text_tokens",
    f"""
    SELECT doc_id,
           CAST(len({_SQL_TOKS}) AS BIGINT) AS n_ws_tokens,
           CAST(len(regexp_extract_all(text, '[a-z]+')) AS BIGINT) AS n_alpha_runs,
           CAST(len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]')) AS BIGINT)
             AS n_bpeish,
           CAST(length(text) AS BIGINT) AS n_chars
    FROM documents
    """,
    extra=True,
)
def text_tokens(spark, sf_dir):
    """Token counting: whitespace tokens, alphabetic runs, BPE-ish
    pieces, chars — all JVM-side regex/split (pipeline/text.py)."""
    return token_counts(tf(spark, sf_dir, "documents")).select(
        "doc_id", "n_ws_tokens", "n_alpha_runs", "n_bpeish", "n_chars"
    )


@query(
    "x_text_chunks",
    f"""
    WITH f AS (
      SELECT doc_id, {_SQL_TOKS} AS toks FROM documents
    ), s AS (
      SELECT doc_id, toks, len(toks) AS n FROM f WHERE len(toks) > 0
    ), c AS (
      SELECT doc_id, toks, n, unnest(range(0, n, 48)) AS start FROM s
    )
    SELECT doc_id,
           CAST(start // 48 AS BIGINT) AS chunk_idx,
           md5(array_to_string(list_slice(toks, start + 1,
                                          least(start + 64, n)), ' '))
             AS chunk_fp,
           CAST(least(start + 64, n) - start AS BIGINT) AS n_chunk_tokens
    FROM c
    """,
)
def x_text_chunks(spark, sf_dir):
    """Document chunking (64-token windows, 16-token overlap → stride
    48) hash-checked: the md5 chunk fingerprint pins exact token
    membership and order, not just counts."""
    from pigout_spark.pipeline.text import chunk_documents

    out = chunk_documents(
        t(spark, sf_dir, "documents"), max_tokens=64, overlap=16
    )
    return out.select(
        "doc_id", "chunk_idx",
        F.md5("chunk_text").alias("chunk_fp"), "n_chunk_tokens",
    )


_PACK_BUDGET = 96  # ≥ chunk max_tokens (64) ⇒ every sequence ≤ budget;
# small enough that two full 64-token chunks can NOT share a sequence —
# the fixture packs a real mix of 1- and multi-sequence docs


@query(
    "x_text_pack",
    f"""
    WITH RECURSIVE f AS (
      SELECT doc_id, {_SQL_TOKS} AS toks FROM documents
    ), s AS (
      SELECT doc_id, len(toks) AS n FROM f WHERE len(toks) > 0
    ), c AS (
      SELECT doc_id, n, unnest(range(0, n, 48)) AS start FROM s
    ), ch AS (
      SELECT doc_id, CAST(start // 48 AS BIGINT) AS chunk_idx,
             CAST(least(start + 64, n) - start AS BIGINT) AS nt
      FROM c
    ), walk(doc_id, chunk_idx, nt, fill, seq) AS (
      SELECT doc_id, chunk_idx, nt, nt, CAST(0 AS BIGINT)
      FROM ch WHERE chunk_idx = 0
      UNION ALL
      SELECT ch.doc_id, ch.chunk_idx, ch.nt,
             CASE WHEN w.fill + ch.nt <= {_PACK_BUDGET}
                  THEN w.fill + ch.nt ELSE ch.nt END,
             CASE WHEN w.fill + ch.nt <= {_PACK_BUDGET}
                  THEN w.seq ELSE w.seq + 1 END
      FROM walk w
      JOIN ch ON ch.doc_id = w.doc_id AND ch.chunk_idx = w.chunk_idx + 1
    )
    SELECT doc_id, seq AS seq_idx, CAST(COUNT(*) AS BIGINT) AS n_chunks,
           CAST(SUM(nt) AS BIGINT) AS n_seq_tokens,
           md5(array_to_string(list_sort(list(chunk_idx)), ','))
             AS chunk_span_fp
    FROM walk GROUP BY doc_id, seq
    """,
)
def x_text_pack(spark, sf_dir):
    """Sequence PACKING (chunks → fixed-token-budget training
    sequences): exact greedy next-fit per doc, hash-checked — the
    oracle replays the identical walk with a recursive CTE, and
    chunk_span_fp pins exact chunk membership per sequence (not just
    counts).  Budget 96 ≥ chunk max_tokens 64, so no sequence
    exceeds the budget (pinned by test_pack_sequences_*)."""
    from pigout_spark.pipeline.text import chunk_documents, pack_sequences

    ch = chunk_documents(
        t(spark, sf_dir, "documents"), max_tokens=64, overlap=16
    )
    p = pack_sequences(ch, _PACK_BUDGET)
    return p.groupBy("doc_id", "seq_idx").agg(
        F.count(F.lit(1)).cast("long").alias("n_chunks"),
        F.sum("n_chunk_tokens").cast("long").alias("n_seq_tokens"),
        F.md5(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list("chunk_idx")),
                    lambda x: x.cast("string"),
                ),
                ",",
            )
        ).alias("chunk_span_fp"),
    )


@query(
    "x_text_repetition",
    f"""
    WITH f AS (
      SELECT doc_id, {_SQL_TOKS} AS toks,
             list_filter(string_split(text, chr(10)), x -> x <> '') AS lines
      FROM documents
    ), s AS (
      SELECT doc_id, toks, len(toks) AS n, len(lines) AS nl,
             len(list_distinct(lines)) AS ndl
      FROM f WHERE len(toks) >= 2
    ), g AS (
      SELECT doc_id, n, nl, ndl,
             unnest(list_transform(range(1, n),
                                   i -> toks[i] || ' ' || toks[i + 1])) AS gram
      FROM s
    ), c AS (
      SELECT doc_id, n, nl, ndl, gram, COUNT(*) AS cnt FROM g GROUP BY ALL
    )
    SELECT doc_id, CAST(n - 1 AS BIGINT) AS n_2grams,
           CAST(MAX(cnt) AS BIGINT) AS top_2gram_n,
           MAX(cnt) / (n - 1) AS top_2gram_frac,
           CASE WHEN nl > 0 THEN 1.0 - ndl / nl ELSE 0.0 END AS dup_line_frac
    FROM c GROUP BY doc_id, n, nl, ndl
    """,
)
def x_text_repetition(spark, sf_dir):
    """Repetition quality signals (Gopher-rules family): most-frequent
    2-gram fraction + duplicate-line fraction, hash-checked."""
    from pigout_spark.pipeline.text import repetition_features

    return repetition_features(t(spark, sf_dir, "documents"))


_STOP_EN = ", ".join(f"'{w}'" for w in LANG_PROFILES["en"])


@query(
    "text_quality",
    f"""
    WITH f AS (
      SELECT doc_id, text, {_SQL_TOKS} AS toks FROM documents
    ), feat AS (
      SELECT doc_id, text,
             CAST(len(toks) AS BIGINT) AS n_tokens,
             CAST(len(list_distinct(toks)) AS BIGINT) AS n_distinct,
             list_reduce(list_transform(toks, t -> length(t)), (a, b) -> a + b)
               / len(toks) AS avg_token_len,
             len(list_filter(toks, t -> list_contains([{_STOP_EN}], t)))
               / len(toks) AS stop_ratio
      FROM f
    )
    SELECT doc_id, n_tokens, n_distinct, avg_token_len, stop_ratio,
           least(n_tokens / 32.0, 1.0) * 0.5
             + (n_distinct / n_tokens) * 0.3
             + least(avg_token_len / 8.0, 1.0) * 0.2 AS quality,
           CAST(len(regexp_extract_all(text, '[a-z]+')) AS BIGINT) AS n_alpha_runs,
           CAST(len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]')) AS BIGINT)
             AS n_bpeish,
           CAST(length(text) AS BIGINT) AS n_chars,
           CASE WHEN length(text) = 0 THEN 0 ELSE
             list_reduce(
               list_transform(string_split_regex(text, ''),
                              c -> CAST(ascii(c) AS BIGINT)),
               (a, b) -> (a * 31 + b) % 1000000007)
           END AS rhash
    FROM feat
    """,
)
def text_quality(spark, sf_dir):
    """Quality scoring + token counting + rolling-hash fingerprint in one
    per-doc projection (formerly text_quality + text_tokens +
    text_rolling_hash — folded for the driver's 50-query window):
    length/distinctness/stopword features, composite score, BPE-ish
    counts, char-level polynomial hash.  All int/int double divisions and
    exact int64 folds — engine-deterministic."""
    from pigout_spark.pipeline.text import rolling_hash

    return (
        quality_features(token_counts(tf(spark, sf_dir, "documents")))
        .withColumn("rhash", rolling_hash("text"))
        .select(
            "doc_id", "n_tokens", "n_distinct", "avg_token_len", "stop_ratio",
            "quality", "n_alpha_runs", "n_bpeish", "n_chars", "rhash",
        )
    )


def _sqlstr(s: str) -> str:
    return "'" + s.replace("'", "''") + "'"


def _langid_sql() -> str:
    """SQL twin of pipeline.text.lang_id: script-range detection first
    (ja/ko/zh/ru precedence), then the Latin 3·stopword + substring
    score argmax, plus the r5 confidence margin (winner − best other
    Latin score; script rows: coverage ratio).  Same integer/double
    arithmetic in both engines, so the margin threshold count is
    hash-exact."""
    from pigout_spark.pipeline.text import LANG_SUBSTRINGS, SCRIPT_RANGES

    score = {}
    for lang, words in LANG_PROFILES.items():
        stop = (
            f"len(list_filter(toks, t -> list_contains("
            f"[{', '.join(repr(w) for w in words)}], t)))"
        )
        subs = " + ".join(
            f"(length(padded) - length(replace(padded, {_sqlstr(p)}, '')))"
            f" / {len(p)}"
            for p in LANG_SUBSTRINGS[lang]
        )
        score[lang] = f"(3 * {stop} + {subs})"
    langs = list(LANG_PROFILES)
    sdefs = ",\n         ".join(f"{score[l]} AS s_{l}" for l in langs)
    pred_cases, marg_cases = [], []
    # script overrides first, in precedence order
    for lang, cc in SCRIPT_RANGES:
        cnt = (
            f"length(regexp_replace(text, {_sqlstr('[^' + cc[1:-1] + ']')},"
            f" '', 'g'))"
        )
        hit = f"{cnt} >= 1 AND {cnt} * 20 >= length(text)"
        pred_cases.append(f"WHEN {hit} THEN '{lang}'")
        marg_cases.append(f"WHEN {hit} THEN {cnt} * 20 / length(text)")
    # Latin chain: winner = first global-max language (same winner the
    # Spark chain picks); margin = winner − best other
    for i, lang in enumerate(langs):
        others = ", ".join(f"s_{l}" for l in langs if l != lang)
        omax = f"greatest({others})"
        if i == len(langs) - 1:
            pred_cases.append(f"ELSE '{lang}'")
            marg_cases.append(f"ELSE s_{lang} - {omax}")
        else:
            pred_cases.append(f"WHEN s_{lang} >= {omax} THEN '{lang}'")
            marg_cases.append(f"WHEN s_{lang} >= {omax} THEN s_{lang} - {omax}")
    pred = "CASE " + " ".join(pred_cases) + " END"
    marg = "CASE " + " ".join(marg_cases) + " END"
    toks_lower = "list_filter(string_split(lower(text), ' '), x -> x <> '')"
    return (
        "WITH f AS (\n"
        f"  SELECT lang, text, {toks_lower} AS toks,\n"
        "         ' ' || lower(text) || ' ' AS padded\n"
        "  FROM documents\n"
        "), sc AS (\n"
        f"  SELECT lang, text,\n         {sdefs}\n  FROM f\n"
        "), lab AS (\n"
        f"  SELECT lang, {pred} AS predicted, {marg} AS margin FROM sc\n"
        ")\n"
        "SELECT lang, predicted, COUNT(*) AS n,\n"
        "       CAST(SUM(CASE WHEN margin < 1.0 THEN 1 ELSE 0 END)"
        " AS BIGINT) AS n_low_margin\n"
        "FROM lab GROUP BY lang, predicted"
    )


@query("text_langid", _langid_sql())
def text_langid(spark, sf_dir):
    """Stopword-profile language ID vs the labeled lang column —
    confusion counts plus how many predictions per cell are LOW-MARGIN
    (margin < 1: no clear stopword/substring edge — the rows a
    downstream quality filter would drop or re-route).  (Synthetic
    word-soup text: the point is the deterministic scoring machinery,
    not linguistic accuracy.)"""
    d = lang_id(t(spark, sf_dir, "documents"))
    return d.groupBy("lang", "predicted").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.when(F.col("lang_margin") < 1.0, 1).otherwise(0))
        .cast("bigint")
        .alias("n_low_margin"),
    )


@query(
    "text_fingerprint",
    f"""
    WITH f AS (
      SELECT source,
             md5(array_to_string(list_sort(list_distinct({_SQL_TOKS})), ' ')) AS fp
      FROM documents
    )
    SELECT source, COUNT(*) AS n_docs, COUNT(DISTINCT fp) AS n_unique_fps
    FROM f GROUP BY source
    """,
    extra=True,  # r5 late rotation; text family driver-covered by text_quality/text_langid
)
def text_fingerprint(spark, sf_dir):
    """Document fingerprint (md5 of sorted distinct tokens) — order/
    repetition-invariant dedup key; uniqueness per source."""
    d = fingerprint(t(spark, sf_dir, "documents"))
    return d.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.count_distinct("fp").alias("n_unique_fps"),
    )


# Extra: rolling hash folded into text_quality (50-query window).
@query(
    "text_rolling_hash",
    """
    SELECT doc_id,
           CASE WHEN length(text) = 0 THEN 0 ELSE
             list_reduce(
               list_transform(string_split_regex(text, ''),
                              c -> CAST(ascii(c) AS BIGINT)),
               (a, b) -> (a * 31 + b) % 1000000007)
           END AS rhash
    FROM documents
    """,
    extra=True,
)
def text_rolling_hash(spark, sf_dir):
    """Per-document polynomial rolling hash (char-level content
    fingerprint; chunked variants build shingle fingerprints from the
    same fold).  Exact int64 arithmetic — left fold matches list_reduce
    (first step yields c1 from acc=0)."""
    from pigout_spark.pipeline.text import rolling_hash

    return tf(spark, sf_dir, "documents").select(
        "doc_id", rolling_hash("text").alias("rhash")
    )


# ------------------------------------------------------------ multimodal ---
@query(
    "mm_binary_meta",
    """
    SELECT doc_id,
           CAST(octet_length(encode(text)) AS BIGINT) AS byte_len,
           CAST(ascii(substr(text, 1, 1)) AS INT) AS first_byte,
           CAST(ceil(octet_length(encode(text)) / 64.0) AS BIGINT) AS n_chunks
    FROM documents
    """,
)
def mm_binary_meta(spark, sf_dir):
    """Multimodal plumbing: binary payload column + Arrow-batched
    mapInPandas metadata extraction (pipeline/multimodal.py).  The
    Pandas stage is the real scale path; the oracle checks its output
    against pure SQL byte math."""
    d = binarize(t(spark, sf_dir, "documents"), "text")
    return extract_meta(d, "payload", "doc_id")


# Local extra (driver window full): the frame-sampling plumbing —
# The decode stage (probe-gated: real PIL when present, deterministic
# fake otherwise) — the FAKE path is pure byte math, so it gets a full
# SQL oracle keeping the mapInPandas schema/batch plumbing hash-checked.
@query(
    "x_mm_decode",
    """
    WITH d AS (
      SELECT doc_id, octet_length(encode(text)) AS n FROM documents
    )
    SELECT doc_id,
           CAST(n % 64 + 1 AS INT) AS width,
           CAST(n // 64 + 1 AS INT) AS height,
           CASE WHEN n % 2 = 1 THEN 'L' ELSE 'RGB' END AS mode
    FROM d
    """,
    extra=True,
)
def x_mm_decode(spark, sf_dir):
    """decode_images over binary payloads (use='fake' pins the
    deterministic path regardless of whether pillow is present, so the
    oracle holds on any cluster; pipeline/multimodal.py)."""
    from pigout_spark.pipeline.multimodal import binarize, decode_images

    d = binarize(t(spark, sf_dir, "documents"), "text")
    return decode_images(d, use="fake")


# Readability (Flesch / Flesch-Kincaid) — dictionary-free syllable
# heuristic over exact regex counts; one narrow map, ROUND-6 IEEE.
@query(
    "x_readability",
    f"""
    WITH c AS (
      SELECT doc_id,
             CAST(len({_SQL_TOKS}) AS BIGINT) AS w,
             CAST(greatest(1, len(regexp_extract_all(text, '[.!?]+')))
                  AS BIGINT) AS s,
             CAST(len(regexp_extract_all(lower(text), '[aeiouy]+'))
                  AS BIGINT) AS y
      FROM documents
    )
    SELECT doc_id, w AS n_words, s AS n_sentences, y AS n_syllables,
           CASE WHEN w > 0 THEN
             ROUND(206.835 - 1.015 * (CAST(w AS DOUBLE) / s)
                           - 84.6 * (CAST(y AS DOUBLE) / w), 6)
           END AS flesch6,
           CASE WHEN w > 0 THEN
             ROUND(0.39 * (CAST(w AS DOUBLE) / s)
                   + 11.8 * (CAST(y AS DOUBLE) / w) - 15.59, 6)
           END AS fk_grade6
    FROM c
    """,
    extra=True,  # r14 addition — r15 rotation candidate
)
def x_readability(spark, sf_dir):
    """Flesch Reading Ease + Flesch-Kincaid grade per document
    (pipeline/text.py:readability_scores — exact integer word /
    sentence-run / vowel-group counts, one ROUND-6 IEEE chain each;
    the classic curation signal between punct ratios and LM
    surprisal).  Pure whole-stage-codegen regex counts — no UDF."""
    from pigout_spark.pipeline.text import readability_scores

    return readability_scores(tf(spark, sf_dir, "documents"))


# Audio (WAV/RIFF) metadata — the r13 verdict #8 gap: payloads are
# REAL canonical PCM WAV bytes built by synth_wav (deterministic
# integer law), parsed back by the dependency-free RIFF chunk walker;
# the oracle replays the generator law in pure SQL, so a header-walk
# or sample-sum bug on either side hash-mismatches.
@query(
    "x_wav_meta",
    """
    WITH d AS (
      SELECT doc_id,
             8000 + (doc_id % 5) * 2000 AS sr,
             1 + (doc_id % 2) AS ch,
             CASE WHEN doc_id % 3 = 0 THEN 8 ELSE 16 END AS bits,
             50 + (doc_id % 100) AS nf
      FROM documents
    ), ix AS (
      SELECT doc_id, sr, ch, bits, nf, unnest(range(0, nf)) AS i FROM d
    ), s AS (
      SELECT doc_id,
             SUM(CASE WHEN bits = 8 THEN (doc_id*7 + i*13) % 256
                      ELSE (doc_id*7 + i*13) % 201 - 100 END) AS s0,
             SUM(CASE WHEN ch = 2 THEN
                   CASE WHEN bits = 8 THEN (doc_id*7 + i*13 + 31) % 256
                        ELSE (doc_id*7 + i*13 + 31) % 201 - 100 END
                 END) AS s1
      FROM ix GROUP BY doc_id
    )
    SELECT d.doc_id,
           CAST(d.sr AS INT) AS sample_rate,
           CAST(d.ch AS INT) AS channels,
           CAST(d.bits AS INT) AS bits,
           CAST(d.nf AS BIGINT) AS n_frames,
           CAST(d.nf * 1000000 // d.sr AS BIGINT) AS duration_us,
           CAST(s.s0 AS BIGINT) AS sum_ch0,
           CAST(s.s1 AS BIGINT) AS sum_ch1
    FROM d JOIN s USING (doc_id)
    """,
    extra=True,  # r14 addition — takes a window slot in its build round
)
def x_wav_meta(spark, sf_dir):
    """Audio-column metadata: deterministic PCM WAV payloads
    (pipeline/multimodal.py:synth_wav — real RIFF bytes, integer
    sample law) decoded by the dependency-free chunk walker
    (decode_wav_audio: sample rate, channels, bit depth, frame count,
    exact micro-unit duration, exact per-channel sample sums) over an
    Arrow-batched narrow map.  The oracle replays the generator law in
    pure SQL — the WAV bytes exist only on the Spark side, so the
    check covers the ENCODER and DECODER round-trip, not just the
    arithmetic."""
    from pigout_spark.pipeline.multimodal import (
        decode_wav_audio,
        synth_wav_payloads,
    )

    d = synth_wav_payloads(
        t(spark, sf_dir, "documents").select("doc_id"), "doc_id"
    )
    return decode_wav_audio(d, "payload", "doc_id")


# Video (AVI/RIFF) container metadata — with x_wav_meta this closes the
# last brief-named multimodal hole (audio/video columns): payloads are
# REAL spec-shaped AVI containers (LIST hdrl / avih main header) built
# by synth_avi, parsed back by the shared RIFF chunk walker; the oracle
# replays the generator law in pure SQL.
@query(
    "x_avi_meta",
    """
    SELECT doc_id,
           CAST(160 * (1 + doc_id % 4) AS INT) AS width,
           CAST(120 * (1 + doc_id % 4) AS INT) AS height,
           CAST(24 + (doc_id % 240) AS BIGINT) AS total_frames,
           CAST(CASE WHEN doc_id % 2 = 0 THEN 33333 ELSE 41666 END
                AS BIGINT) AS us_per_frame,
           CAST(1 + (doc_id % 2) AS INT) AS streams,
           CAST((24 + (doc_id % 240))
                * (CASE WHEN doc_id % 2 = 0 THEN 33333 ELSE 41666 END)
                AS BIGINT) AS duration_us,
           CAST(1000000000
                // (CASE WHEN doc_id % 2 = 0 THEN 33333 ELSE 41666 END)
                AS BIGINT) AS fps_milli
    FROM documents
    """,
    extra=True,  # r14 addition — r15 rotation candidate
)
def x_avi_meta(spark, sf_dir):
    """Video-container metadata: deterministic AVI payloads
    (pipeline/multimodal.py:synth_avi — real RIFF 'AVI ' bytes with a
    spec-shaped LIST hdrl/avih main header) decoded by the
    dependency-free chunk walker (decode_avi_videos: dimensions, frame
    count, exact integer duration and milli-fps) over an Arrow-batched
    narrow map.  The oracle replays the generator law in pure SQL —
    the AVI bytes exist only on the Spark side, so the check covers
    the container encoder and header walk, not just the arithmetic."""
    from pigout_spark.pipeline.multimodal import (
        decode_avi_videos,
        synth_avi_payloads,
    )

    d = synth_avi_payloads(
        t(spark, sf_dir, "documents").select("doc_id"), "doc_id"
    )
    return decode_avi_videos(d, "payload", "doc_id")


# mapInPandas row multiplication — against a pure-SQL byte-math oracle.
@query(
    "x_mm_frames",
    """
    WITH d AS (
      SELECT doc_id, encode(text) AS payload FROM documents
    ), n AS (
      SELECT doc_id, payload,
             CAST(ceil(octet_length(payload) / 64.0) AS BIGINT) AS n_chunks
      FROM d
    )
    SELECT doc_id,
           CAST(unnest(range(0, n_chunks, 2)) AS INT) AS frame_idx,
           CAST(octet_length(payload) AS BIGINT) AS byte_len
    FROM n
    """,
    extra=True,
)
def x_mm_frames(spark, sf_dir):
    """sample_frames (video-pipeline shape: payload → every-2nd 64-byte
    'frame') joined back to byte length — frame indices and row
    multiplication must match the SQL range() oracle exactly."""
    from pigout_spark.pipeline.multimodal import binarize, sample_frames

    d = binarize(t(spark, sf_dir, "documents"), "text")
    frames = sample_frames(d, stride=2)
    lens = d.select("doc_id", F.octet_length("payload").cast("long").alias("byte_len"))
    return frames.join(lens, "doc_id").select("doc_id", "frame_idx", "byte_len")


# ------------------------------------------------------------- curation ---
@query(
    "x_decontaminate",
    f"""
    WITH t AS (
      SELECT doc_id, lang, {_SQL_TOKS} AS tk FROM documents
    ), sh AS (
      SELECT doc_id, lang,
             unnest(CASE WHEN len(tk) >= 4 THEN
               list_transform(range(0, len(tk) - 3),
                              i -> md5(array_to_string(tk[i+1:i+4], ' ')))
             ELSE CAST([] AS VARCHAR[]) END) AS sh
      FROM t
    ), bench AS (
      SELECT DISTINCT sh FROM sh WHERE lang = 'en'
    ), bad AS (
      SELECT DISTINCT s.doc_id FROM sh s JOIN bench b ON s.sh = b.sh
      WHERE s.lang <> 'en'
    )
    SELECT d.doc_id, d.lang FROM documents d
    WHERE d.lang <> 'en' AND d.doc_id NOT IN (SELECT doc_id FROM bad)
    """,
)
def x_decontaminate(spark, sf_dir):
    """Benchmark decontamination (13-gram rule, n=4 at fixture doc
    length): non-English docs sharing any 4-token shingle with the
    'en' corpus are dropped — shingle inverted-join, never doc×doc
    (pipeline/curation.py)."""
    from pigout_spark.pipeline.curation import decontaminate

    d = t(spark, sf_dir, "documents")
    bench = d.filter(F.col("lang") == "en")
    train = d.filter(F.col("lang") != "en")
    return decontaminate(train, bench, n=4).select("doc_id", "lang")


@query(
    "x_token_budget",
    f"""
    WITH t AS (
      SELECT doc_id, source, CAST(len({_SQL_TOKS}) AS BIGINT) AS ntok
      FROM documents
    ), c AS (
      SELECT doc_id, source,
             SUM(ntok) OVER (PARTITION BY source ORDER BY doc_id
                             ROWS UNBOUNDED PRECEDING) AS cum
      FROM t
    )
    SELECT doc_id, source FROM c WHERE cum <= 200
    """,
)
def x_token_budget(spark, sf_dir):
    """Token-budget selection: per source, docs in id order until a
    200-token budget — per-group window cumsum, one shuffle on the
    group key (pipeline/curation.py)."""
    from pigout_spark.pipeline.curation import token_budget_select

    d = t(spark, sf_dir, "documents")
    return token_budget_select(
        d, "source", budget=200, order_col=F.col("doc_id"), ascending=True
    ).select("doc_id", "source")


@query(
    "x_shuffle_order",
    """
    SELECT doc_id,
           CAST(ROW_NUMBER() OVER (
             ORDER BY md5('42' || '|' || coalesce(doc_id::VARCHAR, chr(0)))
           ) AS BIGINT) AS shuffle_rank
    FROM documents
    """,
    extra=True,  # 50-query window full; selfcheck + pytest verified
)
def x_shuffle_order(spark, sf_dir):
    """Deterministic training-set SHUFFLE: the md5(seed||id) permutation
    stamped by the two-pass row_rank — the full position column is
    hash-checked, so any engine derives the identical sample order."""
    from pigout_spark.pipeline.curation import shuffle_deterministic

    d = t(spark, sf_dir, "documents").select("doc_id")
    return shuffle_deterministic(d, ["doc_id"], seed="42")


@query(
    "x_text_unigram",
    f"""
    WITH b AS (
      SELECT doc_id, unnest({_SQL_TOKS}) AS tok FROM documents
    ), fr AS (
      SELECT tok, COUNT(*) AS tf FROM b GROUP BY tok
    ), tot AS (
      SELECT CAST(SUM(tf) AS DOUBLE) AS n FROM fr
    )
    SELECT doc_id,
           ROUND(AVG(ln(tf / n)), 6) + 0.0 AS mean_logprob6,
           CAST(COUNT(*) AS BIGINT) AS n_tokens
    FROM b JOIN fr USING (tok) CROSS JOIN tot
    GROUP BY doc_id
    """,
    extra=True,  # 50-query window full; selfcheck + pytest verified
)
def x_text_unigram(spark, sf_dir):
    """Unigram-LM quality score (the CCNet-style perplexity proxy):
    corpus-trained token frequencies → per-doc mean log-probability.
    Rounded to 6 decimals for the hash (ln is transcendental — engines
    agree to ~1 ulp, q34's convention), counts exact."""
    from pigout_spark.pipeline.text import unigram_logprob

    out = unigram_logprob(tf(spark, sf_dir, "documents"))
    return out.select(
        "doc_id",
        (F.round("mean_logprob", 6) + F.lit(0.0)).alias("mean_logprob6"),
        "n_tokens",
    )


@query(
    "x_dedup_passages",
    f"""
    WITH f AS (
      SELECT doc_id, {_SQL_TOKS} AS toks FROM documents
    ), s AS (
      SELECT doc_id, toks, len(toks) AS n FROM f WHERE len(toks) >= 13
    ), p AS (
      SELECT doc_id, unnest(range(0, n - 12)) AS start, toks FROM s
    ), h AS (
      SELECT doc_id, CAST(start AS BIGINT) AS start,
             md5(array_to_string(list_slice(toks, start + 1, start + 13),
                                 ' ')) AS sh
      FROM p
    ), c AS (
      SELECT sh, CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS ndocs
      FROM h GROUP BY sh
    )
    SELECT doc_id, start, sh, ndocs
    FROM h JOIN c USING (sh) WHERE ndocs >= 2
    """,
)
def x_dedup_passages(spark, sf_dir):
    """Duplicate-passage detection (exact-substring dedup family, Lee
    et al.'s problem at 13-gram granularity): every POSITION of every
    13-token shingle shared by ≥2 distinct docs — span-level output so
    downstream surgery can cut boilerplate instead of dropping docs.
    The hash pins doc, position, shingle hash, and corpus df."""
    from pigout_spark.pipeline.dedup import duplicate_passage_spans

    return duplicate_passage_spans(
        tf(spark, sf_dir, "documents"), n=13, min_docs=2
    )


@query(
    "x_passage_stats",
    f"""
    WITH f AS (
      SELECT doc_id, {_SQL_TOKS} AS toks FROM documents
    ), s AS (
      SELECT doc_id, toks, len(toks) AS n FROM f WHERE len(toks) >= 13
    ), p AS (
      SELECT doc_id, unnest(range(0, n - 12)) AS start, toks FROM s
    ), h AS (
      SELECT doc_id,
             md5(array_to_string(list_slice(toks, start + 1, start + 13),
                                 ' ')) AS sh
      FROM p
    ), c AS (
      SELECT sh, COUNT(DISTINCT doc_id) AS nd FROM h GROUP BY sh
    ), pd AS (
      SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_shingles,
             CAST(SUM(CASE WHEN nd >= 2 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_dup_shingles
      FROM h JOIN c USING (sh) GROUP BY doc_id
    )
    SELECT d.doc_id,
           coalesce(n_shingles, 0) AS n_shingles,
           coalesce(n_dup_shingles, 0) AS n_dup_shingles,
           CASE WHEN coalesce(n_shingles, 0) > 0
                THEN n_dup_shingles / n_shingles ELSE 0.0
           END AS dup_fraction
    FROM documents d LEFT JOIN pd USING (doc_id)
    """,
)
def x_passage_stats(spark, sf_dir):
    """Per-doc duplicate-passage profile: shingle positions, duplicated
    positions, duplicated fraction — the doc-level 'mostly boilerplate'
    filter signal; sub-13-token docs emitted with zeros."""
    from pigout_spark.pipeline.dedup import passage_dup_stats

    return passage_dup_stats(
        tf(spark, sf_dir, "documents"), n=13, min_docs=2
    )


#: mixture recipe for the oracle — exercises the rate cap (src0 kept
#: whole: 0.5·60 > 25), fractional rates (src1, src2), and recipe-absent
#: domains (src3… dropped).  Rate literals are Python-computed floats
#: embedded via repr() so Spark and DuckDB compare against the exact
#: same double.
_MIX_W = {"src0": 0.5, "src1": 0.3, "src2": 0.2}
_MIX_T = 60
_MIX_RATES_SQL = ", ".join(
    f"('{d}', {w * _MIX_T!r})" for d, w in _MIX_W.items()
)


@query(
    "x_mixture_sample",
    f"""
    WITH counts AS (
      SELECT source, CAST(COUNT(*) AS BIGINT) AS nd
      FROM documents GROUP BY source
    ), recipe(source, wt) AS (
      VALUES {_MIX_RATES_SQL}
    )
    SELECT d.doc_id, d.source
    FROM documents d
    JOIN counts USING (source)
    JOIN recipe USING (source)
    WHERE ('0x' || substring(md5('7' || '|' ||
                   coalesce(d.doc_id::VARCHAR, chr(0))), 1, 8))::BIGINT
          / 4294967296.0
          < least(1.0, wt / nd)
    """,
)
def x_mixture_sample(spark, sf_dir):
    """Domain-mixture sampling to a target recipe (news×0.5 web×0.3 …):
    per-domain deterministic md5-threshold rates min(1, w_d·T/n_d) —
    counts aggregate broadcast back, selection a narrow map.  The hash
    pins the exact surviving row set in both engines."""
    from pigout_spark.pipeline.curation import mixture_sample

    d = t(spark, sf_dir, "documents")
    return mixture_sample(
        d, "source", _MIX_W, _MIX_T, ["doc_id"], seed="7"
    ).select("doc_id", "source")


@query(
    "x_bpe_pairs",
    f"""
    WITH f AS (
      SELECT {_SQL_TOKS} AS toks FROM documents
    ), w AS (
      SELECT unnest(toks) AS word FROM f
    ), wc AS (
      SELECT word, CAST(COUNT(*) AS BIGINT) AS n FROM w GROUP BY word
    ), i AS (
      SELECT word, n, unnest(range(1, length(word))) AS i
      FROM wc WHERE length(word) >= 2
    )
    SELECT substring(word, i, 2) AS pair, CAST(SUM(n) AS BIGINT) AS cnt
    FROM i GROUP BY pair
    """,
)
def x_bpe_pairs(spark, sf_dir):
    """BPE tokenizer-training pair statistics: adjacent character-pair
    frequency weighted by word frequency — the corpus pass is the word
    count; pair extraction runs over the vocabulary only (the scalable
    BPE formulation; pipeline/text.py bpe_pair_counts + bpe_train)."""
    from pigout_spark.pipeline.text import bpe_pair_counts

    return bpe_pair_counts(tf(spark, sf_dir, "documents"))


#: DSIR oracle CTE spine, shared by weights + resample: unigram models
#: over corpus (all documents) and target (source='src0'), Laplace α=0.5
#: over the joint vocabulary.
_DSIR_CTES = f"""
    WITH ct AS (
      SELECT doc_id, unnest({_SQL_TOKS}) AS tok FROM documents
    ), cf AS (
      SELECT tok, CAST(COUNT(*) AS BIGINT) AS cfn FROM ct GROUP BY tok
    ), tt AS (
      SELECT unnest({_SQL_TOKS}) AS tok FROM documents WHERE source = 'src0'
    ), tfq AS (
      SELECT tok, CAST(COUNT(*) AS BIGINT) AS tfn FROM tt GROUP BY tok
    ), vv AS (
      SELECT CAST(COUNT(*) AS DOUBLE) AS v
      FROM (SELECT tok FROM cf UNION SELECT tok FROM tfq)
    ), sc AS (
      SELECT (SELECT CAST(SUM(cfn) AS DOUBLE) FROM cf) AS nc,
             (SELECT CAST(SUM(tfn) AS DOUBLE) FROM tfq) AS nt,
             (SELECT v FROM vv) AS v
    ), w AS (
      SELECT doc_id,
             SUM(ln((coalesce(tfn, 0) + 0.5) / (nt + 0.5 * v))
                 - ln((cfn + 0.5) / (nc + 0.5 * v))) AS log_weight,
             CAST(COUNT(*) AS BIGINT) AS n_tokens
      FROM ct JOIN cf USING (tok) LEFT JOIN tfq USING (tok)
      CROSS JOIN sc
      GROUP BY doc_id
    )
"""


@query(
    "x_dsir_weights",
    _DSIR_CTES
    + """
    SELECT doc_id, ROUND(log_weight, 6) + 0.0 AS log_weight6, n_tokens
    FROM w
    """,
)
def x_dsir_weights(spark, sf_dir):
    """DSIR-style importance weights: per-doc log-likelihood ratio of a
    target-domain unigram LM (here: the src0 slice) vs the corpus LM,
    Laplace-smoothed over the joint vocabulary — the data-selection
    scoring pass (pipeline/curation.py importance_weights).  Rounded
    to 6 decimals (ln transcendental; x_text_unigram convention)."""
    from pigout_spark.pipeline.curation import importance_weights

    d = t(spark, sf_dir, "documents")
    out = importance_weights(d, d.filter(F.col("source") == "src0"))
    return out.select(
        "doc_id", (F.round("log_weight", 6) + F.lit(0.0)).alias("log_weight6"), "n_tokens"
    )


@query(
    "x_dsir_sample",
    _DSIR_CTES
    + """
    , g AS (
      SELECT doc_id,
             log_weight
             - ln(-ln((('0x' || substring(md5('5' || '|' ||
                          coalesce(doc_id::VARCHAR, chr(0))), 1, 8))::BIGINT
                       + 0.5) / 4294967296.0)) AS score
      FROM w
    )
    SELECT doc_id, ROUND(score, 6) + 0.0 AS score6
    FROM g ORDER BY score DESC, doc_id LIMIT 100
    """,
)
def x_dsir_sample(spark, sf_dir):
    """DSIR selection step: Gumbel top-k resampling (score = log w +
    deterministic md5-derived Gumbel noise; top-k by score IS the
    weighted without-replacement draw) — TakeOrdered, no global sort.
    The hash pins the exact 100-doc draw in both engines."""
    from pigout_spark.pipeline.curation import importance_resample

    d = t(spark, sf_dir, "documents")
    out = importance_resample(
        d, d.filter(F.col("source") == "src0"), k=100, seed="5"
    )
    return out.select("doc_id", (F.round("score", 6) + F.lit(0.0)).alias("score6"))


@query(
    "x_corpus_stats",
    f"""
    WITH d AS (
      SELECT doc_id, text, {_SQL_TOKS} AS toks FROM documents
    ), a AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
             CAST(SUM(CASE WHEN length(trim(text)) = 0 THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_empty_docs,
             CAST(SUM(length(text)) AS BIGINT) AS n_chars,
             CAST(SUM(len(toks)) AS BIGINT) AS n_tokens
      FROM d
    ), v AS (
      SELECT CAST(COUNT(DISTINCT tok) AS BIGINT) AS n_distinct_tokens
      FROM (SELECT unnest(toks) AS tok FROM d)
    ), du AS (
      SELECT CAST(SUM(c - 1) AS BIGINT) AS n_exact_dup_docs
      FROM (SELECT COUNT(*) AS c FROM documents GROUP BY md5(text))
    )
    SELECT * FROM a, v, du
    """,
)
def x_corpus_stats(spark, sf_dir):
    """One-row corpus dashboard: docs, empties, chars, tokens, vocab,
    exact-dup count — the summary every curation run logs; one corpus
    pass, broadcast-sized intermediates (pipeline/text.py)."""
    from pigout_spark.pipeline.text import corpus_stats

    return corpus_stats(t(spark, sf_dir, "documents"))


#: Fixed merge table for the hash-checked encode (r6, VERDICT task 7):
#: the TRAINING loop is argmax-dependent and stays rows-only below, but
#: ENCODE under a fixed merge table is SQL-replayable — the oracle
#: materializes the table as VALUES and replays the greedy lowest-rank
#: merge loop as a recursive CTE (validated symbol-for-symbol against
#: bpe_apply_merges over the whole vocabulary).
_BPE_FIXED_MERGES = [
    ("t", "a"), ("ta", "b"), ("tab", "l"), ("tabl", "e"),
    ("a", "g"), ("s", "c"), ("r", "o"), ("v", "a"), ("va", "l"),
    ("e", "r"), ("o", "w"), ("i", "n"),
]
_BPE_VALUES = ", ".join(
    f"({i}, '{l}', '{r}')" for i, (l, r) in enumerate(_BPE_FIXED_MERGES)
)
#: symbol-string representation: ␟sym␟␟sym␟␟…␟sym␟ — DOUBLE separator
#: between symbols so one non-overlapping replace() pass merges every
#: occurrence left-to-right exactly like the Python sweep (single
#: separators would make adjacent occurrences share a character and
#: leave every second one unmerged per pass)
_BPE_PAT = "chr(31)||m.l||chr(31)||chr(31)||m.r||chr(31)"


@query(
    "x_bpe_encode",
    f"""
    WITH RECURSIVE m(rank, l, r) AS (VALUES {_BPE_VALUES}),
    f AS (
      SELECT doc_id, {_SQL_TOKS} AS toks FROM documents
    ), dw AS (
      SELECT doc_id, i AS pos, toks[i] AS word
      FROM f, unnest(range(1, len(toks)+1)) AS u(i)
    ), words AS (
      SELECT DISTINCT word FROM dw
    ), seed AS (
      SELECT word,
             chr(31) || array_to_string(
               list_transform(range(1, length(word)+1), i -> word[i]),
               chr(31)||chr(31)) || chr(31) AS s
      FROM words
    ), enc AS (
      SELECT word, s FROM seed
      UNION ALL
      SELECT e.word,
             replace(e.s, chr(31)||b.l||chr(31)||chr(31)||b.r||chr(31),
                     chr(31)||b.l||b.r||chr(31)) AS s
      FROM enc e
      JOIN LATERAL (
        SELECT l, r FROM m
        WHERE position({_BPE_PAT} IN e.s) > 0
        ORDER BY rank LIMIT 1
      ) b ON TRUE
    ), final AS (
      SELECT word,
             replace(trim(s, chr(31)), chr(31)||chr(31), chr(31)) AS js
      FROM enc e
      WHERE NOT EXISTS (
        SELECT 1 FROM m WHERE position({_BPE_PAT} IN e.s) > 0)
    )
    SELECT doc_id,
           md5(string_agg(js, chr(31) ORDER BY pos)) AS bpe_fp,
           CAST(SUM(len(string_split(js, chr(31)))) AS BIGINT) AS n_bpe_tokens
    FROM dw JOIN final USING (word)
    GROUP BY doc_id
    """,
    extra=True,  # rotated into the driver window in r6 (__init__.py)
)
def x_bpe_encode(spark, sf_dir):
    """BPE encode under a fixed merge table, hash-checked end-to-end:
    Python confined to the DISTINCT-WORD vocabulary (mapInPandas),
    corpus re-assembled by a positional join — never row-at-a-time over
    corpus volume.  The oracle replays the greedy lowest-rank merge
    loop as a recursive CTE over the same VALUES merge table."""
    from pigout_spark.pipeline.text import bpe_encode

    d = t(spark, sf_dir, "documents")
    return bpe_encode(d, _BPE_FIXED_MERGES).select(
        "doc_id",
        F.md5(F.concat_ws("\x1f", "bpe_tokens")).alias("bpe_fp"),
        "n_bpe_tokens",
    )


@query("x_bpe_encode_trained", extra=True)  # rows-only: the TRAIN loop
# (8 corpus-trained merges feeding encode) is genuinely
# non-SQL-expressible — iterative argmax-dependent rewriting; pytest
# pins exact token output, and x_bpe_encode hash-checks the encode half.
def x_bpe_encode_trained(spark, sf_dir):
    """BPE train→encode integration: corpus-trained merges applied to
    the same corpus (the x_bpe_pairs + x_bpe_encode machinery chained;
    pipeline/text.py bpe_train/bpe_encode)."""
    from pigout_spark.pipeline.text import bpe_encode, bpe_train

    d = t(spark, sf_dir, "documents")
    merges = bpe_train(d, 8)
    return bpe_encode(d, merges).select(
        "doc_id",
        F.md5(F.concat_ws("\x1f", "bpe_tokens")).alias("bpe_fp"),
        "n_bpe_tokens",
    )


#: split recipe for the oracle — cumulative thresholds are the SAME
#: Python-computed floats on both sides (repr-embedded in the SQL)
_SPLIT_W = {"train": 0.8, "val": 0.1, "test": 0.1}
_SPLIT_CUM = []
_acc = 0.0
for _n, _w in list(_SPLIT_W.items())[:-1]:
    _acc += _w / sum(_SPLIT_W.values())
    _SPLIT_CUM.append((_n, _acc))
_SPLIT_CASE = (
    "CASE "
    + " ".join(f"WHEN __u < {c!r} THEN '{n}'" for n, c in _SPLIT_CUM)
    + f" ELSE '{list(_SPLIT_W)[-1]}' END"
)


@query(
    "x_split_corpus",
    f"""
    WITH u AS (
      SELECT doc_id,
             ('0x' || substring(md5('13' || '|' ||
                coalesce(doc_id::VARCHAR, chr(0))), 1, 8))::BIGINT
             / 4294967296.0 AS __u
      FROM documents
    )
    SELECT doc_id, {_SPLIT_CASE} AS split FROM u
    """,
    extra=True,  # window full at 50; selfcheck + pytest verified
)
def x_split_corpus(spark, sf_dir):
    """Deterministic train/val/test split (80/10/10): md5-bucketed
    threshold over the doc id — reproducible, engine-replayable,
    content-stable across reprocessing; pure narrow map.  The hash
    pins every row's split label."""
    from pigout_spark.pipeline.curation import split_corpus

    d = t(spark, sf_dir, "documents").select("doc_id")
    return split_corpus(d, _SPLIT_W, ["doc_id"], seed="13")


_QUALITY_SQL =     f"""
    WITH f AS (
      SELECT doc_id, {_SQL_TOKS} AS toks,
             list_filter(string_split(text, chr(10)), x -> x <> '') AS lines
      FROM documents
    ), feats AS (
      SELECT doc_id, CAST(len(toks) AS BIGINT) AS n_tokens,
             CASE WHEN len(toks) > 0 THEN
               list_reduce(list_prepend(0, list_transform(toks, t -> length(t))),
                           (a, x) -> a + x) / len(toks)
             ELSE 0.0 END AS avg_token_len,
             CASE WHEN len(toks) > 0 THEN
               len(list_distinct(toks)) / len(toks)
             ELSE 0.0 END AS distinct_frac
      FROM f
    ), s AS (
      SELECT doc_id, toks, len(toks) AS n, len(lines) AS nl,
             len(list_distinct(lines)) AS ndl
      FROM f WHERE len(toks) >= 2
    ), g AS (
      SELECT doc_id, n, nl, ndl,
             unnest(list_transform(range(1, n),
                                   i -> toks[i] || ' ' || toks[i + 1])) AS gram
      FROM s
    ), c AS (
      SELECT doc_id, n, nl, ndl, gram, COUNT(*) AS cnt FROM g GROUP BY ALL
    ), rep AS (
      SELECT doc_id, MAX(cnt) / (n - 1) AS t2,
             CASE WHEN nl > 0 THEN 1.0 - ndl / nl ELSE 0.0 END AS dl
      FROM c GROUP BY doc_id, n, nl, ndl
    ), j AS (
      SELECT feats.*, coalesce(t2, 0.0) AS t2, coalesce(dl, 0.0) AS dl
      FROM feats LEFT JOIN rep USING (doc_id)
    )
    SELECT doc_id, n_tokens, avg_token_len, distinct_frac,
           t2 AS top_2gram_frac, dl AS dup_line_frac,
           coalesce(array_to_string(list_filter([
             CASE WHEN NOT (n_tokens >= 3.0) THEN 'min_tokens' END,
             CASE WHEN NOT (n_tokens <= 100000.0) THEN 'max_tokens' END,
             CASE WHEN NOT (avg_token_len >= 2.0) THEN 'min_avg_token_len' END,
             CASE WHEN NOT (avg_token_len <= 12.0) THEN 'max_avg_token_len' END,
             CASE WHEN NOT (t2 <= 0.3) THEN 'max_top_2gram_frac' END,
             CASE WHEN NOT (dl <= 0.3) THEN 'max_dup_line_frac' END,
             CASE WHEN NOT (distinct_frac >= 0.2) THEN 'min_distinct_frac' END
           ], x -> x IS NOT NULL), ','), '') AS failed_csv,
           (n_tokens >= 3.0 AND n_tokens <= 100000.0
            AND avg_token_len >= 2.0 AND avg_token_len <= 12.0
            AND t2 <= 0.3 AND dl <= 0.3 AND distinct_frac >= 0.2) AS keep
    FROM j
    """


@query(
    "x_quality_filter",
    _QUALITY_SQL,
    extra=True,  # rotated into the driver window in r6 (__init__.py)
)
def x_quality_filter(spark, sf_dir):
    """Composite C4/Gopher-style quality filter: every rule evaluated
    in one pass, verdict + failed-rule audit trail hash-checked (the
    failed array joined to CSV for the comparator)."""
    from pigout_spark.pipeline.text import quality_filter

    out = quality_filter(t(spark, sf_dir, "documents"))
    return out.select(
        "doc_id", "n_tokens", "avg_token_len", "distinct_frac",
        "top_2gram_frac", "dup_line_frac",
        F.concat_ws(",", "failed").alias("failed_csv"), "keep",
    )


@query(
    "x_text_rep_narrow",
    f"""
    WITH f AS (
      SELECT doc_id, list_slice({_SQL_TOKS}, 1, 8) AS t,
             list_filter(string_split(text, chr(10)), x -> x <> '') AS lines
      FROM documents
    ), g AS (
      SELECT doc_id, lines,
             CASE WHEN len(t) >= 2
                  THEN list_transform(range(1, len(t)),
                                      i -> t[i] || ' ' || t[i + 1])
                  ELSE [] END AS grams
      FROM f
    )
    SELECT doc_id,
           CAST(len(grams) AS BIGINT) AS n_2grams,
           CAST(coalesce(list_max(list_transform(grams,
                  g -> len(list_filter(grams, x -> x = g)))), 0)
                AS BIGINT) AS top_2gram_n,
           CASE WHEN len(grams) > 0 THEN
             list_max(list_transform(grams,
               g -> len(list_filter(grams, x -> x = g)))) / len(grams)
           ELSE 0.0 END AS top_2gram_frac,
           CASE WHEN len(lines) > 0
                THEN 1.0 - len(list_distinct(lines)) / len(lines)
                ELSE 0.0 END AS dup_line_frac
    FROM g
    """,
    extra=True,  # window full at 50; selfcheck + pytest verified
)
def x_text_rep_narrow(spark, sf_dir):
    """Shuffle-free repetition signals (the streaming-ingest variant)
    at a deliberately small token cap (8) so the truncation path is
    active on the fixture — every doc-local O(n²) count hash-checked
    against DuckDB's lambda twin."""
    from pigout_spark.pipeline.text import repetition_features_narrow

    out = repetition_features_narrow(
        t(spark, sf_dir, "documents").select("doc_id", "text"), max_tokens=8
    )
    return out.select(
        "doc_id", "n_2grams", "top_2gram_n", "top_2gram_frac", "dup_line_frac"
    )


@query(
    "x_tfidf_terms",
    f"""
    WITH b AS (
      SELECT doc_id, unnest({_SQL_TOKS}) AS term FROM documents
    ), tf AS (
      SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS tf
      FROM b GROUP BY doc_id, term
    ), dfq AS (
      SELECT term, CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS df
      FROM b GROUP BY term
    ), nd AS (
      SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM documents
    ), s AS (
      SELECT doc_id, term, tf, df, tf * ln(n / df) AS tfidf,
             CAST(ROW_NUMBER() OVER (
               PARTITION BY doc_id ORDER BY tf * ln(n / df) DESC, term
             ) AS BIGINT) AS rk
      FROM tf JOIN dfq USING (term) CROSS JOIN nd
    )
    SELECT doc_id, term, tf, df, ROUND(tfidf, 6) AS tfidf6, rk
    FROM s WHERE rk <= 5
    """,
    extra=True,  # window full at 50; selfcheck + pytest verified
)
def x_tfidf_terms(spark, sf_dir):
    """Top-5 TF-IDF terms per doc (keyword extraction): (doc, term)
    count + vocabulary-sized df join + per-doc window top-k with a
    term tiebreak — the full ranking hash-checked (ln rounded to 6,
    x_text_unigram convention)."""
    from pigout_spark.pipeline.text import tfidf_top_terms

    out = tfidf_top_terms(t(spark, sf_dir, "documents"), k=5)
    return out.select(
        "doc_id", "term", "tf", "df",
        F.round("tfidf", 6).alias("tfidf6"), "rk",
    )


@query(
    "x_pmi_pairs",
    f"""
    WITH f AS (
      SELECT {_SQL_TOKS} AS t FROM documents
    ), s AS (
      SELECT t FROM f WHERE len(t) >= 2
    ), p AS (
      SELECT unnest(list_transform(range(1, len(t)),
                    i -> struct_pack(x := t[i], y := t[i + 1]))) AS pr
      FROM s
    ), pairs AS (
      SELECT pr.x AS x, pr.y AS y FROM p
    ), pc AS (
      SELECT x, y, CAST(COUNT(*) AS BIGINT) AS pair_n
      FROM pairs GROUP BY x, y HAVING COUNT(*) >= 5
    ), uni AS (
      SELECT tok, CAST(COUNT(*) AS BIGINT) AS c
      FROM (SELECT unnest({_SQL_TOKS}) AS tok FROM documents) GROUP BY tok
    ), tot AS (
      SELECT CAST(COUNT(*) AS DOUBLE) AS T FROM pairs
    )
    SELECT x, y, pair_n,
           ROUND(ln(pair_n * T / (ux.c * uy.c)), 6) + 0.0 AS pmi6
    FROM pc
    JOIN uni ux ON pc.x = ux.tok
    JOIN uni uy ON pc.y = uy.tok
    CROSS JOIN tot
    """,
    extra=True,  # window full at 50; selfcheck + pytest verified
)
def x_pmi_pairs(spark, sf_dir):
    """Adjacent-pair PMI (collocation / embedding-prep statistic):
    pair + unigram counts, two vocabulary-keyed joins, min-count 5
    floor — only observed pairs, never a |V|² matrix."""
    from pigout_spark.pipeline.text import pmi_pairs

    out = pmi_pairs(t(spark, sf_dir, "documents"), min_count=5)
    return out.select(
        "x", "y", "pair_n", (F.round("pmi", 6) + F.lit(0.0)).alias("pmi6")
    )


#: SemDeDup fixture threshold: the synthetic embeddings have no true
#: near-dups (max in-cell cosine ≈ 0.51), so 0.4 sits between p99
#: (≈0.35) and the max — a discriminative, non-empty pair set.
_SEM_T = 0.4


@query(
    "x_semantic_pairs",
    _IVF_CELLS_SQL
    + f"""
    , p AS (
      SELECT a.vec_id AS a, b.vec_id AS b,
             {_sql_dot('a.v', 'b.v')} / (a.nrm * b.nrm) AS cos
      FROM cells a JOIN cells b
        ON a.cell = b.cell AND a.vec_id < b.vec_id
    )
    SELECT a, b, ROUND(cos, 6) AS cos6 FROM p WHERE cos >= {_SEM_T!r}
    """,
    extra=True,  # window full at 50; selfcheck + pytest verified
)
def x_semantic_pairs(spark, sf_dir):
    """SemDeDup-style semantic near-dup pairs: k-means-cell-restricted
    exact cosine — candidates Σ C(cell,2), never corpus²; the cell
    assignment replays the seeded spherical k-means bit-identically in
    SQL (sim_ivf machinery)."""
    from pigout_spark.pipeline.dedup import semantic_dedup_pairs

    out = semantic_dedup_pairs(
        tf(spark, sf_dir, "embeddings"), n_centroids=8, threshold=_SEM_T
    )
    return out.select("a", "b", F.round("cos", 6).alias("cos6"))


@query(
    "x_semantic_retain",
    _IVF_CELLS_SQL.replace("WITH ", "WITH RECURSIVE ", 1)
    + f"""
    , p AS (
      SELECT a.vec_id AS a, b.vec_id AS b
      FROM cells a JOIN cells b
        ON a.cell = b.cell AND a.vec_id < b.vec_id
      WHERE {_sql_dot('a.v', 'b.v')} / (a.nrm * b.nrm) >= {_SEM_T!r}
    ), edges AS (
      SELECT a AS u, b AS v FROM p UNION SELECT b, a FROM p
    ), reach(u, v) AS (
      SELECT u, v FROM edges
      UNION SELECT r.u, e.v FROM reach r JOIN edges e ON r.v = e.u
    ), allr AS (
      SELECT u, v FROM reach UNION SELECT u, u AS v FROM edges
    ), cl AS (
      SELECT u AS vec_id, MIN(v) AS root FROM allr GROUP BY u
    )
    SELECT vec_id, label FROM embeddings
    WHERE vec_id NOT IN (SELECT vec_id FROM cl WHERE vec_id <> root)
    """,
    extra=True,  # window full at 50; selfcheck + pytest verified
)
def x_semantic_retain(spark, sf_dir):
    """Full SemDeDup chain: cell-restricted pairs → connected
    components → keep the lowest-id representative per component;
    output is the SURVIVING embedding rows (dedup.semantic_dedup),
    oracle = recursive-CTE closure over the identical pair SQL."""
    from pigout_spark.pipeline.dedup import semantic_dedup

    out = semantic_dedup(
        t(spark, sf_dir, "embeddings"), n_centroids=8, threshold=_SEM_T
    )
    return out.select("vec_id", "label")


@query(
    "x_sample_exact",
    """
    WITH r AS (
      SELECT doc_id, source,
             ROW_NUMBER() OVER (
               PARTITION BY source
               ORDER BY md5('3' || '|' || coalesce(doc_id::VARCHAR, chr(0)))
             ) AS rk
      FROM documents
    )
    SELECT doc_id, source FROM r WHERE rk <= 7
    """,
    extra=True,  # window full at 50; selfcheck + pytest verified
)
def x_sample_exact(spark, sf_dir):
    """Exact-count deterministic sample: exactly 7 docs per source by
    md5-hash rank — the reproducible eval-subset primitive; the hash
    pins the exact selected row set."""
    from pigout_spark.pipeline.curation import sample_exact_n

    d = t(spark, sf_dir, "documents").select("doc_id", "source")
    return sample_exact_n(d, 7, ["doc_id"], seed="3", by="source")


def _cms_bucket_sql(tok_sql: str, row: int, width: int) -> str:
    return (
        f"(('0x' || substring(md5('{row}' || '#' || {tok_sql}), 1, 8))::BIGINT"
        f" % {width})"
    )


@query(
    "x_cms_sketch",
    f"""
    WITH toks AS (
      SELECT unnest({_SQL_TOKS}) AS tok FROM documents
    ), pairs AS (
      {' UNION ALL '.join(
          f"SELECT {d} AS row, {_cms_bucket_sql('tok', d, 1024)} AS bucket FROM toks"
          for d in range(4)
      )}
    )
    SELECT row, bucket, CAST(COUNT(*) AS BIGINT) AS cnt
    FROM pairs GROUP BY row, bucket
    """,
    extra=True,  # window full at 50; selfcheck + pytest verified
)
def x_cms_sketch(spark, sf_dir):
    """Count-Min sketch over the corpus token stream (4×1024,
    md5-salted rows): the full counter table hash-checked cell by
    cell — one explode + one map-side-combined groupBy."""
    from pigout_spark.pipeline.sketches import cms_build

    return cms_build(t(spark, sf_dir, "documents"), depth=4, width=1024)


@query(
    "x_cms_estimate",
    f"""
    WITH toks AS (
      SELECT unnest({_SQL_TOKS}) AS tok FROM documents
    ), pairs AS (
      {' UNION ALL '.join(
          f"SELECT {d} AS row, {_cms_bucket_sql('tok', d, 1024)} AS bucket FROM toks"
          for d in range(4)
      )}
    ), sk AS (
      SELECT row, bucket, CAST(COUNT(*) AS BIGINT) AS cnt
      FROM pairs GROUP BY row, bucket
    ), q AS (
      SELECT DISTINCT tok AS term FROM toks
    ), probes AS (
      {' UNION ALL '.join(
          f"SELECT term, {d} AS row, {_cms_bucket_sql('term', d, 1024)} AS bucket FROM q"
          for d in range(4)
      )}
    )
    SELECT term, MIN(coalesce(cnt, 0)) AS est
    FROM probes LEFT JOIN sk USING (row, bucket)
    GROUP BY term
    """,
    extra=True,  # window full at 50; selfcheck + pytest verified
)
def x_cms_estimate(spark, sf_dir):
    """CMS point queries for every distinct corpus token: min over the
    4 salted rows — estimates (≥ truth by construction) hash-checked
    against the identical SQL sketch."""
    from pigout_spark.pipeline.dedup import ws_tokens
    from pigout_spark.pipeline.sketches import (
        cms_build_from_counts,
        cms_estimate,
    )

    # r14 (guide §2.4): ONE tokenize + ONE token-keyed aggregate feed
    # BOTH the sketch build and the probe set (the vocab relation is
    # checkpointed — vocab-sized, tiny).  The former shape tokenized
    # the corpus twice (once per side) and salted-hashed every token
    # OCCURRENCE; the probe set is provably the same term set (global
    # distinct non-empty whitespace tokens either way), so estimates
    # are bit-identical.
    d = t(spark, sf_dir, "documents")
    vocab = (
        d.select(F.explode(ws_tokens("text", distinct=False)).alias("__tok"))
        .groupBy("__tok")
        .agg(F.count(F.lit(1)).alias("__n"))
        .localCheckpoint(eager=False)
    )
    sk = cms_build_from_counts(vocab, "__tok", "__n", depth=4, width=1024)
    q = vocab.select(F.col("__tok").alias("term"))
    return cms_estimate(sk, q, depth=4, width=1024)


_KMV_HASH_SQL = (
    "('0x' || substring(md5(CAST(event_id AS VARCHAR)), 1, 15))::BIGINT"
)
_KMV_DOMAIN_SQL = "1152921504606846976.0"  # 2^60, exact double


@query(
    "x_kmv_sketch",
    f"""
    SELECT h, CAST(256 AS INTEGER) AS k FROM (
      SELECT DISTINCT {_KMV_HASH_SQL} AS h
      FROM events WHERE event_id IS NOT NULL
    ) ORDER BY h LIMIT 256
    """,
    extra=True,  # rotated into the driver window in r6 (__init__.py)
)
def x_kmv_sketch(spark, sf_dir):
    """KMV distinct sketch of event ids (k=256): the k smallest
    distinct 60-bit md5 hashes plus the carried k (self-describing
    sketch contract), hash-checked value-for-value — the
    deterministic sketch the HLL path can't oracle (sketches.py)."""
    from pigout_spark.pipeline.sketches import kmv_build

    return kmv_build(t(spark, sf_dir, "events"), "event_id", k=256)


@query(
    "x_kmv_estimate",
    f"""
    WITH hs AS (
      SELECT h FROM (
        SELECT DISTINCT {_KMV_HASH_SQL} AS h
        FROM events WHERE event_id IS NOT NULL
      ) ORDER BY h LIMIT 256
    ), a AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_hashes, MAX(h) AS mx FROM hs
    )
    SELECT n_hashes,
           CASE WHEN n_hashes < 256 THEN CAST(n_hashes AS DOUBLE)
                ELSE 255.0 / (CAST(mx AS DOUBLE) / {_KMV_DOMAIN_SQL})
           END AS est
    FROM a
    """,
    extra=True,  # window full at 50; selfcheck + pytest verified
)
def x_kmv_estimate(spark, sf_dir):
    """KMV estimator (k−1)/U_k replayed bit-for-bit by the oracle —
    exact-integer max + one IEEE division chain."""
    from pigout_spark.pipeline.sketches import kmv_build, kmv_estimate

    sk = kmv_build(t(spark, sf_dir, "events"), "event_id", k=256)
    return kmv_estimate(sk, k=256)


@query(
    "x_kmv_merge",
    f"""
    WITH ev AS (
      SELECT event_id, {_KMV_HASH_SQL} AS h
      FROM events WHERE event_id IS NOT NULL
    ), s1 AS (
      SELECT h FROM (SELECT DISTINCT h FROM ev WHERE event_id % 2 = 0)
      ORDER BY h LIMIT 256
    ), s2 AS (
      SELECT h FROM (SELECT DISTINCT h FROM ev WHERE event_id % 2 = 1)
      ORDER BY h LIMIT 256
    ), m AS (
      SELECT h FROM (
        SELECT DISTINCT h FROM (SELECT h FROM s1 UNION ALL SELECT h FROM s2)
      ) ORDER BY h LIMIT 256
    ), a AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_hashes, MAX(h) AS mx FROM m
    )
    SELECT n_hashes,
           CASE WHEN n_hashes < 256 THEN CAST(n_hashes AS DOUBLE)
                ELSE 255.0 / (CAST(mx AS DOUBLE) / {_KMV_DOMAIN_SQL})
           END AS est
    FROM a
    """,
)
def x_kmv_merge(spark, sf_dir):
    """KMV merge algebra: two shard sketches (even/odd event ids)
    union-merged then estimated — the distributed-aggregation property
    (sketch(shards) == sketch(union)) hash-checked end-to-end."""
    from pigout_spark.pipeline.sketches import (
        kmv_build,
        kmv_estimate,
        kmv_merge,
    )

    ev = t(spark, sf_dir, "events")
    s1 = kmv_build(ev.filter(F.col("event_id") % 2 == 0), "event_id", k=256)
    s2 = kmv_build(ev.filter(F.col("event_id") % 2 == 1), "event_id", k=256)
    return kmv_estimate(kmv_merge([s1, s2], k=256), k=256)


@query(
    "x_profile",
    """
    SELECT 'doc_id' AS "column", CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(COUNT(*) - COUNT(doc_id) AS BIGINT) AS n_nulls,
           CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_distinct
    FROM documents
    UNION ALL
    SELECT 'lang', CAST(COUNT(*) AS BIGINT),
           CAST(COUNT(*) - COUNT(lang) AS BIGINT),
           CAST(COUNT(DISTINCT lang) AS BIGINT)
    FROM documents
    UNION ALL
    SELECT 'source', CAST(COUNT(*) AS BIGINT),
           CAST(COUNT(*) - COUNT(source) AS BIGINT),
           CAST(COUNT(DISTINCT source) AS BIGINT)
    FROM documents
    UNION ALL
    SELECT 'n_chars', CAST(COUNT(*) AS BIGINT),
           CAST(COUNT(*) - COUNT(n_chars) AS BIGINT),
           CAST(COUNT(DISTINCT n_chars) AS BIGINT)
    FROM documents
    """,
    extra=True,  # window full at 50; selfcheck + pytest verified
)
def x_profile(spark, sf_dir):
    """Column profile (exact variant) over documents: null + distinct
    counts in long format (pipeline/text.py:profile_columns)."""
    from pigout_spark.pipeline.text import profile_columns

    return profile_columns(
        t(spark, sf_dir, "documents"), ["doc_id", "lang", "source", "n_chars"]
    )


_NORM_STRIP_RE2 = (
    "[\\x00-\\x08\\x0b\\x0c\\x0e-\\x1f\\x7f"
    "\\x{200b}\\x{200c}\\x{200d}\\x{feff}]"
)
_NORM_WS_RE2 = "[ \\t\\n\\r\\f\\v]+"


@query(
    "x_normalize",
    f"""
    SELECT doc_id,
           md5(trim(regexp_replace(regexp_replace(nfc_normalize(text),
                 '{_NORM_STRIP_RE2}', '', 'g'),
                 '{_NORM_WS_RE2}', ' ', 'g'), ' ')) AS norm_md5,
           CAST(length(trim(regexp_replace(regexp_replace(
                 nfc_normalize(text),
                 '{_NORM_STRIP_RE2}', '', 'g'),
                 '{_NORM_WS_RE2}', ' ', 'g'), ' ')) AS BIGINT) AS norm_len
    FROM documents WHERE text IS NOT NULL
    """,
    extra=True,  # window full at 50; selfcheck + pytest verified
)
def x_normalize(spark, sf_dir):
    """Unicode normalization (NFC + control/zero-width strip +
    whitespace collapse): every doc's normalized text pinned by md5 +
    length against DuckDB's nfc_normalize twin
    (pipeline/text.py:normalize_text — the sanctioned pandas-UDF
    path, since Spark has no Unicode-normalize builtin)."""
    from pigout_spark.pipeline.text import normalize_text

    d = t(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
    out = normalize_text(d)
    return out.select(
        "doc_id",
        F.md5("text_norm").alias("norm_md5"),
        F.length("text_norm").cast("long").alias("norm_len"),
    )


def _pagerank_sql(iters: int) -> str:
    # fixed-point int64 "picorank" units (pipeline/graph.py): every
    # step is integer floor arithmetic, so the replay is bit-exact by
    # construction (no decimal<->double conversions anywhere)
    ctes = [
        # integer node ids: suppliers keep their key, parts are offset
        # into a disjoint range — int64 keys shuffle/hash far cheaper
        # than prefixed strings in BOTH engines (r6).  The offset is
        # 2^32 (r7): TPC-H keys are 32-bit-bounded at any published SF,
        # so the ranges can never collide (a +10M offset would merge
        # supplier and part nodes once l_suppkey reached 10M, ~sf1000).
        "e AS (SELECT DISTINCT CAST(l_suppkey AS BIGINT) AS s,"
        " CAST(l_partkey + 4294967296 AS BIGINT) AS d FROM lineitem)",
        "deg AS (SELECT s, COUNT(*) AS deg FROM e GROUP BY s)",
        "nodes AS (SELECT DISTINCT node FROM"
        " (SELECT s AS node FROM e UNION SELECT d FROM e))",
        "nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM nodes)",
        "r0 AS (SELECT node,"
        " CAST(1000000000000 // (SELECT n FROM nn) AS BIGINT) AS u"
        " FROM nodes)",
    ]
    for i in range(1, iters + 1):
        ctes.append(
            f"c{i} AS (SELECT e.d AS node,"
            f" CAST(SUM(r.u // deg.deg) AS BIGINT) AS cs"
            f" FROM e JOIN deg USING (s) JOIN r{i-1} r ON r.node = e.s"
            f" GROUP BY e.d)"
        )
        ctes.append(
            f"r{i} AS (SELECT nodes.node,"
            f" CAST(150000000000 // (SELECT n FROM nn)"
            f"      + (85 * coalesce(c{i}.cs, 0)) // 100 AS BIGINT) AS u"
            f" FROM nodes LEFT JOIN c{i} ON nodes.node = c{i}.node)"
        )
    return (
        "WITH " + ",\n".join(ctes)
        + f" SELECT node, CAST(u AS DOUBLE) / 1000000000000.0 AS rank"
        f" FROM r{iters}"
    )


@query(
    "x_pagerank",
    _pagerank_sql(3),
    extra=True,  # window full at 50; selfcheck + pytest verified
)
def x_pagerank(spark, sf_dir):
    """PageRank, 3 rounds, over the supplier→part edge relation —
    every node's rank hash-matched against the UNROLLED-CTE replay
    (pipeline/graph.py:pagerank; decimal-exact contribution sums make
    the FP reduction order-independent)."""
    from pigout_spark.pipeline.graph import pagerank

    li = t(spark, sf_dir, "lineitem")
    edges = li.select(
        F.col("l_suppkey").cast("long").alias("src"),
        # 2^32 offset: disjoint from any 32-bit-bounded supplier key
        # domain (mirrored in _pagerank_sql) — never collides at scale
        (F.col("l_partkey") + 4_294_967_296).cast("long").alias("dst"),
    ).distinct()
    return pagerank(edges, iterations=3)


_KL_A_PRED = "source IN ('src0', 'src1', 'src2', 'src3', 'src4')"


@query(
    "x_vocab_kl",
    f"""
    WITH ta AS (
      SELECT unnest({_SQL_TOKS}) AS tok FROM documents WHERE {_KL_A_PRED}
    ), tb AS (
      SELECT unnest({_SQL_TOKS}) AS tok FROM documents
      WHERE NOT ({_KL_A_PRED})
    ), ca AS (
      SELECT tok, CAST(COUNT(*) AS BIGINT) AS ca FROM ta GROUP BY tok
    ), cb AS (
      SELECT tok, CAST(COUNT(*) AS BIGINT) AS cb FROM tb GROUP BY tok
    ), j AS (
      SELECT tok, coalesce(ca, 0) AS ca, coalesce(cb, 0) AS cb
      FROM ca FULL JOIN cb USING (tok)
    ), t AS (
      SELECT CAST(SUM(ca) AS BIGINT) AS na, CAST(SUM(cb) AS BIGINT) AS nb,
             CAST(COUNT(*) AS BIGINT) AS v
      FROM j
    ), terms AS (
      SELECT CAST(ca + 1 AS DOUBLE) / CAST(na + v AS DOUBLE) AS p,
             CAST(cb + 1 AS DOUBLE) / CAST(nb + v AS DOUBLE) AS q,
             na, nb
      FROM j, t
    )
    SELECT CAST(SUM(CAST(ROUND(p * ln(p / q), 6) AS DECIMAL(20,6)))
                AS DOUBLE) AS kl_nats,
           CAST(COUNT(*) AS BIGINT) AS n_terms,
           MAX(na) AS n_tokens_a, MAX(nb) AS n_tokens_b
    FROM terms
    """,
    extra=True,  # window full at 50; selfcheck + pytest verified
)
def x_vocab_kl(spark, sf_dir):
    """Unigram-distribution KL divergence between a 5-source slice and
    the rest of the corpus — Laplace smoothing over the joint vocab,
    round-6 ln terms summed exactly through DECIMAL(20,6)
    (pipeline/curation.py:vocab_kl)."""
    from pigout_spark.pipeline.curation import vocab_kl

    d = t(spark, sf_dir, "documents")
    pred = F.col("source").isin("src0", "src1", "src2", "src3", "src4")
    return vocab_kl(d.filter(pred), d.filter(~pred))


def _sql_assign_l2(src: str, cents: str, out: str) -> str:
    """Nearest-centroid-by-L2 assignment CTE: argmax of
    (x·c − |c|²/2), ties → lowest c_id (SQL twin of
    similarity._argmin_l2_cell — the |c|²/2 term is the same left-fold
    dot on bit-identical centroid values)."""
    return (
        f"{out} AS (\n"
        f"  SELECT vec_id, v, c_id AS cell FROM (\n"
        f"    SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id\n"
        f"                                 ORDER BY s DESC, c_id) AS rn\n"
        f"    FROM (\n"
        f"      SELECT b.vec_id, b.v, c.c_id,\n"
        f"             {_sql_dot('b.v', 'c.cv')}"
        f" - {_sql_dot('c.cv', 'c.cv')} / 2 AS s\n"
        f"      FROM {src} b, {cents} c)\n"
        f"  ) WHERE rn = 1\n)"
    )


def _pq_sql(m: int = 4, k: int = 8, n_iters: int = 2, dim: int = 64) -> str:
    """SQL replay of PQ train→encode→ADC→rescore: per subspace an
    unrolled L2 k-means chain (same exact-mean update as
    _kmeans_cells_sql), then the asymmetric-distance search."""
    sub = dim // m
    parts = [
        "WITH e AS (\n"
        "  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings\n"
        "), bfull AS (\n"
        f"  SELECT vec_id, v, sqrt({_sql_dot('v', 'v')}) AS nrm FROM e\n"
        ")"
    ]
    finals = []
    for j in range(m):
        lo, hi = j * sub + 1, (j + 1) * sub
        parts.append(
            f", s{j} AS (SELECT vec_id, list_slice(v, {lo}, {hi}) AS v FROM e)"
        )
        parts.append(
            f", c{j}_0 AS (SELECT vec_id AS c_id, v AS cv FROM s{j}"
            f" WHERE vec_id < {k})"
        )
        prev = f"c{j}_0"
        for it in range(1, n_iters + 1):
            parts.append(", " + _sql_assign_l2(f"s{j}", prev, f"a{j}_{it}"))
            parts.append(
                f", m{j}_{it} AS (\n"
                f"  SELECT cell, list(mv ORDER BY dim) AS cv FROM (\n"
                f"    SELECT cell, i AS dim,\n"
                f"           CAST(SUM(CAST(round(v[i] * 10000) AS BIGINT)) AS DOUBLE)\n"
                f"             / 10000.0 / COUNT(*) AS mv\n"
                f"    FROM a{j}_{it}, range(1, {sub + 1}) t(i) GROUP BY cell, i\n"
                f"  ) GROUP BY cell\n)"
            )
            parts.append(
                f", c{j}_{it} AS (\n"
                f"  SELECT p.c_id, COALESCE(m.cv, p.cv) AS cv\n"
                f"  FROM {prev} p LEFT JOIN m{j}_{it} m ON m.cell = p.c_id\n)"
            )
            prev = f"c{j}_{it}"
        finals.append(prev)
        parts.append(", " + _sql_assign_l2(f"s{j}", prev, f"code{j}"))
    code_cols = ", ".join(f"code{j}.cell AS k{j}" for j in range(m))
    code_joins = " ".join(
        f"JOIN code{j} ON code{j}.vec_id = bfull.vec_id" for j in range(m)
    )
    parts.append(
        f", codes AS (SELECT bfull.vec_id, bfull.nrm, {code_cols}"
        f" FROM bfull {code_joins})"
    )
    parts.append(
        ", q AS (SELECT vec_id AS q_id, v AS qv, nrm AS qn FROM bfull"
        " WHERE vec_id < 10)"
    )
    adc = " + ".join(
        "(" + _sql_dot(f"list_slice(q.qv, {j * sub + 1}, {(j + 1) * sub})", f"cf{j}.cv") + ")"
        for j in range(m)
    )
    cf_joins = " ".join(
        f"JOIN {finals[j]} cf{j} ON cf{j}.c_id = codes.k{j}" for j in range(m)
    )
    parts.append(
        f", coarse AS (\n"
        f"  SELECT q.q_id, codes.vec_id AS neighbor_id, q.qv, q.qn,\n"
        f"         ({adc}) / (q.qn * codes.nrm) AS qcos\n"
        f"  FROM q, codes {cf_joins}\n"
        f"  WHERE codes.vec_id <> q.q_id\n)"
    )
    parts.append(
        ", surv AS (\n"
        "  SELECT q_id, neighbor_id, qv, qn,\n"
        "         ROW_NUMBER() OVER (PARTITION BY q_id\n"
        "                            ORDER BY qcos DESC, neighbor_id) AS qrn\n"
        "  FROM coarse QUALIFY qrn <= 12\n)"
    )
    parts.append(
        f", ex AS (\n"
        f"  SELECT s.q_id, s.neighbor_id,\n"
        f"         {_sql_dot('s.qv', 'n2.v')} / (s.qn * n2.nrm) AS cos\n"
        f"  FROM surv s JOIN bfull n2 ON n2.vec_id = s.neighbor_id\n)"
    )
    parts.append(
        "SELECT q_id, neighbor_id, cos,\n"
        "       ROW_NUMBER() OVER (PARTITION BY q_id\n"
        "                          ORDER BY cos DESC, neighbor_id) AS rn\n"
        "FROM ex QUALIFY rn <= 3"
    )
    return "\n".join(parts)


@query(
    "x_pq_topk",
    _pq_sql(),
)
def x_pq_topk(spark, sf_dir):
    """PRODUCT-QUANTIZATION search (FAISS PQ analog): m=4 L2-k-means
    subspace codebooks (exact-mean training replayed in SQL), ADC
    coarse scoring on (norm, 4 codes) only, exact rescore of the top
    12 — ranks hash-matched end-to-end including the training
    (pipeline/similarity.py:pq_codebooks/pq_encode/pq_topk)."""
    from pigout_spark.pipeline.similarity import pq_codebooks, pq_topk

    emb = tf(spark, sf_dir, "embeddings")
    books = pq_codebooks(emb, m=4, k=8, n_iters=2)
    return pq_topk(emb, query_ids_max=10, k=3, books=books, rescore=4)


def _ivfpq_sql(m: int = 4, k: int = 8, n_iters: int = 2, dim: int = 64) -> str:
    """IVFPQ replay: the cosine-cell chain (_kmeans_cells_sql — defines
    e/b/…/cells) plus per-subspace L2 chains, then cell-restricted ADC
    + exact rescore."""
    sub = dim // m
    parts = [_kmeans_cells_sql()]
    finals = []
    for j in range(m):
        lo, hi = j * sub + 1, (j + 1) * sub
        parts.append(
            f", s{j} AS (SELECT vec_id, list_slice(v, {lo}, {hi}) AS v FROM e)"
        )
        parts.append(
            f", pc{j}_0 AS (SELECT vec_id AS c_id, v AS cv FROM s{j}"
            f" WHERE vec_id < {k})"
        )
        prev = f"pc{j}_0"
        for it in range(1, n_iters + 1):
            parts.append(", " + _sql_assign_l2(f"s{j}", prev, f"pa{j}_{it}"))
            parts.append(
                f", pm{j}_{it} AS (\n"
                f"  SELECT cell, list(mv ORDER BY dim) AS cv FROM (\n"
                f"    SELECT cell, i AS dim,\n"
                f"           CAST(SUM(CAST(round(v[i] * 10000) AS BIGINT)) AS DOUBLE)\n"
                f"             / 10000.0 / COUNT(*) AS mv\n"
                f"    FROM pa{j}_{it}, range(1, {sub + 1}) t(i) GROUP BY cell, i\n"
                f"  ) GROUP BY cell\n)"
            )
            parts.append(
                f", pc{j}_{it} AS (\n"
                f"  SELECT p.c_id, COALESCE(m.cv, p.cv) AS cv\n"
                f"  FROM {prev} p LEFT JOIN pm{j}_{it} m ON m.cell = p.c_id\n)"
            )
            prev = f"pc{j}_{it}"
        finals.append(prev)
        parts.append(", " + _sql_assign_l2(f"s{j}", prev, f"pcode{j}"))
    code_cols = ", ".join(f"pcode{j}.cell AS k{j}" for j in range(m))
    code_joins = " ".join(
        f"JOIN pcode{j} ON pcode{j}.vec_id = cells.vec_id" for j in range(m)
    )
    parts.append(
        f", pcodes AS (SELECT cells.vec_id, cells.nrm, cells.cell,"
        f" {code_cols} FROM cells {code_joins})"
    )
    parts.append(
        ", pq AS (SELECT vec_id AS q_id, v AS qv, nrm AS qn, cell"
        " FROM cells WHERE vec_id < 10)"
    )
    adc = " + ".join(
        "(" + _sql_dot(
            f"list_slice(q.qv, {j * sub + 1}, {(j + 1) * sub})", f"pf{j}.cv"
        ) + ")"
        for j in range(m)
    )
    cf_joins = " ".join(
        f"JOIN {finals[j]} pf{j} ON pf{j}.c_id = pcodes.k{j}" for j in range(m)
    )
    parts.append(
        f", pcoarse AS (\n"
        f"  SELECT q.q_id, pcodes.vec_id AS neighbor_id, q.qv, q.qn,\n"
        f"         ({adc}) / (q.qn * pcodes.nrm) AS qcos\n"
        f"  FROM pq q JOIN pcodes ON pcodes.cell = q.cell {cf_joins}\n"
        f"  WHERE pcodes.vec_id <> q.q_id\n)"
    )
    parts.append(
        ", psurv AS (\n"
        "  SELECT q_id, neighbor_id, qv, qn,\n"
        "         ROW_NUMBER() OVER (PARTITION BY q_id\n"
        "                            ORDER BY qcos DESC, neighbor_id) AS qrn\n"
        "  FROM pcoarse QUALIFY qrn <= 12\n)"
    )
    parts.append(
        f", pex AS (\n"
        f"  SELECT s.q_id, s.neighbor_id,\n"
        f"         {_sql_dot('s.qv', 'n2.v')} / (s.qn * n2.nrm) AS cos\n"
        f"  FROM psurv s JOIN b n2 ON n2.vec_id = s.neighbor_id\n)"
    )
    parts.append(
        "SELECT q_id, neighbor_id, cos,\n"
        "       ROW_NUMBER() OVER (PARTITION BY q_id\n"
        "                          ORDER BY cos DESC, neighbor_id) AS rn\n"
        "FROM pex QUALIFY rn <= 3"
    )
    return "\n".join(parts)


@query(
    "x_ivfpq_topk",
    _ivfpq_sql(),
    extra=True,  # window full at 50; selfcheck + pytest verified
)
def x_ivfpq_topk(spark, sf_dir):
    """IVFPQ (the canonical FAISS serving composition): cosine-cell
    restriction × PQ-ADC coarse scoring × exact rescore — BOTH codebook
    trainings and the whole search replayed in SQL, ranks hash-matched
    (pipeline/similarity.py:ivf_pq_topk)."""
    from pigout_spark.pipeline.similarity import ivf_pq_topk

    return ivf_pq_topk(
        tf(spark, sf_dir, "embeddings"), query_ids_max=10, k=3, rescore=4
    )


# ------------------------------------------------------- curate end-to-end ---
#: Composite pipeline invariant (r6, VERDICT task 6): the curate CLI's
#: row-dropping spine (quality filter → MinHash dedup retain) plus the
#: packing tail (chunk → pack), reduced to ONE hash-checked row — doc
#: count, sequence count, total packed tokens, and an order-insensitive
#: doc-set fingerprint.  Every stage reuses the per-stage oracle SQL
#: (quality: _QUALITY_SQL; clusters: _clusters_sql scoped to the
#: survivors CTE; pack: the x_text_pack recursive walk) so a drift in
#: ANY stage moves the end state.
_CURATE_E2E_SQL = f"""
    WITH RECURSIVE q AS (
      SELECT doc_id FROM ({_QUALITY_SQL}) WHERE keep
    ), surv AS (
      SELECT d.doc_id, d.text FROM documents d JOIN q USING (doc_id)
    ), cl AS (
      SELECT * FROM ({_clusters_sql("surv")})
    ), docs_s AS (
      SELECT doc_id, CAST(len({_SQL_TOKS}) AS BIGINT) AS n_tokens FROM surv
    ), j AS (
      SELECT d.doc_id, d.n_tokens,
             COALESCE(c.cluster_id, d.doc_id) AS cluster_id
      FROM docs_s d LEFT JOIN cl c ON d.doc_id = c.doc_id
    ), r AS (
      SELECT *, ROW_NUMBER() OVER (
        PARTITION BY cluster_id ORDER BY n_tokens DESC, doc_id) AS rn
      FROM j
    ), corpus AS (
      SELECT s.doc_id, s.text
      FROM surv s JOIN (SELECT doc_id FROM r WHERE rn = 1) k USING (doc_id)
    ), f2 AS (
      SELECT doc_id, {_SQL_TOKS} AS toks FROM corpus
    ), s2 AS (
      SELECT doc_id, len(toks) AS n FROM f2 WHERE len(toks) > 0
    ), c2 AS (
      SELECT doc_id, n, unnest(range(0, n, 48)) AS start FROM s2
    ), ch AS (
      SELECT doc_id, CAST(start // 48 AS BIGINT) AS chunk_idx,
             CAST(least(start + 64, n) - start AS BIGINT) AS nt
      FROM c2
    ), walk(doc_id, chunk_idx, nt, fill, seq) AS (
      SELECT doc_id, chunk_idx, nt, nt, CAST(0 AS BIGINT)
      FROM ch WHERE chunk_idx = 0
      UNION ALL
      SELECT ch.doc_id, ch.chunk_idx, ch.nt,
             CASE WHEN w.fill + ch.nt <= {_PACK_BUDGET}
                  THEN w.fill + ch.nt ELSE ch.nt END,
             CASE WHEN w.fill + ch.nt <= {_PACK_BUDGET}
                  THEN w.seq ELSE w.seq + 1 END
      FROM walk w
      JOIN ch ON ch.doc_id = w.doc_id AND ch.chunk_idx = w.chunk_idx + 1
    )
    SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM corpus) AS n_docs,
           CAST(COUNT(DISTINCT (doc_id, seq)) AS BIGINT) AS n_sequences,
           CAST(SUM(nt) AS BIGINT) AS n_packed_tokens,
           (SELECT bit_xor(
              ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT)
            FROM corpus) AS doc_fp
    FROM walk
    """


@query("x_curate_e2e", _CURATE_E2E_SQL, extra=True)
def x_curate_e2e(spark, sf_dir):
    """END-TO-END curation invariant: quality filter → MinHash-LSH
    dedup (pairs → connected components → keep-longest retention) →
    64/16 chunking → 96-token next-fit packing, summarized to one row
    (n_docs, n_sequences, n_packed_tokens, doc-set XOR fingerprint).
    The one-command twin is ``tools/curate.py``; this query pins the
    same chain's end state under the hash gate at every sf."""
    from pigout_spark.pipeline.dedup import (
        dedup_clusters,
        minhash_lsh_pairs,
        retain_per_cluster,
        ws_tokens,
    )
    from pigout_spark.pipeline.text import (
        chunk_documents,
        pack_sequences,
        quality_filter,
    )

    d = t(spark, sf_dir, "documents")
    keep = quality_filter(d).filter(F.col("keep")).select("doc_id")
    surv = d.join(keep, "doc_id").select("doc_id", "text")
    pairs = minhash_lsh_pairs(
        fan_out(surv), "doc_id", "text",
        num_hashes=_MH_HASHES, rows_per_band=_MH_ROWS,
    )
    docs_s = surv.select(
        "doc_id",
        F.size(ws_tokens("text", distinct=False)).cast("long").alias("n_tokens"),
    )
    kept = retain_per_cluster(
        docs_s, dedup_clusters(pairs), score_col="n_tokens"
    )
    corpus = surv.join(kept.select("doc_id"), "doc_id")
    packed = pack_sequences(
        chunk_documents(corpus, max_tokens=64, overlap=16), _PACK_BUDGET
    )
    doc_agg = corpus.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.bit_xor(
            F.conv(
                F.substring(F.md5(F.col("doc_id").cast("string")), 1, 15), 16, 10
            ).cast("bigint")
        ).alias("doc_fp"),
    )
    seq_agg = packed.agg(
        F.countDistinct("doc_id", "seq_idx").alias("n_sequences"),
        F.sum("n_chunk_tokens").cast("long").alias("n_packed_tokens"),
    )
    return doc_agg.crossJoin(seq_agg).select(
        "n_docs", "n_sequences", "n_packed_tokens", "doc_fp"
    )


# --------------------------------------------------- r6 pipeline additions ---
@query(
    "x_sample_weighted",
    f"""
    WITH e AS (
      SELECT doc_id, n_chars,
             pow((('0x' || substring(md5('0|' || CAST(doc_id AS VARCHAR)),
                                     1, 15))::BIGINT + 0.5)
                 / {_KMV_DOMAIN_SQL},
                 1.0 / n_chars) AS k
      FROM documents WHERE n_chars IS NOT NULL AND n_chars > 0
    )
    SELECT doc_id, CAST(n_chars AS BIGINT) AS n_chars
    FROM e ORDER BY k DESC, doc_id LIMIT 100
    """,
    extra=True,  # r6 addition; window full — selfcheck + pytest verified
)
def x_sample_weighted(spark, sf_dir):
    """Weighted exact-count sample (Efraimidis–Spirakis A-ES, 100 docs
    weighted by n_chars): u = md5-uniform, key = u^(1/w), top-k — the
    deterministic weighted-without-replacement draw
    (pipeline/curation.py:sample_weighted)."""
    from pigout_spark.pipeline.curation import sample_weighted

    d = t(spark, sf_dir, "documents")
    out = sample_weighted(d, 100, "n_chars", ["doc_id"], seed="0")
    return out.select("doc_id", F.col("n_chars").cast("long").alias("n_chars"))


def _bands_sql(src: str, num_hashes: int, rows_per_band: int) -> str:
    """Per-doc LSH band values (doc_id, band, bv) over ``src`` — the
    SQL twin of pipeline/dedup.py:lsh_band_index (same perms, same md5
    band hash)."""
    from pigout_spark.pipeline.dedup import MINHASH_P, minhash_perms

    perms = minhash_perms(num_hashes)
    n_bands = num_hashes // rows_per_band
    mins = ",\n".join(
        f"    min((x * {a} + {b}) % {MINHASH_P}) AS m{i}"
        for i, (a, b) in enumerate(perms)
    )
    bands = "\n  UNION ALL\n".join(
        "  SELECT doc_id, {j} AS band, md5(concat_ws('_', {ms})) AS bv FROM sig".format(
            j=j,
            ms=", ".join(f"m{j * rows_per_band + r}" for r in range(rows_per_band)),
        )
        for j in range(n_bands)
    )
    return f"""
    WITH toks AS (
      SELECT doc_id, unnest({_SQL_DTOKS}) AS tok FROM {src}
    ), hashed AS (
      SELECT doc_id, ('0x' || substr(md5(tok), 1, 7))::BIGINT AS x FROM toks
    ), sig AS (
      SELECT doc_id,
{mins}
      FROM hashed GROUP BY doc_id
    )
{bands}
    """


@query(
    "x_dedup_incremental",
    f"""
    WITH nb AS (
      SELECT * FROM ({_bands_sql("(SELECT * FROM documents WHERE doc_id % 5 = 0)", _MH_HASHES, _MH_ROWS)})
    ), cb AS (
      SELECT * FROM ({_bands_sql("(SELECT * FROM documents WHERE doc_id % 5 <> 0)", _MH_HASHES, _MH_ROWS)})
    ), hits AS (
      SELECT DISTINCT nb.doc_id
      FROM nb JOIN cb ON nb.band = cb.band AND nb.bv = cb.bv
    )
    SELECT d.doc_id, d.source FROM documents d
    WHERE d.doc_id % 5 = 0
      AND d.doc_id NOT IN (SELECT doc_id FROM hits)
    """,
    extra=True,  # r6 addition; window full — selfcheck + pytest verified
)
def x_dedup_incremental(spark, sf_dir):
    """Incremental (daily-ingest) dedup: new batch (doc_id % 5 = 0)
    probed against the stored LSH band index of the historical corpus
    (the other 80%) — survivors only; corpus text never re-read
    (pipeline/dedup.py:dedup_incremental + lsh_band_index)."""
    from pigout_spark.pipeline.dedup import dedup_incremental, lsh_band_index

    d = t(spark, sf_dir, "documents")
    new = d.filter(F.col("doc_id") % 5 == 0)
    corpus = d.filter(F.col("doc_id") % 5 != 0)
    idx = lsh_band_index(
        fan_out(corpus), "doc_id", "text",
        num_hashes=_MH_HASHES, rows_per_band=_MH_ROWS,
    )
    out = dedup_incremental(
        fan_out(new), idx, num_hashes=_MH_HASHES, rows_per_band=_MH_ROWS
    )
    return out.select("doc_id", "source")


@query(
    "x_surprisal",
    f"""
    WITH toks AS (
      SELECT doc_id, unnest({_SQL_TOKS}) AS tok FROM documents
    ), tf AS (
      SELECT tok, CAST(COUNT(*) AS BIGINT) AS tfn FROM toks GROUP BY tok
    ), sc AS (
      SELECT CAST(COUNT(*) AS DOUBLE) AS v,
             CAST(SUM(tfn) AS DOUBLE) AS n
      FROM tf
    ), s AS (
      SELECT t.doc_id,
             -ln((tf.tfn + 0.5) / (sc.n + 0.5 * sc.v)) AS srp
      FROM toks t JOIN tf ON t.tok = tf.tok, sc
    )
    SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_tokens,
           ROUND(SUM(srp) / COUNT(*), 6) AS mean_surprisal6
    FROM s GROUP BY doc_id
    """,
    extra=True,  # r6 addition; window full — selfcheck + pytest verified
)
def x_surprisal(spark, sf_dir):
    """Unigram-LM surprisal quality score (corpus-as-model, Laplace
    0.5): mean −ln p(tok) per doc, rounded to 6 decimals (ln
    transcendental + cross-partition sum — the x_dsir_weights
    convention) — pipeline/text.py:surprisal_score."""
    from pigout_spark.pipeline.text import surprisal_score

    out = surprisal_score(tf(spark, sf_dir, "documents"))
    return out.select(
        "doc_id", "n_tokens",
        F.round("mean_surprisal", 6).alias("mean_surprisal6"),
    )


@query(
    "x_bigram_lm",
    f"""
    WITH f AS (
      SELECT doc_id, {_SQL_TOKS} AS toks FROM documents
    ), bg AS (
      SELECT doc_id, toks[i] AS w1, toks[i + 1] AS w2
      FROM f, unnest(range(1, len(toks))) AS t(i)
      WHERE len(toks) >= 2
    ), c2 AS (
      SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS c2 FROM bg GROUP BY w1, w2
    ), c1 AS (
      SELECT w1, CAST(COUNT(*) AS BIGINT) AS c1 FROM bg GROUP BY w1
    ), voc AS (
      SELECT CAST(COUNT(DISTINCT tok) AS DOUBLE) AS v
      FROM (SELECT unnest(toks) AS tok FROM f)
    ), s AS (
      SELECT bg.doc_id,
             -ln((c2.c2 + 0.5) / (c1.c1 + 0.5 * voc.v)) AS srp
      FROM bg
      JOIN c2 ON bg.w1 = c2.w1 AND bg.w2 = c2.w2
      JOIN c1 ON bg.w1 = c1.w1, voc
    )
    SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_bigrams,
           ROUND(SUM(srp) / COUNT(*), 6) AS mean_bigram_surprisal6
    FROM s GROUP BY doc_id
    """,
    extra=True,  # r7 addition; window settled for r7 — rotate in r8
)
def x_bigram_lm(spark, sf_dir):
    """Bigram-LM surprisal (corpus-as-model, Laplace 0.5): mean
    −ln p(w2|w1) per doc — the fluency-sensitive step up from
    x_surprisal's unigram score; same round-6 determinism convention
    (pipeline/text.py:bigram_lm_score).  DuckDB's range-unnest builds
    the same positional bigrams the Spark side derives array-side."""
    from pigout_spark.pipeline.text import bigram_lm_score

    out = bigram_lm_score(tf(spark, sf_dir, "documents"))
    return out.select(
        "doc_id", "n_bigrams",
        F.round("mean_bigram_surprisal", 6).alias("mean_bigram_surprisal6"),
    )


def _zorder_sql(bits: int) -> str:
    """SQL twin of plans/partitioning.py zorder_layout over
    orders(o_custkey, o_totalprice): min-max scale to [0, 2^bits),
    Morton-interleave with unrolled shift/mask terms."""
    top = (1 << bits) - 1
    def scaled(col, i):
        return (
            f"coalesce(least({top}, greatest(0, "
            f"CAST(floor((CAST({col} AS DOUBLE) - mn{i}) * {top}.0 / "
            f"(CASE WHEN mx{i} > mn{i} THEN mx{i} - mn{i} ELSE 1.0 END)) AS BIGINT))), 0)"
        )
    terms = " + ".join(
        f"(((s{j} >> {b}) & 1) << {b * 2 + j})"
        for b in range(bits)
        for j in (0, 1)
    )
    return f"""
    WITH st AS (
      SELECT MIN(CAST(o_custkey AS DOUBLE)) AS mn0,
             MAX(CAST(o_custkey AS DOUBLE)) AS mx0,
             MIN(CAST(o_totalprice AS DOUBLE)) AS mn1,
             MAX(CAST(o_totalprice AS DOUBLE)) AS mx1
      FROM orders
    ), sc AS (
      SELECT o_orderkey,
             {scaled("o_custkey", 0)} AS s0,
             {scaled("o_totalprice", 1)} AS s1
      FROM orders, st
    )
    SELECT o_orderkey, CAST({terms} AS BIGINT) AS zkey FROM sc
    """


@query(
    "x_zorder_key",
    _zorder_sql(8),
    extra=True,  # r6 addition; window full — selfcheck + pytest verified
)
def x_zorder_key(spark, sf_dir):
    """Z-order layout key over orders(o_custkey, o_totalprice), 8 bits
    per dimension: min-max scale + Morton interleave, bit-exact in both
    engines (plans/partitioning.py:zorder_layout — the clustered-write
    front end for multi-predicate parquet stats pruning)."""
    from pigout_spark.plans.partitioning import zorder_layout

    d = t(spark, sf_dir, "orders")
    laid, key = zorder_layout(d, ["o_custkey", "o_totalprice"], bits=8)
    return laid.select("o_orderkey", F.col(key).alias("zkey"))


_QD_DEFAULT_VALS = (
    "SELECT CAST(floor(value * 8) AS BIGINT) AS v"
    " FROM events WHERE value IS NOT NULL"
)


def _qdigest_chain_sql(k: int, levels: int, vals_sql: str | None = None) -> str:
    """CTE chain replaying the q-digest build bit-for-bit: leaf
    aggregation, then one (merge, survivors) CTE pair per level,
    bottom-up — the same pure-integer rule sketches.py runs inside its
    one Arrow batch, unrolled because the level recurrence is a fixed
    ``levels``-step program, not data-dependent iteration.
    ``vals_sql`` (a SELECT yielding one BIGINT column ``v``) lets the
    fuzzer drive the same chain over randomized sources."""
    cap = 1 << levels
    # AS MATERIALIZED throughout: DuckDB inlines CTEs by default, and
    # each level references its predecessor 3× — inlined, the chain
    # re-expands to 3^levels scans of the base table.
    parts = [
        f"""vals AS MATERIALIZED (
      {vals_sql or _QD_DEFAULT_VALS}
    ), s{levels} AS MATERIALIZED (
      SELECT {cap} + v AS nid, CAST(COUNT(*) AS BIGINT) AS cnt
      FROM vals GROUP BY 1
    ), tot AS (
      SELECT GREATEST(1, CAST(SUM(cnt) AS BIGINT) // {k}) AS t FROM s{levels}
    )"""
    ]
    for lev in range(levels, 0, -1):
        lo, hi, plo = 1 << lev, 1 << (lev + 1), 1 << (lev - 1)
        parts.append(
            f"""m{lev} AS MATERIALIZED (
      SELECT cs.pid, cs.csum + COALESCE(p.cnt, 0) AS cnt
      FROM (
        SELECT nid // 2 AS pid, CAST(SUM(cnt) AS BIGINT) AS csum
        FROM s{lev} WHERE nid >= {lo} AND nid < {hi} GROUP BY 1
      ) cs
      LEFT JOIN (SELECT nid, cnt FROM s{lev} WHERE nid >= {plo} AND nid < {lo}) p
        ON p.nid = cs.pid
      CROSS JOIN tot
      WHERE cs.csum + COALESCE(p.cnt, 0) < tot.t
    ), s{lev - 1} AS MATERIALIZED (
      SELECT nid, cnt FROM s{lev}
      WHERE (nid < {plo} OR nid >= {hi})
         OR (nid >= {lo} AND nid < {hi}
             AND nid // 2 NOT IN (SELECT pid FROM m{lev}))
         OR (nid >= {plo} AND nid < {lo}
             AND nid NOT IN (SELECT pid FROM m{lev}))
      UNION ALL
      SELECT pid AS nid, cnt FROM m{lev}
    )"""
        )
    return ",\n    ".join(parts)


def _qdigest_rend_sql(levels: int) -> str:
    cap = 1 << levels
    arms = "\n        ".join(
        f"WHEN nid >= {1 << lev} THEN (nid + 1) * {cap >> lev} - 1 - {cap}"
        for lev in range(levels, -1, -1)
    )
    return f"CASE\n        {arms}\n      END"


def qdigest_sketch_sql(k: int, levels: int, vals_sql: str | None = None) -> str:
    """Full oracle query for the digest relation (nid, cnt, k, levels)."""
    return f"""
    WITH {_qdigest_chain_sql(k, levels, vals_sql)}
    SELECT nid, cnt, CAST({k} AS INTEGER) AS k,
           CAST({levels} AS INTEGER) AS levels
    FROM s0
    """


def qdigest_quantiles_sql(
    k: int, levels: int, qs: list[float], vals_sql: str | None = None
) -> str:
    """Full oracle query for the quantile readout (q, est)."""
    return f"""
    WITH {_qdigest_chain_sql(k, levels, vals_sql)},
    rend AS (
      SELECT nid, cnt, CAST({_qdigest_rend_sql(levels)} AS BIGINT) AS r
      FROM s0
    ), cum AS (
      SELECT r, cnt,
             CAST(SUM(cnt) OVER (ORDER BY r, nid
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS c
      FROM rend
    ), nn AS (SELECT MAX(c) AS n FROM cum)
    SELECT CAST(q AS DOUBLE) AS q,
           (SELECT CAST(MIN(r) AS BIGINT) FROM cum, nn
             WHERE c >= CEIL(CAST(q AS DOUBLE) * n)) AS est
    FROM (VALUES {', '.join(f'({q})' for q in qs)}) AS qs(q)
    """


_QD_K, _QD_LEVELS = 64, 13  # eighths-scaled events.value: sf0.1 max 560.21*8 = 4481 < 2^13


@query(
    "x_qdigest_sketch",
    qdigest_sketch_sql(_QD_K, _QD_LEVELS),
    extra=True,  # r6 addition; window full — selfcheck + pytest verified
)
def x_qdigest_sketch(spark, sf_dir):
    """q-digest of eighths-scaled events.value (k=64, 13 levels): the
    deterministic mergeable quantile sketch, hash-checked NODE FOR NODE
    against an oracle that unrolls the same bottom-up compression as a
    13-stage CTE chain — two independent implementations of the pure
    integer spec (pipeline/sketches.py:qdigest_build)."""
    from pigout_spark.pipeline.sketches import qdigest_build

    ev = t(spark, sf_dir, "events").select(
        F.floor(F.col("value") * 8).cast("bigint").alias("v8")
    )
    return qdigest_build(ev, "v8", k=_QD_K, levels=_QD_LEVELS)


_QD_QS = [0.1, 0.25, 0.5, 0.75, 0.9, 0.99]


@query(
    "x_qdigest_quantiles",
    qdigest_quantiles_sql(_QD_K, _QD_LEVELS, _QD_QS),
    extra=True,  # r6 addition; window full — selfcheck + pytest verified
)
def x_qdigest_quantiles(spark, sf_dir):
    """Quantile readout from the events.value q-digest: rank
    accumulation over the ≤3k-node digest, answering node's right
    endpoint — estimate error ≤ levels·⌊n/k⌋ ranks, both engines
    replaying the identical rule so the estimates hash-match exactly."""
    from pigout_spark.pipeline.sketches import qdigest_build, qdigest_quantiles

    ev = t(spark, sf_dir, "events").select(
        F.floor(F.col("value") * 8).cast("bigint").alias("v8")
    )
    d = qdigest_build(ev, "v8", k=_QD_K, levels=_QD_LEVELS)
    return qdigest_quantiles(d, _QD_QS, k=_QD_K, levels=_QD_LEVELS)


_KJ_HASH = "('0x' || substring(md5(CAST(user_id AS VARCHAR)), 1, 15))::BIGINT"


@query(
    "x_kmv_jaccard",
    f"""
    WITH s1 AS (
      SELECT h FROM (
        SELECT DISTINCT {_KJ_HASH} AS h FROM events
        WHERE event_type = 'click' AND user_id IS NOT NULL
      ) ORDER BY h LIMIT 64
    ), s2 AS (
      SELECT h FROM (
        SELECT DISTINCT {_KJ_HASH} AS h FROM events
        WHERE event_type = 'purchase' AND user_id IS NOT NULL
      ) ORDER BY h LIMIT 64
    ), m AS (
      SELECT h FROM (
        SELECT DISTINCT h FROM (SELECT h FROM s1 UNION ALL SELECT h FROM s2)
      ) ORDER BY h LIMIT 64
    ), t AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_merged FROM m
    ), c AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_common FROM m
      WHERE h IN (SELECT h FROM s1) AND h IN (SELECT h FROM s2)
    )
    SELECT n_merged, n_common,
           CAST(n_common AS DOUBLE) / GREATEST(n_merged, 1) AS jaccard
    FROM t, c
    """,
    extra=True,  # r6 addition; window full — selfcheck + pytest verified
)
def x_kmv_jaccard(spark, sf_dir):
    """Corpus-overlap from sketches alone: Jaccard of click-users vs
    purchase-users via k-min-of-union (k=64), hash-checked against the
    identical SQL chain — the shard-overlap primitive that answers
    set-similarity questions from stored KB-sized sketches with no
    rescan (pipeline/sketches.py:kmv_jaccard)."""
    from pigout_spark.pipeline.sketches import kmv_build, kmv_jaccard

    ev = t(spark, sf_dir, "events")
    a = kmv_build(ev.filter(F.col("event_type") == "click"), "user_id", k=64)
    b = kmv_build(ev.filter(F.col("event_type") == "purchase"), "user_id", k=64)
    return kmv_jaccard(a, b, k=64)


@query(
    "x_kmv_keyed",
    f"""
    WITH hs AS (
      SELECT DISTINCT event_type, {_KJ_HASH} AS h
      FROM events WHERE user_id IS NOT NULL
    )
    SELECT event_type, h, CAST(32 AS INTEGER) AS k FROM hs
    QUALIFY row_number() OVER (PARTITION BY event_type ORDER BY h) <= 32
    """,
    extra=True,  # r6 addition; window full — selfcheck + pytest verified
)
def x_kmv_keyed(spark, sf_dir):
    """Per-key KMV sketches (k=32 smallest distinct user hashes PER
    event type): the per-shard/day distinct-tracking shape, k-min via
    a per-key rank window — hash-checked row-for-row against DuckDB's
    QUALIFY row_number twin (pipeline/sketches.py:kmv_build keys=)."""
    from pigout_spark.pipeline.sketches import kmv_build

    return kmv_build(
        t(spark, sf_dir, "events"), "user_id", k=32, keys=["event_type"]
    )


_SO_HASH = "('0x' || substring(md5(sh), 1, 15))::BIGINT"


@query(
    "x_shingle_overlap",
    f"""
    WITH t AS (
      SELECT lang, {_SQL_TOKS} AS tk FROM documents
    ), sh0 AS (
      SELECT lang,
             unnest(CASE WHEN len(tk) >= 4 THEN
               list_transform(range(0, len(tk) - 3),
                              i -> md5(array_to_string(tk[i+1:i+4], ' ')))
             ELSE CAST([] AS VARCHAR[]) END) AS sh
      FROM t
    ), s1 AS (
      SELECT h FROM (
        SELECT DISTINCT {_SO_HASH} AS h FROM sh0 WHERE lang <> 'en'
      ) ORDER BY h LIMIT 512
    ), s2 AS (
      SELECT h FROM (
        SELECT DISTINCT {_SO_HASH} AS h FROM sh0 WHERE lang = 'en'
      ) ORDER BY h LIMIT 512
    ), m AS (
      SELECT h FROM (
        SELECT DISTINCT h FROM (SELECT h FROM s1 UNION ALL SELECT h FROM s2)
      ) ORDER BY h LIMIT 512
    ), t2 AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_merged FROM m
    ), c AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_common FROM m
      WHERE h IN (SELECT h FROM s1) AND h IN (SELECT h FROM s2)
    )
    SELECT n_merged, n_common,
           CAST(n_common AS DOUBLE) / GREATEST(n_merged, 1) AS jaccard
    FROM t2, c
    """,
    extra=True,  # r6 addition; window full — selfcheck + pytest verified
)
def x_shingle_overlap(spark, sf_dir):
    """Corpus↔benchmark contamination pre-check: KMV-estimated 4-gram
    shingle Jaccard between non-English docs (the 'training corpus')
    and English docs (the 'benchmark') — the sketch-sized screen run
    before x_decontaminate's exact inverted anti-join
    (pipeline/curation.py:shingle_overlap)."""
    from pigout_spark.pipeline.curation import shingle_overlap

    d = t(spark, sf_dir, "documents")
    return shingle_overlap(
        d.filter(F.col("lang") != "en"),
        d.filter(F.col("lang") == "en"),
        n=4,
        k=512,
    )


_TRI_EDGES_SQL = """
      SELECT DISTINCT LEAST(a.l_suppkey, b.l_suppkey) AS x,
                      GREATEST(a.l_suppkey, b.l_suppkey) AS y
      FROM lineitem a JOIN lineitem b
        ON a.l_orderkey = b.l_orderkey AND a.l_suppkey < b.l_suppkey
"""


@query(
    "x_triangles",
    f"""
    WITH e AS MATERIALIZED ({_TRI_EDGES_SQL})
    SELECT CAST(COUNT(*) AS BIGINT) AS triangles
    FROM e e1
    JOIN e e2 ON e1.y = e2.x
    JOIN e e3 ON e3.x = e1.x AND e3.y = e2.y
    """,
    extra=True,  # r6 addition; window full — selfcheck + pytest verified
)
def x_triangles(spark, sf_dir):
    """Triangle count of the supplier co-purchase graph (suppliers
    sharing an order).  The Spark side runs the degree-ordered-wedge
    algorithm (pipeline/graph.py:triangle_count, O(m^1.5) bounded);
    the oracle counts id-ordered triples with three plain joins — two
    INDEPENDENT algorithms, one exact answer."""
    from pigout_spark.pipeline.graph import triangle_count

    li = t(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    a = li.alias("a")
    b = li.alias("b")
    edges = a.join(
        b,
        (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
        & (F.col("a.l_suppkey") < F.col("b.l_suppkey")),
    ).select(
        F.col("a.l_suppkey").alias("src"), F.col("b.l_suppkey").alias("dst")
    )
    return triangle_count(edges)


@query(
    "x_triangles_sampled",
    f"""
    WITH und AS MATERIALIZED ({_TRI_EDGES_SQL}),
    e AS MATERIALIZED (
      SELECT x, y FROM und
      WHERE ('0x' || substring(md5(CAST(x AS VARCHAR) || '|'
                                   || CAST(y AS VARCHAR)), 1, 8))::BIGINT
            % 10000 < 2500
    ), m AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS sampled_edges FROM e
    ), tri AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS sampled_triangles
      FROM e e1
      JOIN e e2 ON e1.y = e2.x
      JOIN e e3 ON e3.x = e1.x AND e3.y = e2.y
    )
    SELECT m.sampled_edges, tri.sampled_triangles,
           ROUND(tri.sampled_triangles * 64.0, 6) + 0.0 AS est6
    FROM m, tri
    """,
    extra=True,  # r12 addition — built this round, takes a window slot
)
def x_triangles_sampled(spark, sf_dir):
    """DOULION edge-sampled triangle estimate on the same supplier
    co-purchase graph as x_triangles, p = 0.25
    (pipeline/graph.py:triangle_count_sampled) — the dense-graph
    scale answer the exact count lacks (448 s at sf1; the p^1.5 wedge
    discount makes this seconds).  The md5-deterministic edge sample
    means BOTH engines count the identical sampled subgraph, so the
    estimate hash-matches exactly: Spark runs degree-ordered wedges
    on the sample, the oracle three plain id-ordered joins — two
    independent algorithms, one exact sampled count, one shared
    1/p³ = 64 literal."""
    from pigout_spark.pipeline.graph import triangle_count_sampled

    li = t(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    a = li.alias("a")
    b = li.alias("b")
    edges = a.join(
        b,
        (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
        & (F.col("a.l_suppkey") < F.col("b.l_suppkey")),
    ).select(
        F.col("a.l_suppkey").alias("src"), F.col("b.l_suppkey").alias("dst")
    )
    return triangle_count_sampled(edges, fraction=0.25)


_CC_EDGES_SQL = """
      SELECT DISTINCT LEAST(a.l_suppkey, b.l_suppkey) AS x,
                      GREATEST(a.l_suppkey, b.l_suppkey) AS y
      FROM (SELECT * FROM lineitem WHERE l_quantity > 45) a
      JOIN (SELECT * FROM lineitem WHERE l_quantity > 45) b
        ON a.l_orderkey = b.l_orderkey AND a.l_suppkey < b.l_suppkey
"""


@query(
    "x_clustering_coef",
    f"""
    WITH e AS MATERIALIZED ({_CC_EDGES_SQL}),
    tri AS (
      SELECT unnest([e1.x, e1.y, e2.y]) AS n
      FROM e e1
      JOIN e e2 ON e1.y = e2.x
      JOIN e e3 ON e3.x = e1.x AND e3.y = e2.y
    ), pn AS (
      SELECT n, CAST(COUNT(*) AS BIGINT) AS triangles FROM tri GROUP BY n
    ), deg AS (
      SELECT n, CAST(COUNT(*) AS BIGINT) AS deg FROM (
        SELECT x AS n FROM e UNION ALL SELECT y FROM e
      ) GROUP BY n
    )
    SELECT d.n, d.deg, COALESCE(pn.triangles, 0) AS triangles,
           CASE WHEN d.deg >= 2
                THEN (2.0 * COALESCE(pn.triangles, 0)) / (d.deg * (d.deg - 1))
                ELSE 0.0 END AS coef
    FROM deg d LEFT JOIN pn ON d.n = pn.n
    """,
    extra=True,  # r6 addition; window full — selfcheck + pytest verified
)
def x_clustering_coef(spark, sf_dir):
    """Local clustering coefficient over the high-quantity supplier
    co-purchase graph (sparsified so coefficients spread over (0,1)) —
    Spark's degree-ordered wedge algorithm vs the oracle's independent
    id-ordered-triple formulation, per-node hash-exact
    (pipeline/graph.py:clustering_coefficient)."""
    from pigout_spark.pipeline.graph import clustering_coefficient

    li = t(spark, sf_dir, "lineitem").filter(F.col("l_quantity") > 45).select(
        "l_orderkey", "l_suppkey"
    )
    a, b = li.alias("a"), li.alias("b")
    edges = a.join(
        b,
        (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
        & (F.col("a.l_suppkey") < F.col("b.l_suppkey")),
    ).select(
        F.col("a.l_suppkey").alias("src"), F.col("b.l_suppkey").alias("dst")
    )
    return clustering_coefficient(edges)


def _kcore_sql(k: int, rounds: int) -> str:
    """Unrolled peeling chain: each round recomputes degrees, drops
    weak nodes, filters the live edge list.  Peeling is a fixpoint, so
    unrolling MORE rounds than convergence needs is a no-op — the
    chain uses rounds=convergence+margin and matches the Spark side's
    run-to-fixpoint exactly.  MATERIALIZED per round (each edge CTE is
    referenced 3×; inlined the chain would re-expand exponentially,
    the same wall the q-digest oracle hit)."""
    edge_cte = """
      SELECT DISTINCT LEAST(x.l_suppkey, y.l_suppkey) AS a,
                      GREATEST(x.l_suppkey, y.l_suppkey) AS b
      FROM (SELECT * FROM lineitem WHERE l_quantity > 45) x
      JOIN (SELECT * FROM lineitem WHERE l_quantity > 45) y
        ON x.l_orderkey = y.l_orderkey AND x.l_suppkey < y.l_suppkey
    """
    parts = [f"e0 AS MATERIALIZED ({edge_cte})"]
    for i in range(1, rounds + 1):
        parts.append(f"""w{i} AS MATERIALIZED (
      SELECT n FROM (
        SELECT n, COUNT(*) AS deg FROM (
          SELECT a AS n FROM e{i-1} UNION ALL SELECT b FROM e{i-1}
        ) GROUP BY n
      ) WHERE deg < {k}
    ), e{i} AS MATERIALIZED (
      SELECT a, b FROM e{i-1}
      WHERE a NOT IN (SELECT n FROM w{i}) AND b NOT IN (SELECT n FROM w{i})
    )""")
        i += 1
    chain = ",\n    ".join(parts)
    # Convergence guard: the unroll is only equal to run-to-fixpoint if
    # the LAST round peeled nothing (w{rounds} empty).  A denser SF
    # needing more rounds must fail LOUDLY (error()) rather than as a
    # silent hash mismatch.  The guard column must be referenced in
    # WHERE or DuckDB's column pruning eliminates the whole branch.
    return f"""
    WITH {chain}
    SELECT DISTINCT n FROM (
      SELECT a AS n FROM e{rounds} UNION ALL SELECT b FROM e{rounds}
    ) CROSS JOIN (
      SELECT CASE WHEN (SELECT COUNT(*) FROM w{rounds}) = 0 THEN 1
             ELSE CAST(error('kcore oracle: {rounds}-round unroll did not converge — raise rounds') AS INT)
             END AS g
    ) guard
    WHERE guard.g = 1
    """


@query(
    "x_kcore",
    _kcore_sql(15, 6),  # sf0.01 converges in 3 peel rounds; 6 = 2x margin
    extra=True,  # r6 addition; window full — selfcheck + pytest verified
)
def x_kcore(spark, sf_dir):
    """15-core of the high-quantity supplier co-purchase graph:
    run-to-fixpoint peeling (pipeline/graph.py:k_core) vs the oracle's
    fixed 6-round unroll — equal exactly because peeling past the
    fixpoint is a no-op (82 of 100 suppliers survive at sf0.01)."""
    from pigout_spark.pipeline.graph import k_core

    li = t(spark, sf_dir, "lineitem").filter(F.col("l_quantity") > 45).select(
        "l_orderkey", "l_suppkey"
    )
    a, b = li.alias("a"), li.alias("b")
    edges = a.join(
        b,
        (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
        & (F.col("a.l_suppkey") < F.col("b.l_suppkey")),
    ).select(
        F.col("a.l_suppkey").alias("src"), F.col("b.l_suppkey").alias("dst")
    )
    return k_core(edges, k=15)


@query(
    "x_fuzzy_join",
    """
    WITH l AS (
      SELECT p_partkey AS lid, p_name AS ls FROM part WHERE p_partkey <= 500
    ), r AS (
      SELECT p_partkey + 1000000 AS rid, substr(p_name, 2) AS rs
      FROM part WHERE p_partkey <= 500
    )
    SELECT l.lid AS l_id, r.rid AS r_id,
           CAST(levenshtein(ls, rs) AS BIGINT) AS dist
    FROM l, r
    WHERE abs(len(ls) - len(rs)) <= 1 AND levenshtein(ls, rs) <= 1
    """,
    extra=True,  # r7 addition; window settled for r7 — rotate in r8
)
def x_fuzzy_join(spark, sf_dir):
    """Fuzzy (edit-distance ≤ 1) join of part names against their
    first-char-dropped mangles — EDJoin q-gram prefix filtering on the
    Spark side (operators/joins.py:edit_distance_join) hash-matched
    against the oracle's NAIVE exact all-pairs answer: equality proves
    the gram/prefix/low-gram filter chain lost no pair on this data."""
    from pigout_spark.operators.joins import edit_distance_join

    p = t(spark, sf_dir, "part").filter(F.col("p_partkey") <= 500)
    left = p.select(F.col("p_partkey").alias("id"), F.col("p_name").alias("s"))
    right = p.select(
        (F.col("p_partkey") + 1_000_000).alias("id"),
        F.expr("substring(p_name, 2)").alias("s"),
    )
    out = edit_distance_join(left, right, k=1)
    return out.select(
        F.col("l_id"), F.col("r_id"), F.col("dist")
    )


_BM25_TERMS = ("join", "hash", "vector", "stream")


@query(
    "x_bm25_topk",
    f"""
    WITH f AS (
      SELECT doc_id, {_SQL_TOKS} AS toks FROM documents
    ), dl AS (
      SELECT doc_id, CAST(len(toks) AS BIGINT) AS dl FROM f
    ), st AS (
      SELECT CAST(COUNT(*) AS DOUBLE) AS n,
             CAST(SUM(dl) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS avgdl
      FROM dl
    ), tfq AS (
      SELECT doc_id, tok, CAST(COUNT(*) AS DOUBLE) AS tfn
      FROM (SELECT doc_id, unnest(toks) AS tok FROM f)
      WHERE tok IN {tuple(_BM25_TERMS)!r}
      GROUP BY doc_id, tok
    ), dfc AS (
      SELECT tok, CAST(COUNT(*) AS DOUBLE) AS dfn FROM tfq GROUP BY tok
    ), c AS (
      SELECT tfq.doc_id,
             CAST(ROUND(
               ln((st.n - dfc.dfn + 0.5) / (dfc.dfn + 0.5) + 1)
               * tfq.tfn * (1.2 + 1)
               / (tfq.tfn + 1.2 * (1.0 - 0.75
                    + 0.75 * CAST(dl.dl AS DOUBLE) / st.avgdl)), 6)
             AS DECIMAL(20,6)) AS c
      FROM tfq JOIN dfc USING (tok) JOIN dl USING (doc_id), st
    ), s AS (
      SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_terms,
             CAST(SUM(c) AS DECIMAL(27,6)) AS sc
      FROM c GROUP BY doc_id
    )
    SELECT doc_id, n_terms, CAST(sc AS DOUBLE) AS score
    FROM s ORDER BY sc DESC, doc_id LIMIT 10
    """,
    extra=True,  # r7 addition; window settled for r7 — rotate in r8
)
def x_bm25_topk(spark, sf_dir):
    """BM25 top-10 for a 4-term query over the documents corpus —
    Lucene-variant idf, round-6 DECIMAL-exact per-term contributions,
    (score, id) tie order (pipeline/text.py:bm25_topk).  The token
    stream is pruned to the query vocabulary before any shuffle."""
    from pigout_spark.pipeline.text import bm25_topk

    return bm25_topk(tf(spark, sf_dir, "documents"), list(_BM25_TERMS), k=10)


@query(
    "x_split_safe",
    f"""
    WITH cl AS (
      SELECT * FROM ({_clusters_sql()})
    ), j AS (
      SELECT d.doc_id, COALESCE(cl.cluster_id, d.doc_id) AS ck
      FROM documents d LEFT JOIN cl ON d.doc_id = cl.doc_id
    ), u AS (
      SELECT doc_id,
             ('0x' || substring(md5('13' || '|' ||
                coalesce(ck::VARCHAR, chr(0))), 1, 8))::BIGINT
             / 4294967296.0 AS __u
      FROM j
    )
    SELECT doc_id, {_SPLIT_CASE} AS split FROM u
    """,
    extra=True,  # r7 addition; window settled for r7 — rotate in r8
)
def x_split_safe(spark, sf_dir):
    """LEAKAGE-SAFE 80/10/10 split: assignment keyed on the MinHash
    duplicate-cluster id, so near-dup families never straddle
    train/test (pipeline/curation.py:split_by_cluster over
    dedup_clusters).  The hash pins every doc's split label, and the
    cluster keying is what a doc-keyed split cannot give."""
    from pigout_spark.pipeline.curation import split_by_cluster
    from pigout_spark.pipeline.dedup import minhash_lsh_star_edges

    d = t(spark, sf_dir, "documents")
    # r14 (guide §2.3): the split needs only the CLUSTERS, so the CC
    # input is the star-contracted bucket relation (13.5k edges at
    # sf0.1) instead of the full pair cliques (2.09M) — bit-identical
    # components by construction (see minhash_lsh_star_edges; pinned by
    # test_minhash_star_edges_same_clusters), oracle unchanged (it
    # still replays the pair-clique CC).  Honest warm wall 12-13 s →
    # ~3 s at sf0.1.
    edges = minhash_lsh_star_edges(
        d, "doc_id", "text", num_hashes=_MH_HASHES, rows_per_band=_MH_ROWS
    )
    return split_by_cluster(
        d.select("doc_id"), dedup_clusters(edges), _SPLIT_W, seed="13"
    )


@query(
    "x_quality_pctile",
    f"""
    WITH toks AS (
      SELECT doc_id, unnest({_SQL_TOKS}) AS tok FROM documents
    ), tfc AS (
      SELECT tok, CAST(COUNT(*) AS BIGINT) AS tfn FROM toks GROUP BY tok
    ), sc AS (
      SELECT CAST(COUNT(*) AS DOUBLE) AS v,
             CAST(SUM(tfn) AS DOUBLE) AS n
      FROM tfc
    ), s AS (
      SELECT t.doc_id,
             -ln((tfc.tfn + 0.5) / (sc.n + 0.5 * sc.v)) AS srp
      FROM toks t JOIN tfc ON t.tok = tfc.tok, sc
    ), scored AS (
      SELECT doc_id, ROUND(SUM(srp) / COUNT(*), 6) AS score6
      FROM s GROUP BY doc_id
    )
    SELECT doc_id, score6,
           ROUND(percent_rank() OVER (ORDER BY score6), 6) AS pct6
    FROM scored
    """,
    extra=True,  # r7 addition; window settled for r7 — rotate in r8
)
def x_quality_pctile(spark, sf_dir):
    """Percentile-rank calibration of the unigram surprisal quality
    score: percent_rank semantics WITHOUT a keyless global window —
    two-pass row_rank + tied-score min-rank collapse
    (operators/sorting.py:percentile_rank).  The oracle's
    percent_rank() window is the semantic ground truth; the engine
    side must never plan a single-partition sort over data rows."""
    from pigout_spark.operators.sorting import percentile_rank
    from pigout_spark.pipeline.text import surprisal_score

    scored = surprisal_score(tf(spark, sf_dir, "documents")).select(
        "doc_id", F.round("mean_surprisal", 6).alias("score6")
    )
    out = percentile_rank(scored, "score6", id_cols=["doc_id"], out="__p")
    return out.select("doc_id", "score6", F.round("__p", 6).alias("pct6"))


@query(
    "x_ab_lift",
    """
    WITH e AS (
      SELECT user_id, value FROM events WHERE value IS NOT NULL
    ), a AS (
      SELECT value,
             ('0x' || substring(md5('7' || '|' ||
                coalesce(user_id::VARCHAR, chr(0))), 1, 8))::BIGINT
             / 4294967296.0 < 0.5 AS is_t
      FROM e
    ), s AS (
      SELECT CAST(SUM(CASE WHEN is_t THEN 1 ELSE 0 END) AS BIGINT) AS n_t,
             CAST(SUM(CASE WHEN is_t THEN 0 ELSE 1 END) AS BIGINT) AS n_c,
             CAST(SUM(CAST(CASE WHEN is_t THEN value ELSE 0.0 END
                           AS DECIMAL(24,8))) AS DOUBLE) AS sx_t,
             CAST(SUM(CAST(CASE WHEN is_t THEN 0.0 ELSE value END
                           AS DECIMAL(24,8))) AS DOUBLE) AS sx_c,
             CAST(SUM(CAST(CASE WHEN is_t THEN value * value ELSE 0.0 END
                           AS DECIMAL(30,8))) AS DOUBLE) AS sxx_t,
             CAST(SUM(CAST(CASE WHEN is_t THEN 0.0 ELSE value * value END
                           AS DECIMAL(30,8))) AS DOUBLE) AS sxx_c
      FROM a
    )
    SELECT n_c, n_t,
           ROUND(sx_c / n_c, 6) AS mean_c6,
           ROUND(sx_t / n_t, 6) AS mean_t6,
           ROUND(sx_t / n_t - sx_c / n_c, 6) AS lift6,
           ROUND((sx_t / n_t - sx_c / n_c)
                 / sqrt(((n_t * sxx_t - sx_t * sx_t) / (n_t * (n_t - 1))) / n_t
                      + ((n_c * sxx_c - sx_c * sx_c) / (n_c * (n_c - 1))) / n_c),
                 6) AS z6
    FROM s
    """,
    extra=True,  # r7 addition; window settled for r7 — rotate in r8
)
def x_ab_lift(spark, sf_dir):
    """A/B experiment readout over event values with user-keyed
    deterministic assignment (seed 7, 50/50): per-arm n/mean, lift,
    Welch z — decimal-exact component sums, one fixed IEEE chain
    (pipeline/behavioral.py:ab_lift)."""
    from pigout_spark.pipeline.behavioral import ab_lift

    ev = t(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    out = ab_lift(ev, "value", ["user_id"], treat_frac=0.5, seed="7")
    return out.select(
        "n_c", "n_t",
        F.round("mean_c", 6).alias("mean_c6"),
        F.round("mean_t", 6).alias("mean_t6"),
        F.round("lift", 6).alias("lift6"),
        F.round("z", 6).alias("z6"),
    )


def _lpa_sql(rounds: int) -> str:
    """Unrolled synchronous-LPA twin: EXACTLY ``rounds`` rounds of the
    (count DESC, label ASC) update — LPA is not a fixpoint op
    (synchronous updates can oscillate), so unlike the kcore/clusters
    oracles the round count must match the engine side exactly, and
    no convergence guard applies.  MATERIALIZED per round (each label
    relation is referenced 3×)."""
    edge_cte = """
      SELECT DISTINCT LEAST(x.l_suppkey, y.l_suppkey) AS a,
                      GREATEST(x.l_suppkey, y.l_suppkey) AS b
      FROM (SELECT * FROM lineitem WHERE l_quantity > 45) x
      JOIN (SELECT * FROM lineitem WHERE l_quantity > 45) y
        ON x.l_orderkey = y.l_orderkey AND x.l_suppkey < y.l_suppkey
    """
    parts = [
        f"e0 AS MATERIALIZED ({edge_cte})",
        "edges AS MATERIALIZED (SELECT a AS u, b AS v FROM e0"
        " UNION SELECT b, a FROM e0)",
        "nodes AS MATERIALIZED (SELECT DISTINCT u AS node FROM edges)",
        "l0 AS MATERIALIZED (SELECT node, node AS label FROM nodes)",
    ]
    for i in range(1, rounds + 1):
        parts.append(f"""m{i} AS MATERIALIZED (
      SELECT e.v AS node, l.label, COUNT(*) AS c
      FROM edges e JOIN l{i-1} l ON l.node = e.u
      GROUP BY e.v, l.label
    ), b{i} AS MATERIALIZED (
      SELECT node, label FROM m{i}
      QUALIFY row_number() OVER (PARTITION BY node
                                 ORDER BY c DESC, label ASC) = 1
    ), l{i} AS MATERIALIZED (
      SELECT n.node, COALESCE(b.label, l.label) AS label
      FROM nodes n JOIN l{i-1} l USING (node)
      LEFT JOIN b{i} b USING (node)
    )""")
    return (
        "WITH " + ",\n".join(parts)
        + f"\nSELECT node, CAST(label AS BIGINT) AS label FROM l{rounds}"
    )


@query(
    "x_label_prop",
    _lpa_sql(4),
    extra=True,  # r7 addition; window settled for r7 — rotate in r8
)
def x_label_prop(spark, sf_dir):
    """Synchronous label-propagation communities, EXACTLY 4 rounds,
    over the high-quantity supplier co-purchase graph — every node's
    label hash-matched against the 4-round unrolled replay
    (pipeline/graph.py:label_propagation; deterministic
    (count DESC, label ASC) tie rule makes the whole trajectory,
    oscillations included, a pure function of the graph)."""
    from pigout_spark.pipeline.graph import label_propagation

    li = t(spark, sf_dir, "lineitem").filter(F.col("l_quantity") > 45).select(
        "l_orderkey", "l_suppkey"
    )
    a, b = li.alias("a"), li.alias("b")
    edges = a.join(
        b,
        (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
        & (F.col("a.l_suppkey") < F.col("b.l_suppkey")),
    ).select(
        F.col("a.l_suppkey").alias("src"), F.col("b.l_suppkey").alias("dst")
    )
    return label_propagation(edges, rounds=4)


def _ppr_sql(iters: int, seeds: tuple, n_seeds_div: str = "nseeds") -> str:
    """Weighted + personalized pagerank twin: same int64 picorank
    arithmetic as _pagerank_sql with (a) per-edge integer weights
    (contribution = rank·w div Σw) and (b) teleport mass confined to
    the seed list ((1−d)/|S| and 1/|S| on seeds, 0 elsewhere)."""
    seed_list = ", ".join(str(s) for s in seeds)
    ns = len(seeds)
    base = f"CASE WHEN node IN ({seed_list}) THEN CAST(150000000000 // {ns} AS BIGINT) ELSE CAST(0 AS BIGINT) END"
    r0 = f"CASE WHEN node IN ({seed_list}) THEN CAST(1000000000000 // {ns} AS BIGINT) ELSE CAST(0 AS BIGINT) END"
    ctes = [
        "e AS (SELECT CAST(l_suppkey AS BIGINT) AS s,"
        " CAST(l_partkey + 4294967296 AS BIGINT) AS d,"
        " CAST(COUNT(*) AS BIGINT) AS w"
        " FROM lineitem GROUP BY 1, 2)",
        "deg AS (SELECT s, CAST(SUM(w) AS BIGINT) AS wsum FROM e GROUP BY s)",
        "nodes AS (SELECT DISTINCT node FROM"
        " (SELECT s AS node FROM e UNION SELECT d FROM e))",
        f"r0 AS (SELECT node, {r0} AS u FROM nodes)",
    ]
    for i in range(1, iters + 1):
        ctes.append(
            f"c{i} AS (SELECT e.d AS node,"
            f" CAST(SUM((r.u * e.w) // deg.wsum) AS BIGINT) AS cs"
            f" FROM e JOIN deg USING (s) JOIN r{i-1} r ON r.node = e.s"
            f" GROUP BY e.d)"
        )
        ctes.append(
            f"r{i} AS (SELECT nodes.node,"
            f" CAST({base.replace('node', 'nodes.node')}"
            f"      + (85 * coalesce(c{i}.cs, 0)) // 100 AS BIGINT) AS u"
            f" FROM nodes LEFT JOIN c{i} ON nodes.node = c{i}.node)"
        )
    return (
        "WITH " + ",\n".join(ctes)
        + f" SELECT node, CAST(u AS DOUBLE) / 1000000000000.0 AS rank"
        f" FROM r{iters}"
    )


_PPR_SEEDS = (1, 2, 3, 4, 5)


@query(
    "x_ppr",
    _ppr_sql(3, _PPR_SEEDS),
    extra=True,  # r7 addition; window settled for r7 — rotate in r8
)
def x_ppr(spark, sf_dir):
    """Personalized WEIGHTED PageRank: random-walk-with-restart from
    suppliers 1–5 over the supplier→part graph with co-order counts as
    integer edge weights — rank·w div Σw contributions, teleport mass
    confined to the seeds, every node's rank hash-matched against the
    unrolled integer replay (pipeline/graph.py:pagerank weight_col= /
    seeds=)."""
    from pigout_spark.pipeline.graph import pagerank

    li = t(spark, sf_dir, "lineitem")
    edges = li.groupBy(
        F.col("l_suppkey").cast("long").alias("src"),
        (F.col("l_partkey") + 4_294_967_296).cast("long").alias("dst"),
    ).agg(F.count(F.lit(1)).cast("long").alias("w"))
    return pagerank(
        edges, iterations=3, weight_col="w", seeds=list(_PPR_SEEDS)
    )


@query(
    "x_common_neighbors",
    """
    WITH e0 AS (
      SELECT DISTINCT LEAST(x.l_suppkey, y.l_suppkey) AS a,
                      GREATEST(x.l_suppkey, y.l_suppkey) AS b
      FROM (SELECT * FROM lineitem WHERE l_quantity > 47) x
      JOIN (SELECT * FROM lineitem WHERE l_quantity > 47) y
        ON x.l_orderkey = y.l_orderkey AND x.l_suppkey < y.l_suppkey
    ), adj AS (
      SELECT a AS w, b AS x FROM e0 UNION SELECT b, a FROM e0
    ), deg AS (
      SELECT x AS node, CAST(COUNT(*) AS BIGINT) AS deg FROM adj GROUP BY x
    ), pairs AS (
      SELECT p.x AS u, q.x AS v
      FROM adj p JOIN adj q ON p.w = q.w AND p.x < q.x
    ), cnt AS (
      SELECT u, v, CAST(COUNT(*) AS BIGINT) AS common
      FROM pairs GROUP BY u, v
      HAVING COUNT(*) >= 2
    )
    SELECT u, v, common,
           CAST(common AS DOUBLE)
             / CAST(du.deg + dv.deg - common AS DOUBLE) AS jaccard
    FROM cnt
    JOIN deg du ON du.node = cnt.u
    JOIN deg dv ON dv.node = cnt.v
    """,
    extra=True,  # r7 addition; window settled for r7 — rotate in r8
)
def x_common_neighbors(spark, sf_dir):
    """Common-neighbor link prediction over the high-quantity supplier
    co-purchase graph: shared-neighbor counts (≥ 2) and neighbor-set
    Jaccard per pair — the wedge self-join replayed identically in SQL
    (pipeline/graph.py:common_neighbors)."""
    from pigout_spark.pipeline.graph import common_neighbors

    li = t(spark, sf_dir, "lineitem").filter(F.col("l_quantity") > 47).select(
        "l_orderkey", "l_suppkey"
    )
    a, b = li.alias("a"), li.alias("b")
    edges = a.join(
        b,
        (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
        & (F.col("a.l_suppkey") < F.col("b.l_suppkey")),
    ).select(
        F.col("a.l_suppkey").alias("src"), F.col("b.l_suppkey").alias("dst")
    )
    return common_neighbors(edges, min_common=2)


def _hits_sql(iters: int) -> str:
    """Unrolled integer-L1 HITS twin: per round an auth join-agg +
    rescale and a hub join-agg + rescale, with the L1 totals as scalar
    subqueries and the engine's integer-divisor rule (x div
    max(Σx div 10^12, 1)) — pure int64 floor division, identical in
    both engines (an exact x·10^12 div Σx needs 128-bit intermediates
    that Spark's DECIMAL(38) integral divide silently rounds)."""
    # {x}/{tot} ride as HUGEINT (DuckDB SUM(BIGINT) widens exactly;
    # HUGEINT // is an exact integral divide — DECIMAL // routes
    # through doubles and must not be used here)
    norm = (
        "CAST({x} // greatest(CAST(({tot}) // 1000000000000 AS BIGINT),"
        " CAST(1 AS BIGINT)) AS BIGINT)"
    )
    ctes = [
        "e AS (SELECT CAST(l_suppkey AS BIGINT) AS s,"
        " CAST(l_partkey + 4294967296 AS BIGINT) AS d FROM lineitem)",
        "nodes AS (SELECT DISTINCT node FROM"
        " (SELECT s AS node FROM e UNION SELECT d FROM e))",
        "h0 AS (SELECT node, CAST(1000000000000 AS BIGINT) AS u FROM nodes)",
    ]
    for i in range(1, iters + 1):
        ctes.append(
            f"ar{i} AS (SELECT e.d AS node, SUM(CAST(h.u AS HUGEINT)) AS a"
            f" FROM e JOIN h{i-1} h ON h.node = e.s GROUP BY e.d)"
        )
        ctes.append(
            f"af{i} AS (SELECT nodes.node,"
            f" CAST(coalesce(ar{i}.a, 0) AS HUGEINT) AS a"
            f" FROM nodes LEFT JOIN ar{i} ON nodes.node = ar{i}.node)"
        )
        ctes.append(
            f"a{i} AS (SELECT node, "
            + norm.format(x="a", tot=f"(SELECT SUM(a) FROM af{i})")
            + " AS u FROM af" + str(i) + ")"
        )
        ctes.append(
            f"hr{i} AS (SELECT e.s AS node, SUM(CAST(a.u AS HUGEINT)) AS h"
            f" FROM e JOIN a{i} a ON a.node = e.d GROUP BY e.s)"
        )
        ctes.append(
            f"hf{i} AS (SELECT nodes.node,"
            f" CAST(coalesce(hr{i}.h, 0) AS HUGEINT) AS h"
            f" FROM nodes LEFT JOIN hr{i} ON nodes.node = hr{i}.node)"
        )
        ctes.append(
            f"h{i} AS (SELECT node, "
            + norm.format(x="h", tot=f"(SELECT SUM(h) FROM hf{i})")
            + " AS u FROM hf" + str(i) + ")"
        )
    return (
        "WITH " + ",\n".join(ctes)
        + f""" SELECT n.node,
           CAST(h.u AS DOUBLE) / 1000000000000.0 AS hub,
           CAST(a.u AS DOUBLE) / 1000000000000.0 AS authority
        FROM nodes n
        JOIN h{iters} h ON h.node = n.node
        JOIN a{iters} a ON a.node = n.node"""
    )


@query(
    "x_hits",
    _hits_sql(2),
    extra=True,  # r7 addition; window settled for r7 — rotate in r8
)
def x_hits(spark, sf_dir):
    """HITS hubs & authorities, 2 rounds, over the supplier→part edge
    relation (parallel edges counted) — integer-divisor L1 rescaling,
    every node's (hub, authority) pair
    hash-matched against the unrolled replay
    (pipeline/graph.py:hits)."""
    from pigout_spark.pipeline.graph import hits

    li = t(spark, sf_dir, "lineitem")
    edges = li.select(
        F.col("l_suppkey").cast("long").alias("src"),
        (F.col("l_partkey") + 4_294_967_296).cast("long").alias("dst"),
    )
    return hits(edges, iterations=2)


def _mmr_sql(
    emb_src: str, qmax: int, ncand: int, lam: float, k: int = 3
) -> str:
    """Unrolled MMR twin (k greedy rounds; k=3 supported): candidates +
    pair sims at round-6, then per-round argmax with the (score DESC,
    id ASC) tie rule.  ``emb_src`` is a relation exposing
    (vec_id, embedding) — the fixture view or a fuzz VALUES CTE."""
    assert k == 3, "oracle unroll written for k=3"
    lm, om = repr(float(lam)), repr(1.0 - float(lam))
    return f"""
    WITH e AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM {emb_src}
    ), q AS (
      SELECT vec_id AS q_id, v AS qv FROM e WHERE vec_id < {qmax}
    ), scored AS (
      SELECT q.q_id, e.vec_id AS c, e.v AS cv,
             {_sql_dot('q.qv', 'e.v')}
               / (sqrt({_sql_dot('q.qv', 'q.qv')})
                  * sqrt({_sql_dot('e.v', 'e.v')})) AS cos
      FROM e, q WHERE e.vec_id <> q.q_id
    ), rel AS (
      SELECT q_id, c, cv, ROUND(cos, 6) AS rel6 FROM scored
      QUALIFY row_number() OVER (PARTITION BY q_id
                                 ORDER BY cos DESC, c) <= {ncand}
    ), sims AS (
      SELECT x.q_id, x.c AS a, y.c AS b,
             ROUND({_sql_dot('x.cv', 'y.cv')}
               / (sqrt({_sql_dot('x.cv', 'x.cv')})
                  * sqrt({_sql_dot('y.cv', 'y.cv')})), 6) AS sim6
      FROM rel x JOIN rel y ON x.q_id = y.q_id AND x.c <> y.c
    ), s1 AS (
      SELECT q_id, c AS id1, rel6 AS sc1 FROM rel
      QUALIFY row_number() OVER (PARTITION BY q_id
                                 ORDER BY rel6 DESC, c) = 1
    ), u2 AS (
      SELECT r.q_id, r.c, {lm} * r.rel6 - {om} * s.sim6 AS sc
      FROM rel r
      JOIN s1 ON s1.q_id = r.q_id
      JOIN sims s ON s.q_id = r.q_id AND s.a = r.c AND s.b = s1.id1
      WHERE r.c <> s1.id1
    ), s2 AS (
      SELECT q_id, c AS id2, sc AS sc2 FROM u2
      QUALIFY row_number() OVER (PARTITION BY q_id
                                 ORDER BY sc DESC, c) = 1
    ), u3 AS (
      SELECT r.q_id, r.c,
             {lm} * r.rel6 - {om} * GREATEST(sa.sim6, sb.sim6) AS sc
      FROM rel r
      JOIN s1 ON s1.q_id = r.q_id
      JOIN s2 ON s2.q_id = r.q_id
      JOIN sims sa ON sa.q_id = r.q_id AND sa.a = r.c AND sa.b = s1.id1
      JOIN sims sb ON sb.q_id = r.q_id AND sb.a = r.c AND sb.b = s2.id2
      WHERE r.c <> s1.id1 AND r.c <> s2.id2
    ), s3 AS (
      SELECT q_id, c AS id3, sc AS sc3 FROM u3
      QUALIFY row_number() OVER (PARTITION BY q_id
                                 ORDER BY sc DESC, c) = 1
    )
    SELECT q_id, CAST(1 AS BIGINT) AS rank, id1 AS neighbor_id,
           ROUND(sc1, 6) AS score FROM s1
    UNION ALL
    SELECT q_id, 2, id2, ROUND(sc2, 6) FROM s2
    UNION ALL
    SELECT q_id, 3, id3, ROUND(sc3, 6) FROM s3
    """


@query(
    "x_mmr",
    _mmr_sql("embeddings", qmax=6, ncand=8, lam=0.5),
    extra=True,  # r7 addition; window settled for r7 — rotate in r8
)
def x_mmr(spark, sf_dir):
    """MMR diversified re-ranking (λ=0.5): 8 exact-cosine candidates
    per query, 3 greedy diversity selections — the full trajectory
    (ids AND objective scores) hash-matched against a 3-round
    unrolled argmax replay (pipeline/similarity.py:mmr_rerank;
    round-6 rel/sim inputs make every engine walk the identical
    greedy path)."""
    from pigout_spark.pipeline.similarity import mmr_rerank

    emb = tf(spark, sf_dir, "embeddings")
    out = mmr_rerank(
        emb, emb.filter(F.col("vec_id") < 6), n_candidates=8, k=3, lam=0.5
    )
    return out.select(
        "q_id", "rank", "neighbor_id", F.round("score", 6).alias("score")
    )


def _bfs_sql(seeds: list, hops: int) -> str:
    # min-propagation replay of the frontier BFS (equal values for
    # unweighted graphs: a node's hop count == the min path length
    # that reaches it within the budget) — pure integer, bit-exact
    seed_vals = ", ".join(
        f"(CAST({x} AS BIGINT), CAST(0 AS BIGINT))" for x in seeds
    )
    ctes = [
        "p AS (SELECT l_orderkey, l_suppkey FROM lineitem"
        " WHERE l_quantity > 45)",
        "e AS (SELECT DISTINCT x.l_suppkey AS s, y.l_suppkey AS d"
        " FROM p x JOIN p y ON x.l_orderkey = y.l_orderkey"
        " AND x.l_suppkey <> y.l_suppkey)",
        f"r0 AS (SELECT * FROM (VALUES {seed_vals}) t(node, hops))",
    ]
    for i in range(1, hops + 1):
        ctes.append(
            f"r{i} AS (SELECT node, MIN(h) AS hops FROM ("
            f" SELECT node, hops AS h FROM r{i-1}"
            f" UNION ALL SELECT e.d, r.hops + 1 FROM e"
            f" JOIN r{i-1} r ON r.node = e.s) GROUP BY node)"
        )
    return (
        "WITH " + ",\n".join(ctes)
        + f" SELECT node, CAST(hops AS BIGINT) AS hops FROM r{hops}"
    )


@query("x_bfs_hops", _bfs_sql([1, 2], 3))
def x_bfs_hops(spark, sf_dir):
    """Multi-source BFS (seeds: suppliers 1, 2; budget 3 hops) over
    the high-quantity supplier co-purchase graph — every reached
    node's hop count hash-matched against a 3-round unrolled
    min-propagation replay (pipeline/graph.py:bfs_distances; frontier
    form on the Spark side, min-plus form in SQL — equal for
    unweighted graphs, both pure integer)."""
    from pigout_spark.pipeline.graph import bfs_distances

    li = t(spark, sf_dir, "lineitem").filter(F.col("l_quantity") > 45).select(
        "l_orderkey", "l_suppkey"
    )
    a, b = li.alias("a"), li.alias("b")
    edges = a.join(
        b,
        (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
        & (F.col("a.l_suppkey") != F.col("b.l_suppkey")),
    ).select(
        F.col("a.l_suppkey").alias("src"), F.col("b.l_suppkey").alias("dst")
    )
    # edges already hold both directions (the <> self-join), so the
    # operator runs directed=True on the symmetric relation
    return bfs_distances(edges, sources=[1, 2], max_hops=3, directed=True)


def _sssp_sql(seeds: list, iters: int) -> str:
    # k-round Bellman-Ford replay: dist_i(v) = min(dist_{i-1}(v),
    # min over edges (dist_{i-1}(u) + w)) — shortest path using at
    # most k edges, exactly the operator's contract; integer weights
    # make every engine bit-identical
    seed_vals = ", ".join(
        f"(CAST({x} AS BIGINT), CAST(0 AS BIGINT))" for x in seeds
    )
    ctes = [
        "p AS (SELECT l_orderkey, l_suppkey,"
        " CAST(l_quantity AS BIGINT) AS q FROM lineitem"
        " WHERE l_quantity > 45)",
        # undirected weighted graph: per unordered pair, the MIN of
        # (|Δquantity| + 1) over co-purchase occurrences, emitted in
        # both directions
        "ew AS (SELECT x.l_suppkey AS a, y.l_suppkey AS b,"
        " MIN(abs(x.q - y.q) + 1) AS w"
        " FROM p x JOIN p y ON x.l_orderkey = y.l_orderkey"
        " AND x.l_suppkey < y.l_suppkey GROUP BY x.l_suppkey, y.l_suppkey)",
        "e AS (SELECT a AS s, b AS d, w FROM ew"
        " UNION ALL SELECT b, a, w FROM ew)",
        f"r0 AS (SELECT * FROM (VALUES {seed_vals}) t(node, dist))",
    ]
    for i in range(1, iters + 1):
        ctes.append(
            f"r{i} AS (SELECT node, MIN(dd) AS dist FROM ("
            f" SELECT node, dist AS dd FROM r{i-1}"
            f" UNION ALL SELECT e.d, r.dist + e.w FROM e"
            f" JOIN r{i-1} r ON r.node = e.s) GROUP BY node)"
        )
    return (
        "WITH " + ",\n".join(ctes)
        + f" SELECT node, CAST(dist AS BIGINT) AS dist FROM r{iters}"
    )


@query("x_sssp", _sssp_sql([1], 4))
def x_sssp(spark, sf_dir):
    """Weighted single-source shortest paths (seed: supplier 1, ≤4
    edges) over the supplier co-purchase graph with |Δquantity|+1
    edge weights — every settled node's distance hash-matched against
    a 4-round unrolled Bellman-Ford replay
    (pipeline/graph.py:shortest_paths; the k-edge budget IS the
    contract, so no convergence guard is needed)."""
    from pigout_spark.pipeline.graph import shortest_paths

    li = (
        t(spark, sf_dir, "lineitem")
        .filter(F.col("l_quantity") > 45)
        .select(
            "l_orderkey",
            "l_suppkey",
            F.col("l_quantity").cast("bigint").alias("q"),
        )
    )
    a, b = li.alias("a"), li.alias("b")
    edges = (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_suppkey") < F.col("b.l_suppkey")),
        )
        .groupBy(
            F.col("a.l_suppkey").alias("src"),
            F.col("b.l_suppkey").alias("dst"),
        )
        .agg(
            F.min(F.abs(F.col("a.q") - F.col("b.q")) + F.lit(1)).alias("w")
        )
    )
    return shortest_paths(
        edges, sources=[1], weight_col="w", iterations=4, directed=False
    )


@query(
    "x_item_cf",
    """
    WITH ui0 AS (
      SELECT DISTINCT o_custkey AS u, l_partkey AS i
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    ), ui AS (
      SELECT u, i FROM ui0
      QUALIFY row_number() OVER (PARTITION BY u ORDER BY i) <= 25
    ), ni AS (
      SELECT i, CAST(COUNT(*) AS BIGINT) AS n FROM ui GROUP BY i
    ), pairs AS (
      SELECT x.i AS a, y.i AS b, CAST(COUNT(*) AS BIGINT) AS n_ab
      FROM ui x JOIN ui y ON x.u = y.u AND x.i < y.i
      GROUP BY x.i, y.i HAVING COUNT(*) >= 2
    ), sym AS (
      SELECT a AS item, b AS rec_item, n_ab FROM pairs
      UNION ALL SELECT b, a, n_ab FROM pairs
    ), sc AS (
      SELECT item, rec_item, n_ab,
             n_ab / sqrt(CAST(na.n * nb.n AS DOUBLE)) AS score
      FROM sym
      JOIN ni na ON sym.item = na.i
      JOIN ni nb ON sym.rec_item = nb.i
    )
    SELECT item, rec_item, n_ab, score,
           CAST(row_number() OVER (PARTITION BY item
                ORDER BY score DESC, rec_item) AS BIGINT) AS rank
    FROM sc QUALIFY rank <= 5
    """,
)
def x_item_cf(spark, sf_dir):
    """Item-item collaborative filtering over the customer×part
    incidence (pipeline/recsys.py:item_cf_topk): top-5 cosine
    neighbors per part, co-occurrence ≥ 2, per-customer item sets
    capped at 25 (the deterministic hub guard — mirrored by the
    oracle's QUALIFY cap so capped runs still hash-match)."""
    from pigout_spark.pipeline.recsys import item_cf_topk

    li = t(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    o = t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    ev = li.join(o, li.l_orderkey == o.o_orderkey).select(
        F.col("o_custkey").alias("u"), F.col("l_partkey").alias("i")
    )
    return item_cf_topk(
        ev, "u", "i", k=5, min_cooc=2, max_items_per_user=25
    )


@query(
    "x_ab_segments",
    """
    WITH e AS (
      SELECT user_id, event_type, value FROM events WHERE value IS NOT NULL
    ), a AS (
      SELECT event_type, value,
             ('0x' || substring(md5('7' || '|' ||
                coalesce(user_id::VARCHAR, chr(0))), 1, 8))::BIGINT
             / 4294967296.0 < 0.5 AS is_t
      FROM e
    ), s AS (
      SELECT event_type,
             CAST(SUM(CASE WHEN is_t THEN 1 ELSE 0 END) AS BIGINT) AS n_t,
             CAST(SUM(CASE WHEN is_t THEN 0 ELSE 1 END) AS BIGINT) AS n_c,
             CAST(SUM(CAST(CASE WHEN is_t THEN value ELSE 0.0 END
                           AS DECIMAL(24,8))) AS DOUBLE) AS sx_t,
             CAST(SUM(CAST(CASE WHEN is_t THEN 0.0 ELSE value END
                           AS DECIMAL(24,8))) AS DOUBLE) AS sx_c,
             CAST(SUM(CAST(CASE WHEN is_t THEN value * value ELSE 0.0 END
                           AS DECIMAL(30,8))) AS DOUBLE) AS sxx_t,
             CAST(SUM(CAST(CASE WHEN is_t THEN 0.0 ELSE value * value END
                           AS DECIMAL(30,8))) AS DOUBLE) AS sxx_c
      FROM a GROUP BY event_type
    )
    SELECT event_type, n_c, n_t,
           CASE WHEN n_c > 0 THEN ROUND(sx_c / n_c, 6) END AS mean_c6,
           CASE WHEN n_t > 0 THEN ROUND(sx_t / n_t, 6) END AS mean_t6,
           CASE WHEN n_c > 0 AND n_t > 0
                THEN ROUND(sx_t / n_t - sx_c / n_c, 6) END AS lift6,
           CASE WHEN n_c > 1 AND n_t > 1 THEN
             ROUND((sx_t / n_t - sx_c / n_c)
                 / sqrt(((n_t * sxx_t - sx_t * sx_t) / (n_t * (n_t - 1))) / n_t
                      + ((n_c * sxx_c - sx_c * sx_c) / (n_c * (n_c - 1))) / n_c),
                 6) END AS z6
    FROM s
    """,
)
def x_ab_segments(spark, sf_dir):
    """Per-segment A/B readout (ab_lift(by=['event_type']), r8): the
    heterogeneous-treatment-effect view — same user-keyed assignment
    and decimal-exact formula chain as x_ab_lift, one map-side-
    combinable groupBy onto the segment key instead of the 1-row
    agg."""
    from pigout_spark.pipeline.behavioral import ab_lift

    ev = t(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    out = ab_lift(
        ev, "value", ["user_id"], treat_frac=0.5, seed="7",
        by=["event_type"],
    )
    return out.select(
        "event_type", "n_c", "n_t",
        F.round("mean_c", 6).alias("mean_c6"),
        F.round("mean_t", 6).alias("mean_t6"),
        F.round("lift", 6).alias("lift6"),
        F.round("z", 6).alias("z6"),
    )


# --- r9 additions: ML feature-prep family (pipeline/features.py;
# --- r10 rotation queue) ---
@query(
    "x_target_enc",
    extra=True,  # r9 addition — r10 rotation candidate
    sql="""
    WITH c AS (
      SELECT o_orderpriority AS k,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(30,6))) AS DOUBLE) AS sy,
             CAST(COUNT(o_totalprice) AS DOUBLE) AS ny
      FROM orders GROUP BY 1
    ), t AS (
      SELECT CAST(SUM(CAST(o_totalprice AS DECIMAL(30,6))) AS DOUBLE)
             / CAST(COUNT(o_totalprice) AS DOUBLE) AS prior
      FROM orders
    )
    SELECT o_orderkey, o_orderpriority,
      CASE WHEN (ny - CASE WHEN o_totalprice IS NOT NULL
                           THEN 1.0 ELSE 0.0 END + 20.0) > 0 THEN
        ROUND((sy - CASE WHEN o_totalprice IS NOT NULL
                         THEN o_totalprice ELSE 0.0 END + 20.0 * prior)
              / (ny - CASE WHEN o_totalprice IS NOT NULL
                           THEN 1.0 ELSE 0.0 END + 20.0), 6) + 0.0
      END AS target_enc
    FROM orders JOIN c ON o_orderpriority IS NOT DISTINCT FROM c.k
    CROSS JOIN t
    """,
)
def x_target_enc(spark, sf_dir):
    """Leave-one-out smoothed target encoding of order priority against
    total price (pipeline/features.py:target_encode) — each row's own
    label excluded from its feature (the leakage guard), shrinkage
    m=20 toward the global mean; decimal-exact sums, ROUND-6."""
    from pigout_spark.pipeline.features import target_encode

    o = t(spark, sf_dir, "orders")
    return target_encode(
        o,
        ["o_orderpriority"],
        "o_totalprice",
        smoothing=20.0,
        leave_one_out=True,
    ).select("o_orderkey", "o_orderpriority", "target_enc")


@query(
    "x_feature_hash",
    extra=True,  # r9 addition — r10 rotation candidate
    sql=f"""
    WITH toks AS (
      SELECT doc_id, unnest({_SQL_TOKS}) AS tok FROM documents
    )
    SELECT doc_id,
           ('0x' || substring(md5('fh0' || '|' || tok), 1, 8))::BIGINT
             % 64 AS bucket,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM toks WHERE tok IS NOT NULL
    GROUP BY 1, 2
    """,
)
def x_feature_hash(spark, sf_dir):
    """The hashing trick over document tokens: 64-bucket sparse COO
    counts (pipeline/features.py:feature_hash) — md5-hex bucket
    assignment (the split_corpus idiom) replayed bit-identically by
    the oracle; output is nnz-sized, never docs x buckets."""
    from pigout_spark.pipeline.dedup import ws_tokens
    from pigout_spark.pipeline.features import feature_hash

    d = t(spark, sf_dir, "documents").select(
        "doc_id", F.explode(ws_tokens("text", distinct=False)).alias("tok")
    )
    return feature_hash(d, ["doc_id"], "tok", n_buckets=64, seed="fh0")


@query(
    "x_robust_scale",
    extra=True,  # r9 addition — r10 rotation candidate
    sql="""
    WITH o AS (
      SELECT o_orderkey, o_orderpriority AS pri, o_totalprice AS v
      FROM orders
    ), r AS (
      SELECT pri, v,
             row_number() OVER (PARTITION BY pri ORDER BY v) AS rn,
             COUNT(*) OVER (PARTITION BY pri) AS n
      FROM o WHERE v IS NOT NULL
    ), b AS (
      SELECT pri,
        MIN(CASE WHEN rn = GREATEST(1, ceil(0.25 * n)) THEN v END) AS q25,
        MIN(CASE WHEN rn = GREATEST(1, ceil(0.5 * n)) THEN v END) AS q50,
        MIN(CASE WHEN rn = GREATEST(1, ceil(0.75 * n)) THEN v END) AS q75
      FROM r GROUP BY pri
    )
    SELECT o_orderkey, pri, v AS value,
      CASE WHEN v IS NOT NULL AND (q75 - q25) > 0 THEN
        ROUND((v - q50) / (q75 - q25), 6) + 0.0 END AS value_rs
    FROM o LEFT JOIN b USING (pri)
    """,
)
def x_robust_scale(spark, sf_dir):
    """Per-priority robust scaling of order totals — (v − median)/IQR
    on the winsorize order-statistic convention
    (pipeline/features.py:robust_scale): outlier-immune normalization,
    one key exchange, ROUND-6."""
    from pigout_spark.pipeline.features import robust_scale

    o = t(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.col("o_orderpriority").alias("pri"),
        F.col("o_totalprice").alias("value"),
    )
    return robust_scale(o, "value", ["pri"])


# --- r9 additions: model-evaluation family (pipeline/evaluation.py;
# --- r10 rotation queue).  Scores are md5-derived 6-decimal rationals
# --- (k % 1e6 / 1e6): both engines parse/compute the identical double,
# --- so bins, comparisons, and decimal sums hash bit-identically. ---
_U6 = (
    "(('0x' || substring(md5({seed} || '|' ||"
    " coalesce(CAST({col} AS VARCHAR), chr(0))), 1, 8))::BIGINT"
    " % 1000000) / 1000000.0"
)


def _u6_col(seed: str, col):
    return (
        F.conv(
            F.substring(
                F.md5(
                    F.concat_ws(
                        "|",
                        F.lit(seed),
                        F.coalesce(col.cast("string"), F.lit("\x00")),
                    )
                ),
                1,
                8,
            ),
            16,
            10,
        ).cast("bigint")
        % 1000000
    ) / 1000000.0


@query(
    "x_roc_auc",
    extra=True,  # r9 addition — r10 rotation candidate
    sql="""
    WITH d AS (
      SELECT o_orderpriority LIKE '1%' AS y, o_totalprice AS s
      FROM orders
      WHERE o_orderpriority IS NOT NULL AND o_totalprice IS NOT NULL
    ), r AS (
      SELECT y,
        CAST(2 * rank() OVER (ORDER BY s)
             + count(*) OVER (PARTITION BY s) - 1 AS BIGINT) AS r2
      FROM d
    ), a AS (
      SELECT CAST(SUM(CASE WHEN y THEN 1 ELSE 0 END) AS BIGINT) AS n_pos,
             CAST(SUM(CASE WHEN y THEN 0 ELSE 1 END) AS BIGINT) AS n_neg,
             CAST(SUM(CASE WHEN y THEN CAST(r2 AS DECIMAL(38,0))
                           ELSE 0 END) AS DOUBLE) AS sr2
      FROM r
    )
    SELECT n_pos, n_neg,
      CASE WHEN n_pos > 0 AND n_neg > 0 THEN
        ROUND((sr2 / 2.0 - n_pos * (n_pos + 1.0) / 2.0)
              / (CAST(n_pos AS DOUBLE) * n_neg), 6) + 0.0
      END AS auc6
    FROM a
    """,
)
def x_roc_auc(spark, sf_dir):
    """Exact ROC-AUC of total price as a predictor of urgent priority
    (pipeline/evaluation.py:roc_auc) — the Mann–Whitney rank-sum
    identity with tie ½-credit; no curve materialization, no
    threshold sweep."""
    from pigout_spark.pipeline.evaluation import roc_auc

    o = t(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority").isNotNull()
        & F.col("o_totalprice").isNotNull()
    )
    return roc_auc(
        o.withColumn("y", F.col("o_orderpriority").startswith("1")),
        "y",
        "o_totalprice",
    )


@query(
    "x_calibration",
    extra=True,  # r9 addition — r10 rotation candidate
    sql=f"""
    WITH d AS (
      SELECT {_U6.format(seed="'cal'", col="doc_id")} AS s,
             {_U6.format(seed="'lab'", col="doc_id")}
               < {_U6.format(seed="'cal'", col="doc_id")} AS y
      FROM documents
    ), g AS (
      SELECT LEAST(9, CAST(floor(s * 10) AS INT)) AS bin,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(CASE WHEN y THEN 1 ELSE 0 END) AS BIGINT) AS n_pos,
             CAST(SUM(CAST(s AS DECIMAL(26,16))) AS DOUBLE) AS ss
      FROM d GROUP BY 1
    )
    SELECT CAST(bin AS BIGINT) AS bin, n, n_pos,
           ROUND(ss / n, 6) + 0.0 AS mean_pred6,
           ROUND(CAST(n_pos AS DOUBLE) / n, 6) + 0.0 AS obs_rate6,
           ROUND((ROUND(CAST(n_pos AS DOUBLE) / n, 6) + 0.0)
                 - (ROUND(ss / n, 6) + 0.0), 6) + 0.0 AS gap6
    FROM g
    """,
)
def x_calibration(spark, sf_dir):
    """Reliability-diagram bins for a perfectly-calibrated synthetic
    scorer (label ~ Bernoulli(score) via two independent md5 uniforms —
    observed rate tracks mean prediction by construction)
    (pipeline/evaluation.py:calibration_bins)."""
    from pigout_spark.pipeline.evaluation import calibration_bins

    d = t(spark, sf_dir, "documents").select(
        _u6_col("cal", F.col("doc_id")).alias("s"),
        (
            _u6_col("lab", F.col("doc_id"))
            < _u6_col("cal", F.col("doc_id"))
        ).alias("y"),
    )
    return calibration_bins(d, "s", "y", bins=10)


@query(
    "x_uplift",
    extra=True,  # r9 addition — r10 rotation candidate
    sql=f"""
    WITH d AS (
      SELECT {_U6.format(seed="'upl'", col="user_id")} < 0.5 AS tr,
             event_type = 'purchase' AS y,
             {_U6.format(seed="'sc'", col="event_id")} AS s,
             event_id
      FROM events
      WHERE event_id IS NOT NULL AND event_type IS NOT NULL
    ), r AS (
      SELECT tr, y,
             row_number() OVER (ORDER BY s DESC, event_id) AS rn,
             CAST(COUNT(*) OVER () AS BIGINT) AS n
      FROM d
    ), per AS (
      SELECT CAST(ceil(10.0 * rn / n) AS BIGINT) AS bucket,
             CAST(COUNT(*) AS BIGINT) AS bn,
             CAST(SUM(CASE WHEN tr THEN 1 ELSE 0 END) AS BIGINT) AS bnt,
             CAST(SUM(CASE WHEN tr AND y THEN 1 ELSE 0 END) AS BIGINT)
               AS byt,
             CAST(SUM(CASE WHEN (NOT tr) AND y THEN 1 ELSE 0 END)
                  AS BIGINT) AS byc
      FROM r GROUP BY 1
    ), cum AS (
      SELECT bucket,
        CAST(SUM(bn) OVER w AS BIGINT) AS n,
        CAST(SUM(bnt) OVER w AS BIGINT) AS n_t,
        CAST(SUM(bn) OVER w - SUM(bnt) OVER w AS BIGINT) AS n_c,
        CAST(SUM(byt) OVER w AS BIGINT) AS y_t,
        CAST(SUM(byc) OVER w AS BIGINT) AS y_c
      FROM per
      WINDOW w AS (ORDER BY bucket ROWS UNBOUNDED PRECEDING)
    )
    SELECT bucket, n, n_t, n_c, y_t, y_c,
      CASE WHEN n_t > 0 THEN
        ROUND(CAST(y_t AS DOUBLE) / n_t, 6) + 0.0 END AS rate_t6,
      CASE WHEN n_c > 0 THEN
        ROUND(CAST(y_c AS DOUBLE) / n_c, 6) + 0.0 END AS rate_c6,
      CASE WHEN n_c > 0 THEN
        ROUND(CAST(y_t AS DOUBLE)
              - CAST(y_c AS DOUBLE) * n_t / n_c, 6) + 0.0 END AS qini6
    FROM cum
    """,
)
def x_uplift(spark, sf_dir):
    """Cumulative Qini/uplift by score decile — md5-assigned treatment,
    purchase outcome, md5-uniform targeting score, event_id tiebreak
    (pipeline/evaluation.py:uplift_deciles)."""
    from pigout_spark.pipeline.evaluation import uplift_deciles

    e = t(spark, sf_dir, "events").filter(
        F.col("event_id").isNotNull() & F.col("event_type").isNotNull()
    )
    d = e.select(
        (_u6_col("upl", F.col("user_id")) < 0.5).alias("tr"),
        (F.col("event_type") == "purchase").alias("y"),
        _u6_col("sc", F.col("event_id")).alias("s"),
        "event_id",
    )
    return uplift_deciles(
        d, "tr", "y", "s", tiebreak_cols=["event_id"], n_buckets=10
    )


@query(
    "x_url_normalize",
    extra=True,  # r9 addition — r10 rotation candidate
    sql="""
    WITH u AS (
      SELECT CASE doc_id % 5
        WHEN 0 THEN 'https://example.com/p/' || (doc_id % 500)
        WHEN 1 THEN 'HTTPS://EXAMPLE.COM:443/p/' || (doc_id % 500) || '/'
        WHEN 2 THEN 'https://example.com/p/' || (doc_id % 500)
                    || '?utm_source=x&z=1#f'
        WHEN 3 THEN 'https://example.com/p/' || (doc_id % 500)
             || '?z=1&utm_campaign=c'
        ELSE 'https://example.com/p/' || (doc_id % 500)
             || '#/route?id=5'
      END AS url
      FROM documents
    ), n AS (
      SELECT url,
        lower(regexp_extract(url, '^([A-Za-z][A-Za-z0-9+.-]*)://', 1))
          AS sch,
        lower(regexp_extract(url, '^[^:/?#]+://([^/?#]*)', 1)) AS hp,
        regexp_extract(url, '^[^:/?#]+://[^/?#]*([^?#]*)', 1) AS pth,
        regexp_extract(regexp_extract(url, '^[^#]*', 0), '\\?(.*)', 1)
          AS q
      FROM u
    ), n2 AS (
      SELECT sch,
        CASE WHEN sch = 'http' AND hp LIKE '%:80'
               THEN substring(hp, 1, length(hp) - 3)
             WHEN sch = 'https' AND hp LIKE '%:443'
               THEN substring(hp, 1, length(hp) - 4)
             ELSE hp END AS host,
        CASE WHEN pth = '' THEN '/' ELSE pth END AS p1, q
      FROM n
    ), n3 AS (
      SELECT sch, host,
        CASE WHEN length(p1) > 1 AND p1 LIKE '%/'
             THEN substring(p1, 1, length(p1) - 1) ELSE p1 END AS path,
        array_to_string(list_sort(list_filter(string_split(q, '&'),
          x -> x <> '' AND NOT regexp_matches(x,
            '^(utm_[^=]*|fbclid|gclid|msclkid|ref)(=|$)'))), '&') AS qn
      FROM n2
    )
    SELECT sch || '://' || host || path
           || CASE WHEN qn <> '' THEN '?' || qn ELSE '' END AS url_norm,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM n3 GROUP BY 1
    """,
)
def x_url_normalize(spark, sf_dir):
    """URL canonicalization → exact dedup by canonical URL — the
    web-corpus pre-dedup step (pipeline/text.py:url_normalize).  Five
    cosmetic variants per synthetic page (case, default port, trailing
    slash, tracking params, fragments, param order, and the hash-route
    SPA form ``#/route?id=5`` whose '?' lives INSIDE the fragment — the
    r9-advice regression) must collapse so counts group correctly; the
    oracle replays every normalization rule in DuckDB's own
    regexp/list functions."""
    from pigout_spark.pipeline.text import url_normalize

    d = t(spark, sf_dir, "documents")
    k = (F.col("doc_id") % 500).cast("string")
    v = F.col("doc_id") % 5
    url = (
        F.when(v == 0, F.concat(F.lit("https://example.com/p/"), k))
        .when(
            v == 1,
            F.concat(F.lit("HTTPS://EXAMPLE.COM:443/p/"), k, F.lit("/")),
        )
        .when(
            v == 2,
            F.concat(
                F.lit("https://example.com/p/"), k, F.lit("?utm_source=x&z=1#f")
            ),
        )
        .when(
            v == 3,
            F.concat(
                F.lit("https://example.com/p/"), k, F.lit("?z=1&utm_campaign=c")
            ),
        )
        .otherwise(
            F.concat(F.lit("https://example.com/p/"), k, F.lit("#/route?id=5"))
        )
    )
    u = url_normalize(d.select(url.alias("url")), "url")
    return u.groupBy("url_norm").agg(F.count(F.lit(1)).alias("n"))


@query(
    "x_rank_metrics",
    extra=True,  # r9 addition — r10 rotation candidate
    sql="""
    WITH ranked AS (
      SELECT o_orderpriority AS q, o_orderkey,
             row_number() OVER (PARTITION BY o_orderpriority
                                ORDER BY o_totalprice DESC, o_orderkey)
               AS rank
      FROM orders
    ), d AS (
      SELECT q, rank,
             ('0x' || substring(md5('rel' || '|' ||
                CAST(o_orderkey AS VARCHAR)), 1, 8))::BIGINT % 4 AS rel
      FROM ranked WHERE rank <= 10
    ), terms AS (
      SELECT q, rank, rel,
        CAST(ROUND((pow(2, rel) - 1) / log2(rank + 1.0), 6)
             AS DECIMAL(20,6)) AS dcg_t,
        CAST(ROUND((pow(2, rel) - 1)
             / log2(CAST(row_number() OVER (PARTITION BY q
                          ORDER BY rel DESC) AS DOUBLE) + 1.0), 6)
             AS DECIMAL(20,6)) AS idcg_t
      FROM d
    ), s AS (
      SELECT q, CAST(COUNT(*) AS BIGINT) AS n_ranked,
             CAST(SUM(dcg_t) AS DOUBLE) AS dcg,
             CAST(SUM(idcg_t) AS DOUBLE) AS idcg,
             MIN(CASE WHEN rel > 0 THEN rank END) AS fr,
             CAST(SUM(CASE WHEN rel > 0 THEN 1 ELSE 0 END) AS BIGINT)
               AS nrel
      FROM terms GROUP BY q
    )
    SELECT q AS o_orderpriority, n_ranked,
      CASE WHEN idcg > 0 THEN ROUND(dcg / idcg, 6) + 0.0
           ELSE 0.0 END AS ndcg6,
      CASE WHEN fr IS NOT NULL THEN ROUND(1.0 / fr, 6) + 0.0
           ELSE 0.0 END AS mrr6,
      ROUND(CAST(nrel AS DOUBLE) / 10.0, 6) + 0.0 AS p_at_k6
    FROM s
    """,
)
def x_rank_metrics(spark, sf_dir):
    """NDCG@10 / MRR@10 / P@10 per priority "query" over the top-priced
    orders with md5-derived relevance grades
    (pipeline/evaluation.py:rank_metrics) — ROUND-6 log₂ discount
    terms decimal-summed (the vocab_kl ln discipline), tie-safe IDCG."""
    from pyspark.sql import Window
    from pigout_spark.pipeline.evaluation import rank_metrics

    o = t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderpriority").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    ranked = (
        o.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rank") <= 10)
        .withColumn(
            "rel",
            F.conv(
                F.substring(
                    F.md5(
                        F.concat_ws(
                            "|", F.lit("rel"), F.col("o_orderkey").cast("string")
                        )
                    ),
                    1,
                    8,
                ),
                16,
                10,
            ).cast("bigint")
            % 4,
        )
    )
    return rank_metrics(ranked, "o_orderpriority", "rank", "rel", k=10)


@query(
    "x_mm_decode",
    extra=True,  # r10 addition — takes a driver slot in _WINDOW_R10
    sql="""
    WITH g AS (
      SELECT doc_id, 4 + doc_id % 5 AS w, 3 + doc_id % 4 AS h
      FROM documents
    ), px AS (
      SELECT doc_id, w, h, xs.x AS x, ys.y AS y
      FROM g, range(0, 8) xs(x), range(0, 6) ys(y)
      WHERE xs.x < w AND ys.y < h
    ), s AS (
      SELECT doc_id, w, h,
        CAST(SUM((doc_id + 7 * x + 13 * y) % 256) AS BIGINT) AS sr,
        CAST(SUM((doc_id + 7 * x + 13 * y + 101) % 256) AS BIGINT) AS sg,
        CAST(SUM((doc_id + 7 * x + 13 * y + 202) % 256) AS BIGINT) AS sb,
        CAST(COUNT(*) AS BIGINT) AS npx
      FROM px GROUP BY 1, 2, 3
    )
    SELECT doc_id, CAST(w AS INT) AS width, CAST(h AS INT) AS height,
      CAST(255 AS INT) AS maxval,
      ROUND(CAST(sr AS DOUBLE) / npx, 6) + 0.0 AS mean_r6,
      ROUND(CAST(sg AS DOUBLE) / npx, 6) + 0.0 AS mean_g6,
      ROUND(CAST(sb AS DOUBLE) / npx, 6) + 0.0 AS mean_b6
    FROM s
    """,
)
def x_mm_decode(spark, sf_dir):
    """REAL image decode end-to-end without pillow (r9 verdict #7):
    synthesize one binary-PPM payload per document (width/height and
    every pixel a closed form of doc_id — pipeline/multimodal.py:
    encode_ppm in an Arrow-batched map), then BYTE-LEVEL decode it back
    (multimodal.py:decode_ppm_images — header parse + exact integer
    channel sums over the raster) and read per-channel means.  The
    oracle computes the same statistics from the closed form directly,
    so any byte the codec misplaces — header, sample order,
    interleaving — breaks the hash."""
    from pigout_spark.pipeline.multimodal import (
        decode_ppm_images,
        encode_ppm,
    )

    d = t(spark, sf_dir, "documents").select("doc_id")

    def gen(batches):
        import pandas as pd

        for pdf in batches:
            payloads = []
            for did in pdf["doc_id"]:
                did = int(did)
                w, h = 4 + did % 5, 3 + did % 4
                raster = bytes(
                    (did + 7 * x + 13 * y + 101 * c) % 256
                    for y in range(h)
                    for x in range(w)
                    for c in range(3)
                )
                payloads.append(encode_ppm(w, h, raster))
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].astype("int64"),
                    "payload": payloads,
                }
            )

    imgs = d.mapInPandas(gen, "doc_id long, payload binary")
    dec = decode_ppm_images(imgs)
    npx = F.col("n_px").cast("double")

    def mean6(c):
        return F.round(F.col(c).cast("double") / npx, 6) + F.lit(0.0)

    return dec.select(
        "doc_id",
        "width",
        "height",
        "maxval",
        mean6("sum_r").alias("mean_r6"),
        mean6("sum_g").alias("mean_g6"),
        mean6("sum_b").alias("mean_b6"),
    )


@query(
    "x_emb_covariance",
    extra=True,  # r11 addition — r12 rotation candidate
    sql="""
    WITH q AS (
      SELECT [CAST(round(CAST(x AS DOUBLE) * 1000000.0) AS BIGINT)
              FOR x IN embedding] AS mq
      FROM embeddings WHERE embedding IS NOT NULL
    ), idx AS (
      SELECT CAST(i AS INT) AS i FROM range(64) t(i)
    ), m1 AS (
      SELECT idx.i, CAST(COUNT(*) AS BIGINT) AS n,
             SUM(CAST(mq[idx.i + 1] AS HUGEINT)) AS sx
      FROM q CROSS JOIN idx GROUP BY idx.i
    ), cells AS (
      SELECT a.i AS i, b.i AS j FROM idx a JOIN idx b ON a.i <= b.i
    ), m2 AS (
      SELECT c.i, c.j,
             SUM(CAST(mq[c.i + 1] * mq[c.j + 1] AS HUGEINT)) AS sxy
      FROM q CROSS JOIN cells c GROUP BY c.i, c.j
    )
    SELECT m2.i, m2.j, a.n,
      ROUND((CAST(sxy AS DOUBLE) / a.n
             - (CAST(a.sx AS DOUBLE) / a.n)
               * (CAST(b.sx AS DOUBLE) / a.n))
            / 1000000000000.0, 6) + 0.0 AS cov6
    FROM m2 JOIN m1 a ON m2.i = a.i JOIN m1 b ON m2.j = b.i
    ORDER BY m2.i, m2.j
    """,
)
def x_emb_covariance(spark, sf_dir):
    """Population covariance matrix of the 64-dim embedding corpus,
    upper triangle as (i, j, n, cov6) rows (features.py:
    embedding_covariance — exact int64 micro-unit moment sums folded
    in-task by higher-order array functions, ONE map-side-combined
    exchange; the PCA/whitening input of a training pipeline).  The
    oracle replays the same integer sums as HUGEINT and the identical
    IEEE readout chain."""
    from pigout_spark.pipeline.features import embedding_covariance

    e = t(spark, sf_dir, "embeddings")
    return embedding_covariance(e, "embedding", dim=64)


#: Principal axes pinned as plan literals (r11 VERDICT #5): computed
#: ONCE by features.py:pca_components(k=2, dim=64) on the sf0.01
#: embeddings corpus (eigh of the hash-checked x_emb_covariance
#: matrix, largest-|coef|-positive sign convention) and frozen here so
#: BOTH engines project onto the IDENTICAL doubles — the
#: LSH-hyperplane literal precedent.  The projection path under test
#: (pca_project's zip_with/aggregate fold) is corpus-independent;
#: eigh itself is pytest-covered driver-side numpy.
_PCA_AXES = [
    [-0.20962322543976497, -0.12052915283008597, 0.03652589010342644,
     0.01187038437291471, 0.07545481900669014, 0.01317733022093176,
     0.09054669645764564, 0.2867305354469484, 0.04944094820297659,
     0.41399308946308494, 0.0651947818929452, 0.18202948250108103,
     0.06508674070804536, -0.03668762982551625, 0.17110426994606232,
     -0.18539607665972432, 0.08879638862652557, -0.15750959537667675,
     -0.030052456992680835, 0.03233408472370082, 0.06117676007008306,
     -0.11077066411748311, -0.08358147765647062, -0.055000559014268154,
     0.019898714370643875, 0.19944334781803832, -0.037493822537167334,
     0.14952301489965333, -0.17277057866767653, -0.005855559857521231,
     -0.058692401325416296, 0.062325977530493626, 0.2965183214362517,
     0.10605748824830472, -0.032113914956706825, 0.1039908001230455,
     0.04447092839714761, 0.06140470857453442, 0.01269385691656668,
     0.02178679541385351, -0.11668451939581011, 0.005515795300728779,
     -0.24078354335609606, 0.09597792293424583, -0.028530557583703292,
     -0.22488098931913444, 0.008789558537030534, -0.07925782954161321,
     -0.08381502073007839, -0.11825151258470176, 0.12067569697385437,
     0.07261027663565385, -0.017172533170844745, 0.08158925421079329,
     -0.015329863924220522, -0.06680591525514921, -0.05522418114431475,
     -0.05137204356553893, 0.06001205948197022, -0.09094555912864827,
     0.12210607832561705, 0.05053657203498392, -0.2182215796973299,
     -0.10193519057548908],
    [-0.00423617448978682, -0.054642868717533245, -0.01258389028856784,
     -0.08805932867349756, 0.17489023236552345, 0.02526740382962641,
     0.075134433829086, -0.06970383786166592, 0.07744640454364764,
     0.03133312193030968, 0.10582170862221504, -0.017562137877756713,
     0.012923426052944971, 0.1336609678325819, 0.014791610021626565,
     0.04106174879812821, 0.14868440955578996, 0.36008355817869553,
     -0.05409099812012924, -0.05073937481202376, 0.03259064777482601,
     0.03524602655601909, 0.06516436000922207, -0.3091235230616898,
     -0.2576923442040327, -0.23881039703641538, -0.02068723599083175,
     -0.00011138275614380397, -0.08645926467166756, -0.17459561935868229,
     -0.02415667239115224, -0.21739143509949915, 0.029835807066430933,
     0.06157216833695379, 0.033651913928649066, 0.07928561550195477,
     0.059571206533658994, 0.036475358607635136, 0.18205769922733991,
     0.0466734685088788, -6.431024595263471e-05, 0.04715097720127763,
     -0.0631478036561815, -0.17915530007790367, 0.17268816797859637,
     -0.1891830640460577, -0.04690592860809891, 0.14566526486445497,
     0.11279644759676571, -0.11351053535640598, -0.1572581229086741,
     -0.08192088060255162, 0.013056677806842207, -0.016027565791467115,
     0.2379134944650246, 0.02325959612981341, -0.30293536291285134,
     0.01642102183104027, 0.13556925050361707, -0.12168254002370914,
     -0.08355568031738611, 0.08503048900857588, -0.000777972285799719,
     -0.07869351343839381],
]


def _sql_arr(xs):
    return "[" + ", ".join(repr(float(x)) for x in xs) + "]"


@query(
    "x_pca_project",
    extra=True,  # r12 addition — built this round, takes a window slot
    sql=f"""
    WITH v AS (
      SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
      FROM embeddings WHERE embedding IS NOT NULL
    )
    SELECT vec_id,
           ROUND({_sql_dot('v', _sql_arr(_PCA_AXES[0]))}, 6) + 0.0 AS p0_6,
           ROUND({_sql_dot('v', _sql_arr(_PCA_AXES[1]))}, 6) + 0.0 AS p1_6
    FROM v
    """,
)
def x_pca_project(spark, sf_dir):
    """Project every embedding onto the two pinned principal axes
    (features.py:pca_project — a JVM zip_with/aggregate fold per
    component, no UDF, no exchange; axes are the _PCA_AXES literals
    from pca_components on the sf0.01 corpus).  The oracle replays
    the k×d matrix multiply with the same left-fold over the same
    literal doubles, closing the last pytest-only gap in the
    embedding family (r11 VERDICT #5)."""
    from pigout_spark.pipeline.features import pca_project

    e = t(spark, sf_dir, "embeddings").filter(F.col("embedding").isNotNull())
    proj = pca_project(e, _PCA_AXES, "embedding", "pca")
    return proj.select(
        "vec_id",
        (F.round(F.col("pca")[0], 6) + F.lit(0.0)).alias("p0_6"),
        (F.round(F.col("pca")[1], 6) + F.lit(0.0)).alias("p1_6"),
    )


@query(
    "x_ann_recall",
    extra=True,  # r11 addition — r12 rotation candidate
    sql=_IVF_CELLS_SQL
    + f"""
    , q3 AS (
      SELECT vec_id AS q_id, v AS qv, nrm AS qn, cell
      FROM cells WHERE vec_id < 10
    ), approx3 AS (
      SELECT q.q_id, c.vec_id AS neighbor_id,
             ROW_NUMBER() OVER (PARTITION BY q.q_id
               ORDER BY {_sql_dot('q.qv', 'c.v')} / (q.qn * c.nrm) DESC,
                        c.vec_id) AS rn
      FROM q3 q JOIN cells c ON q.cell = c.cell AND c.vec_id <> q.q_id
      QUALIFY rn <= 10
    ), exact3 AS (
      SELECT q.q_id, c.vec_id AS neighbor_id,
             ROW_NUMBER() OVER (PARTITION BY q.q_id
               ORDER BY {_sql_dot('q.qv', 'c.v')} / (q.qn * c.nrm) DESC,
                        c.vec_id) AS rn
      FROM q3 q JOIN cells c ON c.vec_id <> q.q_id
      QUALIFY rn <= 10
    )
    SELECT e.q_id, CAST(COUNT(*) AS BIGINT) AS n_exact,
           CAST(COUNT(a.neighbor_id) AS BIGINT) AS n_hit,
           ROUND(COUNT(a.neighbor_id) / CAST(COUNT(*) AS DOUBLE), 6)
             AS recall6
    FROM exact3 e LEFT JOIN approx3 a
      ON e.q_id = a.q_id AND e.neighbor_id = a.neighbor_id
    GROUP BY e.q_id
    """,
)
def x_ann_recall(spark, sf_dir):
    """Recall@10 of the IVF index against the exact brute-force
    neighbors, per query vector — the self-evaluation a pipeline runs
    before trusting an approximate index (similarity.ivf_topk vs
    similarity.brute_force_topk; both sides' cosine chains are the
    bit-identical folds the sim_* queries already pin, so the oracle
    replays exact-vs-approx set intersection token-for-token)."""
    from pigout_spark.pipeline.similarity import brute_force_topk, ivf_topk

    emb = tf(spark, sf_dir, "embeddings")
    exact = brute_force_topk(emb, emb.filter(F.col("vec_id") < 10), k=10)
    approx = ivf_topk(emb, query_ids_max=10, k=10, n_centroids=8)
    hits = approx.select("q_id", "neighbor_id").withColumn(
        "__hit", F.lit(1)
    )
    j = exact.select("q_id", "neighbor_id").join(
        F.broadcast(hits), ["q_id", "neighbor_id"], "left"
    )
    return j.groupBy("q_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_exact"),
        F.count("__hit").cast("bigint").alias("n_hit"),
        F.round(
            F.count("__hit") / F.count(F.lit(1)).cast("double"), 6
        ).alias("recall6"),
    )


def _benford_sql() -> str:
    """Oracle twin of validate.benford_test over lineitem cents — the
    expected-digit probabilities embed as the SAME Python literals the
    Spark plan uses (validate.BENFORD_P), never engine log10."""
    from pigout_spark.pipeline.validate import BENFORD_P

    counts = ",\n        ".join(
        f"CAST(SUM(CASE WHEN d = {dd} THEN 1 ELSE 0 END) AS BIGINT)"
        f" AS n{dd}"
        for dd in range(1, 10)
    )
    terms = []
    for dd in range(1, 10):
        p = repr(BENFORD_P[dd - 1])
        terms.append(
            f"CAST(ROUND((CAST(n{dd} AS DOUBLE) - CAST(n AS DOUBLE) * {p})"
            f" * (CAST(n{dd} AS DOUBLE) - CAST(n AS DOUBLE) * {p})"
            f" / (CAST(n AS DOUBLE) * {p}), 6) + 0.0 AS DECIMAL(20,6))"
        )
    return f"""
    WITH v AS (
      SELECT l_returnflag,
             CAST(substring(CAST(CAST(ROUND(l_extendedprice * 100)
                                      AS BIGINT) AS VARCHAR), 1, 1)
                  AS INT) AS d
      FROM lineitem
      WHERE l_extendedprice IS NOT NULL
        AND ROUND(l_extendedprice * 100) >= 1
    ), agg AS (
      SELECT l_returnflag, CAST(COUNT(*) AS BIGINT) AS n,
        {counts}
      FROM v GROUP BY l_returnflag
    )
    SELECT l_returnflag, n,
      ROUND(CAST({" + ".join(terms)} AS DOUBLE), 6) + 0.0 AS chi2_6
    FROM agg
    """


@query("x_benford", _benford_sql(), extra=True)  # r12 rotation candidate
def x_benford(spark, sf_dir):
    """Benford first-digit conformance of extendedprice cents per
    returnflag (pipeline/validate.py:benford_test) — the forensic
    data-quality screen: digits from the bigint's decimal string (no
    engine log10 anywhere), chi-square against Python-literal expected
    probabilities, ROUND-6 decimal-summed."""
    from pigout_spark.pipeline.validate import benford_test

    li = t(spark, sf_dir, "lineitem").select(
        "l_returnflag",
        F.round(F.col("l_extendedprice") * 100)
        .cast("bigint")
        .cast("double")
        .alias("cents"),
    )
    return benford_test(li, "cents", keys=["l_returnflag"])


@query(
    "x_temp_mixture",
    extra=True,  # r12 addition — r13 rotation candidate
    sql="""
    WITH c AS (
      SELECT source AS domain, CAST(COUNT(*) AS BIGINT) AS n
      FROM documents WHERE source IS NOT NULL GROUP BY source
    ), t AS (
      SELECT domain, n,
             CAST(ROUND(sqrt(CAST(n AS DOUBLE)), 6) + 0.0
                  AS DECIMAL(20,6)) AS tt
      FROM c
    ), s AS (SELECT SUM(tt) AS tot FROM t)
    SELECT domain, n,
           ROUND(CAST(tt AS DOUBLE) / CAST(tot AS DOUBLE), 6) + 0.0 AS w6
    FROM t, s
    """,
)
def x_temp_mixture(spark, sf_dir):
    """Temperature-scaled (α = 0.5) mixing weights per document source
    (curation.py:temperature_weights — w_d ∝ √n_d, the
    head-domain-flattening recipe rule; sqrt is correctly rounded in
    every IEEE engine so the oracle replays it exactly; feeds
    mixture_sample as target_weights)."""
    from pigout_spark.pipeline.curation import temperature_weights

    d = t(spark, sf_dir, "documents").filter(F.col("source").isNotNull())
    return temperature_weights(d, "source", alpha=0.5)


#: quality-scorer coefficients pinned as plan literals (the _PCA_AXES
#: discipline): an offline-trained logistic model's weights — inference
#: is the engine's job, training is not
_LOGIT_W = {"len_k": 0.8, "upper_ratio": -2.5, "digit_ratio": -1.5}
_LOGIT_B = -0.25


@query(
    "x_quality_logit",
    extra=True,  # r12 addition — r13 rotation candidate
    sql=f"""
    WITH f AS (
      SELECT doc_id,
             CAST(n_chars AS DOUBLE) / 1000.0 AS len_k,
             CAST(length(regexp_replace(text, '[^A-Z]', '', 'g')) AS DOUBLE)
               / CAST(GREATEST(length(text), 1) AS DOUBLE) AS upper_ratio,
             CAST(length(regexp_replace(text, '[^0-9]', '', 'g')) AS DOUBLE)
               / CAST(GREATEST(length(text), 1) AS DOUBLE) AS digit_ratio
      FROM documents
      WHERE text IS NOT NULL AND n_chars IS NOT NULL
    )
    SELECT doc_id,
           ROUND(1.0 / (1.0 + exp(-(ROUND({_LOGIT_B!r}
                 + digit_ratio * {_LOGIT_W['digit_ratio']!r}
                 + len_k * {_LOGIT_W['len_k']!r}
                 + upper_ratio * {_LOGIT_W['upper_ratio']!r}, 6) + 0.0))),
                 6) + 0.0 AS score
    FROM f
    """,
)
def x_quality_logit(spark, sf_dir):
    """Fixed logistic quality scorer over cheap text features
    (features.py:apply_logistic — the CCNet/fastText-style linear
    classifier APPLICATION step; weights are plan literals, the
    weighted sum folds in sorted-feature order in both engines, logit
    ROUND-6 before the sigmoid so exp sees identical doubles).
    Features: chars/1000, uppercase ratio, digit ratio."""
    from pigout_spark.pipeline.features import apply_logistic

    d = t(spark, sf_dir, "documents").filter(
        F.col("text").isNotNull() & F.col("n_chars").isNotNull()
    )
    ln = F.greatest(F.length("text"), F.lit(1)).cast("double")
    feats = d.select(
        "doc_id",
        (F.col("n_chars").cast("double") / F.lit(1000.0)).alias("len_k"),
        (
            F.length(F.regexp_replace("text", "[^A-Z]", "")).cast("double")
            / ln
        ).alias("upper_ratio"),
        (
            F.length(F.regexp_replace("text", "[^0-9]", "")).cast("double")
            / ln
        ).alias("digit_ratio"),
    )
    return apply_logistic(feats, _LOGIT_W, _LOGIT_B, "score").select(
        "doc_id", "score"
    )


@query(
    "x_neyman",
    extra=True,  # r12 addition — r13 rotation candidate
    sql="""
    WITH d AS (
      SELECT o_orderpriority AS stratum,
             CAST(round(o_totalprice * 100) AS BIGINT) AS v
      FROM orders
      WHERE o_totalprice IS NOT NULL AND o_orderpriority IS NOT NULL
    ), g AS (
      SELECT stratum, CAST(COUNT(*) AS BIGINT) AS n_rows,
             SUM(CAST(v AS HUGEINT)) AS s,
             SUM(CAST(v * v AS HUGEINT)) AS ss
      FROM d GROUP BY stratum
    ), t AS (
      SELECT stratum, n_rows,
        CASE WHEN n_rows > 1 THEN
          ROUND(sqrt(GREATEST(
            (n_rows * CAST(ss AS DOUBLE) - CAST(s AS DOUBLE) * CAST(s AS DOUBLE))
            / (CAST(n_rows AS DOUBLE) * (CAST(n_rows AS DOUBLE) - 1.0)),
            0.0)), 6) + 0.0 END AS sd6
      FROM g
    ), w AS (
      SELECT stratum, n_rows, sd6,
             COALESCE(CAST(ROUND(CAST(n_rows AS DOUBLE) * sd6, 6) + 0.0
                           AS DECIMAL(30,6)),
                      CAST(0 AS DECIMAL(30,6))) AS wt
      FROM t
    ), s2 AS (SELECT SUM(wt) AS tot FROM w)
    SELECT stratum, n_rows, sd6,
           CASE WHEN CAST(tot AS DOUBLE) > 0
                THEN CAST(ROUND(10000.0 * CAST(wt AS DOUBLE)
                                / CAST(tot AS DOUBLE), 0) AS BIGINT)
                ELSE CAST(0 AS BIGINT) END AS alloc
    FROM w, s2
    """,
)
def x_neyman(spark, sf_dir):
    """Neyman-optimal allocation of a 10,000-row eval budget across
    order priorities by order-value dispersion
    (curation.py:neyman_allocation — exact integer moments in ONE
    map-side-combined exchange, n_h·S_h weights ROUND-6
    decimal-folded; the minimum-variance sampling design ahead of
    stratified_sample)."""
    from pigout_spark.pipeline.curation import neyman_allocation

    o = t(spark, sf_dir, "orders").filter(
        F.col("o_totalprice").isNotNull() & F.col("o_orderpriority").isNotNull()
    )
    return neyman_allocation(
        o.select(
            "o_orderpriority",
            F.round(F.col("o_totalprice") * 100).cast("bigint").alias("cents"),
        ),
        "o_orderpriority",
        "cents",
        total_n=10_000,
    )


@query(
    "x_containment",
    extra=True,  # r12 addition — r13 rotation candidate
    sql=f"""
    WITH toks0 AS (
      SELECT doc_id, unnest({_SQL_DTOKS}) AS tok FROM documents
    ), hub AS (
      -- mirror containment_pairs' DEFAULT_MAX_DF=10000 hub-token cap
      -- (dedup.py:170): tokens present in >10k docs are excluded from
      -- BOTH engines' vocabulary, so containment is computed over the
      -- identical token set at every scale factor.
      SELECT tok FROM toks0 GROUP BY tok HAVING COUNT(*) > 10000
    ), toks AS (
      SELECT t.doc_id, t.tok FROM toks0 t
      ANTI JOIN hub h ON t.tok = h.tok
    ), sizes AS (
      SELECT doc_id, COUNT(*) AS sz FROM toks GROUP BY doc_id
    ), inter AS (
      SELECT a.doc_id AS da, b.doc_id AS db, COUNT(*) AS i
      FROM toks a JOIN toks b ON a.tok = b.tok AND a.doc_id <> b.doc_id
      GROUP BY a.doc_id, b.doc_id
    ), oriented AS (
      SELECT CASE WHEN (sa.sz, da) < (sb.sz, db) THEN da ELSE db END
               AS doc_small,
             CASE WHEN (sa.sz, da) < (sb.sz, db) THEN db ELSE da END
               AS doc_big,
             i,
             LEAST(sa.sz, sb.sz) AS na
      FROM inter
      JOIN sizes sa ON sa.doc_id = da
      JOIN sizes sb ON sb.doc_id = db
      WHERE da < db
    )
    SELECT doc_small, doc_big, i / CAST(na AS DOUBLE) AS containment
    FROM oriented
    WHERE i / CAST(na AS DOUBLE) >= 0.9
    """,
)
def x_containment(spark, sf_dir):
    """Asymmetric near-dup: small-doc containment ≥ 0.9 in a larger
    doc (pipeline/dedup.py:containment_pairs — prefix filter on the
    SMALL side only, full index on the big side, exact
    array_intersect verification; Broder containment catches the
    quotation/boilerplate/version-extension duplicates Jaccard's
    symmetric denominator hides).  The oracle replays the naive full
    inverted-index argmin as an independent algorithm."""
    from pigout_spark.pipeline.dedup import containment_pairs

    return containment_pairs(
        tf(spark, sf_dir, "documents"), "doc_id", "text", threshold=0.9
    )


@query(
    "x_token_entropy",
    f"""
    WITH toks AS (
      SELECT doc_id, unnest({_SQL_TOKS}) AS tok FROM documents
    ), c AS (
      SELECT doc_id, tok, CAST(COUNT(*) AS BIGINT) AS c
      FROM toks GROUP BY doc_id, tok
    ), t AS (
      SELECT doc_id, c,
             CAST(SUM(c) OVER (PARTITION BY doc_id) AS BIGINT) AS n
      FROM c
    ), s AS (
      SELECT doc_id, n,
             CAST(ROUND(-(c / CAST(n AS DOUBLE))
                        * ln(c / CAST(n AS DOUBLE)), 6) + 0.0
                  AS DECIMAL(20,6)) AS term
      FROM t
    )
    SELECT doc_id, CAST(MAX(n) AS BIGINT) AS n_tokens,
           CAST(COUNT(*) AS BIGINT) AS n_distinct,
           CAST(SUM(term) AS DOUBLE) AS entropy6
    FROM s GROUP BY doc_id
    """,
    extra=True,  # r13 addition — r14 rotation candidate
)
def x_token_entropy(spark, sf_dir):
    """Per-doc Shannon entropy of the token distribution — the
    repetitiveness/quality signal (spam and template docs score low
    for their length); pipeline/text.py:token_entropy — ONE exchange
    on the doc key serves the (doc, token) counts, the per-doc total
    window, and the final fold; per-term −p·ln p ROUND-6
    decimal-summed (the vocab_kl ln convention)."""
    from pigout_spark.pipeline.text import token_entropy

    return token_entropy(tf(spark, sf_dir, "documents"))


@query(
    "x_good_turing",
    f"""
    WITH toks AS (
      SELECT unnest({_SQL_TOKS}) AS tok FROM documents
    ), f AS (
      SELECT tok, CAST(COUNT(*) AS BIGINT) AS n FROM toks GROUP BY tok
    ), nr AS (
      SELECT n AS r, CAST(COUNT(*) AS BIGINT) AS n_r FROM f GROUP BY n
    )
    SELECT a.r, a.n_r,
           CASE WHEN b.n_r IS NOT NULL THEN
             ROUND((a.r + 1) * CAST(b.n_r AS DOUBLE)
                   / CAST(a.n_r AS DOUBLE), 6) + 0.0
           END AS r_star6
    FROM nr a LEFT JOIN nr b ON b.r = a.r + 1
    """,
    extra=True,  # r13 addition — r14 rotation candidate
)
def x_good_turing(spark, sf_dir):
    """Good-Turing frequency-of-frequencies with the smoothed count
    r* = (r+1)·N_{r+1}/N_r — the classical unseen-mass/LM-smoothing
    table (pipeline/text.py:good_turing_counts: corpus pass =
    word_frequencies, then counts-of-counts — a tens-of-rows
    relation; honest NULL r* where the spectrum has no r+1)."""
    from pigout_spark.pipeline.text import good_turing_counts

    return good_turing_counts(tf(spark, sf_dir, "documents"))


@query(
    "x_chao1",
    f"""
    WITH toks AS (
      SELECT unnest({_SQL_TOKS}) AS tok FROM documents
    ), f AS (
      SELECT tok, CAST(COUNT(*) AS BIGINT) AS n FROM toks GROUP BY tok
    ), a AS (
      SELECT CAST(COALESCE(SUM(n), 0) AS BIGINT) AS n_tokens,
             CAST(COUNT(*) AS BIGINT) AS vocab,
             CAST(COALESCE(SUM(CASE WHEN n = 1 THEN 1 ELSE 0 END), 0)
                  AS BIGINT) AS f1,
             CAST(COALESCE(SUM(CASE WHEN n = 2 THEN 1 ELSE 0 END), 0)
                  AS BIGINT) AS f2
      FROM f
    )
    SELECT n_tokens, vocab, f1, f2,
      CASE WHEN n_tokens > 0 THEN
        ROUND(CAST(vocab AS DOUBLE)
              + CAST(f1 AS DOUBLE) * (CAST(f1 AS DOUBLE) - 1.0)
                / (2.0 * (CAST(f2 AS DOUBLE) + 1.0)), 6) + 0.0
      END AS chao1_6,
      CASE WHEN n_tokens > 0 THEN
        ROUND(1.0 - CAST(f1 AS DOUBLE) / CAST(n_tokens AS DOUBLE), 6)
          + 0.0
      END AS coverage6
    FROM a
    """,
    extra=True,  # r14 addition — r15 rotation candidate
)
def x_chao1(spark, sf_dir):
    """Chao1 vocabulary-richness lower bound + Good's sample coverage
    over the corpus unigrams (pipeline/text.py:chao1_richness) —
    the vocabulary-saturation readout for crawl curation, sharing
    word_frequencies' single corpus pass with x_good_turing /
    x_zipf_fit; exact integer spectrum, one ROUND-6 IEEE chain per
    estimate."""
    from pigout_spark.pipeline.text import chao1_richness

    return chao1_richness(tf(spark, sf_dir, "documents"))


@query(
    "x_zipf_fit",
    f"""
    WITH toks AS (
      SELECT unnest({_SQL_TOKS}) AS tok FROM documents
    ), f AS (
      SELECT tok, CAST(COUNT(*) AS BIGINT) AS n FROM toks GROUP BY tok
    ), rk AS (
      SELECT n, ROW_NUMBER() OVER (ORDER BY n DESC, tok ASC) AS r
      FROM f QUALIFY r <= 10000
    ), mi AS (
      SELECT CAST(ROUND(ln(CAST(r AS DOUBLE)) * 1000000.0) AS BIGINT) AS x,
             CAST(ROUND(ln(CAST(n AS DOUBLE)) * 1000000.0) AS BIGINT) AS y
      FROM rk
    ), m AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_terms,
             CAST(SUM(CAST(x AS HUGEINT)) AS DOUBLE) AS sx,
             CAST(SUM(CAST(y AS HUGEINT)) AS DOUBLE) AS sy,
             CAST(SUM(CAST(x AS HUGEINT) * y) AS DOUBLE) AS sxy,
             CAST(SUM(CAST(x AS HUGEINT) * x) AS DOUBLE) AS sxx,
             CAST(SUM(CAST(y AS HUGEINT) * y) AS DOUBLE) AS syy
      FROM mi
    )
    SELECT n_terms,
      CASE WHEN n_terms > 1 AND (n_terms * sxx - sx * sx) > 0 THEN
        ROUND((n_terms * sxy - sx * sy) / (n_terms * sxx - sx * sx), 6) + 0.0
      END AS slope6,
      CASE WHEN n_terms > 1 AND (n_terms * sxx - sx * sx) > 0 THEN
        ROUND((sy - ((n_terms * sxy - sx * sy) / (n_terms * sxx - sx * sx))
                    * sx) / n_terms / 1000000.0, 6) + 0.0
      END AS intercept6,
      CASE WHEN n_terms > 1 AND (n_terms * sxx - sx * sx) > 0
                AND (n_terms * syy - sy * sy) > 0 THEN
        ROUND((n_terms * sxy - sx * sy) * (n_terms * sxy - sx * sy)
              / ((n_terms * sxx - sx * sx) * (n_terms * syy - sy * sy)), 6)
        + 0.0
      END AS r2_6
    FROM m
    """,
    extra=True,  # r13 addition — r14 rotation candidate
)
def x_zipf_fit(spark, sf_dir):
    """Zipf's-law exponent of the corpus unigram spectrum: OLS of
    ln(freq) on ln(rank) over the top-10k terms (pipeline/text.py:
    zipf_fit — ranks from the two-pass row_rank, ln terms as integer
    micro-units, DECIMAL(38,0)-exact moments, one IEEE readout;
    a corpus whose exponent drifts far from −1 is template-heavy)."""
    from pigout_spark.pipeline.text import zipf_fit

    return zipf_fit(tf(spark, sf_dir, "documents"))


@query(
    "x_rrf_fusion",
    f"""
    WITH f AS (
      SELECT doc_id, {_SQL_TOKS} AS toks FROM documents
    ), dl AS (
      SELECT doc_id, CAST(len(toks) AS BIGINT) AS dl FROM f
    ), st AS (
      SELECT CAST(COUNT(*) AS DOUBLE) AS n,
             CAST(SUM(dl) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS avgdl
      FROM dl
    ), tfq AS (
      SELECT doc_id, tok, CAST(COUNT(*) AS DOUBLE) AS tfn
      FROM (SELECT doc_id, unnest(toks) AS tok FROM f)
      WHERE tok IN {tuple(_BM25_TERMS)!r}
      GROUP BY doc_id, tok
    ), dfc AS (
      SELECT tok, CAST(COUNT(*) AS DOUBLE) AS dfn FROM tfq GROUP BY tok
    ), c AS (
      SELECT tfq.doc_id,
             CAST(ROUND(
               ln((st.n - dfc.dfn + 0.5) / (dfc.dfn + 0.5) + 1)
               * tfq.tfn * (1.2 + 1)
               / (tfq.tfn + 1.2 * (1.0 - 0.75
                    + 0.75 * CAST(dl.dl AS DOUBLE) / st.avgdl)), 6)
             AS DECIMAL(20,6)) AS c
      FROM tfq JOIN dfc USING (tok) JOIN dl USING (doc_id), st
    ), s AS (
      SELECT doc_id, CAST(SUM(c) AS DECIMAL(27,6)) AS sc
      FROM c GROUP BY doc_id
    ), bm AS (
      SELECT doc_id, ROW_NUMBER() OVER (ORDER BY sc DESC, doc_id) AS rank
      FROM s QUALIFY rank <= 20
    ), e AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
    ), qv AS (
      SELECT v AS qv FROM e WHERE vec_id = 0
    ), cosr AS (
      SELECT e.vec_id AS doc_id,
             {_sql_dot('qv.qv', 'e.v')}
               / (sqrt({_sql_dot('qv.qv', 'qv.qv')})
                  * sqrt({_sql_dot('e.v', 'e.v')})) AS cos
      FROM e, qv WHERE e.vec_id <> 0
    ), dn AS (
      SELECT doc_id, ROW_NUMBER() OVER (ORDER BY cos DESC, doc_id) AS rank
      FROM cosr QUALIFY rank <= 20
    ), u AS (
      SELECT doc_id,
             CAST(ROUND(1.0 / (60.0 + rank), 6) + 0.0 AS DECIMAL(20,6)) AS c
      FROM bm
      UNION ALL
      SELECT doc_id,
             CAST(ROUND(1.0 / (60.0 + rank), 6) + 0.0 AS DECIMAL(20,6)) AS c
      FROM dn
    )
    SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_lists,
           CAST(SUM(c) AS DOUBLE) AS rrf6
    FROM u GROUP BY doc_id
    """,
    extra=True,  # r13 addition — r14 rotation candidate
)
def x_rrf_fusion(spark, sf_dir):
    """HYBRID retrieval fusion: BM25 top-20 (lexical, the 4-term
    x_bm25_topk query) and exact-cosine top-20 around probe vector 0
    (dense; embeddings are doc-aligned in this fixture) fused by
    Reciprocal Rank Fusion, k = 60 (pipeline/retrieval.py:rrf_fuse —
    ROUND-6 decimal-summed 1/(k+rank) votes, candidate-sized
    throughout; ranks for the 20-row lists ride the two-pass row_rank,
    never a keyless window)."""
    from pigout_spark.operators.sorting import row_rank
    from pigout_spark.pipeline.retrieval import rrf_fuse
    from pigout_spark.pipeline.similarity import brute_force_topk
    from pigout_spark.pipeline.text import bm25_topk

    docs = tf(spark, sf_dir, "documents")
    bm = row_rank(
        bm25_topk(docs, list(_BM25_TERMS), k=20),
        F.col("score").desc(),
        F.col("doc_id").asc(),
        out="rank",
    ).select("doc_id", "rank")
    emb = tf(spark, sf_dir, "embeddings")
    dn = (
        brute_force_topk(emb, emb.filter(F.col("vec_id") == 0), k=20)
        .select(F.col("neighbor_id").alias("doc_id"), F.col("rn").alias("rank"))
    )
    return rrf_fuse([bm, dn], id_col="doc_id", rank_col="rank", k=60)


@query(
    "x_fuzzy_pairs",
    """
    WITH p AS (
      SELECT c_custkey AS id, c_name AS s FROM customer
      WHERE c_custkey IS NOT NULL AND c_name IS NOT NULL
    ), k AS (
      SELECT id, s, 'p' AS side, substring(s, 1, 4) AS bk FROM p
      UNION ALL
      SELECT id, s, 's' AS side, substring(s, length(s) - 3, 4) AS bk
      FROM p WHERE length(s) >= 4
    ), big AS (
      SELECT side, bk FROM k GROUP BY side, bk HAVING COUNT(*) > 10000
    ), k2 AS (
      SELECT k.* FROM k ANTI JOIN big USING (side, bk)
    ), cand AS (
      SELECT DISTINCT a.id AS id_a, b.id AS id_b, a.s AS sa, b.s AS sb
      FROM k2 a JOIN k2 b ON a.side = b.side AND a.bk = b.bk
                         AND a.id < b.id
    )
    SELECT id_a, id_b, CAST(levenshtein(sa, sb) AS BIGINT) AS dist
    FROM cand
    WHERE abs(length(sa) - length(sb)) <= 1 AND levenshtein(sa, sb) <= 1
    """,
    extra=True,  # r13 addition — r14 rotation candidate
)
def x_fuzzy_pairs(spark, sf_dir):
    """Fuzzy-string near-dup pairs over CUSTOMER NAMES: exact
    Levenshtein ≤ 1 on redundant prefix4/suffix4 blocked candidates
    (pipeline/dedup.py:fuzzy_pairs — the record-linkage workhorse the
    token-set family misses: a one-character typo is edit distance 1
    but moves no Jaccard).  c_name is ASCII by fixture construction,
    where Spark's char-based and DuckDB's byte-based levenshtein agree
    exactly (the documented unicode caveat at the op).

    FIXTURE CHOICE (r14, closes the r13 verdict's vacuity finding):
    the r13 variant ran over part names, whose vocabulary is 64
    distinct strings at EVERY scale factor — at sf1 each prefix block
    exceeds DEFAULT_MAX_BLOCK, the cap drops all of them, and both
    engines hash-agree on 0 rows (a proof of the cap, not the
    pipeline); an uncapped run is result-quadratic in the duplicate
    multiplicity (~312M dist-0 pairs at sf1) and oracle-infeasible.
    Customer names scale in CARDINALITY with the data (ID-like
    zero-padded strings — the canonical record-linkage shape): the
    driver reads 19.5k pairs at sf0.01, and the sf1/sf3 sweeps read
    1.17M / 11.0M NON-EMPTY pairs with the oracle completing in
    1.5 s / 13 s.  max_dist=1 keeps the driver-side relation compact;
    the op's max_dist=2 path stays covered by tests/test_pipeline.py.
    At sf≥0.1 the 'Cust'-prefix block exceeds max_block and drops —
    candidates then flow through suffix-4 blocks alone, exercising
    the cap and the redundant-blocking recall contract on the SAME
    run that produces non-empty pairs."""
    from pigout_spark.pipeline.dedup import fuzzy_pairs

    c = t(spark, sf_dir, "customer").select("c_custkey", "c_name")
    return fuzzy_pairs(c, "c_custkey", "c_name", max_dist=1)


@query(
    "x_fs_linkage",
    """
    WITH r AS (
      SELECT p_partkey, p_brand, p_size,
             p_type AS f_type,
             string_split(p_name, ' ')[1] AS f_color,
             CAST(CAST(FLOOR(p_retailprice / 10) AS BIGINT) AS VARCHAR)
               AS f_price
      FROM part
    ), tu AS (
      SELECT CAST(SUM(c * c) AS DOUBLE)
             / (CAST(SUM(c) AS DOUBLE) * CAST(SUM(c) AS DOUBLE)) AS u
      FROM (SELECT CAST(COUNT(*) AS BIGINT) AS c FROM r
            WHERE f_type IS NOT NULL GROUP BY f_type)
    ), cu AS (
      SELECT CAST(SUM(c * c) AS DOUBLE)
             / (CAST(SUM(c) AS DOUBLE) * CAST(SUM(c) AS DOUBLE)) AS u
      FROM (SELECT CAST(COUNT(*) AS BIGINT) AS c FROM r
            WHERE f_color IS NOT NULL GROUP BY f_color)
    ), mu AS (
      SELECT CAST(SUM(c * c) AS DOUBLE)
             / (CAST(SUM(c) AS DOUBLE) * CAST(SUM(c) AS DOUBLE)) AS u
      FROM (SELECT CAST(COUNT(*) AS BIGINT) AS c FROM r
            WHERE f_price IS NOT NULL GROUP BY f_price)
    ), w AS (
      SELECT ROUND(log2(0.95 / tu.u), 6) + 0.0 AS t_wa,
             ROUND(log2((1.0 - 0.95) / (1.0 - tu.u)), 6) + 0.0 AS t_wd,
             ROUND(log2(0.95 / cu.u), 6) + 0.0 AS c_wa,
             ROUND(log2((1.0 - 0.95) / (1.0 - cu.u)), 6) + 0.0 AS c_wd,
             ROUND(log2(0.95 / mu.u), 6) + 0.0 AS m_wa,
             ROUND(log2((1.0 - 0.95) / (1.0 - mu.u)), 6) + 0.0 AS m_wd
      FROM tu, cu, mu
    ), pr AS (
      SELECT a.p_partkey AS id_a, b.p_partkey AS id_b,
             a.f_type AS at, b.f_type AS bt,
             a.f_color AS ac, b.f_color AS bc,
             a.f_price AS am, b.f_price AS bm
      FROM r a
      JOIN r b
        ON a.p_brand = b.p_brand AND a.p_size = b.p_size
       AND a.p_partkey < b.p_partkey
    )
    SELECT id_a, id_b,
      CAST((CASE WHEN at IS NOT NULL AND bt IS NOT NULL THEN 1 ELSE 0 END)
         + (CASE WHEN ac IS NOT NULL AND bc IS NOT NULL THEN 1 ELSE 0 END)
         + (CASE WHEN am IS NOT NULL AND bm IS NOT NULL THEN 1 ELSE 0 END)
           AS BIGINT) AS n_known,
      CAST((CASE WHEN at IS NOT NULL AND bt IS NOT NULL AND at = bt
                 THEN 1 ELSE 0 END)
         + (CASE WHEN ac IS NOT NULL AND bc IS NOT NULL AND ac = bc
                 THEN 1 ELSE 0 END)
         + (CASE WHEN am IS NOT NULL AND bm IS NOT NULL AND am = bm
                 THEN 1 ELSE 0 END) AS BIGINT) AS n_agree,
      ROUND(CAST(
          CAST(CASE WHEN at IS NULL OR bt IS NULL THEN 0.0
                    WHEN at = bt THEN w.t_wa ELSE w.t_wd END
               AS DECIMAL(38,6))
        + CAST(CASE WHEN ac IS NULL OR bc IS NULL THEN 0.0
                    WHEN ac = bc THEN w.c_wa ELSE w.c_wd END
               AS DECIMAL(38,6))
        + CAST(CASE WHEN am IS NULL OR bm IS NULL THEN 0.0
                    WHEN am = bm THEN w.m_wa ELSE w.m_wd END
               AS DECIMAL(38,6)) AS DOUBLE), 6) + 0.0 AS weight6
    FROM pr, w
    """,
    extra=True,  # r14 addition — r15 rotation candidate
)
def x_fs_linkage(spark, sf_dir):
    """Fellegi-Sunter probabilistic record-linkage weights over
    brand+size blocked part pairs (pipeline/dedup.py:
    fs_linkage_weights): u-probabilities estimated exactly from the
    field value distributions (sum of squared count shares), m = 0.95
    per field, agreement/disagreement log2 weights ROUND-6'd
    in-engine and decimal-summed per pair over (type, name color
    word, $10 price bucket) — the scorer that ranks a blocking
    stage's candidates for linkage decisions."""
    from pigout_spark.pipeline.dedup import fs_linkage_weights

    parts = t(spark, sf_dir, "part").select(
        "p_partkey", "p_brand", "p_size",
        F.col("p_type").alias("f_type"),
        F.split(F.col("p_name"), " ").getItem(0).alias("f_color"),
        F.floor(F.col("p_retailprice") / 10)
        .cast("bigint").cast("string").alias("f_price"),
    )
    a = parts.select(
        F.col("p_partkey").alias("id_a"),
        F.col("p_brand").alias("__kb"),
        F.col("p_size").alias("__ks"),
    )
    b = parts.select(
        F.col("p_partkey").alias("id_b"),
        F.col("p_brand").alias("__kb"),
        F.col("p_size").alias("__ks"),
    )
    pairs = (
        a.join(b, ["__kb", "__ks"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
    )
    return fs_linkage_weights(
        parts,
        pairs,
        "p_partkey",
        ["f_type", "f_color", "f_price"],
        default_m=0.95,
    )


@query(
    "x_png_meta",
    """
    WITH d AS (
      SELECT doc_id,
             8 + (doc_id % 9) AS w,
             8 + (doc_id % 7) AS h,
             CASE WHEN doc_id % 4 = 0 THEN 0 ELSE 2 END AS ct
      FROM documents
    ), ix AS (
      SELECT doc_id, w, h, ct, unnest(range(0, w * h)) AS i FROM d
    ), s AS (
      SELECT doc_id,
             SUM((doc_id*7 + i*13) % 256) AS s0,
             SUM(CASE WHEN ct = 2
                      THEN (doc_id*7 + i*13 + 31) % 256 END) AS s1,
             SUM(CASE WHEN ct = 2
                      THEN (doc_id*7 + i*13 + 62) % 256 END) AS s2
      FROM ix GROUP BY doc_id
    )
    SELECT d.doc_id,
           CAST(d.w AS INT) AS width,
           CAST(d.h AS INT) AS height,
           CAST(d.ct AS INT) AS color_type,
           CAST(3 AS INT) AS n_chunks,
           CAST(d.w * d.h AS BIGINT) AS n_pixels,
           CAST(s.s0 AS BIGINT) AS sum_c0,
           CAST(s.s1 AS BIGINT) AS sum_c1,
           CAST(s.s2 AS BIGINT) AS sum_c2
    FROM d JOIN s USING (doc_id)
    """,
    extra=True,  # r14 addition — r15 rotation candidate
)
def x_png_meta(spark, sf_dir):
    """Image-column metadata via a REAL PNG round-trip
    (pipeline/multimodal.py:synth_png / decode_png_images): spec-true
    chunk+CRC-32 layout, DEFLATE via stdlib zlib, and per-row scanline
    filters cycling through ALL FIVE spec filter types (None / Sub /
    Up / Average / Paeth) by the generator law — so the oracle's
    law-replayed pixel sums certify the encoder's filtering and the
    decoder's CRC walk + inflate + unfilter end to end, not just
    header arithmetic."""
    from pigout_spark.pipeline.multimodal import (
        decode_png_images,
        synth_png_payloads,
    )

    d = synth_png_payloads(
        t(spark, sf_dir, "documents").select("doc_id"), "doc_id"
    )
    return decode_png_images(d, "payload", "doc_id")


@query(
    "x_jw_pairs",
    """
    WITH p AS (
      SELECT c_custkey AS id, c_name AS s FROM customer
      WHERE c_custkey IS NOT NULL AND c_name IS NOT NULL
    ), k AS (
      SELECT id, s, 'p' AS side, substring(s, 1, 4) AS bk FROM p
      UNION ALL
      SELECT id, s, 's' AS side, substring(s, length(s) - 3, 4) AS bk
      FROM p WHERE length(s) >= 4
    ), big AS (
      SELECT side, bk FROM k GROUP BY side, bk HAVING COUNT(*) > 10000
    ), k2 AS (
      SELECT k.* FROM k ANTI JOIN big USING (side, bk)
    ), cand AS (
      SELECT DISTINCT a.id AS id_a, b.id AS id_b, a.s AS sa, b.s AS sb
      FROM k2 a JOIN k2 b ON a.side = b.side AND a.bk = b.bk
                         AND a.id < b.id
    )
    SELECT id_a, id_b,
           ROUND(jaro_winkler_similarity(sa, sb), 6) + 0.0 AS jw6
    FROM cand
    WHERE ROUND(jaro_winkler_similarity(sa, sb), 6) + 0.0 >= 0.95
    """,
    extra=True,  # r14 addition — r15 rotation candidate
)
def x_jw_pairs(spark, sf_dir):
    """Jaro-Winkler near-dup pairs over CUSTOMER NAMES
    (pipeline/dedup.py:jw_pairs): the census name-matching scorer
    (prefix boost, transposition tolerance) on the SAME blocked
    candidates as x_fuzzy_pairs — Spark lacks the builtin, so the
    score is the documented candidate-confined Arrow UDF, implemented
    to DuckDB's exact convention (empty->0, window floor(max/2)-1,
    boost only above 0.7, prefix cap 4) and verified bit-identical
    over 30k random strings; readout ROUND-6 in the JVM."""
    from pigout_spark.pipeline.dedup import jw_pairs

    c = t(spark, sf_dir, "customer").select("c_custkey", "c_name")
    return jw_pairs(c, "c_custkey", "c_name", min_sim=0.95)


@query(
    "x_winnow",
    """
    WITH d AS (
      SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '')
               AS toks
      FROM documents WHERE doc_id IS NOT NULL AND text IS NOT NULL
    ), kg AS (
      SELECT doc_id,
        list_transform(range(0, len(toks) - 2), i ->
          ('0x' || substr(md5(array_to_string(
             list_slice(toks, i + 1, i + 3), ' ')), 1, 7))::BIGINT) AS hs
      FROM d WHERE len(toks) >= 3
    ), we AS (
      SELECT doc_id, hs, least(4, len(hs)) AS w FROM kg
    ), sel AS (
      SELECT doc_id,
        list_transform(range(0, len(hs) - w + 1), j ->
          struct_pack(
            pos := j + w - list_position(
              list_reverse(list_slice(hs, j + 1, j + w)),
              list_min(list_slice(hs, j + 1, j + w))),
            fp := list_min(list_slice(hs, j + 1, j + w)))) AS sels
      FROM we
    ), ex AS (
      SELECT doc_id, unnest(sels) AS s FROM sel
    ), fps AS (
      SELECT DISTINCT doc_id, CAST(s.pos AS BIGINT) AS pos, s.fp AS fp
      FROM ex
    ), per_doc AS (
      SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_fps
      FROM fps GROUP BY doc_id
    ), df2 AS (
      SELECT DISTINCT doc_id, fp FROM fps
    ), nd AS (
      SELECT fp, COUNT(DISTINCT doc_id) AS ndocs FROM df2 GROUP BY fp
    ), sh AS (
      SELECT df2.doc_id, CAST(COUNT(*) AS BIGINT) AS n_shared
      FROM df2 JOIN nd USING (fp) WHERE nd.ndocs >= 2
      GROUP BY df2.doc_id
    )
    SELECT per_doc.doc_id, n_fps,
           CAST(COALESCE(sh.n_shared, 0) AS BIGINT) AS n_shared_fps
    FROM per_doc LEFT JOIN sh ON per_doc.doc_id = sh.doc_id
    """,
    extra=True,  # r14 addition — r15 rotation candidate
)
def x_winnow(spark, sf_dir):
    """Winnowing fingerprints (MOSS; Schleimer-Wilkerson-Aiken 2003)
    over documents (pipeline/dedup.py:winnowing_fingerprints): k=3
    token-gram md5 hashes, window w=4, rightmost-min selection — per
    doc the fingerprint count and how many of its distinct
    fingerprints appear in OTHER docs too (the overlap-detection
    readout; any shared >= w+k-1 = 6-token run guarantees a shared
    fingerprint).  The winnow itself is in-task higher-order arrays,
    zero Python; sharing is one fp-keyed exchange."""
    from pigout_spark.pipeline.dedup import winnowing_fingerprints

    from pyspark.sql import Window

    # r14 (guide §2.4): the winnow narrow map (md5 per k-gram + window
    # mins) used to compute THREE times — once per consumer (per-doc
    # count, the fp-frequency aggregate, and the share join's probe).
    # One hash exchange by fp up front is shared by every consumer
    # (identical exchange → executed once); the (doc, fp) distinct and
    # the distinct-doc count both ride that partitioning (the count as
    # a fp-keyed Window instead of a self-join), so the fingerprint
    # relation is computed and shuffled exactly once.
    fps = winnowing_fingerprints(
        tf(spark, sf_dir, "documents"), "doc_id", "text", k=3, w=4
    ).select(F.col("id").alias("doc_id"), "pos", "fp").repartition("fp")
    per_doc = fps.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_fps")
    )
    df2 = fps.dropDuplicates(["doc_id", "fp"]).select("doc_id", "fp")
    sh = (
        df2.withColumn(
            "__ndocs", F.count(F.lit(1)).over(Window.partitionBy("fp"))
        )
        .filter(F.col("__ndocs") >= 2)
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).cast("bigint").alias("__n_shared"))
    )
    return per_doc.join(sh, "doc_id", "left").select(
        "doc_id", "n_fps",
        F.coalesce(F.col("__n_shared"), F.lit(0))
        .cast("bigint").alias("n_shared_fps"),
    )


@query(
    "x_img_dhash",
    """
    WITH d AS (
      SELECT doc_id, 8 + (doc_id % 9) AS w, 8 + (doc_id % 7) AS h,
             CASE WHEN doc_id % 4 = 0 THEN 1 ELSE 3 END AS bpp
      FROM documents
    ), g AS (
      SELECT d.*, gx, gy
      FROM d, (SELECT unnest(range(0, 9)) AS gx),
              (SELECT unnest(range(0, 8)) AS gy)
    ), cb AS (
      SELECT doc_id, w, h, bpp, gx, gy,
             (gx * w) // 9 AS x0,
             greatest((gx * w) // 9 + 1, ((gx + 1) * w) // 9) AS x1,
             (gy * h) // 8 AS y0,
             greatest((gy * h) // 8 + 1, ((gy + 1) * h) // 8) AS y1
      FROM g
    ), pxx AS (
      SELECT doc_id, w, bpp, gx, gy, y0, y1,
             unnest(range(x0, x1)) AS x FROM cb
    ), pxy AS (
      SELECT doc_id, w, bpp, gx, gy, x,
             unnest(range(y0, y1)) AS y FROM pxx
    ), lum AS (
      SELECT doc_id, gx, gy,
        CASE WHEN bpp = 1 THEN (doc_id*7 + (y*w + x)*13) % 256
             ELSE ((doc_id*7 + (y*w + x)*13) % 256
                 + (doc_id*7 + (y*w + x)*13 + 31) % 256
                 + (doc_id*7 + (y*w + x)*13 + 62) % 256) // 3 END AS v
      FROM pxy
    ), cavg AS (
      SELECT doc_id, gx, gy, SUM(v) // COUNT(*) AS a
      FROM lum GROUP BY doc_id, gx, gy
    ), bits AS (
      SELECT l.doc_id, l.gy,
             CAST(SUM(CASE WHEN l.a > r.a
                           THEN (1 << (7 - l.gx)) ELSE 0 END) AS INT) AS b
      FROM cavg l
      JOIN cavg r ON l.doc_id = r.doc_id AND l.gy = r.gy
                 AND r.gx = l.gx + 1
      WHERE l.gx < 8
      GROUP BY l.doc_id, l.gy
    ), dh AS (
      SELECT doc_id,
             MAX(CASE WHEN gy = 0 THEN b END) AS b0,
             MAX(CASE WHEN gy = 1 THEN b END) AS b1,
             MAX(CASE WHEN gy = 2 THEN b END) AS b2,
             MAX(CASE WHEN gy = 3 THEN b END) AS b3,
             MAX(CASE WHEN gy = 4 THEN b END) AS b4,
             MAX(CASE WHEN gy = 5 THEN b END) AS b5,
             MAX(CASE WHEN gy = 6 THEN b END) AS b6,
             MAX(CASE WHEN gy = 7 THEN b END) AS b7
      FROM bits GROUP BY doc_id
    ), blk AS (
      SELECT doc_id, 0 AS blk, b0 * 256 + b1 AS b FROM dh
      UNION ALL SELECT doc_id, 1, b2 * 256 + b3 FROM dh
      UNION ALL SELECT doc_id, 2, b4 * 256 + b5 FROM dh
      UNION ALL SELECT doc_id, 3, b6 * 256 + b7 FROM dh
    ), keep AS (
      SELECT blk, b FROM blk GROUP BY blk, b HAVING COUNT(*) <= 10000
    ), blk2 AS (
      SELECT blk.* FROM blk JOIN keep USING (blk, b)
    ), cand AS (
      SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
      FROM blk2 a JOIN blk2 b ON a.blk = b.blk AND a.b = b.b
                             AND a.doc_id < b.doc_id
    )
    SELECT c.id_a, c.id_b,
      CAST(bit_count(xor(x.b0, y.b0)) + bit_count(xor(x.b1, y.b1))
         + bit_count(xor(x.b2, y.b2)) + bit_count(xor(x.b3, y.b3))
         + bit_count(xor(x.b4, y.b4)) + bit_count(xor(x.b5, y.b5))
         + bit_count(xor(x.b6, y.b6)) + bit_count(xor(x.b7, y.b7))
           AS BIGINT) AS dist
    FROM cand c
    JOIN dh x ON c.id_a = x.doc_id
    JOIN dh y ON c.id_b = y.doc_id
    WHERE bit_count(xor(x.b0, y.b0)) + bit_count(xor(x.b1, y.b1))
        + bit_count(xor(x.b2, y.b2)) + bit_count(xor(x.b3, y.b3))
        + bit_count(xor(x.b4, y.b4)) + bit_count(xor(x.b5, y.b5))
        + bit_count(xor(x.b6, y.b6)) + bit_count(xor(x.b7, y.b7)) <= 3
    """,
    extra=True,  # r14 addition — r15 rotation candidate
)
def x_img_dhash(spark, sf_dir):
    """Image near-dup pairs by perceptual dHash (multimodal.py:
    dhash_png_images -> dedup.py:dhash_hamming_pairs): REAL PNG
    payloads decoded (CRC walk + inflate + unfilter), 9x8 integer
    block-average luma grid, horizontal-comparison bits packed per
    row, then the simhash-style pigeonhole block join (16-bit blocks —
    the corpus-scale bucket width) with exact bit_count(xor)
    verification at Hamming <= 3.  The oracle replays
    the pixel law through the SAME grid/bit/pair arithmetic in pure
    SQL — so codec, hash, and pairing are all under the check."""
    from pigout_spark.pipeline.dedup import dhash_hamming_pairs
    from pigout_spark.pipeline.multimodal import (
        dhash_png_images,
        synth_png_payloads,
    )

    d = synth_png_payloads(
        # t(), not tf(): synth_png_payloads fans out internally (r14) —
        # the former site-level tf() now planned a second respray
        t(spark, sf_dir, "documents").select("doc_id"), "doc_id"
    )
    hashes = dhash_png_images(d, "payload", "doc_id")
    return dhash_hamming_pairs(hashes, "doc_id", max_dist=3)
