"""Pig BuildBloom / Bloom builtins (Pig 0.10+) — bloom-join reduction,
Spark-first.

Pig's pattern: ``BuildBloom`` aggregates the small relation's keys into
a bloom filter, ``Bloom(key)`` filters the big relation BEFORE the join,
so the shuffle moves only probable matches.  Spark's own runtime
row-level bloom join does this automatically above size thresholds; this
module provides the explicit, deterministic version for when the
optimizer can't see it (pre-filtering before a write, cross-job reuse,
or Pig script parity).

Design: the filter is an ``array<long>`` of ``n_longs`` words
(m = 64·n_longs bits).  Keys hash through ONE base hash (28-bit) and k
universal-hash probes (exact int64 arithmetic — the MinHash family
device).  Two base-hash modes:

- ``hash_fn="xxhash64"`` (default): Spark's JVM xxhash64 — the fast
  path.  The r11 sf1 decomposition showed the md5→substring→conv
  chain dominating the probe stage (3.2 s vs 1.2 s over 6M rows); the
  final JOIN eliminates bloom false positives either way, so join
  RESULTS are hash-independent and the fast hash is safe wherever the
  pruned set itself isn't externally replayed.
- ``hash_fn="md5"``: engine-independent and SQL-mirrorable (DuckDB:
  ``('0x'||substring(md5(k::VARCHAR),1,7))::BIGINT``) — use when
  another engine must reproduce the EXACT kept-row set (oracle replay
  of the pruned relation, cross-system handoff of a pre-filtered
  extract).

Build explodes the k positions and groupBys the word index (≤ n_longs
tiny rows, two trivially-small shuffles) instead of one aggregate with
n_longs·k generated expressions — same bits, half the wall at bench
scale, and it stays compilable at the 150k-long sizing below where
the expression-per-word form would overwhelm codegen.  The result is
ONE row of n_longs longs, broadcast to the probe side.  At 100 TB:
build cost is a scan of the small side; probe cost is 4 integer ops
per row; the only data movement is the (tiny) filter itself.

No false negatives ever; false-positive rate ≈ (1 - e^{-k·n/m})^k —
size ``n_longs`` for the build-side cardinality (e.g. 1M keys at 1% FP
needs m ≈ 9.6M bits ≈ 150k longs ≈ 1.2 MB — still broadcast-cheap).
"""

from __future__ import annotations

import random

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: Mersenne prime for the universal-hash probe family (shared with the
#: MinHash family in pipeline/dedup.py).
_P = 2_147_483_647


def _probe_params(k: int, seed: int) -> list[tuple[int, int]]:
    rng = random.Random(seed)
    return [(rng.randrange(1, _P), rng.randrange(0, _P)) for _ in range(k)]


def _with_positions(
    df: DataFrame,
    col: Column | str,
    m: int,
    k: int,
    seed: int,
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """Attach __h0..__h{k-1} bit-position columns for ``col``.

    One base hash per row (CSE collapses the shared subexpression),
    then k exact-int64 universal hashes into [0, m)."""
    c = F.col(col) if isinstance(col, str) else col
    if hash_fn == "md5":
        x = F.conv(
            F.substring(F.md5(c.cast("string")), 1, 7), 16, 10
        ).cast("long")
    elif hash_fn == "xxhash64":
        # pmod into the same 28-bit domain the md5 mode uses, so the
        # universal-hash probe family sees an identical base range
        x = F.pmod(F.xxhash64(c.cast("string")), F.lit(1 << 28)).cast("long")
    else:
        raise ValueError(f"hash_fn must be 'xxhash64' or 'md5', got {hash_fn!r}")
    out = df.withColumn("__x", x)
    for i, (a, b) in enumerate(_probe_params(k, seed)):
        out = out.withColumn(f"__h{i}", ((F.col("__x") * a + b) % _P) % m)
    return out.drop("__x")


def bloom_build(
    df: DataFrame,
    col: Column | str,
    n_longs: int = 64,
    k: int = 4,
    seed: int = 11,
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """Pig ``BuildBloom``: aggregate ``col``'s values into a bloom
    filter.  Returns a ONE-ROW DataFrame with column ``bloom``
    (array<long> of ``n_longs`` words) — broadcast it to probe sides."""
    m = n_longs * 64
    withh = _with_positions(df, col, m, k, seed, hash_fn)
    # explode the k positions, bit_or per word index, assemble the
    # dense word array from the ≤ n_longs-row result — O(n_longs)
    # trivial expressions instead of n_longs·k generated aggregates
    pos = withh.select(
        F.explode(F.array(*[F.col(f"__h{i}") for i in range(k)])).alias("__h")
    )
    perword = pos.groupBy(F.shiftright("__h", 6).alias("__j")).agg(
        F.bit_or(F.expr("shiftleft(1L, cast(__h % 64 as int))")).alias("__w")
    )
    one = perword.agg(
        F.map_from_entries(F.collect_list(F.struct("__j", "__w"))).alias("__mw")
    )
    return one.select(
        F.array(
            *[
                F.coalesce(
                    F.element_at(F.col("__mw"), F.lit(j)),
                    F.lit(0).cast("long"),
                )
                for j in range(n_longs)
            ]
        )
        .cast("array<long>")
        .alias("bloom")
    )


def bloom_filter(
    df: DataFrame,
    col: Column | str,
    bloom_df: DataFrame,
    n_longs: int = 64,
    k: int = 4,
    seed: int = 11,
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """Pig ``Bloom(key)`` filter: keep rows whose ``col`` is *probably*
    in the filter (never drops a true member).  ``bloom_df`` is
    ``bloom_build``'s output with MATCHING n_longs/k/seed/hash_fn; it
    is broadcast — the probe is a narrow map."""
    m = n_longs * 64
    withh = _with_positions(df, col, m, k, seed, hash_fn).crossJoin(
        F.broadcast(bloom_df)
    )
    cond = None
    for i in range(k):
        t = F.expr(
            f"(shiftright(element_at(bloom, cast(shiftright(__h{i}, 6) + 1 as int)),"
            f" cast(__h{i} % 64 as int)) & 1) = 1"
        )
        cond = t if cond is None else cond & t
    return withh.filter(cond).drop("bloom", *[f"__h{i}" for i in range(k)])


def bloom_join(
    fact: DataFrame,
    dim: DataFrame,
    fact_key: str,
    dim_key: str,
    how: str = "inner",
    n_longs: int = 64,
    k: int = 4,
    seed: int = 11,
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """The full bloom-join reduction: build on the dim side, pre-filter
    the fact side, then the real join (exact results — bloom false
    positives are eliminated by the join itself, so the default
    xxhash64 fast hash never changes the OUTPUT, only the pruning
    speed).  ``how`` is restricted to inner/left_semi: pre-filtering
    the fact side would corrupt outer semantics."""
    if how not in ("inner", "left_semi"):
        raise ValueError(
            f"bloom_join pre-filters the fact side; {how!r} outer semantics "
            "would lose unmatched fact rows — use a plain join"
        )
    bf = bloom_build(dim, dim_key, n_longs, k, seed, hash_fn)
    pruned = bloom_filter(fact, fact_key, bf, n_longs, k, seed, hash_fn)
    if fact_key == dim_key:
        # same-named key: join(on=name) resolves unambiguously and emits
        # the key column once (a bare col(name) == col(name) condition
        # would be ambiguous → AnalysisException)
        return pruned.join(dim, on=fact_key, how=how)
    # distinct names: qualify both sides so any OTHER same-named columns
    # can't make the key reference ambiguous
    f, d = pruned.alias("__bjf"), dim.alias("__bjd")
    return f.join(
        d, F.col(f"__bjf.{fact_key}") == F.col(f"__bjd.{dim_key}"), how
    )
