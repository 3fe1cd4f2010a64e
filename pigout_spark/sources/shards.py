"""Sharded training-data export: deterministic shard assignment, one
file per shard, and a verifiable manifest — the sink stage of the
curation pipeline (webdataset/Megatron-style consumption expects a
fixed set of similar-sized shard files plus a manifest, not "whatever
task count Spark happened to use").

Integrity model: the manifest records per-shard row counts and an
ORDER-INSENSITIVE content fingerprint (bit-XOR of per-row md5 words —
XOR is commutative, associative, and overflow-free, so any engine, any
partitioning, any row order reproduces it).  :func:`verify_shards`
recomputes both from the written files — the check a 100 TB export
needs before anyone trains on it.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

#: Null sentinel for the row fingerprint (repo discipline: bare
#: concat_ws skips NULLs silently — coalesce every component first).
_NUL = "\x00"


def _row_fingerprint(cols: list[str]) -> F.Column:
    """64-bit word from the md5 of the row's canonical string form
    (columns in schema order, nulls sentineled)."""
    parts = [F.coalesce(F.col(c).cast("string"), F.lit(_NUL)) for c in cols]
    return F.conv(F.substring(F.md5(F.concat_ws("\x01", *parts)), 1, 15), 16, 10).cast(
        "bigint"
    )


def shard_assign(df: DataFrame, id_col: str, n_shards: int) -> DataFrame:
    """Add a deterministic ``shard`` column: md5(id) % n_shards.
    Content-addressed, so the same row lands in the same shard on every
    run and on any cluster — no dependence on task layout."""
    h = F.conv(F.substring(F.md5(F.col(id_col).cast("string")), 1, 15), 16, 10).cast(
        "bigint"
    )
    return df.withColumn("shard", (h % n_shards).cast("int"))


def _shard_summary(df_with_shard: DataFrame, data_cols: list[str]) -> DataFrame:
    """Per-shard (n_rows, fingerprint) aggregation — the single
    definition both the manifest build and :func:`verify_shards` use."""
    return df_with_shard.select(*data_cols, "shard").groupBy("shard").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.bit_xor(_row_fingerprint(data_cols)).alias("fingerprint"),
    )


def write_shards(
    df: DataFrame,
    path: str,
    id_col: str,
    n_shards: int,
    fmt: str = "parquet",
) -> dict:
    """Write ``df`` as exactly ``n_shards`` files under
    ``path/shard=K/`` plus ``path/_manifest.json``, and return the
    manifest.

    Layout: repartition on the shard column (one hash exchange) so each
    hive directory holds ONE file; rows are sorted by ``id_col`` within
    the shard, making the files byte-reproducible run to run.

    100 TB: pick ``n_shards`` so shards land near the consumer's target
    (0.5–2 GB); the single exchange replaces Spark's task-count-shaped
    output with a stable contract.  Manifest aggregation is one
    map-side-combined pass (count + XOR per shard) over the WRITTEN
    files, not over ``df``: aggregating the input in a separate action
    would scan it twice, and any nondeterministic upstream expression
    or source mutation between the two jobs would certify data that was
    never written (ADVICE r5).  Reading back only the written parquet
    makes the manifest describe the actual bytes on disk by
    construction — write_shards returns with its own verification
    already inherent.
    """
    sharded = shard_assign(df, id_col, n_shards)
    (
        sharded.repartition(n_shards, "shard")
        .sortWithinPartitions(id_col)
        .write.format(fmt)
        .mode("overwrite")
        .partitionBy("shard")
        .save(path)
    )
    spark = df.sparkSession
    spark.catalog.refreshByPath(path)
    written = spark.read.format(fmt).load(path)
    manifest_rows = _shard_summary(written, [c for c in df.columns]).collect()
    manifest = {
        "n_shards": n_shards,
        "id_col": id_col,
        "format": fmt,
        "columns": [c for c in df.columns],
        "total_rows": int(sum(r.n_rows for r in manifest_rows)),
        "shards": {
            str(r.shard): {"n_rows": int(r.n_rows), "fingerprint": int(r.fingerprint)}
            for r in sorted(manifest_rows, key=lambda r: r.shard)
        },
    }
    with open(os.path.join(path, "_manifest.json"), "w") as fh:
        json.dump(manifest, fh, indent=1, sort_keys=True)
    return manifest


def verify_shards(spark: SparkSession, path: str) -> dict:
    """Recompute counts and fingerprints FROM THE WRITTEN FILES and
    diff them against the manifest.  Returns {"ok": bool, "errors":
    [...]} — run it before shipping an export."""
    with open(os.path.join(path, "_manifest.json")) as fh:
        manifest = json.load(fh)
    # Files may have changed since this session last listed the path —
    # drop cached file status so tampering can't hide behind it.
    spark.catalog.refreshByPath(path)
    df = spark.read.format(manifest["format"]).load(path)
    data_cols = manifest["columns"]
    got = {
        str(r.shard): (int(r.n_rows), int(r.fingerprint))
        for r in _shard_summary(df, data_cols).collect()
    }
    errors = []
    for shard, meta in manifest["shards"].items():
        if shard not in got:
            errors.append(f"shard {shard} missing from files")
        elif got[shard] != (meta["n_rows"], meta["fingerprint"]):
            errors.append(
                f"shard {shard}: files {got[shard]} != manifest "
                f"({meta['n_rows']}, {meta['fingerprint']})"
            )
    for shard in got:
        if shard not in manifest["shards"]:
            errors.append(f"shard {shard} on disk but not in manifest")
    return {"ok": not errors, "errors": errors}
