"""LOAD/STORE surface (SURVEY.md §2.1): format round-trips with schema
(AS-clause) and options (PigStorage delimiter)."""

from __future__ import annotations

import shutil
import tempfile

import pytest

from pigout_spark.sources.io import load, store


@pytest.fixture()
def tmpdir():
    d = tempfile.mkdtemp(prefix="pigout_io")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def _df(spark):
    return spark.createDataFrame(
        [(1, "a", 1.5), (2, "b", 2.5)], "k int, s string, v double"
    )


def test_avro_gated_on_jar_detection(spark, tmpdir):
    """AvroStorage: fmt='avro' works when spark-avro is on the classpath
    and fails with a clear gating error when it isn't — capability
    detection, not a dropped feature."""
    from pigout_spark.sources.io import avro_available

    df = _df(spark)
    uri = f"{tmpdir}/avro"
    if avro_available(spark):
        store(df, uri, fmt="avro")
        back = load(spark, uri, fmt="avro")
        assert back.count() == 2
    else:
        with pytest.raises(RuntimeError, match="spark-avro"):
            store(df, uri, fmt="avro")


@pytest.mark.parametrize("fmt", ["parquet", "orc", "json", "csv"])
def test_roundtrip(spark, tmpdir, fmt):
    df = _df(spark)
    uri = f"{tmpdir}/{fmt}"
    opts = {"header": "true"} if fmt == "csv" else {}
    store(df, uri, fmt=fmt, **opts)
    back = load(spark, uri, fmt=fmt, **opts)
    got = sorted((r.k, r.s, r.v) for r in back.collect())
    assert got == [(1, "a", 1.5), (2, "b", 2.5)]


def test_pigstorage_delimiter(spark, tmpdir):
    # PigStorage(',') analog: csv with explicit sep + AS-schema.
    df = _df(spark)
    uri = f"{tmpdir}/pigstorage"
    store(df, uri, fmt="csv", sep="|")
    back = load(spark, uri, fmt="csv", schema="k int, s string, v double", sep="|")
    assert back.count() == 2 and back.schema.simpleString() == df.schema.simpleString()


def test_textloader(spark, tmpdir):
    # TextLoader: one line → one chararray field.
    df = _df(spark)
    store(df.selectExpr("concat(s, k)"), f"{tmpdir}/text", fmt="text")
    back = load(spark, f"{tmpdir}/text", fmt="text")
    assert sorted(r.value for r in back.collect()) == ["a1", "b2"]


def test_unknown_format_rejected(spark):
    with pytest.raises(ValueError):
        load(spark, "/nowhere", fmt="hbase")


def test_predicate_pushdown_reaches_scan(spark, sf_dir):
    """§4.1: filters and pruned columns must reach the parquet reader —
    the LoadPushDown/PredicatePushdownOptimizer story is free, but we
    assert it stays that way."""
    from pigout_spark.catalog import load_table

    li = load_table(spark, sf_dir, "lineitem")
    plan = (
        li.filter("l_quantity < 5")
        .select("l_orderkey")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "PushedFilters: [IsNotNull(l_quantity), LessThan(l_quantity,5" in plan
    # column pruning: the scan must read only the two needed columns
    assert "ReadSchema: struct<l_orderkey:bigint,l_quantity:double>" in plan


def test_partitioned_store_prunes_partitions(spark, sf_dir, tmp_path):
    """store(partition_by=...): hive-layout sink; a downstream filter on
    the partition column reaches the scan as a PartitionFilter (whole
    directories skipped — the 100 TB pruning path)."""
    from pigout_spark.sources.io import load, store

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    dst = str(tmp_path / "li_part")
    store(li, dst, partition_by=["l_returnflag"])
    back = load(spark, dst).filter("l_returnflag = 'R'")
    plan = back._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [isnotnull(l_returnflag" in plan
    assert back.count() == li.filter("l_returnflag = 'R'").count()
    # partition column round-trips (as string — hive layout convention)
    assert set(back.select("l_returnflag").distinct().toPandas()["l_returnflag"]) == {"R"}


def test_write_shards_layout_and_manifest(spark, sf_dir, tmp_path):
    """Exactly n_shards one-file directories, counts conserved, and a
    manifest verify_shards accepts."""
    import glob

    from pigout_spark.sources.shards import verify_shards, write_shards

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    path = str(tmp_path / "export")
    manifest = write_shards(docs, path, id_col="doc_id", n_shards=8)
    assert manifest["total_rows"] == docs.count()
    assert set(manifest["shards"]) <= {str(i) for i in range(8)}
    for shard_dir in glob.glob(f"{path}/shard=*"):
        files = [f for f in glob.glob(f"{shard_dir}/*.parquet")]
        assert len(files) == 1, shard_dir
    check = verify_shards(spark, path)
    assert check["ok"], check["errors"]


def test_write_shards_deterministic_assignment(spark, sf_dir, tmp_path):
    """Same ids -> same shards on a rerun over a superset corpus (rows
    never migrate when content grows; only new ids appear)."""
    from pigout_spark.sources.shards import shard_assign

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    a = {r.doc_id: r.shard for r in shard_assign(docs.limit(200), "doc_id", 8).collect()}
    b = {r.doc_id: r.shard for r in shard_assign(docs, "doc_id", 8).collect()}
    assert all(b[k] == v for k, v in a.items())


def test_verify_shards_detects_tampering(spark, sf_dir, tmp_path):
    """Dropping a row from a written shard must fail verification."""
    import glob

    from pigout_spark.sources.shards import verify_shards, write_shards

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(100)
    path = str(tmp_path / "export")
    write_shards(docs, path, id_col="doc_id", n_shards=4)
    victim_dir = sorted(glob.glob(f"{path}/shard=*"))[0]
    victim = glob.glob(f"{victim_dir}/*.parquet")[0]
    kept = spark.read.parquet(victim_dir).limit(1).drop("shard")
    import tempfile

    with tempfile.TemporaryDirectory() as td:
        kept.coalesce(1).write.mode("overwrite").parquet(td)
        import shutil

        part = glob.glob(f"{td}/part-*.parquet")[0]
        shutil.copyfile(part, victim)
    # drop Hadoop's checksum sidecar so the swap isn't caught at the
    # filesystem layer — verify_shards must catch it at the content layer
    import os

    for crc in glob.glob(f"{victim_dir}/.*.crc"):
        os.remove(crc)
    check = verify_shards(spark, path)
    assert not check["ok"] and check["errors"]
