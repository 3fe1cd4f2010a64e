"""Pig LOAD/STORE + the LoadFunc/StoreFunc families (SURVEY.md §2.1).

Pig's pluggable loaders map onto Spark's format registry; pushdown
(LoadPushDown / predicate pushdown into ORC+Parquet) is native to the
DataSource API — `.explain` shows PushedFilters/ReadSchema reaching the
scan, which is the §4.1 PartitionFilter/PredicatePushdown story for free.

| Pig loader            | here                              |
| PigStorage(delim)     | fmt="csv", sep=delim, header opt  |
| TextLoader            | fmt="text"                        |
| JsonLoader/Storage    | fmt="json"                        |
| Parquet               | fmt="parquet" (fixture default)   |
| OrcStorage            | fmt="orc"                         |
| AvroStorage           | fmt="avro" (needs spark-avro jar — gated) |
| BinStorage            | not needed: parquet is the interchange format |
| HBaseStorage          | out of scope (external connector) |
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

_FORMATS = {"parquet", "csv", "json", "text", "orc", "avro"}

_AVRO_AVAILABLE: bool | None = None


def avro_available(spark: SparkSession | None = None) -> bool:
    """True when the spark-avro module is on the session's classpath.
    Avro ships as an external Spark module (org.apache.spark:spark-avro);
    AvroStorage support is gated on detecting it rather than dropped —
    clusters that carry the jar get fmt='avro' with no code change."""
    global _AVRO_AVAILABLE
    if _AVRO_AVAILABLE is None:
        if spark is None:
            from pigout_spark.session import get_spark

            spark = get_spark()
        import shutil
        import tempfile

        # probe with a real one-row write: classpath checks false-positive
        # (avro *classes* can be present while the data source module is
        # not deployed); the result is cached for the process
        d = tempfile.mkdtemp(prefix="avro_probe")
        try:
            spark.createDataFrame([(1,)], "x int").write.format("avro").mode(
                "overwrite"
            ).save(f"{d}/probe")
            _AVRO_AVAILABLE = True
        except Exception:
            _AVRO_AVAILABLE = False
        finally:
            shutil.rmtree(d, ignore_errors=True)
    return _AVRO_AVAILABLE


def _check_fmt(fmt: str) -> str:
    if fmt not in _FORMATS:
        raise ValueError(f"unsupported format {fmt!r}; one of {sorted(_FORMATS)}")
    if fmt == "avro" and not avro_available():
        raise RuntimeError(
            "fmt='avro' needs the spark-avro jar on the classpath "
            "(org.apache.spark:spark-avro_2.13); not present in this session"
        )
    return fmt


def load(
    spark: SparkSession,
    uri: str,
    fmt: str = "parquet",
    schema: str | None = None,
    **options,
) -> DataFrame:
    """Pig `A = LOAD 'uri' USING fn(...) [AS (schema)]`.

    `schema` is a DDL string — the `AS` clause.  Without it, parquet/orc
    are self-describing and csv/json infer (Pig's schemaless bytearray
    mode narrowed to schema-on-read, divergence D2).
    """
    reader = spark.read.format(_check_fmt(fmt))
    if schema:
        reader = reader.schema(schema)
    elif fmt in ("csv", "json"):
        reader = reader.option("inferSchema", "true")
    for k, v in options.items():
        reader = reader.option(k, v)
    return reader.load(uri)


def store(
    df: DataFrame,
    uri: str,
    fmt: str = "parquet",
    mode: str = "overwrite",
    partition_by: list[str] | None = None,
    **options,
) -> None:
    """Pig `STORE A INTO 'uri' USING fn;`

    ``partition_by`` writes a hive-layout sink (``k=v/`` directories) —
    beyond the Pig surface, but the standard 100 TB layout: downstream
    scans with a filter on a partition column prune whole directories
    (PartitionFilters in the scan, verified in test_sources.py) instead
    of reading 100 TB to keep 1%.  Choose low-cardinality columns
    (date, category); high-cardinality keys belong in bucketing
    (plans/bucketing.py) — millions of tiny partition dirs are their
    own scale bug.
    """
    writer = df.write.format(_check_fmt(fmt)).mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    for k, v in options.items():
        writer = writer.option(k, v)
    writer.save(uri)
