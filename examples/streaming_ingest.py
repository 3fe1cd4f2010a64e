"""Streaming INGEST with a quality gate: documents arrive as files,
the C4/Gopher rule set gates them inside the stream (narrow-only plan
— no joins, no aggregates), survivors land partitioned by split.

    readStream(parquet)  →  quality_filter_stream  →  keep-only
    →  split_corpus stamp  →  writeStream(parquet, partitioned)

Everything here is the exact code path the batch pipeline uses — the
streaming gate is the same rule arithmetic, just planned without
exchanges (SCALE.md).

Run:  python examples/streaming_ingest.py [sf_dir] [out_dir]
"""

import sys
import tempfile

sys.path.insert(0, ".")

from pyspark.sql import functions as F  # noqa: E402

from pigout_spark.session import get_spark  # noqa: E402
from pigout_spark.pipeline.curation import split_corpus  # noqa: E402
from pigout_spark.pipeline.text import quality_filter_stream  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    out_dir = (
        sys.argv[2]
        if len(sys.argv) > 2
        else tempfile.mkdtemp(prefix="pigout_stream_out")
    )
    spark = get_spark("streaming-ingest-example")

    # stage the fixture into an arrival directory (readStream watches
    # directories; in production this is the landing bucket)
    import shutil
    from pathlib import Path

    incoming = Path(tempfile.mkdtemp(prefix="pigout_incoming"))
    shutil.copy(f"{sf_dir}/documents.parquet", incoming / "batch0.parquet")

    stream = spark.readStream.schema(
        "doc_id long, text string, lang string, source string, n_chars long"
    ).parquet(str(incoming))

    verdicts = quality_filter_stream(stream)
    survivors = (
        verdicts.filter(F.col("keep"))
        .select("doc_id", "n_tokens")
    )
    stamped = split_corpus(
        survivors, {"train": 0.8, "val": 0.1, "test": 0.1}, ["doc_id"],
        seed="ingest",
    )

    q = (
        stamped.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", out_dir + "/_chk")
        .partitionBy("split")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)

    out = spark.read.parquet(out_dir)
    print(f"ingested (kept) : {out.count()}")
    out.groupBy("split").count().orderBy("split").show()
    print(f"output          : {out_dir}")


if __name__ == "__main__":
    main()
