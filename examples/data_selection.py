"""End-to-end DATA SELECTION on the fixture tables: the chain that
turns a deduplicated corpus into a mixed, packed, shuffled training
set — the stages downstream of examples/curation_pipeline.py.

    quality-rule filter (C4/Gopher audit)  →  duplicate-passage
    profile  →  drop boilerplate-heavy docs  →  DSIR importance
    resample toward a target domain  →  domain-mixture draw to a
    recipe  →  chunk  →  pack into fixed-token sequences
    →  deterministic export shuffle  →  BPE train + encode

Run:  python examples/data_selection.py [sf_dir]
"""

import sys

sys.path.insert(0, ".")

from pyspark.sql import functions as F  # noqa: E402

from pigout_spark.session import get_spark  # noqa: E402
from pigout_spark.catalog import load_table  # noqa: E402
from pigout_spark.pipeline.curation import (  # noqa: E402
    importance_resample,
    mixture_sample,
    shuffle_deterministic,
)
from pigout_spark.pipeline.dedup import passage_dup_stats  # noqa: E402
from pigout_spark.pipeline.text import (  # noqa: E402
    bpe_encode,
    bpe_train,
    chunk_documents,
    pack_sequences,
    quality_filter,
)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark("data-selection-example")
    docs = load_table(spark, sf_dir, "documents")

    # 0. rule-based quality gate (keep the audit trail around for
    #    threshold tuning)
    verdicts = quality_filter(docs)
    docs_q = docs.join(
        verdicts.filter(F.col("keep")).select("doc_id"), "doc_id"
    )

    # 1. duplicate-passage profile: drop docs that are mostly corpus
    #    boilerplate (>60% of 13-gram positions duplicated elsewhere)
    profile = passage_dup_stats(docs_q, n=13, min_docs=2)
    clean = docs_q.join(
        profile.filter(F.col("dup_fraction") <= 0.6).select("doc_id"),
        "doc_id",
    )

    # 2. DSIR: resample toward a target domain (here: the src0 slice
    #    stands in for a quality reference set like Wikipedia)
    target = docs.filter(F.col("source") == "src0")
    selected_ids = importance_resample(clean, target, k=300, seed="17")
    selected = clean.join(selected_ids.select("doc_id"), "doc_id")

    # 3. mixture draw to a recipe over the surviving sources
    mixed = mixture_sample(
        selected,
        "source",
        {f"src{i}": 1.0 for i in range(10)},  # uniform over 10 sources
        target_rows=200,
        id_cols=["doc_id"],
        seed="17",
    )

    # 4. chunk to 64-token windows, pack into 96-token sequences
    chunks = chunk_documents(mixed, max_tokens=64, overlap=16)
    packed = pack_sequences(chunks, budget=96)

    # 5. deterministic export order
    out = shuffle_deterministic(
        packed.groupBy("doc_id", "seq_idx").agg(
            F.sum("n_chunk_tokens").alias("seq_tokens")
        ),
        ["doc_id", "seq_idx"],
        seed="17",
    )

    # 6. tokenizer: train 16 BPE merges on the final mix, encode it
    merges = bpe_train(mixed, 16)
    encoded = bpe_encode(mixed, merges)

    print(f"docs in              : {docs.count()}")
    print(f"after quality gate   : {docs_q.count()}")
    print(f"after passage filter : {clean.count()}")
    print(f"after DSIR resample  : {selected.count()}")
    print(f"after mixture draw   : {mixed.count()}")
    print(f"packed sequences     : {out.count()}")
    print(f"BPE merges trained   : {len(merges)}")
    print(f"BPE tokens total     : {encoded.agg(F.sum('n_bpe_tokens')).first()[0]}")
    out.orderBy("shuffle_rank").show(10, truncate=False)


if __name__ == "__main__":
    main()
