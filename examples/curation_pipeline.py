"""End-to-end corpus curation on the fixture tables: the chain a
training-data pipeline runs before tokenization.

    scrub PII  →  quality + language features  →  near-dup pairs
    →  connected-component clusters  →  one retained doc per cluster
    →  benchmark decontamination  →  per-source token budget

Run:  python examples/curation_pipeline.py [sf_dir]
"""

import sys

sys.path.insert(0, ".")

from pigout_spark.session import get_spark  # noqa: E402
from pigout_spark.catalog import load_table  # noqa: E402
from pigout_spark.pipeline.curation import token_budget_select  # noqa: E402
from pigout_spark.pipeline.dedup import (  # noqa: E402
    dedup_clusters,
    minhash_lsh_pairs,
    retain_per_cluster,
)
from pigout_spark.pipeline.text import (  # noqa: E402
    lang_id,
    quality_features,
    scrub_pii,
)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark("curation-example")
    docs = load_table(spark, sf_dir, "documents")

    scrubbed = scrub_pii(docs)
    featured = lang_id(quality_features(scrubbed, "text_scrubbed"))

    # 2 bands of 8 rows: band-collision probability ≈ jaccard^8 — tight
    # enough that only near-dups pair.  The loose default (4 bands of 2,
    # ≈ j^2 per band) pairs most of a word-soup corpus into ONE
    # component and retention would keep a single doc.
    pairs = minhash_lsh_pairs(
        docs, "doc_id", "text", num_hashes=16, rows_per_band=8
    )
    clusters = dedup_clusters(pairs)
    kept = retain_per_cluster(featured, clusters, score_col="quality")

    budget = token_budget_select(
        kept,
        group_col="source",
        budget=2_000,
        order_col="quality",
        text_col="text_scrubbed",
    )

    print(f"docs in            : {docs.count()}")
    print(f"after cluster-dedup: {kept.count()}")
    print(f"after token budget : {budget.count()}")
    budget.select(
        "doc_id", "source", "predicted", "quality", "n_tokens"
    ).show(10, truncate=False)


if __name__ == "__main__":
    main()
