"""Training-data pipeline extensions (SURVEY.md §7 phase 7) — the
operations a 100 TB training-data pipeline needs, beyond the reference's
Pig Latin surface:

    dedup       exact, MinHash+LSH, SimHash, n-gram Jaccard
    similarity  brute-force cosine top-k; hyperplane-LSH bucketing (ANN)
    text        language-ID, quality scoring, token counting, fingerprints
    multimodal  binary payload columns + Arrow-batched extract/decode stubs

Scale design rules used throughout: no cross joins (inverted-index /
band-bucket joins instead), no driver-side collects, JVM-side column
expressions wherever expressible, Arrow-batched mapInPandas where not.
"""

from pigout_spark.pipeline import dedup, multimodal, similarity, text  # noqa: F401
