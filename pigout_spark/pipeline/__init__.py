"""Training-data pipeline extensions (SURVEY.md §7 phase 7) — the
operations a 100 TB training-data pipeline needs, beyond the reference's
Pig Latin surface:

    dedup       exact, MinHash+LSH (+clusters/retention), SimHash,
                n-gram Jaccard, embedding near-dup, duplicate passages
    similarity  brute-force cosine top-k; LSH / k-means-IVF ANN; int8
                quantization + rescore search
    text        language-ID, quality scoring (+C4/Gopher composite
                filter with streaming variant), token counting,
                fingerprints, PII scrub, chunking + sequence packing,
                unigram-LM scoring, BPE train/encode, TF-IDF, PMI,
                corpus stats
    curation    decontamination, stratified/mixture/DSIR sampling,
                token budgets, deterministic shuffle + train/val/test
                split
    multimodal  binary payload columns + Arrow-batched extract/decode stubs

Scale design rules used throughout: no cross joins (inverted-index /
band-bucket joins instead), no driver-side collects, JVM-side column
expressions wherever expressible, Arrow-batched mapInPandas where not.
"""

from pigout_spark.pipeline import (  # noqa: F401
    curation,
    dedup,
    multimodal,
    similarity,
    text,
)
