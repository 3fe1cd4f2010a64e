"""The similarity serving matrix on the embeddings fixture: exact
baseline vs every approximate path, with measured recall.

    brute force      exact cosine top-k (the truth)
    LSH              hyperplane buckets
    IVF              k-means cell restriction
    int8 rescore     quantized coarse scan + exact rescore
    PQ-ADC           product-quantization codes + exact rescore
    IVFPQ            cell restriction x PQ codes + exact rescore

Run:  python examples/similarity_search.py [sf_dir]
"""

import sys

sys.path.insert(0, ".")

from pigout_spark.catalog import load_table  # noqa: E402
from pigout_spark.pipeline.similarity import (  # noqa: E402
    ann_topk,
    brute_force_topk,
    random_hyperplanes,
    ivf_pq_topk,
    ivf_topk,
    pq_codebooks,
    pq_topk,
    quantized_topk,
)
from pigout_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("similarity-example")
    emb = load_table(spark, sf_dir, "embeddings")
    n_q, k = 10, 5

    truth: dict[int, set] = {}
    for r in brute_force_topk(emb, emb.filter(f"vec_id < {n_q}"), k).collect():
        truth.setdefault(r.q_id, set()).add(r.neighbor_id)

    def recall(df) -> float:
        got: dict[int, set] = {}
        for r in df.collect():
            got.setdefault(r.q_id, set()).add(r.neighbor_id)
        return sum(len(got.get(q, set()) & truth[q]) for q in truth) / sum(
            len(truth[q]) for q in truth
        )

    books = pq_codebooks(emb, m=4, k=16, n_iters=3)
    planes = random_hyperplanes(64, 8)
    queries = emb.filter(f"vec_id < {n_q}")
    paths = [
        ("LSH (8 planes)", ann_topk(emb, queries, planes, k)),
        ("IVF (nprobe=1)", ivf_topk(emb, n_q, k)),
        ("int8 rescore", quantized_topk(emb, n_q, k, rescore=4)),
        ("PQ-ADC rescore=8", pq_topk(emb, n_q, k, books, rescore=8)),
        ("IVFPQ rescore=8", ivf_pq_topk(emb, n_q, k, books=books, rescore=8)),
    ]
    print(f"recall@{k} vs brute force, {n_q} queries:")
    for name, df in paths:
        print(f"  {name:18s} {recall(df):.2f}")
    spark.stop()


if __name__ == "__main__":
    main()
