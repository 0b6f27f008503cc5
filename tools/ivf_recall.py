"""IVF serving evidence: recall@k vs nprobe against brute-force ground
truth (VERDICT r4 item 6).

q37/q97 prove the full-probe IVF == brute force (exactness); what a
100-TB user actually runs is nprobe << n_centroids. This measures the
recall/cost trade-off of that serving configuration on the real
embeddings table, for both the untrained ("first") and Lloyd-trained
("kmeans") coarse quantizers:

    python tools/ivf_recall.py [sf_dir] [n_centroids] [k] [n_queries]

Prints one JSON line: {"recall": {"first": {nprobe: r, ...},
"kmeans": {...}}, ...}. tests/test_similarity.py pins floors from the
sf0.01 curve so a quantizer regression fails CI.
"""

from __future__ import annotations

import json
import sys

sys.path.insert(0, ".")


def recall_curve(
    spark,
    emb,
    n_centroids: int,
    k: int,
    n_queries: int,
    nprobes: list[int],
) -> dict:
    from pyspark.sql import functions as F

    from phenobert_spark.operators.similarity import (
        cosine_topk_pandas,
        ivf_topk,
    )

    gt = {
        (r.qid, r.nid)
        for r in cosine_topk_pandas(
            spark, emb, n_queries=n_queries, k=k
        ).collect()
    }
    queries = emb.filter(F.col("vec_id") < n_queries).select(
        "vec_id", "embedding"
    )
    out: dict[str, dict[int, float]] = {}
    for quantizer in ("first", "kmeans"):
        out[quantizer] = {}
        for nprobe in nprobes:
            got = {
                (r.qid, r.nid)
                for r in ivf_topk(
                    spark,
                    emb,
                    queries,
                    n_centroids=n_centroids,
                    k=k,
                    nprobe=nprobe,
                    quantizer=quantizer,
                ).collect()
            }
            out[quantizer][nprobe] = round(len(got & gt) / len(gt), 4)
    return out


def main() -> None:
    from phenobert_spark.config import get_spark

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    n_centroids = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    k = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    n_queries = int(sys.argv[4]) if len(sys.argv) > 4 else 50

    spark = get_spark(app_name="ivf-recall", master="local[8]",
                      shuffle_partitions=16)
    spark.sparkContext.setLogLevel("ERROR")
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    nprobes = sorted({1, 2, 4, n_centroids // 2, n_centroids})
    rec = recall_curve(spark, emb, n_centroids, k, n_queries, nprobes)
    print(
        json.dumps(
            {
                "metric": "ivf_recall_at_k",
                "sf_dir": sf_dir,
                "n_vectors": emb.count(),
                "n_centroids": n_centroids,
                "k": k,
                "n_queries": n_queries,
                "recall": rec,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
