"""spark-submit entry point: near-duplicate dedup of a documents table.

    spark-submit --master <cluster> --py-files phenobert_spark.zip \
        jobs/dedup_corpus.py \
        --input  <documents parquet (doc_id, text, ...)> \
        --output <dir> \
        [--method prefix|lsh] [--threshold 0.2] [--keep-assignments]

Pipeline: candidate pairs (never all-pairs — PPJoin prefix equi-join
by default, MinHash+LSH banded join with --method lsh) -> undirected
connected components (hash-min label propagation) -> keep one CANONICAL
document per cluster (min doc_id). Writes:

    <output>/deduped/      the surviving documents (all columns)
    <output>/assignments/  (doc_id, component, is_canonical), with
                           --keep-assignments (audit/debug table)

Every stage is a shuffle-on-key plan (band/prefix equi-joins, node-key
aggregates); nothing materializes O(n^2) pairs, so the same job shape
holds at 10^9+ documents.
"""

from __future__ import annotations

import argparse

from pyspark.sql import functions as F


def main(argv: list[str] | None = None, spark=None) -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--input", required=True)
    p.add_argument("--output", required=True)
    p.add_argument("--method", choices=["prefix", "lsh"], default="prefix")
    p.add_argument("--threshold", type=float, default=0.2)
    p.add_argument("--keep-assignments", action="store_true")
    args = p.parse_args(argv)

    from phenobert_spark.config import get_spark
    from phenobert_spark.operators.closure import (
        connected_components,
        star_components,
    )
    from phenobert_spark.operators.dedup import (
        jaccard_pairs_prefix,
        lsh_star_edges,
        minhash_signatures,
    )

    owns_session = spark is None
    if owns_session:
        spark = get_spark(app_name="dedup-corpus")
    docs = spark.read.parquet(args.input)

    if args.method == "lsh":
        # star-contracted edges: identical components to the
        # within-bucket pair clique at O(n x bands) rows — LSH buckets
        # of exact duplicates are exactly where the clique goes
        # quadratic (see operators/dedup.lsh_star_edges)
        edges = lsh_star_edges(minhash_signatures(docs))
        # two-level components: iterate on the bucket-rep graph
        # (bounded by #buckets), join labels back onto the corpus —
        # label-identical to connected_components (pinned by test)
        comp = star_components(edges, nodes=docs.select("doc_id"))
    else:
        edges = jaccard_pairs_prefix(docs, threshold=args.threshold).select(
            F.col("doc_a").alias("src"), F.col("doc_b").alias("dst")
        )
        comp = connected_components(edges, nodes=docs.select("doc_id"))
    assignments = comp.select(
        F.col("node").alias("doc_id"),
        "component",
        (F.col("component") == F.col("node")).alias("is_canonical"),
    )
    if args.keep_assignments:
        assignments.write.mode("overwrite").parquet(
            f"{args.output}/assignments"
        )

    # keep the canonical row of every cluster; the join side is the
    # (small) set of canonical ids — broadcastable when clusters are
    # few, plain shuffled semi-join otherwise (let AQE decide)
    canon = assignments.filter("is_canonical").select("doc_id")
    docs.join(canon, on="doc_id", how="left_semi").write.mode(
        "overwrite"
    ).parquet(f"{args.output}/deduped")
    if owns_session:
        spark.stop()


if __name__ == "__main__":
    main()
