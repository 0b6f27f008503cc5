"""spark-submit entry point: annotate a documents corpus into the KG
edge/node tables with per-bucket checkpointing (north rule launch mode).

    zip -r /tmp/phenobert_spark.zip phenobert_spark
    spark-submit --master <cluster> --py-files /tmp/phenobert_spark.zip \
        jobs/annotate_corpus.py \
        --input  <iceberg table | parquet dir | txt dir> \
        --output <graph dir> \
        [--n-buckets 256] [--use-model-stages] [--write-nodes]

Re-running with the same --output resumes from the bucket manifest.
With --delta, a CHANGED corpus snapshot (docs added / modified /
removed since the last run) is diffed against the manifest lineage and
only drifted buckets are re-annotated — the day-N+1 incremental ingest
path (O(changed buckets) work, one fingerprint scan of the input).
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True)
    ap.add_argument("--output", required=True)
    ap.add_argument("--n-buckets", type=int, default=256)
    ap.add_argument("--use-model-stages", action="store_true")
    ap.add_argument("--write-nodes", action="store_true")
    ap.add_argument("--chunk-bytes", type=int, default=4096)
    ap.add_argument(
        "--delta",
        action="store_true",
        help="incremental ingest: diff the snapshot against the manifest "
        "lineage and reprocess only drifted buckets (annotate_delta)",
    )
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    from phenobert_spark.config import PipelineConfig
    from phenobert_spark.materialize import (
        annotate_delta,
        read_manifest,
        run_with_checkpoint,
        write_nodes,
    )
    from phenobert_spark.ontology import get_ontology
    from phenobert_spark.sources.tables import read_documents

    # under spark-submit the session/master comes from the launcher
    spark = SparkSession.builder.appName("phenobert-annotate").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    cfg = PipelineConfig(
        use_model_stages=args.use_model_stages,
        chunk_target_bytes=args.chunk_bytes,
    )
    onto = get_ontology()
    docs = read_documents(spark, args.input)

    t0 = time.time()
    runner = annotate_delta if args.delta else run_with_checkpoint
    result = runner(
        spark, docs, onto, args.output, cfg, n_buckets=args.n_buckets
    )
    if args.write_nodes:
        write_nodes(spark, docs, onto, args.output)
    manifest = read_manifest(spark, args.output)
    agg = manifest.groupBy().sum("n_docs", "n_triples").collect()[0]
    print(
        json.dumps(
            {
                "input": args.input,
                "output": args.output,
                "resumed_from_buckets": result["resumed_from"],
                "processed_buckets": result["processed"],
                "total_docs": agg[0],
                "total_triples": agg[1],
                "wall_sec": round(time.time() - t0, 2),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    sys.exit(main())
