"""spark-submit entry point: continuous/incremental annotation.

    spark-submit --master <cluster> --py-files phenobert_spark.zip \
        jobs/annotate_stream.py \
        --input  <dir or Iceberg-backed stream of documents parquet> \
        --output <triples dir> --checkpoint <ckpt dir> \
        [--follow]   # keep running; default drains available data and exits
"""

from __future__ import annotations

import argparse
import sys


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True)
    ap.add_argument("--output", required=True)
    ap.add_argument("--checkpoint", required=True)
    ap.add_argument("--follow", action="store_true")
    ap.add_argument("--use-model-stages", action="store_true")
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    from phenobert_spark.config import PipelineConfig
    from phenobert_spark.ontology import get_ontology
    from phenobert_spark.streaming.incremental import annotate_stream

    spark = SparkSession.builder.appName("phenobert-annotate-stream").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    onto = get_ontology()
    cfg = PipelineConfig(use_model_stages=args.use_model_stages)

    q = annotate_stream(
        spark, args.input, args.output, args.checkpoint, onto, cfg
    )
    if args.follow:
        q.awaitTermination()
    else:
        q.awaitTermination(3600)
        if q.isActive:
            q.stop()
    spark.stop()


if __name__ == "__main__":
    sys.exit(main())
