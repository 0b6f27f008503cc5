"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "sec", "queries": {...}, "sf": ...}

plus (stderr) docs/sec for the flagship pipeline. Scaling-efficiency
evidence across parallelism levels lives in bench_scaling.py.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else -1.0

    from pyspark.sql import functions as F

    from phenobert_spark.config import PipelineConfig, get_spark
    from phenobert_spark.ontology import get_ontology
    from phenobert_spark.pipeline import annotate
    from phenobert_spark.plans.contract_queries import QUERIES

    spark = get_spark(app_name="phenobert-spark-bench")
    spark.sparkContext.setLogLevel("ERROR")

    # warm-up: JVM + Python workers + broadcast machinery (one tiny
    # pipeline run so the flagship timing reflects steady state)
    spark.range(1_000_000).select(F.sum("id")).collect()

    timings: dict[str, float] = {}
    samples: dict[str, list[float]] = {}
    n_repeats = int(os.environ.get("SPARK_GRAFT_BENCH_REPEATS", "3"))

    def loadavg() -> float:
        with open("/proc/loadavg") as f:
            return float(f.read().split()[0])

    load_start = loadavg()

    def run(name, fn, repeats: int = n_repeats):
        # best-of-N (default 3): cross-invocation variance on this
        # shared VM is ~2x (noisy neighbors); the minimum is the
        # steady-state estimator, applied identically to every query.
        # The full sample list ships in the JSON so the artifact is
        # self-describing about its noise floor.
        ts = []
        for _ in range(repeats):
            t0 = time.time()
            fn()
            ts.append(round(time.time() - t0, 3))
        samples[name] = ts
        timings[name] = min(ts)

    # Flagship: full KG pipeline over the documents table.
    onto = get_ontology()
    raw = spark.read.parquet(f"{sf_dir}/documents.parquet")
    docs = raw.select(
        F.lit("bench").alias("repo"),
        F.concat(F.lit("doc_"), F.col("doc_id")).alias("path"),
        F.lit("0" * 40).alias("commit"),
        F.col("lang"),
        F.col("text").alias("content"),
    )
    n_docs = raw.count()
    annotate(spark, docs.limit(64), onto, PipelineConfig()).count()  # warm-up
    run("hpo_annotate", lambda: annotate(spark, docs, onto, PipelineConfig()).count())

    headline = [
        "q01_pricing_summary",
        "q02_revenue_by_nation",
        "q04_maximal_intervals",
        "q08_transitive_closure",
        "q17_minhash_lsh_pairs",
        "q18_simhash",
        "q19_cosine_topk",
        "q22_dict_match_maximal",
        "q24_event_hourly_rollup",
    ]
    # JIT/codegen warm-up at the smallest SF (same practice as the
    # flagship warm-up above): the measurement below is steady-state.
    for qname in headline:
        QUERIES[qname](spark, "/root/testdata/sf0.001").count()
    for qname in headline:
        fn = QUERIES[qname]
        run(qname, lambda fn=fn: fn(spark, sf_dir).count())

    total = round(sum(timings.values()), 3)
    docs_per_sec = round(n_docs / timings["hpo_annotate"], 2)
    print(
        f"hpo_annotate: {n_docs} docs in {timings['hpo_annotate']}s "
        f"= {docs_per_sec} docs/sec",
        file=sys.stderr,
    )
    print(
        json.dumps(
            {
                "metric": "headline_queries_total",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
                "docs_per_sec": docs_per_sec,
                "samples": samples,
                "loadavg_start": load_start,
                "loadavg_end": loadavg(),
                "repeats": n_repeats,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
