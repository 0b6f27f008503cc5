"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Protocol (round 5): this shared VM's co-tenant load swings single-window
benches up to 2x (BENCH_SCALING.md), which made round-4's single-JVM
artifact unusable as a trend signal. The suite therefore runs in up to
$SPARK_GRAFT_BENCH_JVMS (default 3) FRESH JVM subprocesses — the same
fresh-JVM windowing bench_scaling.py uses — each recording
/proc/loadavg before and after; the per-query estimator is the minimum
across all windows (identical treatment for every query), and the
artifact carries every window's samples + loadavg so a noisy run is
self-describing. Windows stop early once a quiet one (loadavg < 2.0)
has been observed.

Scaling-efficiency evidence across parallelism levels lives in
bench_scaling.py / bench_dedup_scaling.py.
"""

from __future__ import annotations

import json
import os
import re
import subprocess
import sys
import time

QUIET_LOAD = float(os.environ.get("SPARK_GRAFT_BENCH_QUIET_LOAD", "2.0"))


def loadavg() -> float:
    with open("/proc/loadavg") as f:
        return float(f.read().split()[0])


def run_window() -> dict:
    """One fresh-JVM bench window: every headline query, best-of-N
    in-JVM repeats, with loadavg bracketing."""
    from pyspark.sql import functions as F

    from phenobert_spark.config import PipelineConfig, get_spark
    from phenobert_spark.ontology import get_ontology
    from phenobert_spark.pipeline import annotate
    from phenobert_spark.plans.contract_queries import QUERIES

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="phenobert-spark-bench")
    spark.sparkContext.setLogLevel("ERROR")

    # warm-up: JVM + Python workers + broadcast machinery
    spark.range(1_000_000).select(F.sum("id")).collect()

    timings: dict[str, float] = {}
    samples: dict[str, list[float]] = {}
    n_repeats = int(os.environ.get("SPARK_GRAFT_BENCH_REPEATS", "3"))
    load_start = loadavg()

    def run(name, fn, repeats: int = n_repeats):
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
    run(
        "hpo_annotate",
        lambda: annotate(spark, docs, onto, PipelineConfig()).count(),
    )

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
    # JIT/codegen warm-up at the smallest SF: measurements are
    # steady-state.
    for qname in headline:
        QUERIES[qname](spark, "/root/testdata/sf0.001").count()
    for qname in headline:
        fn = QUERIES[qname]
        run(qname, lambda fn=fn: fn(spark, sf_dir).count())

    # KG graph-metrics family (jobs/kg_metrics.py composition) at
    # corpus scale: PageRank over the lineitem-derived bipartite
    # annotation graph (~600k edges at sf0.1) — the iterative
    # join+aggregate loop the kg job runs over materialized triples.
    from phenobert_spark.operators.kg_metrics import pagerank

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    kg_edges = li.select(
        F.concat(F.lit("O"), F.col("l_orderkey")).alias("src"),
        F.concat(F.lit("S"), F.col("l_suppkey")).alias("dst"),
    ).distinct()
    pagerank(kg_edges.limit(1000), iters=1).count()  # warm-up
    run("kg_pagerank", lambda: pagerank(kg_edges, iters=3).count())

    spark.stop()
    return {
        "timings": timings,
        "samples": samples,
        "n_docs": n_docs,
        "loadavg_start": load_start,
        "loadavg_end": loadavg(),
        "repeats": n_repeats,
    }


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else -1.0

    max_windows = int(os.environ.get("SPARK_GRAFT_BENCH_JVMS", "3"))
    windows: list[dict] = []
    for i in range(max_windows):
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--window"],
            capture_output=True,
            text=True,
        )
        if out.returncode != 0:
            print(out.stderr[-2000:], file=sys.stderr)
            raise SystemExit(f"bench window {i} failed")
        w = json.loads(out.stdout.strip().splitlines()[-1])
        windows.append(w)
        # quiet = co-tenant load low when the window STARTED; the end
        # reading is dominated by this bench's own executors and is
        # recorded for the artifact, not gated on.
        quiet = w["loadavg_start"] < QUIET_LOAD
        print(
            f"window {i}: total "
            f"{round(sum(w['timings'].values()), 3)}s, loadavg "
            f"{w['loadavg_start']}->{w['loadavg_end']}"
            f"{' (quiet)' if quiet else ''}",
            file=sys.stderr,
        )
        if quiet and i >= 1:
            break  # >=2 windows, one of them quiet: enough signal

    # Per-query minimum across all fresh-JVM windows — the steady-state
    # estimator under co-tenant noise, applied identically everywhere.
    names = list(windows[0]["timings"])
    timings = {
        n: min(w["timings"][n] for w in windows) for n in names
    }
    total = round(sum(timings.values()), 3)
    n_docs = windows[0]["n_docs"]
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
                "n_windows": len(windows),
                "windows": [
                    {
                        "timings": w["timings"],
                        "samples": w["samples"],
                        "loadavg_start": w["loadavg_start"],
                        "loadavg_end": w["loadavg_end"],
                    }
                    for w in windows
                ],
                "repeats": windows[0]["repeats"],
            }
        )
    )


if __name__ == "__main__":
    if "--window" in sys.argv:
        print(json.dumps(run_window()))
    else:
        main()
