"""Scaling-efficiency evidence for the END-TO-END dedup recipe
(VERDICT r3 item 8): the full jobs/dedup_corpus.py composition —
MinHash signatures -> LSH banded candidate pairs -> connected
components -> keep one canonical doc per cluster — run on identical
amplified input at two parallelism levels, same interleaved-fresh-JVM
protocol as bench_scaling.py (this shared VM's co-tenant load swings
single runs ~2x; time-adjacent pairs cancel the drift).

Input: sf0.1 documents amplified xAMP with a per-replica suffix, so
every base document becomes a cluster of AMP NEAR-duplicates — the
pipeline does real clustering work (banded join buckets of size ~AMP,
CC over ~O(base_docs x AMP^2 / bands) edges), and the survivor count
has a known expectation (~n_base) recorded for cross-level equality.

    eff = docs_per_sec(4N) / (4 x docs_per_sec(N))

Usage: python bench_dedup_scaling.py [sf_dir]
Appends a row to BENCH_SCALING.md and prints one JSON line.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

WORKER = r"""
import json, os, sys, time
from pyspark.sql import functions as F
from phenobert_spark.config import get_spark
from phenobert_spark.operators.closure import star_components
from phenobert_spark.operators.dedup import lsh_star_edges, minhash_signatures

cores, sf_dir, amp, n_runs = sys.argv[1], sys.argv[2], int(sys.argv[3]), int(sys.argv[4])
spark = get_spark(app_name=f"dedup-scaling-{cores}", master=f"local[{cores}]",
                  shuffle_partitions=2 * int(cores))
spark.sparkContext.setLogLevel("ERROR")
raw = spark.read.parquet(f"{sf_dir}/documents.parquet")
docs = (
    raw.crossJoin(spark.range(amp).withColumnRenamed("id", "rep"))
    .select(
        F.concat(F.col("doc_id").cast("string"), F.lit("_"), F.col("rep")).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" replica "), F.col("rep")).alias("text"),
    )
    .repartition(4 * int(cores))
    .cache()
)
n_docs = docs.count()

def once():
    t0 = time.time()
    edges = lsh_star_edges(minhash_signatures(docs))
    comp = star_components(edges, nodes=docs.select("doc_id"))
    canon = comp.filter("component = node").select(F.col("node").alias("doc_id"))
    survivors = docs.join(canon, on="doc_id", how="left_semi").count()
    return time.time() - t0, survivors

once()  # warm-up (JIT + python-worker spin-up), excluded
runs = [once() for _ in range(n_runs)]
best = min(t for t, _ in runs)
print(json.dumps({"cores": int(cores), "n_docs": n_docs, "sec": round(best, 3),
                  "docs_per_sec": round(n_docs / best, 2),
                  "runs": [round(t, 3) for t, _ in runs],
                  "survivors": runs[0][1],
                  "loadavg": round(os.getloadavg()[0], 2)}))
spark.stop()
"""

AMP = int(os.environ.get("DEDUP_SCALING_AMP", "64"))

# Optional constant-memory-PER-CORE mode (SCALING_MEM_PER_CORE_MB): a real
# N -> 4N executor scale-up carries 4x total memory (each executor keeps its
# own heap), while a single local JVM at a fixed SPARK_DRIVER_MEMORY gives the
# 16-core level 4x LESS memory per task than the 4-core level — an asymmetry a
# cluster never sees, and the suspected cause of the x512 dedup windows
# reading 0.66-0.75 while x256 clears 0.8. Setting e.g.
# SCALING_MEM_PER_CORE_MB=1500 gives local[4] a 6g heap and local[16] 24g,
# mirroring per-executor-constant memory. Unset = legacy fixed-heap protocol.
MEM_PER_CORE_MB = os.environ.get("SCALING_MEM_PER_CORE_MB")

# Optional RAM-backed shuffle dirs (SCALING_SHM_SHUFFLE=1): both levels
# write shuffle/spill files under /dev/shm instead of the single shared
# VM disk. Rationale mirrors mem-per-core: a real N -> 4N scale-up
# carries 4x node-local disks, so aggregate shuffle bandwidth grows
# with the cluster, while this sandbox's one virtual disk serializes
# the 16-core level's concurrent shuffle writes — an asymmetry a
# cluster never sees. Applied to BOTH levels (paired), so the ratio
# stays honest about scheduling/CPU scaling.
SHM_SHUFFLE = os.environ.get("SCALING_SHM_SHUFFLE")


def run_level(
    cores: int,
    sf_dir: str,
    n_runs: int = int(os.environ.get("DEDUP_SCALING_RUNS", "2")),
) -> dict:
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


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    )
    lo_runs, hi_runs = [], []
    for _ in range(int(os.environ.get("SCALING_JVMS", "3"))):
        lo_runs.append(run_level(4, sf_dir))
        hi_runs.append(run_level(16, sf_dir))
    lo = min(lo_runs, key=lambda r: r["sec"])
    hi = min(hi_runs, key=lambda r: r["sec"])
    assert lo["survivors"] == hi["survivors"], (lo, hi)
    eff = hi["docs_per_sec"] / (4 * lo["docs_per_sec"])
    pair_effs = [
        round((l["sec"] / h["sec"]) / 4, 4)
        for l, h in zip(lo_runs, hi_runs)
    ]
    paired_median = sorted(pair_effs)[len(pair_effs) // 2]
    result = {
        "metric": "dedup_scaling_efficiency_N_to_4N",
        "value": round(eff, 4),
        "unit": "ratio",
        "value_paired_median": paired_median,
        "pair_effs": pair_effs,
        "n_level": lo,
        "four_n_level": hi,
        "amp": AMP,
        "sf_dir": sf_dir,
    }
    print(json.dumps(result))
    proto = f" mem/core={MEM_PER_CORE_MB}m" if MEM_PER_CORE_MB else ""
    if SHM_SHUFFLE:
        proto += " shm-shuffle"
    line = (
        f"| dedup e2e {sf_dir} x{AMP}{proto} ({lo['n_docs']} docs, "
        f"{lo['survivors']} survivors) "
        f"| local[{lo['cores']}]: {lo['docs_per_sec']} docs/s ({lo['sec']}s) "
        f"| local[{hi['cores']}]: {hi['docs_per_sec']} docs/s ({hi['sec']}s) "
        f"| **{eff:.3f}** (paired-median {paired_median}) |\n"
    )
    with open(os.path.join(os.path.dirname(__file__) or ".", "BENCH_SCALING.md"), "a") as f:
        f.write(line)


if __name__ == "__main__":
    main()
