"""Isolated q17 experiment (guide §1.4 noop sink): baseline vs
fan-out repartition before the minhash hash pass.

Usage: python tools/probe_q17.py [sf_dir] [mode]
  mode: base | fan
"""

import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F  # noqa: E402

from phenobert_spark.config import get_spark  # noqa: E402
from phenobert_spark.operators.dedup import (  # noqa: E402
    lsh_candidate_pairs,
    minhash_signatures,
)


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    mode = sys.argv[2] if len(sys.argv) > 2 else "base"
    spark = get_spark(app_name=f"probe-q17-{mode}")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1_000_000).select(F.sum("id")).collect()  # JVM warm-up

    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    if mode == "fan":
        d = d.repartition(spark.sparkContext.defaultParallelism, "doc_id")

    def run():
        sig = minhash_signatures(d, n_hashes=4, shingle_w=3)
        out = lsh_candidate_pairs(sig).orderBy("doc_a", "doc_b")
        out.write.format("noop").mode("overwrite").save()

    spark.sparkContext.setJobDescription(f"q17 {mode} warm")
    run()
    ts = []
    for i in range(3):
        spark.sparkContext.setJobDescription(f"q17 {mode} rep{i}")
        t0 = time.time()
        run()
        ts.append(round(time.time() - t0, 3))
    print({"mode": mode, "sf": sf_dir, "samples": ts, "min": min(ts)})
    spark.stop()


if __name__ == "__main__":
    main()
